"""Hypothesis property tests for the sketch core.

Properties the Ray engine's correctness rests on (SURVEY.md §5 plan):

* batch-add == sequential-add (bytes), for arbitrary values AND parameters;
* union is associative, commutative, and idempotent (bytes);
* serde round-trips bytes exactly;
* merging any partition of a stream equals the sequential build (bytes);
* the sparse/full estimators agree where both representations are reachable.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings as hsettings
from hypothesis import strategies as st

from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
value_lists = st.lists(int64s, min_size=0, max_size=600)
params = st.tuples(
    st.integers(min_value=4, max_value=14),  # log2m
    st.integers(min_value=1, max_value=8),  # regwidth
    st.sampled_from([-1, 0, 1, 4, 10, 18]),  # expthresh
    st.booleans(),  # sparseon
)


def _arr(values) -> np.ndarray:
    return np.array(values, dtype=np.int64)


@hsettings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(params=params, values=value_lists)
def test_batch_equals_sequential(params, values):
    s = HllSettings(*params)
    batch = HllSketch(s)
    batch.add_batch(_arr(values))
    seq = HllSketch(s)
    for v in values:
        seq.add_raw(v)
    assert batch.to_bytes() == seq.to_bytes()


@hsettings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(params=params, a=value_lists, b=value_lists, c=value_lists)
def test_union_associative_commutative(params, a, b, c):
    s = HllSettings(*params)

    def sk(vals):
        h = HllSketch(s)
        h.add_batch(_arr(vals))
        return h

    ab_c = sk(a)
    ab_c.union(sk(b))
    ab_c.union(sk(c))
    a_bc = sk(b)
    a_bc.union(sk(c))
    a_bc.union(sk(a))
    assert ab_c.to_bytes() == a_bc.to_bytes()
    # idempotence: x ∪ x == x
    x = sk(a)
    x2 = sk(a)
    x.union(x2)
    assert x.to_bytes() == sk(a).to_bytes()


@hsettings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(params=params, values=value_lists)
def test_serde_roundtrip_exact(params, values):
    s = HllSettings(*params)
    h = HllSketch(s)
    h.add_batch(_arr(values))
    data = h.to_bytes()
    back = HllSketch.from_bytes(data)
    assert back.to_bytes() == data
    assert back.get_type() == h.get_type()
    assert back.cardinality() == h.cardinality()


@hsettings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    values=st.lists(int64s, min_size=1, max_size=800),
    n_parts=st.integers(min_value=1, max_value=7),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_partition_merge_equals_sequential(values, n_parts, seed):
    s = HllSettings(11, 5)
    arr = _arr(values)
    seq = HllSketch(s)
    seq.add_batch(arr)
    parts = np.array_split(arr, n_parts)
    order = np.random.default_rng(seed).permutation(n_parts)
    acc = HllSketch(s)
    for i in order:
        p = HllSketch(s)
        p.add_batch(parts[i])
        acc.union(HllSketch.from_bytes(p.to_bytes()))
    assert acc.to_bytes() == seq.to_bytes()


@hsettings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(values=st.lists(int64s, min_size=1, max_size=400, unique=True))
def test_explicit_mode_is_exact(values):
    h = HllSketch(HllSettings(11, 5, expthresh=18))
    h.add_batch(_arr(values))
    assert h.cardinality() == len(set(values))
