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


# --- text kernel properties (shared token-hash stream) ---

_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_doc = st.lists(_tok, min_size=0, max_size=30)


@hsettings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=1, max_size=8), gram=st.integers(2, 5))
def test_token_gram_stream_properties(docs, gram):
    """First-principles mirrors of the shared stream kernels: gram counts,
    hash-distinct tokens, and the 2-gram mode must equal the pure-Python
    computation on the same token lists."""
    import collections

    import polars as pl

    from rayhll.pipelines.text import token_gram_hashes, token_hash_stream

    texts = pl.Series([" ".join(d) for d in docs])
    valid_lens, grams = token_gram_hashes(texts, gram)
    assert valid_lens.tolist() == [max(len(d) - gram + 1, 0) for d in docs]
    assert len(grams) == sum(max(len(d) - gram + 1, 0) for d in docs)

    # gram-hash equality == token-sequence equality across the whole batch
    by_hash: dict[int, tuple] = {}
    pos = 0
    for d in docs:
        for i in range(max(len(d) - gram + 1, 0)):
            key = int(grams[pos])
            seq = tuple(d[i : i + gram])
            assert by_hash.setdefault(key, seq) == seq  # no aliasing
            pos += 1

    lengths, flat = token_hash_stream(texts)
    assert lengths.tolist() == [len(d) for d in docs]
    off = 0
    for d in docs:
        seg = flat[off : off + len(d)]
        assert len(set(seg.tolist())) == len(set(d))  # hash-distinct == distinct
        off += len(d)


@hsettings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_repetition_stats_match_counter(docs):
    import collections

    import pyarrow as pa

    from rayhll.pipelines.text import RepetitionStats

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array([" ".join(d) for d in docs]),
        }
    )
    out = RepetitionStats()(batch).to_pandas()
    for i, d in enumerate(docs):
        assert out.loc[i, "n_distinct_tokens"] == len(set(d))
        grams2 = list(zip(d, d[1:]))
        want_top = max(collections.Counter(grams2).values()) if grams2 else 0
        assert out.loc[i, "top_2gram_count"] == want_top
