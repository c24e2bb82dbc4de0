"""Unit + property tests for the vectorized sketch core (no Ray).

Modeled on the reference's test pyramid (SURVEY.md §5): per-representation
semantics, promotion thresholds, randomized oracles, estimator ranges,
serialization round-trips, and the partition-permutation merge property that
the Ray engine relies on.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from rayhll.core import serde
from rayhll.core.hlltype import HllType
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch, compute_registers


def construct_hll_value(log2m, register_index, register_value):
    return ((1 << (register_value - 1)) << log2m) | register_index


# ----------------------------------------------------------------------
# register kernel


def test_register_kernel_matches_scalar_model():
    """Vectorized kernel vs a direct transcription of the scalar reference
    math (reference: python_hll/hll.py:282-323)."""
    settings = HllSettings(11, 5)
    rng = random.Random(1)
    values = [rng.randint(-(2**63), 2**63 - 1) for _ in range(5000)] + [
        0,
        -1,
        1,
        2**63 - 1,
        -(2**63),
        construct_hll_value(11, 0, 1),
        construct_hll_value(11, 2047, 31),
    ]
    arr = np.array(values, dtype=np.int64)
    j, p_w = compute_registers(settings, arr)
    got = dict()
    for jj, pp in zip(j.tolist(), p_w.tolist()):
        got[jj] = max(got.get(jj, 0), pp)

    expected = dict()
    for v in values:
        u = v & 0xFFFFFFFFFFFFFFFF
        sub = u >> settings.log2m
        if sub == 0:
            continue
        masked = (sub | settings.pw_max_mask_u64) & 0xFFFFFFFFFFFFFFFF
        lsb = (masked & -masked).bit_length() - 1
        pw = 1 + lsb
        jj = u & settings.m_bits_mask
        expected[jj] = max(expected.get(jj, 0), pw)
    assert got == expected


@pytest.mark.parametrize("regwidth", range(1, 9))
def test_register_values_clamped(regwidth):
    settings = HllSettings(8, regwidth)
    rng = np.random.default_rng(7)
    arr = rng.integers(-(2**63), 2**63 - 1, size=20000, dtype=np.int64)
    _, p_w = compute_registers(settings, arr)
    assert p_w.max(initial=0) <= settings.max_register_value


# ----------------------------------------------------------------------
# representation state machine


def test_explicit_exact_and_negative_values():
    h = HllSketch(HllSettings(11, 5, expthresh=10))
    h.add_batch(np.array([1, -1, 2**62, -(2**62), 1, -1], dtype=np.int64))
    assert h.get_type() == HllType.EXPLICIT
    assert h.cardinality() == 4


def test_promotion_chain_counts():
    # expthresh=4 -> explicit threshold 8 (reference: tests/test_explicit_hll.py:141-154)
    h = HllSketch(HllSettings(11, 5, expthresh=4))
    h.add_batch(np.arange(1, 9, dtype=np.int64) << 11)
    assert h.get_type() == HllType.EXPLICIT
    h.add_raw(9 << 11)
    assert h.get_type() == HllType.SPARSE
    # drive past the sparse threshold (512 at log2m=11, regwidth=5)
    h.add_batch(np.arange(10, 1000, dtype=np.int64) + (1 << 30))
    assert h.get_type() == HllType.FULL


def test_empty_skips_explicit_when_expthresh_zero():
    h = HllSketch(HllSettings(11, 5, expthresh=0))
    h.add_raw(123456)
    assert h.get_type() == HllType.SPARSE
    h2 = HllSketch(HllSettings(11, 5, expthresh=0, sparseon=False))
    h2.add_raw(123456)
    assert h2.get_type() == HllType.FULL


def test_batch_add_equals_sequential_adds():
    """add_batch(values) must land in the same state (bytes!) as add_raw per
    element — across all promotion boundaries."""
    rng = np.random.default_rng(42)
    values = rng.integers(-(2**63), 2**63 - 1, size=3000, dtype=np.int64)
    for expthresh in (-1, 0, 4, 10):
        batch = HllSketch(HllSettings(11, 5, expthresh=expthresh))
        batch.add_batch(values)
        seq = HllSketch(HllSettings(11, 5, expthresh=expthresh))
        for v in values.tolist():
            seq.add_raw(v)
        assert batch.get_type() == seq.get_type(), expthresh
        assert batch.to_bytes() == seq.to_bytes(), expthresh


def test_clear_preserves_type():
    h = HllSketch(HllSettings(11, 5, expthresh=0))
    h.add_batch(np.arange(10, dtype=np.int64) << 11)
    assert h.get_type() == HllType.SPARSE
    h.clear()
    assert h.get_type() == HllType.SPARSE
    assert h.cardinality() == 0


# ----------------------------------------------------------------------
# randomized oracle (reference: tests/test_explicit_hll.py:122-138,
# tests/test_sparse_hll.py:361-387)


def test_explicit_randomized_oracle():
    rng = random.Random(1)
    h = HllSketch(HllSettings(11, 5, expthresh=18))
    model = set()
    for _ in range(2000):
        v = rng.randint(1, 2**63 - 1)
        h.add_raw(v)
        model.add(v)
    assert h.get_type() == HllType.EXPLICIT
    assert h.cardinality() == len(model)


def test_sparse_registers_match_dict_model():
    rng = random.Random(1)
    settings = HllSettings(11, 5, expthresh=0)
    h = HllSketch(settings)
    model = {}
    for _ in range(400):
        v = rng.randint(1, 2**63 - 1)
        h.add_raw(v)
        u = v & 0xFFFFFFFFFFFFFFFF
        sub = u >> settings.log2m
        if sub == 0:
            continue
        masked = (sub | settings.pw_max_mask_u64) & 0xFFFFFFFFFFFFFFFF
        pw = (masked & -masked).bit_length()
        jj = u & settings.m_bits_mask
        model[jj] = max(model.get(jj, 0), pw)
    assert h.get_type() == HllType.SPARSE
    idx, vals = h._sparse_items()
    assert dict(zip(idx.tolist(), vals.tolist())) == model


# ----------------------------------------------------------------------
# estimator ranges (reference: tests/test_full_hll.py:16-113)


def test_small_range_estimator():
    h = HllSketch.for_testing(11, 5, 128, 512, HllType.FULL)
    h.add_raw(construct_hll_value(11, 0, 1))
    m = 2048
    # one register set -> small-range correction m*ln(m/V), V = m-1
    expected = m * np.log(m / (m - 1))
    assert h.float_cardinality() == pytest.approx(expected)


def test_normal_range_estimator():
    h = HllSketch.for_testing(11, 5, 128, 512, HllType.FULL)
    for i in range(2048):
        h.add_raw(construct_hll_value(11, i, 7))
    s = h.settings
    indicator = 2048 * 2.0**-7
    expected = s.alpha_m_squared / indicator
    assert h.float_cardinality() == pytest.approx(expected)


def test_large_range_estimator():
    h = HllSketch.for_testing(11, 5, 128, 512, HllType.FULL)
    for i in range(2048):
        h.add_raw(construct_hll_value(11, i, 30))
    s = h.settings
    estimator = s.alpha_m_squared / (2048 * 2.0**-30)
    two_to_l = float(2 ** (11 + 30))
    assert s.large_estimator_cutoff < estimator < two_to_l
    expected = -two_to_l * np.log(1.0 - estimator / two_to_l)
    assert h.float_cardinality() == pytest.approx(expected)


def test_large_range_estimator_saturates_to_zero():
    """E >= 2^L saturates to 0 via the reference's caught ValueError
    (reference: python_hll/hllutil.py:155-158)."""
    h = HllSketch.for_testing(11, 5, 128, 512, HllType.FULL)
    for i in range(2048):
        h.add_raw(construct_hll_value(11, i, 31))
    assert h.float_cardinality() == 0


def test_error_bound_on_random_stream():
    """Estimate within 3 * 1.04/sqrt(m) of exact distinct (pinned seed)."""
    rng = np.random.default_rng(12345)
    n = 200_000
    values = rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
    exact = len(np.unique(values))
    for log2m in (11, 14):
        h = HllSketch(HllSettings(log2m, 5, expthresh=0))
        h.add_batch(values)
        rel_err = abs(h.cardinality() - exact) / exact
        assert rel_err <= 3 * 1.04 / np.sqrt(2**log2m), (log2m, rel_err)


# ----------------------------------------------------------------------
# union properties


def _random_sketch(rng, settings, n):
    h = HllSketch(settings)
    h.add_batch(rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64))
    return h


def test_union_partition_permutation_property():
    """Merging per-partition sketches in ANY order == sequential build,
    byte-identical (the retry/shuffle safety property of the Ray engine)."""
    rng = np.random.default_rng(9)
    settings = HllSettings(11, 5)
    values = rng.integers(-(2**63), 2**63 - 1, size=20_000, dtype=np.int64)
    sequential = HllSketch(settings)
    sequential.add_batch(values)
    expected = sequential.to_bytes()

    parts = np.array_split(values, 7)
    for perm_seed in range(5):
        order = np.random.default_rng(perm_seed).permutation(len(parts))
        acc = HllSketch(settings)
        for i in order:
            part_sketch = HllSketch(settings)
            part_sketch.add_batch(parts[i])
            # exchange as serialized bytes, as the shuffle does
            acc.union(HllSketch.from_bytes(part_sketch.to_bytes()))
        assert acc.to_bytes() == expected


def test_union_heterogeneous_all_pairs():
    """Every (type, type) union pair produces the same content as adding both
    value streams to one sketch."""
    settings = HllSettings(11, 5, expthresh=6)  # explicit threshold 32
    rng = np.random.default_rng(3)
    streams = {
        HllType.EMPTY: np.empty(0, dtype=np.int64),
        HllType.EXPLICIT: rng.integers(-(2**63), 2**63 - 1, 10, dtype=np.int64),
        HllType.SPARSE: rng.integers(-(2**63), 2**63 - 1, 100, dtype=np.int64),
        HllType.FULL: rng.integers(-(2**63), 2**63 - 1, 5000, dtype=np.int64),
    }
    for ta, va in streams.items():
        for tb, vb in streams.items():
            a = HllSketch(settings)
            a.add_batch(va)
            assert a.get_type() == ta, (ta, a.get_type())
            b = HllSketch(settings)
            b.add_batch(vb)
            both = HllSketch(settings)
            both.add_batch(np.concatenate([va, vb]))
            a.union(b)
            assert a.to_bytes() == both.to_bytes(), (ta, tb)


def test_union_incompatible_raises():
    a = HllSketch(HllSettings(11, 5))
    b = HllSketch(HllSettings(12, 5))
    with pytest.raises(ValueError, match="union-incompatible"):
        a.union(b)


# ----------------------------------------------------------------------
# serialization sweep (reference: tests/test_hll_serialization.py:16-61,
# corner-sampled as in --fast-only mode)


@pytest.mark.parametrize("log2m", [4, 11, 16])
@pytest.mark.parametrize("regwidth", [1, 5, 8])
@pytest.mark.parametrize("expthresh", [-1, 0, 1, 18])
@pytest.mark.parametrize("sparseon", [True, False])
def test_serialization_roundtrip_sweep(log2m, regwidth, expthresh, sparseon):
    settings = HllSettings(log2m, regwidth, expthresh, sparseon)
    rng = np.random.default_rng(hash((log2m, regwidth, expthresh, sparseon)) % 2**32)
    h = HllSketch(settings)
    h.add_batch(rng.integers(-(2**63), 2**63 - 1, size=250, dtype=np.int64))
    data = h.to_bytes()
    back = HllSketch.from_bytes(data)
    assert back.get_type() == h.get_type()
    assert back.cardinality() == h.cardinality()
    assert back.to_bytes() == data


def test_hex_codec():
    data = bytes([0x12, 0x8D, 0x7F, 0x00, 0xFF])
    assert serde.to_hex(data) == "128D7F00FF"
    assert serde.from_hex("128D7F00FF") == data
    assert serde.from_pg_hex(serde.to_pg_hex(data)) == data


def test_settings_validation():
    with pytest.raises(ValueError):
        HllSettings(3, 5)
    with pytest.raises(ValueError):
        HllSettings(31, 5)
    with pytest.raises(ValueError):
        HllSettings(11, 0)
    with pytest.raises(ValueError):
        HllSettings(11, 9)
    with pytest.raises(ValueError):
        HllSettings(11, 5, expthresh=19)
    # auto explicit threshold, memory-optimal formula
    s = HllSettings(11, 5)
    assert s.explicit_threshold == ((5 * 2048 + 7) // 8) // 8
    assert s.sparse_threshold == 512


# ----------------------------------------------------------------------
# dict-backed SPARSE fallback (m > 2^24)


def test_dict_sparse_path_large_log2m():
    """log2m=25 -> m=2^25 exceeds the dense-sparse limit; the dict path must
    agree with the dense path semantics and serde."""
    rng = np.random.default_rng(13)
    values = rng.integers(-(2**63), 2**63 - 1, size=500, dtype=np.int64)
    h = HllSketch(HllSettings(25, 5, expthresh=0))
    h.add_batch(values)
    assert h.get_type() == HllType.SPARSE
    assert h._sparse is not None  # dict backing
    data = h.to_bytes()
    back = HllSketch.from_bytes(data)
    assert back.to_bytes() == data
    assert back.cardinality() == h.cardinality()
    # batch == sequential on the dict path too
    seq = HllSketch(HllSettings(25, 5, expthresh=0))
    for v in values.tolist():
        seq.add_raw(v)
    assert seq.to_bytes() == data


def test_dict_sparse_union_paths():
    s = HllSettings(25, 5, expthresh=4)
    rng = np.random.default_rng(14)
    va = rng.integers(-(2**63), 2**63 - 1, size=300, dtype=np.int64)
    vb = rng.integers(-(2**63), 2**63 - 1, size=300, dtype=np.int64)
    a = HllSketch(s)
    a.add_batch(va)
    b = HllSketch(s)
    b.add_batch(vb)
    both = HllSketch(s)
    both.add_batch(np.concatenate([va, vb]))
    a.union(HllSketch.from_bytes(b.to_bytes()))
    assert a.to_bytes() == both.to_bytes()
    # EMPTY ∪ dict-SPARSE clone
    e = HllSketch(s)
    e.union(both)
    assert e.to_bytes() == both.to_bytes()


# ----------------------------------------------------------------------
# serde error paths


def test_from_bytes_error_paths():
    with pytest.raises(ValueError, match="too short"):
        HllSketch.from_bytes(b"\x14")
    with pytest.raises(ValueError, match="schema version"):
        HllSketch.from_bytes(b"\x24\x8b\x49")
    with pytest.raises(ValueError, match="type ordinal"):
        HllSketch.from_bytes(b"\x17\x8b\x49")
    with pytest.raises(ValueError, match="UNDEFINED"):
        HllSketch.from_bytes(b"\x10\x8b\x49")
    # FULL body with fewer than m words
    h = HllSketch.for_testing(11, 5, 128, 512, HllType.FULL)
    data = h.to_bytes()
    with pytest.raises(ValueError, match="words"):
        HllSketch.from_bytes(data[: len(data) // 2])
