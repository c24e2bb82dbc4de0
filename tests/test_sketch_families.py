"""Unit tests for the non-HLL sketch families (Bloom, count-min, t-digest,
KLL, MinHash): accuracy bounds, merge associativity, serde round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from rayhll.sketches.bloom import BloomFilter
from rayhll.sketches.countmin import CountMinSketch
from rayhll.sketches.kll import KLLSketch
from rayhll.sketches.minhash import (
    MinHash,
    band_hashes,
    signatures_for_offsets,
)
from rayhll.sketches.tdigest import TDigest


# ----------------------------------------------------------------------
# Bloom


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(1)
    members = rng.integers(-(2**63), 2**63 - 1, size=10_000, dtype=np.int64)
    others = rng.integers(-(2**63), 2**63 - 1, size=10_000, dtype=np.int64)
    bf = BloomFilter.for_capacity(10_000, fp_rate=0.01)
    bf.add_batch(members)
    assert bf.contains_batch(members).all()
    fp = bf.contains_batch(others).mean()
    assert fp < 0.03


def test_bloom_merge_and_roundtrip():
    a, b = BloomFilter(1 << 12, 5), BloomFilter(1 << 12, 5)
    a.add_batch(np.arange(100, dtype=np.int64))
    b.add_batch(np.arange(100, 200, dtype=np.int64))
    a.merge(b)
    assert a.contains_batch(np.arange(200, dtype=np.int64)).all()
    back = BloomFilter.from_bytes(a.to_bytes())
    assert np.array_equal(back.bits, a.bits)
    with pytest.raises(ValueError):
        a.merge(BloomFilter(1 << 13, 5))


# ----------------------------------------------------------------------
# count-min


def test_countmin_overestimates_and_is_tight_when_sparse():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 50, size=100_000, dtype=np.int64)
    exact = np.bincount(keys, minlength=50)
    cm = CountMinSketch(depth=5, width=1 << 14)
    cm.add_batch(keys)
    est = cm.estimate_batch(np.arange(50, dtype=np.int64))
    assert (est >= exact).all()
    # 50 keys in 16384 cells: collisions essentially impossible
    assert (est == exact).all()
    assert cm.total == 100_000


def test_countmin_merge_equals_single_build():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1000, size=20_000, dtype=np.int64)
    whole = CountMinSketch(4, 1 << 10)
    whole.add_batch(keys)
    a, b = CountMinSketch(4, 1 << 10), CountMinSketch(4, 1 << 10)
    a.add_batch(keys[:7000])
    b.add_batch(keys[7000:])
    a.merge(b)
    assert np.array_equal(a.table, whole.table)
    back = CountMinSketch.from_bytes(a.to_bytes())
    assert np.array_equal(back.table, whole.table) and back.total == whole.total


def test_countmin_weighted_adds():
    cm = CountMinSketch(4, 1 << 10)
    cm.add_batch(np.array([5, 6], dtype=np.int64), counts=np.array([10, 3]))
    assert cm.estimate(5) == 10 and cm.estimate(6) == 3


# ----------------------------------------------------------------------
# t-digest


def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(4)
    data = rng.normal(size=200_000)
    td = TDigest(compression=200)
    for chunk in np.array_split(data, 10):
        td.add_batch(chunk)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = td.quantile(q)
        # compare by rank error, the meaningful t-digest metric
        rank = (data < est).mean()
        assert abs(rank - q) < 0.01, (q, est, rank)
    assert td.quantile(0.0) == pytest.approx(data.min())
    assert td.quantile(1.0) == pytest.approx(data.max())


def test_tdigest_merge_accuracy_and_roundtrip():
    rng = np.random.default_rng(5)
    data = rng.exponential(size=100_000)
    parts = np.array_split(data, 7)
    digests = []
    for p in parts:
        td = TDigest(compression=200)
        td.add_batch(p)
        digests.append(TDigest.from_bytes(td.to_bytes()))  # via serde, as Ray would
    acc = digests[0]
    for d in digests[1:]:
        acc.merge(d)
    assert acc.total_weight == pytest.approx(len(data))
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = (data < acc.quantile(q)).mean()
        assert abs(rank - q) < 0.015, q


# ----------------------------------------------------------------------
# KLL


def test_kll_rank_error_bound():
    rng = np.random.default_rng(6)
    data = rng.uniform(size=150_000)
    kll = KLLSketch(k=200)
    for chunk in np.array_split(data, 20):
        kll.add_batch(chunk)
    assert kll.n == len(data)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = kll.quantile(q)
        rank = (data < est).mean()
        assert abs(rank - q) < 0.03, (q, rank)


def test_kll_merge_and_roundtrip_deterministic():
    rng = np.random.default_rng(7)
    data = rng.normal(size=60_000)
    a, b = KLLSketch(200), KLLSketch(200)
    a.add_batch(data[:30_000])
    b.add_batch(data[30_000:])
    a.merge(KLLSketch.from_bytes(b.to_bytes()))
    assert a.n == len(data)
    rank = (data < a.quantile(0.5)).mean()
    assert abs(rank - 0.5) < 0.03
    # determinism: same build twice -> identical bytes
    c, d = KLLSketch(200), KLLSketch(200)
    c.add_batch(data)
    d.add_batch(data)
    assert c.to_bytes() == d.to_bytes()


# ----------------------------------------------------------------------
# MinHash


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(8)
    base = rng.integers(-(2**63), 2**63 - 1, size=1000, dtype=np.int64)
    # 80% overlap
    other = np.concatenate(
        [base[:800], rng.integers(-(2**63), 2**63 - 1, size=200, dtype=np.int64)]
    )
    a, b = MinHash(256), MinHash(256)
    a.add_batch(base)
    b.add_batch(other)
    true_j = len(np.intersect1d(base, other)) / len(np.union1d(base, other))
    assert a.jaccard(b) == pytest.approx(true_j, abs=0.08)
    # merge == union of sets
    a.merge(b)
    u = MinHash(256)
    u.add_batch(np.concatenate([base, other]))
    assert np.array_equal(a.signature, u.signature)
    back = MinHash.from_bytes(a.to_bytes())
    assert np.array_equal(back.signature, a.signature)


def test_ragged_signatures_match_per_set():
    rng = np.random.default_rng(9)
    sets = [rng.integers(0, 2**63 - 1, size=n, dtype=np.int64) for n in (5, 0, 17, 3)]
    flat = np.concatenate(sets).view(np.uint64)
    offsets = np.cumsum([0] + [len(s) for s in sets])
    sigs = signatures_for_offsets(flat, np.asarray(offsets), num_perm=64)
    for i, s in enumerate(sets):
        mh = MinHash(64)
        mh.add_batch(s)
        assert np.array_equal(sigs[i], mh.signature), i
    bands = band_hashes(sigs, num_bands=16)
    assert bands.shape == (4, 16)
    # identical sets -> identical band hashes
    sigs2 = signatures_for_offsets(flat, np.asarray(offsets), num_perm=64)
    assert np.array_equal(band_hashes(sigs2, 16), bands)


# ----------------------------------------------------------------------
# Theta (KMV)


def test_theta_exact_below_capacity_and_estimate_above():
    from rayhll.sketches.theta import ThetaSketch

    rng = np.random.default_rng(10)
    small = rng.integers(-(2**63), 2**63 - 1, size=1000, dtype=np.int64)
    t = ThetaSketch(k=4096)
    t.add_batch(small)
    assert t.cardinality() == len(np.unique(small))  # exact below k

    big = rng.integers(-(2**63), 2**63 - 1, size=300_000, dtype=np.int64)
    t2 = ThetaSketch(k=4096)
    for chunk in np.array_split(big, 7):
        t2.add_batch(chunk)
    exact = len(np.unique(big))
    assert abs(t2.cardinality() - exact) / exact < 0.05


def test_theta_merge_and_roundtrip():
    from rayhll.sketches.theta import ThetaSketch

    rng = np.random.default_rng(11)
    vals = rng.integers(-(2**63), 2**63 - 1, size=100_000, dtype=np.int64)
    whole = ThetaSketch(1024)
    whole.add_batch(vals)
    a, b = ThetaSketch(1024), ThetaSketch(1024)
    a.add_batch(vals[:60_000])
    b.add_batch(vals[60_000:])
    a.merge(ThetaSketch.from_bytes(b.to_bytes()))
    assert np.array_equal(a.values, whole.values)  # deterministic KMV state


def test_theta_set_operations_beat_inclusion_exclusion_shape():
    from rayhll.sketches.theta import ThetaSketch

    rng = np.random.default_rng(12)
    pool = rng.integers(-(2**63), 2**63 - 1, size=300_000, dtype=np.int64)
    A = pool[:200_000]
    B = pool[100_000:]  # |A ∩ B| = 100_000, |A ∪ B| = 300_000 (minus dup noise)
    a, b = ThetaSketch(8192), ThetaSketch(8192)
    a.add_batch(A)
    b.add_batch(B)
    exact_a = len(np.unique(A))
    exact_b = len(np.unique(B))
    exact_u = len(np.unique(pool))
    exact_i = exact_a + exact_b - exact_u
    assert abs(a.intersect_estimate(b) - exact_i) / exact_i < 0.08
    assert abs(a.union_estimate(b) - exact_u) / exact_u < 0.05
    assert abs(a.difference_estimate(b) - (exact_a - exact_i)) / (exact_a - exact_i) < 0.08
    true_j = exact_i / exact_u
    assert abs(a.jaccard_estimate(b) - true_j) < 0.05


def test_rhs_frame_version_guard():
    """A blob framed with a different format version fails LOUDLY at
    from_bytes — cross-version merges would corrupt estimates silently
    (ADVICE r2: the r2 hash-stream rework changed signature contents for
    the same seed)."""
    import numpy as np

    from rayhll.sketches.base import Sketch
    from rayhll.sketches.minhash import MinHash

    mh = MinHash(num_perm=16)
    mh.add_batch(np.arange(100, dtype=np.int64))
    blob = mh.to_bytes()
    assert blob[:3] == b"RHS" and blob[4] == Sketch.format_version
    assert MinHash.from_bytes(blob).jaccard(mh) == 1.0
    stale = blob[:4] + bytes([Sketch.format_version - 1]) + blob[5:]
    with pytest.raises(ValueError, match="format v"):
        MinHash.from_bytes(stale)
