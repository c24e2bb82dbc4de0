"""Seeded randomized differential soak vs the reference library.

Compensates for the three sandbox-absent probabilistic golden CSVs
(reference `.MISSING_LARGE_BLOBS`) by unioning sketches across >=50 random
(log2m, regwidth, expthresh, sparseon) configurations and asserting
byte-equal serialization and equal cardinality against the shimmed
reference at every checkpoint (VERDICT r1 item 7).

Add counts are sized to exercise the EXPLICIT -> SPARSE -> FULL promotion
ladder and the heterogeneous-union dispatch (reference:
python_hll/hll.py:222-280, 491-691).
"""

from __future__ import annotations

import random
import sys

import numpy as np
import pytest

from rayhll.compat import HLL

pytestmark = pytest.mark.filterwarnings("ignore::RuntimeWarning")


@pytest.fixture(scope="module")
def ref_hll():
    np.int = int  # the reference uses np.int, removed in numpy >= 1.24
    sys.path.insert(0, "/root/reference")
    try:
        from python_hll.hll import HLL as RefHLL
    except ImportError:
        pytest.skip("reference library not importable")
    yield RefHLL
    sys.path.remove("/root/reference")


def _soak_configs(n: int, seed: int = 20260817):
    """n deterministic random parameter tuples across the legal space."""
    rng = random.Random(seed)
    configs = []
    while len(configs) < n:
        log2m = rng.randint(4, 16)
        regwidth = rng.randint(1, 8)
        # expthresh: auto (-1), promotion-disabled (0), or explicit 1..18
        expthresh = rng.choice([-1, 0, rng.randint(1, 18)])
        sparseon = rng.random() < 0.7
        cfg = (log2m, regwidth, expthresh, sparseon)
        if cfg not in configs:
            configs.append(cfg)
    return configs


N_CONFIGS = 50


@pytest.mark.parametrize("cfg", _soak_configs(N_CONFIGS), ids=lambda c: f"{c[0]}-{c[1]}-{c[2]}-{int(c[3])}")
def test_differential_union_soak(ref_hll, cfg):
    log2m, regwidth, expthresh, sparseon = cfg
    rng = random.Random(hash(cfg) & 0xFFFFFFFF)
    # two sketches with asymmetric sizes so unions cross representations
    # (EXPLICIT x SPARSE, SPARSE x FULL, ...), then a self-union re-check
    n_a = rng.choice([3, 40, 300, 900])
    n_b = rng.choice([3, 40, 300, 900])
    ours_a = HLL(log2m, regwidth, expthresh, sparseon)
    ref_a = ref_hll(log2m, regwidth, expthresh, sparseon)
    ours_b = HLL(log2m, regwidth, expthresh, sparseon)
    ref_b = ref_hll(log2m, regwidth, expthresh, sparseon)
    for n, (o, r) in ((n_a, (ours_a, ref_a)), (n_b, (ours_b, ref_b))):
        for _ in range(n):
            v = rng.randint(-(2**63), 2**63 - 1)
            o.add_raw(v)
            r.add_raw(v)
        assert o.to_bytes() == r.to_bytes(), cfg
        assert o.cardinality() == r.cardinality(), cfg
    ours_a.union(ours_b)
    ref_a.union(ref_b)
    assert ours_a.to_bytes() == ref_a.to_bytes(), cfg
    assert ours_a.cardinality() == ref_a.cardinality(), cfg
    # round-trip through bytes preserves the union result exactly
    again = HLL.from_bytes(ours_a.to_bytes())
    assert again.to_bytes() == ref_a.to_bytes(), cfg


@pytest.mark.parametrize("seed", range(12))
def test_differential_create_for_testing_soak(ref_hll, seed):
    """Arbitrary (explicit, sparse) threshold pairs via create_for_testing —
    the configuration space of the sandbox-absent promotion/correction golden
    suites (postgres replays use explicit=128/sparse=512, not the auto
    values).  Byte-equal at every add checkpoint and after union."""
    rng = random.Random(1000 + seed)
    log2m = rng.randint(5, 13)
    regwidth = rng.randint(2, 8)
    explicit = rng.choice([1, 4, 128, 512])
    sparse = rng.choice([16, 512, 850, 4096])
    t = rng.choice([1, 2, 3, 4])  # EMPTY/EXPLICIT/SPARSE/FULL start type
    if t == 2 and explicit == 0:
        t = 1
    ours = HLL.create_for_testing(log2m, regwidth, explicit, sparse, t)
    ref = ref_hll.create_for_testing(log2m, regwidth, explicit, sparse, t)
    n = rng.choice([3, 200, 1100])
    for i in range(n):
        v = rng.randint(-(2**63), 2**63 - 1)
        ours.add_raw(v)
        ref.add_raw(v)
        if i % 97 == 0:
            assert ours.to_bytes() == ref.to_bytes(), (log2m, regwidth, explicit, sparse, t, i)
    o2 = HLL.create_for_testing(log2m, regwidth, explicit, sparse, t)
    r2 = ref_hll.create_for_testing(log2m, regwidth, explicit, sparse, t)
    for _ in range(60):
        v = rng.randint(-(2**63), 2**63 - 1)
        o2.add_raw(v)
        r2.add_raw(v)
    ours.union(o2)
    ref.union(r2)
    assert ours.to_bytes() == ref.to_bytes()
    assert ours.cardinality() == ref.cardinality()


@pytest.mark.parametrize("seed", range(8))
def test_differential_union_chain_soak(ref_hll, seed):
    """Sequential union CHAINS (5 sketches of random sizes folded left to
    right) — covers repeated-union state transitions the pairwise soak
    doesn't (e.g. SPARSE accumulator absorbing EXPLICIT then crossing to
    FULL mid-chain).  Byte-equal after every fold."""
    rng = random.Random(4000 + seed)
    log2m = rng.randint(4, 14)
    regwidth = rng.randint(1, 8)
    expthresh = rng.choice([-1, 0, rng.randint(1, 14)])
    sparseon = rng.random() < 0.7
    acc_o = HLL(log2m, regwidth, expthresh, sparseon)
    acc_r = ref_hll(log2m, regwidth, expthresh, sparseon)
    for _ in range(5):
        n = rng.choice([0, 2, 30, 250, 800])
        o = HLL(log2m, regwidth, expthresh, sparseon)
        r = ref_hll(log2m, regwidth, expthresh, sparseon)
        for _ in range(n):
            v = rng.randint(-(2**63), 2**63 - 1)
            o.add_raw(v)
            r.add_raw(v)
        acc_o.union(o)
        acc_r.union(r)
        assert acc_o.to_bytes() == acc_r.to_bytes(), (log2m, regwidth, expthresh, sparseon, n)
    assert acc_o.cardinality() == acc_r.cardinality()
