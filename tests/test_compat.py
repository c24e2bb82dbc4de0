"""Differential test: rayhll.compat.HLL vs the actual reference library.

Runs the reference at /root/reference (with the numpy shim from SURVEY.md §5)
side-by-side with the compat facade: same op sequence, byte-identical
serialization at every step."""

from __future__ import annotations

import random
import sys

import numpy as np
import pytest

from rayhll.compat import HLL, HLLType, HLLUtil, NumberUtil

# the reference's pure-python bit ops emit numpy overflow RuntimeWarnings
pytestmark = pytest.mark.filterwarnings("ignore::RuntimeWarning")


@pytest.fixture(scope="module")
def reference():
    np.int = int  # the reference uses np.int, removed in numpy >= 1.24
    sys.path.insert(0, "/root/reference")
    try:
        from python_hll.hll import HLL as RefHLL
        from python_hll.util import NumberUtil as RefNumberUtil
    except ImportError:
        pytest.skip("reference library not importable")
    yield RefHLL, RefNumberUtil
    sys.path.remove("/root/reference")


def test_reference_example_flow():
    """The reference README usage (README.rst:38-60) runs verbatim."""
    hll = HLL(13, 5)
    hll.add_raw(123456789)
    assert hll.cardinality() == 1
    hll1, hll2 = HLL(13, 5), HLL(13, 5)
    hll1.add_raw(1)
    hll2.add_raw(2)
    hll1.union(hll2)
    assert hll1.cardinality() == 2
    b = hll1.to_bytes()
    assert isinstance(b, list) and all(-128 <= x <= 127 for x in b)
    assert HLL.from_bytes(b).cardinality() == 2


def test_differential_adds_vs_reference(reference):
    RefHLL, RefNumberUtil = reference
    rng = random.Random(7)
    ours = HLL(11, 5)
    ref = RefHLL(11, 5)
    for i in range(3000):
        v = rng.randint(-(2**63), 2**63 - 1)
        ours.add_raw(v)
        ref.add_raw(v)
        if i % 250 == 0:
            assert ours.to_bytes() == ref.to_bytes(), i
            assert ours.cardinality() == ref.cardinality(), i
    assert ours.to_bytes() == ref.to_bytes()
    assert ours.get_type() == HLLType.FULL


def test_differential_unions_vs_reference(reference):
    RefHLL, _ = reference
    rng = random.Random(8)
    acc_ours, acc_ref = HLL(11, 5), RefHLL(11, 5)
    for round_ in range(6):
        n = [3, 50, 900][round_ % 3]
        values = [rng.randint(-(2**63), 2**63 - 1) for _ in range(n)]
        o, r = HLL(11, 5), RefHLL(11, 5)
        for v in values:
            o.add_raw(v)
            r.add_raw(v)
        acc_ours.union(o)
        acc_ref.union(r)
        assert acc_ours.to_bytes() == acc_ref.to_bytes(), round_
        assert acc_ours.cardinality() == acc_ref.cardinality(), round_


def test_differential_serde_vs_reference(reference):
    RefHLL, RefNumberUtil = reference
    ours = HLL.create_for_testing(11, 5, 256, 850, HLLType.SPARSE)
    ref = RefHLL.create_for_testing(11, 5, 256, 850, 3)
    for v in (4096, -1, 2**62, 17):
        ours.add_raw(v)
        ref.add_raw(v)
    b_ours, b_ref = ours.to_bytes(), ref.to_bytes()
    assert b_ours == b_ref
    hex_ours = NumberUtil.to_hex(b_ours, 0, len(b_ours))
    hex_ref = RefNumberUtil.to_hex(b_ref, 0, len(b_ref))
    assert hex_ours == hex_ref
    assert NumberUtil.from_hex(hex_ours, 0, len(hex_ours)) == b_ours
    # cross-read: we parse their bytes, they parse ours
    assert HLL.from_bytes(b_ref).cardinality() == ref.cardinality()
    assert RefHLL.from_bytes(b_ours).cardinality() == ours.cardinality()


def test_hllutil_surface_matches_reference_values(reference):
    sys.path.insert(0, "/root/reference")
    from python_hll.hllutil import HLLUtil as RefUtil

    for m in (16, 32, 64, 2048):
        assert HLLUtil.alpha_m_squared(m) == RefUtil.alpha_m_squared(m)
        assert HLLUtil.small_estimator_cutoff(m) == RefUtil.small_estimator_cutoff(m)
    for rw in range(1, 9):
        assert HLLUtil.pw_max_mask(rw) == RefUtil.pw_max_mask(rw)
    for log2m, rw in ((11, 5), (14, 6), (4, 1)):
        assert HLLUtil.large_estimator_cutoff(log2m, rw) == RefUtil.large_estimator_cutoff(log2m, rw)
    assert HLLUtil.register_bit_size(10**6) == RefUtil.register_bit_size(10**6)


@pytest.mark.parametrize(
    "log2m,regwidth,expthresh,sparseon",
    [
        (4, 1, -1, True),
        (4, 8, -1, True),
        (5, 2, 0, True),
        (7, 3, 4, False),
        (10, 4, 1, True),
        (11, 5, 18, True),
        (12, 6, -1, False),
        (13, 7, 10, True),
        (16, 8, 0, False),
        (14, 1, -1, True),
    ],
)
def test_differential_parameter_sweep(reference, log2m, regwidth, expthresh, sparseon):
    """Random adds + a union at unusual parameter corners: byte-identical to
    the reference at every checkpoint."""
    RefHLL, _ = reference
    rng = random.Random(log2m * 100 + regwidth)
    ours = HLL(log2m, regwidth, expthresh, sparseon)
    ref = RefHLL(log2m, regwidth, expthresh, sparseon)
    for i in range(400):
        v = rng.randint(-(2**63), 2**63 - 1)
        ours.add_raw(v)
        ref.add_raw(v)
        if i in (0, 7, 63, 200, 399):
            assert ours.to_bytes() == ref.to_bytes(), (i, ours.get_type())
            assert ours.cardinality() == ref.cardinality(), i
    o2 = HLL(log2m, regwidth, expthresh, sparseon)
    r2 = RefHLL(log2m, regwidth, expthresh, sparseon)
    for _ in range(50):
        v = rng.randint(-(2**63), 2**63 - 1)
        o2.add_raw(v)
        r2.add_raw(v)
    ours.union(o2)
    ref.union(r2)
    assert ours.to_bytes() == ref.to_bytes()
    assert ours.cardinality() == ref.cardinality()
