"""HyperLogLog estimator constants and correction formulas.

Closed-form math from Flajolet et al. 2007 with the 64-bit-hash large-range
adaptation, matching the reference's constants exactly
(reference: python_hll/hllutil.py:26-184).  Pure functions, numpy-friendly,
no Ray imports.
"""

from __future__ import annotations

from math import log

MIN_LOG2M = 4
MAX_LOG2M = 30
MIN_REGWIDTH = 1
MAX_REGWIDTH = 8
MIN_EXPTHRESH = -1
MAX_EXPTHRESH = 18
# per storage spec: 2^(MAX_EXPTHRESH - 1)
MAX_EXPLICIT_THRESHOLD = 1 << (MAX_EXPTHRESH - 1)

LONG_BIT_LENGTH = 64

# Precomputed overflow masks indexed by regwidth, as signed 64-bit values
# (reference: python_hll/hllutil.py:26-36).  Formula (with Java 64-bit shift
# semantics): ~((1 << (((1 << regwidth) - 1) - 1)) - 1).
PW_MASK = (
    -9223372036854775808,
    -1,
    -4,
    -64,
    -16384,
    -1073741824,
    -4611686018427387904,
    -4611686018427387904,
    -4611686018427387904,
)


def pw_max_mask(regwidth: int) -> int:
    """Signed-64 mask that clamps p(w) to the max register value
    (reference: python_hll/hllutil.py:84-93)."""
    return PW_MASK[regwidth]


def pw_max_mask_u64(regwidth: int) -> int:
    """Unsigned view of :func:`pw_max_mask` for numpy uint64 kernels."""
    return PW_MASK[regwidth] & 0xFFFFFFFFFFFFFFFF


def alpha_m_squared(m: int) -> float:
    """alpha * m^2 constant of the raw estimator
    (reference: python_hll/hllutil.py:57-82)."""
    if m < 16:
        raise ValueError(f"'m' cannot be less than 16 ({m} < 16).")
    if m == 16:
        return 0.673 * m * m
    if m == 32:
        return 0.697 * m * m
    if m == 64:
        return 0.709 * m * m
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def small_estimator_cutoff(m: int) -> float:
    """5m/2 cutoff for the small-range correction
    (reference: python_hll/hllutil.py:95-105)."""
    return (float(m) * 5) / 2


def small_estimator(m: int, number_of_zeroes: int) -> float:
    """m * ln(m/V) small-range correction
    (reference: python_hll/hllutil.py:107-120)."""
    return m * log(float(m) / number_of_zeroes)


def two_to_l(log2m: int, regwidth: int) -> int:
    """2^L with L = log2m + 2^regwidth - 2, as an exact Python int
    (reference: python_hll/hllutil.py:161-184)."""
    max_register_value = (1 << regwidth) - 1
    pw_bits = max_register_value - 1
    return 2 ** (pw_bits + log2m)


def large_estimator_cutoff(log2m: int, regwidth: int) -> float:
    """2^L / 30 cutoff for the large-range correction
    (reference: python_hll/hllutil.py:122-137)."""
    return two_to_l(log2m, regwidth) / 30.0


def large_estimator(log2m: int, regwidth: int, estimator: float) -> float:
    """-2^L * ln(1 - E/2^L), saturating to 0 when E >= 2^L exactly as the
    reference does via its caught ValueError
    (reference: python_hll/hllutil.py:139-158)."""
    ttl = two_to_l(log2m, regwidth)
    try:
        return -1 * ttl * log(1.0 - (estimator / ttl))
    except ValueError:
        return 0


def corrected_estimate(
    indicator: float,
    number_of_zeroes: int,
    m: int,
    log2m: int,
    regwidth: int,
    alpha_m_sq: float,
    small_cutoff: float,
    large_cutoff: float,
) -> float:
    """Three-branch corrected estimator applied to the indicator sum
    (reference: python_hll/hll.py:430-437, 459-466)."""
    estimator = alpha_m_sq / indicator
    if number_of_zeroes != 0 and estimator < small_cutoff:
        return small_estimator(m, number_of_zeroes)
    if estimator <= large_cutoff:
        return estimator
    return large_estimator(log2m, regwidth, estimator)
