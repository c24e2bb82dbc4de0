"""Characteristic parameters of an HLL sketch and all derived constants.

Matches the reference constructor's parameter semantics and derived-constant
math exactly (reference: python_hll/hll.py:94-211), with two documented
deviations:

* ``log2m`` is validated strictly against 4..30 (the reference accidentally
  validates against 131072 due to a typo at python_hll/hll.py:129; its error
  message says 30).
* union compatibility (equal ``log2m``/``regwidth``) is enforced by the sketch
  (the reference leaves a ``TODO`` at python_hll/hll.py:499).

Settings are immutable, hashable, cheap to ship inside Ray task/actor
constructor args, and carry no numpy state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from rayhll.core import estimators as est


@dataclass(frozen=True)
class HllSettings:
    """Validated sketch parameters plus derived constants.

    :param log2m: log2 of the register count, 4..30
        (reference: python_hll/hll.py:41-42).
    :param regwidth: bits per register, 1..8
        (reference: python_hll/hll.py:45-46).
    :param expthresh: EXPLICIT promotion tuning, -1..18: -1 = auto
        (memory-optimal), 0 = skip EXPLICIT, n = promote at 2^(n-1)
        (reference: python_hll/hll.py:106-117,144-165).
    :param sparseon: whether the SPARSE representation is used
        (reference: python_hll/hll.py:119-121,167-174).
    """

    log2m: int
    regwidth: int
    expthresh: int = -1
    sparseon: bool = True

    # Derived (filled in __post_init__); not part of equality/hash.
    m: int = field(init=False, compare=False, default=0)
    m_bits_mask: int = field(init=False, compare=False, default=0)
    value_mask: int = field(init=False, compare=False, default=0)
    pw_max_mask: int = field(init=False, compare=False, default=0)
    pw_max_mask_u64: int = field(init=False, compare=False, default=0)
    alpha_m_squared: float = field(init=False, compare=False, default=0.0)
    small_estimator_cutoff: float = field(init=False, compare=False, default=0.0)
    large_estimator_cutoff: float = field(init=False, compare=False, default=0.0)
    explicit_auto: bool = field(init=False, compare=False, default=False)
    explicit_off: bool = field(init=False, compare=False, default=False)
    explicit_threshold: int = field(init=False, compare=False, default=0)
    short_word_length: int = field(init=False, compare=False, default=0)
    sparse_off: bool = field(init=False, compare=False, default=False)
    sparse_threshold: int = field(init=False, compare=False, default=0)
    max_register_value: int = field(init=False, compare=False, default=0)

    def __post_init__(self) -> None:
        log2m, regwidth, expthresh = self.log2m, self.regwidth, self.expthresh
        if not est.MIN_LOG2M <= log2m <= est.MAX_LOG2M:
            raise ValueError(
                f"'log2m' must be at least {est.MIN_LOG2M} and at most "
                f"{est.MAX_LOG2M} (was: {log2m})"
            )
        if not est.MIN_REGWIDTH <= regwidth <= est.MAX_REGWIDTH:
            raise ValueError(
                f"'regwidth' must be at least {est.MIN_REGWIDTH} and at most "
                f"{est.MAX_REGWIDTH} (was: {regwidth})"
            )

        s = object.__setattr__
        m = 1 << log2m
        s(self, "m", m)
        s(self, "m_bits_mask", m - 1)
        s(self, "value_mask", (1 << regwidth) - 1)
        s(self, "max_register_value", (1 << regwidth) - 1)
        s(self, "pw_max_mask", est.pw_max_mask(regwidth))
        s(self, "pw_max_mask_u64", est.pw_max_mask_u64(regwidth))
        s(self, "alpha_m_squared", est.alpha_m_squared(m))
        s(self, "small_estimator_cutoff", est.small_estimator_cutoff(m))
        s(self, "large_estimator_cutoff", est.large_estimator_cutoff(log2m, regwidth))

        # EXPLICIT promotion threshold (reference: python_hll/hll.py:144-165).
        if expthresh == -1:
            s(self, "explicit_auto", True)
            s(self, "explicit_off", False)
            # Matches the PostgreSQL size calculation: bytes of the FULL
            # representation, divided by 8 (longs), capped.
            full_representation_size = (regwidth * m + 7) // 8
            num_longs = full_representation_size // 8
            s(self, "explicit_threshold", min(num_longs, est.MAX_EXPLICIT_THRESHOLD))
        elif expthresh == 0:
            s(self, "explicit_auto", False)
            s(self, "explicit_off", True)
            s(self, "explicit_threshold", 0)
        elif 0 < expthresh <= est.MAX_EXPTHRESH:
            s(self, "explicit_auto", False)
            s(self, "explicit_off", False)
            s(self, "explicit_threshold", 1 << (expthresh - 1))
        else:
            raise ValueError(
                f"'expthresh' must be at least {est.MIN_EXPTHRESH} and at most "
                f"{est.MAX_EXPTHRESH} (was: {expthresh})"
            )

        # SPARSE promotion threshold (reference: python_hll/hll.py:167-174):
        # largest power of 2 <= m*regwidth/short_word_length.
        s(self, "short_word_length", regwidth + log2m)
        s(self, "sparse_off", not self.sparseon)
        if not self.sparseon:
            s(self, "sparse_threshold", 0)
        else:
            cutoff = (m * regwidth) / self.short_word_length
            largest_pow_2 = int(cutoff).bit_length() - 1
            s(self, "sparse_threshold", 1 << largest_pow_2)

    @classmethod
    def for_testing(
        cls, log2m: int, regwidth: int, explicit_threshold: int, sparse_threshold: int
    ) -> "HllSettings":
        """Override both promotion thresholds directly, as the conformance
        corpus requires (reference: python_hll/hll.py:178-211)."""
        if not 1 <= explicit_threshold <= est.MAX_EXPLICIT_THRESHOLD:
            raise ValueError(
                "'explicit_threshold' must be at least 1 and at most "
                f"{est.MAX_EXPLICIT_THRESHOLD} (was: {explicit_threshold})"
            )
        self = cls(log2m=log2m, regwidth=regwidth, expthresh=-1, sparseon=True)
        s = object.__setattr__
        s(self, "explicit_auto", False)
        s(self, "explicit_off", False)
        s(self, "explicit_threshold", explicit_threshold)
        s(self, "sparse_off", False)
        s(self, "sparse_threshold", sparse_threshold)
        return self

    def compatible_with(self, other: "HllSettings") -> bool:
        """Union compatibility: equal (log2m, regwidth)."""
        return self.log2m == other.log2m and self.regwidth == other.regwidth

    def log2_explicit_threshold(self) -> int:
        """floor(log2(explicit_threshold)) for the serialized cutoff byte
        (reference: python_hll/hll.py:750-753)."""
        if self.explicit_auto or self.explicit_off:
            return 0
        return self.explicit_threshold.bit_length() - 1


#: The postgresql-hll defaults used by the golden conformance corpus
#: (reference: tests/test_integration.py:17-20).
CONFORMANCE = HllSettings.for_testing(11, 5, 256, 850)

#: Default settings for engine pipelines: log2m=11, regwidth=5, auto expthresh.
DEFAULT = HllSettings(11, 5)
