"""Drop-in compatibility layer for AdRoll/python-hll users.

A reference user's code looks like (reference: README.rst:38-60)::

    from python_hll.hll import HLL
    hll = HLL(13, 5)
    hll.add_raw(mmh3.hash('foo'))
    hll.cardinality()
    hll1.union(hll2)
    b = hll.to_bytes()            # Java-style signed-byte list
    HLL.from_bytes(b)

This module provides the same surface on top of the vectorized core, so that
code runs after ``from rayhll.compat import HLL`` (or module-alias
``python_hll``-style imports of ``rayhll.compat``):

* ``HLL`` — same constructor signature/defaults, ``create_for_testing``,
  ``add_raw``/``union``/``cardinality``/``clear``/``get_type``;
* byte convention preserved: ``to_bytes()`` returns a **list of Java-style
  signed bytes** (-128..127), and ``from_bytes`` accepts that list (or real
  ``bytes``), matching the reference's representation (README.rst:21-22);
* ``HLLType`` ordinals and ``NumberUtil.to_hex``/``from_hex`` hex-codec
  semantics (reference: python_hll/util.py:400-474).
"""

from __future__ import annotations

from rayhll.core import serde
from rayhll.core.hlltype import HllType as HLLType  # same ordinals
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch


def _to_signed_list(data: bytes) -> list[int]:
    return [b - 256 if b >= 128 else b for b in data]


def _to_raw_bytes(data) -> bytes:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return bytes(data)
    return bytes((b + 256 if b < 0 else b) for b in data)


class HLL:
    """Reference-compatible facade over :class:`rayhll.core.sketch.HllSketch`."""

    MINIMUM_LOG2M_PARAM = 4
    MAXIMUM_LOG2M_PARAM = 30
    MINIMUM_REGWIDTH_PARAM = 1
    MAXIMUM_REGWIDTH_PARAM = 8
    MINIMUM_EXPTHRESH_PARAM = -1
    MAXIMUM_EXPTHRESH_PARAM = 18
    MAXIMUM_EXPLICIT_THRESHOLD = 1 << (MAXIMUM_EXPTHRESH_PARAM - 1)

    def __init__(self, log2m, regwidth, expthresh=-1, sparseon=True, type=HLLType.EMPTY):
        self._sketch = HllSketch(HllSettings(log2m, regwidth, expthresh, sparseon), type)

    @classmethod
    def _wrap(cls, sketch: HllSketch) -> "HLL":
        out = cls.__new__(cls)
        out._sketch = sketch
        return out

    @classmethod
    def create_for_testing(cls, log2m, regwidth, explicit_threshold, sparse_threshold, type):
        return cls._wrap(
            HllSketch.for_testing(log2m, regwidth, explicit_threshold, sparse_threshold, type)
        )

    def get_type(self) -> HLLType:
        return self._sketch.get_type()

    def add_raw(self, raw_value: int) -> None:
        self._sketch.add_raw(raw_value)

    def union(self, other: "HLL") -> None:
        self._sketch.union(other._sketch)

    def cardinality(self) -> int:
        return self._sketch.cardinality()

    def clear(self) -> None:
        self._sketch.clear()

    def to_bytes(self, schema_version=None) -> list[int]:
        if schema_version is not None and schema_version != 1:
            raise ValueError("only storage-spec schema version 1 is supported")
        return _to_signed_list(self._sketch.to_bytes())

    @classmethod
    def from_bytes(cls, bytes) -> "HLL":  # noqa: A002 - reference signature
        return cls._wrap(HllSketch.from_bytes(_to_raw_bytes(bytes)))


class NumberUtil:
    """Hex codec with the reference's signature shapes
    (reference: python_hll/util.py:375-518)."""

    @classmethod
    def to_hex(cls, byte_list, offset: int, count: int) -> str:
        data = _to_raw_bytes(byte_list)
        return serde.to_hex(data[offset : offset + count])

    @classmethod
    def from_hex(cls, string: str, offset: int, count: int) -> list[int]:
        chunk = string[offset : offset + count]
        return _to_signed_list(serde.from_hex(chunk))


class HLLUtil:
    """Constants/formulas surface (reference: python_hll/hllutil.py)."""

    LONG_BIT_LENGTH = 64

    from rayhll.core.estimators import (  # noqa: F401 - re-exported surface
        alpha_m_squared,
        large_estimator,
        large_estimator_cutoff,
        pw_max_mask,
        small_estimator,
        small_estimator_cutoff,
    )

    @classmethod
    def register_bit_size(cls, expected_unique_elements: int):
        """max(1, log2(log2(n))) register sizing helper — returns the
        unrounded float exactly like the reference
        (reference: python_hll/hllutil.py:41-55, util.py:386-397)."""
        import math

        log2 = lambda v: math.log(v) / 0.6931471805599453  # noqa: E731
        return max(HLL.MINIMUM_REGWIDTH_PARAM, log2(log2(expected_unique_elements)))
