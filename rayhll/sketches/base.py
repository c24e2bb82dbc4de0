"""Sketch-family plugin interface.

The reference's user-extension surface is its ``SchemaVersion`` registry and
the bring-your-own-hash ``add_raw`` contract (reference:
python_hll/serialization.py:563-578, hll.py:226-230).  The engine generalizes
that into a family interface (SURVEY.md §2.5 "User-extension surface"):
every sketch family is {empty, add_batch, merge, finalize, to_bytes,
from_bytes} over pre-hashed numpy arrays, which is exactly the shape Ray
Data needs for a mergeable UDAF — partial per block, associative merge in
the shuffle, finalize at the end.

Serialized family blobs carry a 5-byte prefix (``RHS`` + family code +
format version) so a mixed sink can be re-read family-by-family and a blob
written by a different format revision of the same family fails LOUDLY at
deserialization instead of merging silently-wrong (the r2 hash-stream rework
changed MinHash/Bloom/count-min contents for the same seed — the version
byte is the guard against exactly that class of corruption).  The HLL core
keeps its own storage-spec v1.0.0 bytes unprefixed for postgres/java
interop.
"""

from __future__ import annotations

import abc

import numpy as np

MAGIC = b"RHS"


class Sketch(abc.ABC):
    """A mergeable sketch accumulator over pre-hashed values."""

    #: one-byte family code used in the serialized header
    family_code: int = 0
    #: one-byte per-family format version; bump whenever the family's hash
    #: stream, permutation scheme, or payload layout changes (cross-version
    #: merge = silent corruption; the frame check turns it into an error)
    format_version: int = 2

    @abc.abstractmethod
    def add_batch(self, values: np.ndarray) -> None:
        """Fold a batch of values (dtype family-specific) into the sketch."""

    @abc.abstractmethod
    def merge(self, other: "Sketch") -> None:
        """Associative, commutative in-place union."""

    @abc.abstractmethod
    def to_bytes(self) -> bytes:
        ...

    @classmethod
    @abc.abstractmethod
    def from_bytes(cls, data: bytes) -> "Sketch":
        ...

    def _frame(self, payload: bytes) -> bytes:
        return MAGIC + bytes([self.family_code, self.format_version]) + payload

    @classmethod
    def _unframe(cls, data: bytes) -> bytes:
        if data[:3] != MAGIC or data[3] != cls.family_code:
            raise ValueError(
                f"not a {cls.__name__} blob (magic={data[:4]!r})"
            )
        if data[4] != cls.format_version:
            raise ValueError(
                f"{cls.__name__} blob is format v{data[4]}; this build reads "
                f"v{cls.format_version} — re-serialize with a matching version "
                "(cross-version merges would corrupt estimates silently)"
            )
        return data[5:]
