"""Bloom filter: approximate set membership as a mergeable sketch.

Standard k-hash Bloom filter (Bloom 1970) over pre-hashed int64 values; the
k probe positions are multiplicative (multiply-shift) hashes of the base
value — ``(h * a_i + b_i) >> (64 - log2(num_bits))`` with seeded odd
``a_i`` — computed one stream at a time so temporaries stay cache-resident
(a (k, n) SplitMix64 stream matrix was memory-bandwidth-bound at filter
scale, PERF_NOTES #15).  Merge is bitwise OR, so it composes as a Ray Data
UDAF exactly like the HLL (partial per block, OR in the merge tree).

Primary engine use: broadcast semi-/anti-join prefilter — build the filter
over the small side's keys, ``ray.put`` the serialized blob once, and probe
inside ``map_batches`` on the big side (no shuffle).
"""

from __future__ import annotations

import numpy as np

from rayhll.functions.hashing import splitmix64
from rayhll.sketches.base import Sketch


def optimal_params(expected_n: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate."""
    n = max(1, expected_n)
    num_bits = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
    num_bits = max(64, 1 << int(np.ceil(np.log2(num_bits))))  # power of two
    num_hashes = max(1, int(round(num_bits / n * np.log(2))))
    return num_bits, min(num_hashes, 16)


class BloomFilter(Sketch):
    family_code = 1

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 7, seed: int = 77):
        if num_bits & (num_bits - 1):
            raise ValueError("num_bits must be a power of two")
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.seed = seed
        self.bits = np.zeros(num_bits // 64, dtype=np.uint64)
        self._shift = np.uint64(64 - int(np.log2(num_bits)))
        self._a = splitmix64(
            np.arange(seed, seed + num_hashes, dtype=np.uint64)
        ) | np.uint64(1)
        self._b = splitmix64(
            np.arange(seed + 7919, seed + 7919 + num_hashes, dtype=np.uint64)
        )

    @classmethod
    def for_capacity(cls, expected_n: int, fp_rate: float = 0.01) -> "BloomFilter":
        bits, hashes = optimal_params(expected_n, fp_rate)
        return cls(bits, hashes)

    def _position_streams(self, values: np.ndarray):
        """Yield per-hash bit-position arrays (cache-resident temporaries)."""
        h = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
        for i in range(self.num_hashes):
            yield (h * self._a[i] + self._b[i]) >> self._shift

    def add_batch(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        dense_add = len(values) * self.num_hashes >= (self.num_bits >> 4)
        if dense_add:
            # filter-sized batch: boolean scatter (duplicate-safe fancy
            # assignment) + one packbits — far cheaper than a scatter-OR
            # (PERF_NOTES #15); layout matches the uint64 words
            # (bit k of word w == dense[w*64 + k], little-endian)
            dense = np.zeros(self.num_bits, dtype=bool)
            for pos in self._position_streams(values):
                dense[pos.astype(np.int64)] = True
            self.bits |= np.packbits(dense, bitorder="little").view(np.uint64)
            return
        for pos in self._position_streams(values):
            np.bitwise_or.at(
                self.bits,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains_batch(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership probe; True may be a false positive."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        hit = np.ones(len(values), dtype=bool)
        for pos in self._position_streams(values):
            words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= ((words >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
        return hit

    def merge(self, other: "BloomFilter") -> None:
        if (self.num_bits, self.num_hashes, self.seed) != (
            other.num_bits,
            other.num_hashes,
            other.seed,
        ):
            raise ValueError("merge-incompatible Bloom filters")
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())

    def to_bytes(self) -> bytes:
        head = np.array([self.num_bits, self.num_hashes, self.seed], dtype="<i8").tobytes()
        return self._frame(head + self.bits.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        payload = cls._unframe(bytes(data))
        num_bits, num_hashes, seed = np.frombuffer(payload, dtype="<i8", count=3)
        bf = cls(int(num_bits), int(num_hashes), int(seed))
        bf.bits = np.frombuffer(payload, dtype="<u8", offset=24).astype(np.uint64)
        return bf
