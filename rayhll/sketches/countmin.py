"""Count-min sketch: approximate frequencies as a mergeable sketch.

Cormode & Muthukrishnan 2005.  ``depth`` independent hash rows of ``width``
counters; point estimate is the min over rows (always an overestimate).
Merge is element-wise addition, so grouped/global aggregation composes the
same way as the HLL UDAF.  Batch adds are one ``np.bincount`` per row —
no per-value Python; the per-row column streams are multiply-shift hashes
computed one row at a time (cache-resident, same pattern as minhash/bloom —
PERF_NOTES #12/#15).
"""

from __future__ import annotations

import numpy as np

from rayhll.functions.hashing import splitmix64
from rayhll.sketches.base import Sketch


class CountMinSketch(Sketch):
    family_code = 2

    def __init__(self, depth: int = 5, width: int = 1 << 14, seed: int = 99):
        if width & (width - 1):
            raise ValueError("width must be a power of two")
        self.depth = depth
        self.width = width
        self.seed = seed
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0
        self._shift = np.uint64(64 - int(np.log2(width)))
        self._a = splitmix64(np.arange(seed, seed + depth, dtype=np.uint64)) | np.uint64(1)
        self._b = splitmix64(np.arange(seed + 7919, seed + 7919 + depth, dtype=np.uint64))

    def _col_streams(self, values: np.ndarray):
        """Yield per-row column-index arrays (multiply-shift hashing)."""
        h = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
        for d in range(self.depth):
            yield ((h * self._a[d] + self._b[d]) >> self._shift).astype(np.int64)

    def add_batch(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        weights = None if counts is None else np.asarray(counts, dtype=np.int64)
        for d, cols in enumerate(self._col_streams(values)):
            self.table[d] += np.bincount(
                cols, weights=weights, minlength=self.width
            ).astype(np.int64)
        self.total += int(len(values) if weights is None else weights.sum())

    def estimate_batch(self, values: np.ndarray) -> np.ndarray:
        """Estimated count per value (vectorized min over rows)."""
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
        for d, cols in enumerate(self._col_streams(values)):
            np.minimum(est, self.table[d][cols], out=est)
        return est

    def estimate(self, value: int) -> int:
        return int(self.estimate_batch(np.array([value], dtype=np.int64))[0])

    def merge(self, other: "CountMinSketch") -> None:
        if (self.depth, self.width, self.seed) != (other.depth, other.width, other.seed):
            raise ValueError("merge-incompatible count-min sketches")
        self.table += other.table
        self.total += other.total

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.depth, self.width, self.seed, self.total], dtype="<i8"
        ).tobytes()
        return self._frame(head + self.table.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        payload = cls._unframe(bytes(data))
        depth, width, seed, total = np.frombuffer(payload, dtype="<i8", count=4)
        cm = cls(int(depth), int(width), int(seed))
        cm.total = int(total)
        cm.table = (
            np.frombuffer(payload, dtype="<i8", offset=32)
            .astype(np.int64)
            .reshape(int(depth), int(width))
        )
        return cm
