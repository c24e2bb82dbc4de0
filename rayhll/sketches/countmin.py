"""Count-min sketch: approximate frequencies as a mergeable sketch.

Cormode & Muthukrishnan 2005.  ``depth`` independent hash rows of ``width``
counters; point estimate is the min over rows (always an overestimate).
Merge is element-wise addition, so grouped/global aggregation composes the
same way as the HLL UDAF.  Batch adds are one ``np.bincount`` per row —
no per-value Python.
"""

from __future__ import annotations

import numpy as np

from rayhll.functions.hashing import derive_streams
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

    def _cols(self, values: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
        return (derive_streams(h, self.depth, seed=self.seed) & np.uint64(self.width - 1)).astype(
            np.int64
        )

    def add_batch(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        cols = self._cols(values)
        weights = None if counts is None else np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            self.table[d] += np.bincount(
                cols[d], weights=weights, minlength=self.width
            ).astype(np.int64)
        self.total += int(len(values) if weights is None else weights.sum())

    def estimate_batch(self, values: np.ndarray) -> np.ndarray:
        """Estimated count per value (vectorized min over rows)."""
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(values)
        ests = self.table[np.arange(self.depth)[:, None], cols]
        return ests.min(axis=0)

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
