"""KLL: mergeable quantile sketch with worst-case rank-error guarantees.

Karnin, Lang & Liberty 2016.  A hierarchy of compactors: level i holds items
of weight 2^i; when a level overflows its capacity (k * c^(levels-1-i),
c = 2/3) it sorts and promotes every other item to level i+1.  This is the
*deterministic* variant — the even/odd offset alternates with the level's
compaction count instead of a coin flip — so a retried Ray task reproduces
its partial sketch bit-for-bit (the determinism requirement of SURVEY.md
§7.4(4); the classic randomized variant has the same error bound in
expectation).

Batch adds are vectorized: a batch appends to level 0 in one concatenate and
each compaction is one sort + strided slice.
"""

from __future__ import annotations

import numpy as np

from rayhll.sketches.base import Sketch

_C = 2.0 / 3.0


class KLLSketch(Sketch):
    family_code = 4

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.compaction_counts: list[int] = [0]
        self.n = 0
        self.min = np.inf
        self.max = -np.inf

    def _capacity(self, level: int) -> int:
        height = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * _C**height)))

    def add_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_all()

    def _compact_all(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._capacity(i):
                self._compact_level(i)
            i += 1

    def _compact_level(self, i: int) -> None:
        buf = np.sort(self.levels[i], kind="stable")
        offset = self.compaction_counts[i] & 1  # deterministic alternation
        self.compaction_counts[i] += 1
        promoted = buf[offset::2]
        self.levels[i] = np.empty(0, dtype=np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compaction_counts.append(0)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    def merge(self, other: "KLLSketch") -> None:
        if self.k != other.k:
            raise ValueError("merge-incompatible KLL sketches")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compaction_counts.append(0)
        for i, buf in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compact_all()

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 2.0**i))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float | np.ndarray) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        it, w = self._weighted_items()
        if len(it) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w) - w / 2
        out = np.interp(qs * w.sum(), cum, it, left=self.min, right=self.max)
        return float(out[0]) if scalar else out

    def rank(self, x: float) -> float:
        """Approximate fraction of items <= x."""
        it, w = self._weighted_items()
        if len(it) == 0:
            return float("nan")
        return float(w[it <= x].sum() / w.sum())

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.k, self.n, len(self.levels)] + [len(b) for b in self.levels],
            dtype="<i8",
        ).tobytes()
        cc = np.array(self.compaction_counts, dtype="<i8").tobytes()
        body = b"".join(b.astype("<f8").tobytes() for b in self.levels)
        mm = np.array([self.min, self.max], dtype="<f8").tobytes()
        return self._frame(head + cc + mm + body)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        payload = cls._unframe(bytes(data))
        k, n, nlev = np.frombuffer(payload, dtype="<i8", count=3)
        nlev = int(nlev)
        sizes = np.frombuffer(payload, dtype="<i8", offset=24, count=nlev).astype(int)
        off = 24 + 8 * nlev
        cc = np.frombuffer(payload, dtype="<i8", offset=off, count=nlev).astype(int)
        off += 8 * nlev
        mn, mx = np.frombuffer(payload, dtype="<f8", offset=off, count=2)
        off += 16
        sk = cls(int(k))
        sk.n = int(n)
        sk.min, sk.max = float(mn), float(mx)
        sk.levels = []
        sk.compaction_counts = list(map(int, cc))
        for s in sizes:
            sk.levels.append(
                np.frombuffer(payload, dtype="<f8", offset=off, count=int(s)).astype(
                    np.float64
                )
            )
            off += 8 * int(s)
        return sk
