"""t-digest: mergeable quantile sketch (Dunning & Ertl 2019).

Merging-digest variant with the k1 scale function, using the vectorized
"integer-k clustering" compression: sorted (mean, weight) pairs are assigned
cluster ids ``floor(k1(q))`` and combined by weighted mean with one
``reduceat`` — no per-centroid Python loop.  Accuracy concentrates at the
tails like any k1 digest; merge = concat + recompress (associative up to the
digest's own approximation guarantees, which is the published behavior of
t-digest — unlike the HLL, merged results are approximation-equal, not
byte-equal, under reordering).
"""

from __future__ import annotations

import numpy as np

from rayhll.sketches.base import Sketch


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


class TDigest(Sketch):
    family_code = 3

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def add_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        self._compress()

    def _compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m = self.means[order]
        w = self.weights[order]
        total = w.sum()
        # mid-point quantile of each centroid
        cum = np.cumsum(w)
        q = (cum - w / 2) / total
        k = np.floor(_k1(q, self.compression)).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        new_w = np.add.reduceat(w, starts)
        new_m = np.add.reduceat(m * w, starts) / new_w
        self.means = new_m
        self.weights = new_w

    def merge(self, other: "TDigest") -> None:
        if self.compression != other.compression:
            raise ValueError("merge-incompatible t-digests")
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()

    def quantile(self, q: float | np.ndarray) -> np.ndarray | float:
        """Interpolated quantile estimate(s)."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        order = np.argsort(self.means, kind="stable")
        m = self.means[order]
        w = self.weights[order]
        cum = np.cumsum(w) - w / 2
        total = w.sum()
        targets = qs * total
        out = np.interp(targets, cum, m, left=self.min, right=self.max)
        return float(out[0]) if scalar else out

    def cdf(self, x: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        order = np.argsort(self.means, kind="stable")
        m = self.means[order]
        w = self.weights[order]
        cum = np.cumsum(w) - w / 2
        return float(np.interp(x, m, cum / w.sum(), left=0.0, right=1.0))

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.compression, self.min, self.max, float(len(self.means))],
            dtype="<f8",
        ).tobytes()
        body = self.means.astype("<f8").tobytes() + self.weights.astype("<f8").tobytes()
        return self._frame(head + body)

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        payload = cls._unframe(bytes(data))
        compression, mn, mx, n = np.frombuffer(payload, dtype="<f8", count=4)
        n = int(n)
        td = cls(float(compression))
        td.min, td.max = float(mn), float(mx)
        td.means = np.frombuffer(payload, dtype="<f8", offset=32, count=n).astype(np.float64)
        td.weights = np.frombuffer(
            payload, dtype="<f8", offset=32 + 8 * n, count=n
        ).astype(np.float64)
        return td
