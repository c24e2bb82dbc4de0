"""Theta (KMV) sketch: mergeable distinct counting WITH real set operations.

The k-minimum-values formulation (Bar-Yossef et al. 2002; Dasgupta et al.
2016 "Theta-Sketch Framework"): keep the k smallest 64-bit hash values;
theta = the k-th smallest (as a fraction of the hash space); the retained
values form a uniform sample of the distinct items, so

* |A| ≈ (k - 1) / theta  (unbiased KMV estimator);
* set operations compose SAMPLE-wise: intersection/difference keep the
  retained values below min(theta_a, theta_b), giving direct estimates whose
  error does not compound the way HLL inclusion-exclusion does
  (rayhll.functions.setops documents that caveat — this sketch is the
  engine's answer to it).

Vectorized: batch adds are one concatenate + partition; merge likewise.
Deterministic given the value stream (no RNG), so retry/resume-safe like
every other family.
"""

from __future__ import annotations

import numpy as np

from rayhll.sketches.base import Sketch

_SPACE = 2.0**64  # hash space size, values treated as uint64


class ThetaSketch(Sketch):
    family_code = 6

    def __init__(self, k: int = 4096):
        self.k = int(k)
        # retained distinct hash values, sorted ascending, len <= k
        self.values = np.empty(0, dtype=np.uint64)

    # ------------------------------------------------------------------

    @property
    def theta(self) -> float:
        """Sampling threshold in (0, 1]: 1 until k values are retained,
        then the k-th smallest value / 2^64."""
        if len(self.values) < self.k:
            return 1.0
        return float(self.values[-1]) / _SPACE

    def add_batch(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
        merged = np.union1d(self.values, v)  # sorted distinct
        self.values = merged[: self.k]

    def merge(self, other: "ThetaSketch") -> None:
        if self.k != other.k:
            raise ValueError("merge-incompatible theta sketches")
        merged = np.union1d(self.values, other.values)
        self.values = merged[: self.k]

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)  # exact below capacity
        return (self.k - 1) / self.theta

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    # ------------------------------------------------------------------
    # set operations (sample-wise, Theta-Sketch Framework)

    def _cut(self) -> int | None:
        """Exact uint64 sampling threshold (k-th smallest), None below capacity."""
        return int(self.values[-1]) if len(self.values) >= self.k else None

    def _common_theta(self, other: "ThetaSketch") -> tuple[float, np.ndarray, np.ndarray]:
        cuts = [c for c in (self._cut(), other._cut()) if c is not None]
        if not cuts:
            return 1.0, self.values, other.values
        cut = np.uint64(min(cuts))
        return float(cut) / _SPACE, self.values[self.values < cut], other.values[
            other.values < cut
        ]

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_theta(other)
        return len(np.intersect1d(a, b)) / theta

    def union_estimate(self, other: "ThetaSketch") -> float:
        # below the common theta BOTH samples are complete, so the union
        # sample is complete too: count / theta is unbiased (no k-truncation)
        theta, a, b = self._common_theta(other)
        return len(np.union1d(a, b)) / theta

    def difference_estimate(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_theta(other)
        return len(np.setdiff1d(a, b)) / theta

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_theta(other)
        inter = len(np.intersect1d(a, b))
        union = len(np.union1d(a, b))
        return inter / union if union else 0.0

    # ------------------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = np.array([self.k, len(self.values)], dtype="<i8").tobytes()
        return self._frame(head + self.values.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        payload = cls._unframe(bytes(data))
        k, n = np.frombuffer(payload, dtype="<i8", count=2)
        sk = cls(int(k))
        sk.values = np.frombuffer(payload, dtype="<u8", offset=16, count=int(n)).astype(
            np.uint64
        )
        return sk
