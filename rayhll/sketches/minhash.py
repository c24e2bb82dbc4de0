"""MinHash: mergeable Jaccard-similarity signatures.

Broder 1997 k-permutation MinHash over pre-hashed shingle/token sets; the k
permutations are affine bijections of Z_2^64 (``h*a_i + b_i`` with odd
``a_i`` — true permutations, derived per slot from a SplitMix64-seeded
stream).  Per-set signature = column-wise min; merge = element-wise min
(set union); estimated Jaccard = fraction of agreeing signature slots.
Feeds the LSH banding dedup pipeline (rayhll.pipelines.dedup): band hashes
of the signature bucket near-duplicates for a groupby.

Performance note (r2, PERF_NOTES #12): the permutation streams are computed
one at a time fused with the segment-min (``np.minimum.reduceat``), so
temporaries stay cache-resident — the earlier (k, n) stream matrix was
memory-bandwidth-bound (1.6 GB of temporaries per 20k-doc batch).
"""

from __future__ import annotations

import numpy as np

from rayhll.functions.hashing import splitmix64
from rayhll.sketches.base import Sketch

_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def perm_params(num_perm: int, seed: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficients of the ``h*a + b`` affine permutations of Z_2^64
    (a forced odd => bijective)."""
    a = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64)) | np.uint64(1)
    b = splitmix64(np.arange(seed + 7919, seed + 7919 + num_perm, dtype=np.uint64))
    return a, b


def signature_matrix(hashes: np.ndarray, num_perm: int, seed: int = 5) -> np.ndarray:
    """MinHash signature of ONE set's flat (n,) uint64 element hashes."""
    h = np.ascontiguousarray(hashes).view(np.uint64)
    if len(h) == 0:
        return np.full(num_perm, _MAX, dtype=np.uint64)
    a, b = perm_params(num_perm, seed)
    out = np.empty(num_perm, dtype=np.uint64)
    for p in range(num_perm):
        out[p] = (h * a[p] + b[p]).min()
    return out


def signatures_for_offsets(
    flat_hashes: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int = 5
) -> np.ndarray:
    """Vectorized signatures for ragged sets.

    :param flat_hashes: uint64 element hashes of all sets, concatenated.
    :param offsets: int64 (n_sets+1,) prefix offsets into ``flat_hashes``.
    :returns: (n_sets, num_perm) uint64 signature matrix.
    """
    n_sets = len(offsets) - 1
    out = np.full((n_sets, num_perm), _MAX, dtype=np.uint64)
    if len(flat_hashes) == 0:
        return out
    h = flat_hashes.view(np.uint64)
    a, b = perm_params(num_perm, seed)
    # per-permutation minimum within each [offsets[i], offsets[i+1]) segment;
    # stream computed per permutation (cache-resident, see module docstring)
    starts = offsets[:-1]
    nonempty = (offsets[1:] - starts) > 0
    idx = starts[nonempty]
    for p in range(num_perm):
        out[nonempty, p] = np.minimum.reduceat(h * a[p] + b[p], idx)
    return out


def band_hashes(signatures: np.ndarray, num_bands: int, seed: int = 6) -> np.ndarray:
    """(n_sets, num_bands) int64 LSH bucket hashes; equal bucket hash in any
    band => candidate near-duplicate pair."""
    n, num_perm = signatures.shape
    if num_perm % num_bands:
        raise ValueError("num_perm must be divisible by num_bands")
    rows = num_perm // num_bands
    sig = signatures.reshape(n, num_bands, rows)
    acc = np.zeros((n, num_bands), dtype=np.uint64)
    for r in range(rows):
        acc = splitmix64(acc ^ sig[:, :, r])
    acc = splitmix64(acc ^ (np.arange(num_bands, dtype=np.uint64) + np.uint64(seed)))
    return acc.view(np.int64)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


class MinHash(Sketch):
    """A single set's mergeable MinHash accumulator."""

    family_code = 5

    def __init__(self, num_perm: int = 128, seed: int = 5):
        self.num_perm = num_perm
        self.seed = seed
        self.signature = np.full(num_perm, _MAX, dtype=np.uint64)

    def add_batch(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        sig = signature_matrix(
            np.ascontiguousarray(values, dtype=np.int64).view(np.uint64),
            self.num_perm,
            seed=self.seed,
        )
        np.minimum(self.signature, sig, out=self.signature)

    def merge(self, other: "MinHash") -> None:
        if (self.num_perm, self.seed) != (other.num_perm, other.seed):
            raise ValueError("merge-incompatible MinHash sketches")
        np.minimum(self.signature, other.signature, out=self.signature)

    def jaccard(self, other: "MinHash") -> float:
        return estimate_jaccard(self.signature, other.signature)

    def to_bytes(self) -> bytes:
        head = np.array([self.num_perm, self.seed], dtype="<i8").tobytes()
        return self._frame(head + self.signature.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "MinHash":
        payload = cls._unframe(bytes(data))
        num_perm, seed = np.frombuffer(payload, dtype="<i8", count=2)
        mh = cls(int(num_perm), int(seed))
        mh.signature = np.frombuffer(payload, dtype="<u8", offset=16).astype(np.uint64)
        return mh
