"""Deterministic row hashing for sketch keys and the per-row invariant.

The reference's contract is "bring your own strong hash": ``add_raw`` takes a
caller-hashed signed 64-bit value (reference: python_hll/hll.py:226-230,
README.rst:38-46; mmh3 is suggested but unavailable offline and the golden
vectors feed ``add_raw`` directly, so hash choice does not affect conformance).

Two hash families:

* :func:`sha256_hex` / :func:`sha256_raw64` — the BASELINE per-row invariant
  (``sha256(content)`` equality vs the reference) and the raw value used for
  content sketches: first 8 digest bytes, big-endian, as signed int64.
  hashlib releases the GIL per call; this is the one per-row C loop in the
  engine and it is only used where the invariant demands sha256.
* :func:`hash64_table` — the fast path for every other key: polars' vectorized
  64-bit xxhash over one column or a struct of columns (~60M rows/s/core),
  deterministic for a fixed seed.
* :func:`splitmix64` — numpy-vectorized integer mixer (Steele et al. 2014,
  public domain constants) for derived hash streams (MinHash permutations,
  count-min rows, Bloom probes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa

DEFAULT_SEED = 0x9E3779B9


def sha256_hex(values: pa.Array | pa.ChunkedArray | list[str]) -> list[str]:
    """Hex sha256 digest per row (the BASELINE.json per-row invariant)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out.append(hashlib.sha256(v).hexdigest())
    return out


def sha256_raw64(values: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Signed int64 raw values for HLL adds: first 8 bytes of sha256(value),
    big-endian.  Nulls hash as the empty string."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            v = b""
        elif isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        out[i] = int.from_bytes(hashlib.sha256(v).digest()[:8], "big")
    return out.view(np.int64)


def hash64_table(
    table: pa.Table | pa.RecordBatch, cols: list[str], seed: int = DEFAULT_SEED
) -> np.ndarray:
    """Vectorized signed-int64 hash of one or more columns of an Arrow batch.

    Multi-column keys hash the column struct, so ``("repo", "commit")`` is a
    composite key with no separator-collision hazard.
    """
    if isinstance(table, pa.RecordBatch):
        table = pa.Table.from_batches([table])
    df = pl.from_arrow(table.select(cols))
    if len(cols) == 1:
        h = df.select(pl.col(cols[0]).hash(seed=seed).alias("h"))["h"]
    else:
        h = df.select(pl.struct(cols).hash(seed=seed).alias("h"))["h"]
    return h.to_numpy().view(np.int64)


_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (vectorized)."""
    z = x.astype(np.uint64, copy=True)
    z += _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def derive_streams(h: np.ndarray, k: int, seed: int = 1) -> np.ndarray:
    """k independent uint64 hash streams from one base hash array, shape
    (k, len(h)): stream_i = splitmix64(h + mix(seed + i))."""
    base = h.astype(np.uint64, copy=False)
    seeds = splitmix64(np.arange(seed, seed + k, dtype=np.uint64))
    return splitmix64(base[None, :] ^ seeds[:, None])
