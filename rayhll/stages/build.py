"""map_batches stages that build and merge partial HLL sketches.

The engine's shape (SURVEY.md §2.5, §7.3): the sketch *is* the aggregate, so
the wide operation is tiny by construction —

* ``BuildPartials`` (this module) runs inside ``ds.map_batches(...,
  batch_format="pyarrow", zero_copy_batch=True)`` and collapses each input
  batch to at most one fixed-size serialized sketch row per group seen in the
  batch.  Per-batch work is vectorized: one hash pass, one register-update
  pass (``np.maximum.at``), one serialization.
* the subsequent ``groupby(group_cols)`` therefore shuffles only
  O(#blocks × #groups-per-block) sketch rows of ~1.3 KiB each (at log2m=11,
  regwidth=5), never the input rows — the partial/combiner split the
  instructions require.
* ``merge_sketch_rows`` / ``merge_group`` revive shuffled sketches with
  ``from_bytes``, fold them with the associative ``union``
  (reference semantics: python_hll/hll.py:491-691), and emit bytes again.

Every stage output is a pure function of (block contents, settings), so Ray
task retries are idempotent — a retried block reproduces the identical
partial sketch (register max is order-independent and duplicate-insensitive).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayhll.core.serde import from_bytes
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch
from rayhll.functions import hashing

SKETCH_COL = "sketch"
ROWS_COL = "rows_in"
ESTIMATE_COL = "estimate"
GROUP_HASH_SEED = 0x5EED_6800


class BuildPartials:
    """Actor-pool callable: input Arrow batch -> one partial-sketch row per
    group present in the batch (a single global row when ``group_cols`` is
    empty).

    Stateful setup (settings validation, derived constants) happens once per
    actor in ``__init__``; ``__call__`` does only vectorized per-batch work.
    """

    def __init__(
        self,
        key_cols: list[str] | tuple[str, ...],
        group_cols: list[str] | tuple[str, ...] = (),
        settings: HllSettings | None = None,
        hash_method: str = "fast",
        seed: int = hashing.DEFAULT_SEED,
    ):
        self.settings = settings or HllSettings(11, 5)
        self.key_cols = list(key_cols)
        self.group_cols = list(group_cols)
        if hash_method not in ("fast", "sha256"):
            raise ValueError(f"unknown hash_method {hash_method!r}")
        if hash_method == "sha256" and len(self.key_cols) != 1:
            raise ValueError("sha256 hashing supports exactly one key column")
        self.hash_method = hash_method
        self.seed = seed

    def _raw64(self, batch: pa.Table) -> np.ndarray:
        if self.hash_method == "sha256":
            return hashing.sha256_raw64(batch.column(self.key_cols[0]))
        return hashing.hash64_table(batch, self.key_cols, seed=self.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = self._raw64(batch)
        if not self.group_cols:
            sk = HllSketch(self.settings)
            sk.add_batch(raw)
            return pa.table(
                {
                    SKETCH_COL: pa.array([sk.to_bytes()], type=pa.binary()),
                    ROWS_COL: pa.array([len(batch)], type=pa.int64()),
                }
            )
        # Vectorized within-batch grouping: one composite hash of the group
        # columns -> integer codes; python loops only over distinct groups.
        ghash = hashing.hash64_table(batch, self.group_cols, seed=GROUP_HASH_SEED)
        uniq, first_idx, codes = np.unique(ghash, return_index=True, return_inverse=True)
        order = np.argsort(codes, kind="stable")
        boundaries = np.searchsorted(codes[order], np.arange(len(uniq)))
        sketches = []
        counts = []
        raw_sorted = raw[order]
        for g in range(len(uniq)):
            lo = boundaries[g]
            hi = boundaries[g + 1] if g + 1 < len(uniq) else len(raw_sorted)
            sk = HllSketch(self.settings)
            sk.add_batch(raw_sorted[lo:hi])
            sketches.append(sk.to_bytes())
            counts.append(hi - lo)
        out = batch.select(self.group_cols).take(pa.array(first_idx))
        out = out.append_column(SKETCH_COL, pa.array(sketches, type=pa.binary()))
        out = out.append_column(ROWS_COL, pa.array(counts, type=pa.int64()))
        return out


def merge_sketch_rows(batch: pa.Table) -> pa.Table:
    """Fold every sketch row of a batch into one row (the tree-merge step).
    Settings travel inside the serialized header, so this stage needs none."""
    col = batch.column(SKETCH_COL)
    acc: HllSketch | None = None
    for blob in col:
        sk = from_bytes(blob.as_py())
        if acc is None:
            acc = sk
        else:
            acc.union(sk)
    rows_in = 0
    if ROWS_COL in batch.column_names:
        rows_in = int(pa.compute.sum(batch.column(ROWS_COL)).as_py() or 0)
    return pa.table(
        {
            SKETCH_COL: pa.array([acc.to_bytes() if acc else b""], type=pa.binary()),
            ROWS_COL: pa.array([rows_in], type=pa.int64()),
        }
    )


def merge_group(group: pa.Table, group_cols: list[str]) -> pa.Table:
    """map_groups body: merge one group's partial sketches, emit one row with
    the group key, the merged sketch bytes, and the integer estimate."""
    acc: HllSketch | None = None
    for blob in group.column(SKETCH_COL):
        sk = from_bytes(blob.as_py())
        if acc is None:
            acc = sk
        else:
            acc.union(sk)
    out = group.select(group_cols).slice(0, 1)
    out = out.append_column(SKETCH_COL, pa.array([acc.to_bytes()], type=pa.binary()))
    out = out.append_column(
        ESTIMATE_COL, pa.array([acc.cardinality()], type=pa.int64())
    )
    if ROWS_COL in group.column_names:
        total = int(pa.compute.sum(group.column(ROWS_COL)).as_py() or 0)
        out = out.append_column(ROWS_COL, pa.array([total], type=pa.int64()))
    return out


def finalize_estimate(batch: pa.Table) -> pa.Table:
    """Append the integer cardinality estimate to merged-sketch rows."""
    estimates = [from_bytes(b.as_py()).cardinality() for b in batch.column(SKETCH_COL)]
    return batch.append_column(ESTIMATE_COL, pa.array(estimates, type=pa.int64()))
