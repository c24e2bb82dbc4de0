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

from rayhll.core import batchbuild
from rayhll.core.serde import from_bytes
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch
from rayhll.functions import hashing

SKETCH_COL = "sketch"
ROWS_COL = "rows_in"

#: Group-identity contract: the 64-bit xxhash of the group columns
#: (``GHASH_COL``) IS the group identity end-to-end (build → premerge →
#: bucket merge).  Two distinct group-key tuples colliding in 64 bits would
#: silently merge under the first tuple's label.  Expected collisions are
#: ~G²/2^65 for G groups (birthday bound): ~5e-8 at 1M groups, ~0.05 at 1B
#: groups — acceptable for approximate aggregation (the estimates are already
#: ±1.04/√m); the bound is pinned by
#: tests/test_ray_pipelines.py::test_group_hash_collision_contract.  Pipelines
#: needing exactness at ≥10^10 groups should groupby the raw key columns
#: instead (grouped_approx_distinct carries the group values on every row, so
#: the reduce could compare them; the hash is kept for shuffle compactness).
ESTIMATE_COL = "estimate"
GHASH_COL = "_ghash"
BUCKET_COL = "_bucket"
GROUP_HASH_SEED = 0x5EED_6800
DEFAULT_NUM_BUCKETS = 64


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
        num_buckets: int = DEFAULT_NUM_BUCKETS,
        ignore_nulls: bool = True,
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
        self.num_buckets = num_buckets
        #: SQL semantics (default): rows whose key tuple contains a NULL
        #: contribute nothing to the distinct count — COUNT(DISTINCT col)
        #: ignores NULLs (and Spark's multi-arg variant ignores any-null
        #: tuples).  False = count NULL as one distinct value per column
        #: combination (the pre-r2 behavior).
        self.ignore_nulls = ignore_nulls

    def _raw64(self, batch: pa.Table) -> np.ndarray:
        if self.hash_method == "sha256":
            return hashing.sha256_raw64(batch.column(self.key_cols[0]))
        return hashing.hash64_table(batch, self.key_cols, seed=self.seed)

    def _valid_mask(self, batch: pa.Table) -> np.ndarray | None:
        """Bool mask of rows whose key tuple has no NULL (None = all valid)."""
        if not self.ignore_nulls:
            return None
        import pyarrow.compute as pc

        mask: np.ndarray | None = None
        for c in self.key_cols:
            col = batch.column(c)
            if col.null_count == 0:
                continue
            m = pc.is_valid(col).to_numpy(zero_copy_only=False)
            mask = m if mask is None else (mask & m)
        return mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = self._raw64(batch)
        valid = self._valid_mask(batch)
        if not self.group_cols:
            sk = HllSketch(self.settings)
            sk.add_batch(raw if valid is None else raw[valid])
            return pa.table(
                {
                    SKETCH_COL: pa.array([sk.to_bytes()], type=pa.binary()),
                    ROWS_COL: pa.array([len(batch)], type=pa.int64()),
                }
            )
        # Vectorized within-batch grouping: one composite hash of the group
        # columns -> codes; all per-group sketches built in one pass
        # (rayhll.core.batchbuild), python loop only over threshold-crossing
        # groups.
        ghash = hashing.hash64_table(batch, self.group_cols, seed=GROUP_HASH_SEED)
        uniq, first_idx, counts, sketches = batchbuild.build_grouped_sketches(
            self.settings, ghash, raw, valid=valid
        )
        out = batch.select(self.group_cols).take(pa.array(first_idx))
        out = out.append_column(SKETCH_COL, pa.array(sketches, type=pa.binary()))
        out = out.append_column(ROWS_COL, pa.array(counts, type=pa.int64()))
        # carry the group hash so the reduce side can merge many groups per
        # task, and a bucket id for the co-locating groupby
        out = out.append_column(GHASH_COL, pa.array(uniq, type=pa.int64()))
        bucket = (uniq.view(np.uint64) % np.uint64(self.num_buckets)).astype(np.int64)
        return out.append_column(BUCKET_COL, pa.array(bucket, type=pa.int64()))


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


def make_bucket_merger(
    group_cols: list[str],
    sketch_cols: list[str] = (SKETCH_COL,),
    estimate_cols: list[str] | None = None,
    include_sketch: bool = True,
):
    """Build the reduce fn for the bucketed grouped aggregation.

    Receives ALL partial rows of one hash bucket (many groups) and merges
    every group's sketches vectorized (rayhll.core.batchmerge); per-group
    Python work is limited to threshold-crossing groups.  Emits one row per
    group: group cols, merged sketch(es), integer estimate(s), summed rows.
    """
    from rayhll.core import batchmerge
    from rayhll.core.serde import settings_from_bytes

    estimate_cols = estimate_cols or [
        ESTIMATE_COL if c == SKETCH_COL else f"estimate_{c}" for c in sketch_cols
    ]

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        codes = tbl.column(GHASH_COL).to_numpy()
        uniq, inv = np.unique(codes, return_inverse=True)
        first_idx = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_idx, inv, np.arange(len(codes), dtype=np.int64))
        out = tbl.select(group_cols).take(pa.array(first_idx))
        for sc, ec in zip(sketch_cols, estimate_cols):
            col = tbl.column(sc)
            settings = settings_from_bytes(col[0].as_py())
            _, _, merged = batchmerge.merge_grouped_blobs(settings, codes, col)
            if include_sketch:
                out = out.append_column(sc, pa.array(merged, type=pa.binary()))
            ests = [batchmerge.blob_cardinality(b) for b in merged]
            out = out.append_column(ec, pa.array(ests, type=pa.int64()))
        rows = np.bincount(inv, weights=tbl.column(ROWS_COL).to_numpy()).astype(np.int64)
        return out.append_column(ROWS_COL, pa.array(rows, type=pa.int64()))

    return merge_bucket


#: env var marking the cluster's exchange as network-bound (any non-empty
#: value): auto-resolution then enables the local combiner.
NETWORK_BOUND_ENV = "RAYHLL_NETWORK_BOUND"
DEFAULT_PREMERGE_BATCH = 262144


def resolve_premerge_batch(premerge_batch) -> int | None:
    """Cluster-aware default for the build->shuffle local combiner.

    * explicit int > 0 — use that batch size;
    * ``0`` / ``False`` — force OFF;
    * ``None`` (default) — AUTO: on (at ``DEFAULT_PREMERGE_BATCH``) iff
      ``$RAYHLL_NETWORK_BOUND`` is set non-empty OR the live Ray cluster
      spans more than one node.  Rationale (PERF_NOTES #10-11, both A/B
      orderings recorded): the combiner cuts shuffle ROWS ~2.6x but costs
      ~15-18% extra local CPU, so it loses on a single node where the sort
      is CPU-bound and wins when the exchange crosses a network.
    """
    import os

    if premerge_batch is not None:
        return int(premerge_batch) if premerge_batch else None
    if os.environ.get(NETWORK_BOUND_ENV, ""):
        return DEFAULT_PREMERGE_BATCH
    try:
        import ray

        if ray.is_initialized():
            alive = [n for n in ray.nodes() if n.get("Alive")]
            if len(alive) > 1:
                return DEFAULT_PREMERGE_BATCH
    except Exception:
        pass
    return None


def make_local_premerge(group_cols: list[str], sketch_cols: list[str] = (SKETCH_COL,)):
    """Combiner between build and shuffle: merge partial rows that share a
    group hash *within* a batch (no co-location assumed), shrinking the sort
    input by roughly the number of build outputs the batch spans.  Output
    schema equals the build stage's partial schema."""
    from rayhll.core import batchmerge
    from rayhll.core.serde import settings_from_bytes

    def premerge(tbl: pa.Table) -> pa.Table:
        codes = tbl.column(GHASH_COL).to_numpy()
        uniq, inv = np.unique(codes, return_inverse=True)
        if len(uniq) == len(codes):  # nothing to combine
            return tbl
        first_idx = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_idx, inv, np.arange(len(codes), dtype=np.int64))
        out = tbl.select(group_cols).take(pa.array(first_idx))
        for sc in sketch_cols:
            col = tbl.column(sc)
            settings = settings_from_bytes(col[0].as_py())
            _, _, merged = batchmerge.merge_grouped_blobs(settings, codes, col)
            out = out.append_column(sc, pa.array(merged, type=pa.binary()))
        rows = np.bincount(inv, weights=tbl.column(ROWS_COL).to_numpy()).astype(np.int64)
        out = out.append_column(ROWS_COL, pa.array(rows, type=pa.int64()))
        out = out.append_column(GHASH_COL, pa.array(uniq, type=pa.int64()))
        bucket = tbl.column(BUCKET_COL).take(pa.array(first_idx))
        return out.append_column(BUCKET_COL, bucket)

    return premerge


def finalize_estimate(batch: pa.Table) -> pa.Table:
    """Append the integer cardinality estimate to merged-sketch rows."""
    estimates = [from_bytes(b.as_py()).cardinality() for b in batch.column(SKETCH_COL)]
    return batch.append_column(ESTIMATE_COL, pa.array(estimates, type=pa.int64()))
