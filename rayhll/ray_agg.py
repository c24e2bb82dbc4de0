"""High-level Ray Data API: approximate-distinct as a mergeable UDAF.

Three entry styles (SURVEY.md §2.5 "Aggregations"):

* :func:`approx_distinct` — global distinct count of one or more key columns;
  partial sketches per block, distributed two-level tree merge, finalize.
* :func:`grouped_approx_distinct` — distinct per group:
  ``map_batches`` pre-aggregation (one sketch row per group per block) →
  ``groupby(group_cols).map_groups`` merge.  The shuffle moves fixed-size
  sketch rows, not input rows, so reducer skew is bounded by #groups, not by
  the hottest group's row count.
* :func:`HllDistinct` — a ``ray.data.aggregate.AggregateFn`` so the sketch
  composes with Ray's own aggregate machinery:
  ``ds.groupby(k).aggregate(HllDistinct(on="col"))``.

All exchanges are storage-spec v1.0.0 bytes, so any stage's output is
readable by postgresql-hll / java-hll and by every other stage.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

from ray.data.aggregate import AggregateFn

from rayhll.core.serde import from_bytes
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch
from rayhll.functions import hashing
from rayhll.stages.build import (
    BUCKET_COL,
    ESTIMATE_COL,
    GHASH_COL,
    SKETCH_COL,
    BuildPartials,
    finalize_estimate,
    make_bucket_merger,
    merge_sketch_rows,
)

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


#: Sketch settings that keep every group in the exact EXPLICIT representation
#: up to 2^17 distinct values (expthresh=18 — reference: python_hll/hll.py:106-117).
#: Used by the oracle-gated correctness queries, where estimates must equal
#: exact COUNT(DISTINCT); benchmark pipelines use probabilistic DEFAULT.
EXACT_MODE = HllSettings(11, 5, expthresh=18)


def build_partials(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    group_cols: list[str] | tuple[str, ...] = (),
    settings: HllSettings | None = None,
    hash_method: str = "fast",
    batch_size: int | None = 262144,
    concurrency=None,
    ignore_nulls: bool = True,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Collapse input rows to partial-sketch rows (see stages.build).

    ``ignore_nulls`` (default, SQL semantics): rows whose key tuple contains
    a NULL contribute nothing to the distinct count.  ``num_buckets``
    (reduce fanout for the downstream grouped merge) auto-sizes from the
    input's metadata row count when ``None`` — an upper bound, since the
    shuffle carries pre-aggregated rows (floor 64 keeps small runs
    byte-identical; ``functions.partitioning``)."""
    from rayhll.functions.partitioning import resolve_num_buckets
    from rayhll.stages.build import DEFAULT_NUM_BUCKETS

    num_buckets = resolve_num_buckets(
        ds, num_buckets, floor=DEFAULT_NUM_BUCKETS, warn_on_floor=False
    )
    fn_args = dict(
        key_cols=key_cols,
        group_cols=group_cols,
        settings=settings,
        hash_method=hash_method,
        ignore_nulls=ignore_nulls,
        num_buckets=num_buckets,
    )
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    if concurrency is not None:
        # actor-pool form: settings construction amortized across batches
        return ds.map_batches(
            BuildPartials,
            fn_constructor_kwargs=fn_args,
            concurrency=concurrency,
            **kwargs,
        )
    return ds.map_batches(BuildPartials(**fn_args), **kwargs)


def tree_merge(
    partials: "ray.data.Dataset", leaf_batch: int = 4096
) -> "ray.data.Dataset":
    """Distributed two-level merge of partial-sketch rows down to one row.

    Level 1 merges up to ``leaf_batch`` partials per task in parallel; level 2
    folds the survivors in a single task.  At 100 TB (~800k blocks) that is
    ~200 level-1 tasks and one ~200-row final fold — sketches are ~1.3 KiB, so
    no stage ever materializes meaningful data.
    """
    level1 = partials.map_batches(
        merge_sketch_rows, batch_format="pyarrow", batch_size=leaf_batch
    )
    return level1.repartition(1).map_batches(
        merge_sketch_rows, batch_format="pyarrow", batch_size=None
    )


def approx_distinct_sketch(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    settings: HllSettings | None = None,
    hash_method: str = "fast",
    **kwargs,
) -> HllSketch:
    """Global sketch over ``key_cols``; returns the merged HllSketch
    (an EMPTY sketch for an empty dataset)."""
    partials = build_partials(
        ds, key_cols, settings=settings, hash_method=hash_method, **kwargs
    )
    merged = tree_merge(partials)
    rows = merged.take(1)
    if not rows or not rows[0][SKETCH_COL]:
        return HllSketch(settings or HllSettings(11, 5))
    return from_bytes(rows[0][SKETCH_COL])


def approx_distinct(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    settings: HllSettings | None = None,
    hash_method: str = "fast",
    **kwargs,
) -> int:
    """Global approximate distinct count of ``key_cols``."""
    return approx_distinct_sketch(
        ds, key_cols, settings=settings, hash_method=hash_method, **kwargs
    ).cardinality()


def grouped_approx_distinct(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    key_cols: list[str],
    settings: HllSettings | None = None,
    hash_method: str = "fast",
    batch_size: int | None = 262144,
    concurrency=None,
    include_sketch: bool = False,
    premerge_batch: int | None = None,
    ignore_nulls: bool = True,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Distinct-per-group dataset: ``group_cols... , estimate:int64``.

    The groupby shuffle sees only pre-aggregated sketch rows (one per group
    per input block), co-located by hash *bucket* (not by raw group key), so
    each reduce task merges thousands of groups vectorized and per-group
    Python overhead never dominates.  Skew is bounded twice: a hot group
    costs O(#blocks) fixed-size sketch rows, and hot buckets spread across
    ``num_buckets`` reducers.  A local combiner (``premerge_batch``) merges
    partial rows sharing a group hash before the sort — 2.6x fewer shuffle
    rows when #groups approaches the build batch size, at ~15-18%%
    single-node CPU cost.  ``None`` = cluster-aware AUTO (on for multi-node
    sessions / $RAYHLL_NETWORK_BOUND, off single-node), ``0`` = force off —
    see ``stages.build.resolve_premerge_batch`` (PERF_NOTES #10-11)."""
    partials = build_partials(
        ds,
        key_cols,
        group_cols=group_cols,
        settings=settings,
        hash_method=hash_method,
        batch_size=batch_size,
        concurrency=concurrency,
        ignore_nulls=ignore_nulls,
        num_buckets=num_buckets,
    )
    from rayhll.stages.build import make_local_premerge, resolve_premerge_batch

    premerge_batch = resolve_premerge_batch(premerge_batch)
    if premerge_batch:
        pre = make_local_premerge(list(group_cols))
        partials = partials.map_batches(
            pre, batch_format="pyarrow", batch_size=premerge_batch
        )
    merger = make_bucket_merger(
        list(group_cols), [SKETCH_COL], [ESTIMATE_COL], include_sketch=include_sketch
    )
    return partials.groupby(BUCKET_COL).map_groups(merger, batch_format="pyarrow")


def aggregate_family(ds: "ray.data.Dataset", build_partial, family_cls, leaf_batch: int = 1024):
    """Generic distributed aggregation for any sketch family
    (rayhll.sketches.base.Sketch): ``build_partial(batch) -> bytes`` per
    block, then a two-level tree merge with the family's associative
    ``merge``.  Returns the merged sketch object."""

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"blob": pa.array([build_partial(batch)], type=pa.binary())})

    def merge_blobs(batch: pa.Table) -> pa.Table:
        acc = None
        for b in batch.column("blob"):
            sk = family_cls.from_bytes(b.as_py())
            if acc is None:
                acc = sk
            else:
                acc.merge(sk)
        return pa.table({"blob": pa.array([acc.to_bytes()], type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    level1 = partials.map_batches(merge_blobs, batch_format="pyarrow", batch_size=leaf_batch)
    final = level1.repartition(1).map_batches(
        merge_blobs, batch_format="pyarrow", batch_size=None
    )
    return family_cls.from_bytes(final.take(1)[0]["blob"])


def grouped_aggregate_family(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    build_partial,
    family_cls,
    finalize=None,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Grouped aggregation for any sketch family: ``build_partial(sub_batch)
    -> bytes`` per (batch, group), hash-bucketed shuffle of blob rows, merge
    per group, optional ``finalize(sketch) -> dict[str, value]`` columns.

    Same skew story as the HLL path: the shuffle carries one family blob per
    (block, group), never input rows.  ``num_buckets`` auto-sizes from the
    input's metadata row count when ``None`` (an upper bound; floor 64)."""
    import numpy as np

    from rayhll.functions.hashing import hash64_table
    from rayhll.functions.partitioning import resolve_num_buckets

    num_buckets = resolve_num_buckets(ds, num_buckets, warn_on_floor=False)

    def partials(batch: pa.Table) -> pa.Table:
        ghash = hash64_table(batch, group_cols, seed=0xFA71)
        uniq, first_idx, inv = np.unique(ghash, return_index=True, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq)))
        blobs = []
        sorted_batch = batch.take(pa.array(order))
        for g in range(len(uniq)):
            lo = bounds[g]
            hi = bounds[g + 1] if g + 1 < len(uniq) else len(batch)
            blobs.append(build_partial(sorted_batch.slice(lo, hi - lo)))
        out = batch.select(group_cols).take(pa.array(first_idx))
        out = out.append_column("blob", pa.array(blobs, type=pa.binary()))
        out = out.append_column(GHASH_COL, pa.array(uniq, type=pa.int64()))
        bucket = (uniq.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return out.append_column(BUCKET_COL, pa.array(bucket, type=pa.int64()))

    merge_bucket = _make_blob_merge_bucket(group_cols, family_cls, "blob", finalize)
    p = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(BUCKET_COL).map_groups(merge_bucket, batch_format="pyarrow")


def _make_blob_merge_bucket(group_cols, family_cls, blob_col, finalize):
    """The shared reduce half of the family aggregations: per bucket, merge
    every group's blobs (group identity = 64-bit hash, the documented
    collision contract) and emit one blob-or-finalized row per group."""

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        import numpy as np

        codes = tbl.column(GHASH_COL).to_numpy()
        uniq, inv = np.unique(codes, return_inverse=True)
        first_idx = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_idx, inv, np.arange(len(codes), dtype=np.int64))
        merged: list = [None] * len(uniq)
        for i, blob in enumerate(tbl.column(blob_col)):
            g = int(inv[i])
            sk = family_cls.from_bytes(blob.as_py())
            if merged[g] is None:
                merged[g] = sk
            else:
                merged[g].merge(sk)
        out = tbl.select(group_cols).take(pa.array(first_idx))
        if finalize is None:
            return out.append_column(
                blob_col, pa.array([m.to_bytes() for m in merged], type=pa.binary())
            )
        cols: dict[str, list] = {}
        for m in merged:
            for k, v in finalize(m).items():
                cols.setdefault(k, []).append(v)
        for k, vals in cols.items():
            out = out.append_column(k, pa.array(vals))
        return out

    return merge_bucket


def grouped_merge_family(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    family_cls,
    blob_col: str = "blob",
    finalize=None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Merge EXISTING family-blob rows per group (the second half of
    :func:`grouped_aggregate_family`, for pipelines that already hold
    per-partial blobs — e.g. sliding windows replicating per-step sketches
    into the windows they serve).  The shuffle carries only blob rows, so a
    fixed ``num_buckets`` is combiner-bounded by construction."""
    import numpy as np

    from rayhll.functions.hashing import hash64_table

    def key_bucket(batch: pa.Table) -> pa.Table:
        gh = hash64_table(batch, group_cols, seed=0xFA71)
        out = batch.append_column(GHASH_COL, pa.array(gh, type=pa.int64()))
        bucket = (gh.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return out.append_column(BUCKET_COL, pa.array(bucket, type=pa.int64()))

    merge_bucket = _make_blob_merge_bucket(group_cols, family_cls, blob_col, finalize)
    keyed = ds.map_batches(key_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby(BUCKET_COL).map_groups(merge_bucket, batch_format="pyarrow")


class HllDistinct(AggregateFn):
    """``ray.data`` AggregateFn: approximate COUNT(DISTINCT on).

    Accumulates whole Arrow blocks vectorized; the aggregate state is an
    ``HllSketch`` (pickled between stages by Ray), merged with the
    associative union.  ``finalize`` yields the integer estimate.
    """

    def __init__(
        self,
        on: str,
        settings: HllSettings | None = None,
        alias_name: str | None = None,
        hash_method: str = "fast",
    ):
        settings = settings or HllSettings(11, 5)

        def _raw(block):
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            # SQL semantics: COUNT(DISTINCT on) ignores NULL rows
            if block.column(on).null_count:
                block = block.filter(pa.compute.is_valid(block.column(on)))
            if hash_method == "sha256":
                return hashing.sha256_raw64(block.column(on))
            return hashing.hash64_table(block, [on])

        # The aggregate state crosses stage boundaries as storage-spec bytes
        # (Arrow binary-friendly, interop-readable), not pickled objects.
        def accumulate_block(agg: bytes, block) -> bytes:
            sk = from_bytes(agg)
            sk.add_batch(_raw(block))
            return sk.to_bytes()

        def merge(a: bytes, b: bytes) -> bytes:
            sk = from_bytes(a)
            sk.union(from_bytes(b))
            return sk.to_bytes()

        super().__init__(
            init=lambda k: HllSketch(settings).to_bytes(),
            merge=merge,
            accumulate_block=accumulate_block,
            finalize=lambda a: from_bytes(a).cardinality(),
            name=alias_name or f"approx_distinct({on})",
        )


__all__ = [
    "EXACT_MODE",
    "ESTIMATE_COL",
    "SKETCH_COL",
    "HllDistinct",
    "approx_distinct",
    "approx_distinct_sketch",
    "build_partials",
    "grouped_approx_distinct",
    "tree_merge",
    "finalize_estimate",
]
