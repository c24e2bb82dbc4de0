"""Per-group top-k and deterministic per-group sampling.

Training-data curation staples ("k examples per class", "uniform sample per
source") expressed Ray-Data-first:

* :func:`grouped_top_k` — the smallest/largest ``k`` rows of each group by
  an order column, as a distributed pre-aggregating pipeline: every batch
  keeps at most k rows per group (one lexsort), a bucketed groupby
  co-locates thousands of groups per reduce task, and the reduce repeats
  the same vectorized cut.  The shuffle carries at most
  O(#blocks × #groups-per-block × k) rows, never the input.
  SQL equivalent: ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) <= k``.
* :func:`grouped_hash_sample` — a deterministic uniform sample of k rows
  per group: top-k by the 64-bit hash of the id columns (a seeded hash
  order is a uniform random order, reproducible across runs and batchings
  — no RNG state to coordinate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayhll.functions.hashing import hash64_table

_BUCKET = "_tk_bkt"
_ORDER = "_tk_order"


def _cut_top_k(tbl: pa.Table, group_cols: list[str], order: np.ndarray, k: int) -> pa.Table:
    """Keep <= k rows per group, ordered by ``order`` ascending (vectorized:
    one lexsort + within-group rank)."""
    ghash = hash64_table(tbl, group_cols, seed=0x70FF)
    sortidx = np.lexsort((order, ghash))
    g = ghash[sortidx]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    counts = np.diff(np.r_[starts, len(g)])
    rank = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts)
    return tbl.take(pa.array(sortidx[rank < k]))


def grouped_top_k(
    ds,
    group_cols: list[str] | str,
    order_col: str,
    k: int,
    descending: bool = False,
    num_buckets: int = 64,
):
    """The ``k`` smallest (or largest) rows of each group by ``order_col``.

    Ties broken by order-column value only (rows equal in ``order_col`` are
    kept in arbitrary deterministic order, like SQL ROW_NUMBER with a
    non-unique ORDER BY); output columns = input columns.  Nulls (and float
    NaNs) place LAST regardless of direction — SQL ``NULLS LAST``.

    ``num_buckets`` stays a fixed default (unlike the raw-row-scale stages
    sized by ``functions.partitioning``): the per-batch partial cut bounds
    each reduce task's input at ``batches × groups × k`` rows, which does
    not grow with raw row count — raise it only for huge group counts."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]

    def order_of(tbl: pa.Table) -> np.ndarray:
        col = tbl.column(order_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        null_mask = None
        if col.null_count:
            null_mask = col.is_null().to_numpy(zero_copy_only=False)
            # fill so integer columns stay integer through to_numpy (a
            # null-driven float64 round-trip would corrupt int64 > 2^53)
            t = col.type
            zero = "" if pa.types.is_string(t) or pa.types.is_large_string(t) else 0
            col = pc.fill_null(col, pa.scalar(zero, type=t))
        vals = col.to_numpy(zero_copy_only=False)
        if vals.dtype == object:
            # strings etc.: local ordinal ranks — rank order == value order
            # within any table, and top-k is a selection, so partial and
            # final cuts both select by true value order
            order = np.argsort(np.argsort(vals, kind="stable"), kind="stable")
            order = len(order) - 1 - order if descending else order
            if null_mask is not None:
                order = order.copy()
                order[null_mask] = len(order)  # past every real rank
            return order
        if np.issubdtype(vals.dtype, np.unsignedinteger):
            # bias by the sign bit (order-preserving uint64 -> int64 map);
            # a plain astype(int64) would wrap values >= 2^63 negative
            order = (vals.astype(np.uint64) ^ np.uint64(1 << 63)).view(np.int64)
            order = ~order if descending else order  # ~x = -x-1: exact reverse
            last = np.iinfo(np.int64).max
        elif np.issubdtype(vals.dtype, np.integer) or vals.dtype.kind == "M":
            order = vals.view(np.int64) if vals.dtype.kind == "M" else vals.astype(np.int64)
            order = ~order if descending else order
            last = np.iinfo(np.int64).max
        else:
            order = vals.astype(np.float64)
            order = -order if descending else order
            last = np.inf  # NaN already sorts after inf in numpy sorts
        if null_mask is not None:
            order = order.copy()
            order[null_mask] = last
        return order

    def partial(tbl: pa.Table) -> pa.Table:
        out = _cut_top_k(tbl, group_cols, order_of(tbl), k)
        gh = hash64_table(out, group_cols, seed=0x70FF)
        return out.append_column(
            _BUCKET,
            pa.array((gh.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)),
        )

    def final(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns([_BUCKET])
        return _cut_top_k(tbl, group_cols, order_of(tbl), k)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_hash_sample(
    ds,
    group_cols: list[str] | str,
    id_cols: list[str] | str,
    k: int,
    seed: int = 0x5A17,
    num_buckets: int = 64,
):
    """Deterministic uniform sample of ``k`` rows per group: the rows whose
    seeded 64-bit id-hash is smallest.  Reproducible across runs, batch
    sizes and cluster shapes; change ``seed`` for an independent draw."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if isinstance(id_cols, str):
        id_cols = [id_cols]

    def with_hash(tbl: pa.Table) -> pa.Table:
        h = hash64_table(tbl, id_cols, seed=seed)
        return tbl.append_column(_ORDER, pa.array(h, type=pa.int64()))

    out = grouped_top_k(
        ds.map_batches(with_hash, batch_format="pyarrow", zero_copy_batch=True),
        group_cols,
        _ORDER,
        k,
        num_buckets=num_buckets,
    )
    return out.drop_columns([_ORDER])


def hash_fraction_sample(ds, id_cols: list[str] | str, fraction: float, seed: int = 0x5A17):
    """Deterministic ``fraction`` sample: keep rows whose seeded 64-bit
    id-hash falls below ``fraction`` of the hash space.

    The curation staple for web-scale corpora: a pure per-batch filter —
    NO shuffle, no RNG state, no coordination — that is reproducible
    across runs, batchings and cluster shapes, COORDINATED (the same ids
    are kept at every fraction: ``sample(0.1)`` ⊆ ``sample(0.3)``, so
    growing a subsample never resamples), and composable with
    :func:`hash_fraction_complement` (exactly the other rows — a held-out
    split disjoint by construction).
    Sampling is uniform per id, hence ~``fraction`` within every group
    without ever grouping.  Rows where every id column is NULL hash
    deterministically and land on one side, same as any other id.
    """
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction={fraction} not in [0, 1]")
    threshold = np.uint64(int(fraction * float(1 << 64))) if fraction < 1.0 else None

    def keep(tbl: pa.Table) -> pa.Table:
        if threshold is None:
            return tbl
        h = hash64_table(tbl, id_cols, seed=seed).view(np.uint64)
        return tbl.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def hash_fraction_complement(ds, id_cols: list[str] | str, fraction: float, seed: int = 0x5A17):
    """Exactly the rows :func:`hash_fraction_sample` drops — e.g. a
    held-out split that is disjoint by construction."""
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction={fraction} not in [0, 1]")
    threshold = np.uint64(int(fraction * float(1 << 64))) if fraction < 1.0 else None

    def keep(tbl: pa.Table) -> pa.Table:
        if threshold is None:
            return tbl.slice(0, 0)
        h = hash64_table(tbl, id_cols, seed=seed).view(np.uint64)
        return tbl.filter(pa.array(h >= threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def token_budget_sample(
    ds,
    budgets: "dict | int",
    group_col: str = "lang",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
):
    """Per-group prefix sample by cumulative weight — the data-mixing
    staple "take documents per source/language until its token budget is
    full".  Selection order is ``id_col`` ascending (deterministic and
    SQL-mirrorable: ``SUM(w) OVER (PARTITION BY g ORDER BY id) <= budget``);
    a row is kept iff its cumulative weight INCLUDING itself fits.

    ``budgets`` is either one int for every group or a dict
    ``{group: budget}`` (groups absent from the dict are dropped).  A null
    group key forms a group like any other (the repo-wide NULL convention):
    int mode budgets it like every group, and dict mode honors an explicit
    ``None`` key (absent ``None`` = nulls dropped, same as any absent
    group).

    Shape: one bucketed shuffle of compact ``(id, group, weight)`` rows
    with each group fully co-located (the prefix is inherently sequential
    per group).  Partitioning assumption — same as ``session_windows``: one
    group's weight rows fit in one reduce task (24 B/row; a 10^9-doc group
    is ~24 GB, so shard upstream by source file before this at extreme
    single-group scale)."""
    from rayhll.functions.partitioning import resolve_num_buckets

    num_buckets = resolve_num_buckets(ds, num_buckets)
    fixed = None if isinstance(budgets, dict) else int(budgets)
    table = dict(budgets) if isinstance(budgets, dict) else None

    def key_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([id_col, group_col, weight_col])
        gh = hash64_table(batch, [group_col], seed=0xB0D6)
        bucket = (gh.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column(_BUCKET, pa.array(bucket, type=pa.int64()))

    def cut(tbl: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tbl.drop_columns([_BUCKET])).sort([group_col, id_col])
        # null weights contribute 0 to the running sum and stay ELIGIBLE,
        # matching the SQL mirror (windowed SUM skips NULLs); a plain
        # cum_sum would null the cumulative and silently drop the row
        cum = df.select(
            pl.col(weight_col).fill_null(0).cum_sum().over(group_col).alias("_cum")
        )["_cum"]
        df = df.with_columns(_cum=cum)
        if fixed is not None:
            out = df.filter(pl.col("_cum") <= fixed)
        else:
            bdf = pl.DataFrame(
                {group_col: list(table), "_budget": list(table.values())}
            ).with_columns(pl.col(group_col).cast(df[group_col].dtype))
            # nulls_equal: a None dict key must budget the null group —
            # without it the inner join silently drops null group keys
            out = df.join(bdf, on=group_col, how="inner", nulls_equal=True).filter(
                pl.col("_cum") <= pl.col("_budget")
            )
        return out.select([id_col, group_col, weight_col]).to_arrow()

    keyed = ds.map_batches(key_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby(_BUCKET).map_groups(cut, batch_format="pyarrow")
