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


_GH = "_tb_gh"
_RNG = "_tb_rng"
_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)

#: range classifications for big-group id ranges (driver-computed)
_KEEP_ALL, _DROP_ALL, _BOUNDARY = 1, 2, 3


def _unit_key(gh: np.ndarray, rng: np.ndarray) -> np.ndarray:
    """Mixed uint64 key of a (group-hash, range) unit — vectorized lookups
    against the broadcast classification/offset tables (same 2^-64
    collision contract as group hashing throughout the engine)."""
    from rayhll.functions.hashing import splitmix64

    return splitmix64(gh.view(np.uint64) + (rng.astype(np.uint64) + 1) * _GOLDEN64)


def _id_order_values(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(values, null_mask) of an id column for ORDER comparisons: integer
    ids stay int64 (a null-driven float64 round-trip would corrupt ids >
    2^53), strings become object arrays; nulls are filled (callers place
    null ids FIRST explicitly, matching the polars sort the cut uses)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = (
        col.is_null().to_numpy(zero_copy_only=False)
        if col.null_count
        else np.zeros(len(col), dtype=bool)
    )
    if col.null_count:
        t = col.type
        zero = "" if pa.types.is_string(t) or pa.types.is_large_string(t) else 0
        col = pc.fill_null(col, pa.scalar(zero, type=t))
    return col.to_numpy(zero_copy_only=False), null_mask


def token_budget_sample(
    ds,
    budgets: "dict | int",
    group_col: str = "lang",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    target_rows_per_range: int = 1_000_000,
    max_ranges: int = 64,
    sample_min_rows_per_batch: int = 256,
    stats_out: dict | None = None,
):
    """Per-group prefix sample by cumulative weight — the data-mixing
    staple "take documents per source/language until its token budget is
    full".  Selection order is ``id_col`` ascending, nulls first
    (deterministic and SQL-mirrorable: ``SUM(w) OVER (PARTITION BY g ORDER
    BY id) <= budget``); a row is kept iff its cumulative weight INCLUDING
    itself fits.

    ``budgets`` is either one int for every group or a dict
    ``{group: budget}`` (groups absent from the dict are dropped).  A null
    group key forms a group like any other (the repo-wide NULL convention):
    int mode budgets it like every group, and dict mode honors an explicit
    ``None`` key (absent ``None`` = nulls dropped, same as any absent
    group).

    Shape — SKEW-SAFE two-pass prefix (no reduce task ever holds a whole
    hot group; a dominant language is the NORM in web corpora):

    1. the compact ``(id, group, weight)`` projection is materialized once
       (24 B/row — the volume the pre-r5 shape pushed through its single
       shuffle; spills to the object store at scale);
    2. a bounded sample pass finds BIG groups (≳ ``target_rows_per_range``
       rows; only groups with ≥ ``sample_min_rows_per_batch`` rows in a
       batch emit samples, so the pass ships ≤ rows/256) and picks up to
       ``max_ranges - 1`` id-range boundaries per big group;
    3. an exact per-(big group, id-range) weight-sum pass + a driver-side
       exclusive prefix classifies each range: KEEP-ALL (offset + sum ≤
       budget — rows stream out through a broadcast filter, NO shuffle),
       DROP-ALL (offset > budget — rows vanish in the map), or BOUNDARY
       (the one range containing the cut);
    4. only boundary ranges and small groups shuffle, co-located per
       (group, range) unit — each reduce task holds at most one range of a
       big group (~``target_rows_per_range`` rows), never the group.

    Misdetecting a big-but-thinly-spread group is BENIGN: it falls back to
    the small-group path (one task holds it — the pre-r5 behavior).  The
    result is exact and identical to the single-task cut for integer
    weights (float weights: per-range summation order differs at float64
    epsilon).  Driver state is O(#big groups × ranges) ≤ rows /
    ``target_rows_per_range`` — scale-proof; dict mode additionally holds
    one budget per group by its own contract.  ``stats_out`` (optional
    dict) receives the routing facts — big-group count, ranges per big
    group, keep-all/drop-all/boundary counts — so tests and stress tools
    can pin that the skew machinery actually engaged."""
    import polars as pl

    import ray

    from rayhll.functions.hashing import splitmix64
    from rayhll.functions.partitioning import resolve_num_buckets

    fixed = None if isinstance(budgets, dict) else int(budgets)
    table = dict(budgets) if isinstance(budgets, dict) else None

    compact = ds.map_batches(
        lambda t: t.select([id_col, group_col, weight_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    num_buckets = resolve_num_buckets(compact, num_buckets)

    base = compact.schema().base_schema
    id_type = base.field(id_col).type
    group_type = base.field(group_col).type
    is_str_id = pa.types.is_string(id_type) or pa.types.is_large_string(id_type)
    # both union legs (polars-round-tripped cut, arrow-native keep-all
    # filter) must emit the EXACT input schema — polars widens string to
    # large_string on to_arrow
    out_schema = pa.schema([base.field(c) for c in (id_col, group_col, weight_col)])

    # ---- pass 1: find big groups + sample their id distributions -------
    min_rows = max(2, int(sample_min_rows_per_batch))
    n_samples = 4 * max_ranges  # ids per (batch, group) — boundary quality

    def sample_batch(tbl: pa.Table) -> pa.Table:
        gh = hash64_table(tbl, [group_col], seed=0xB0D6)
        order = np.argsort(gh, kind="stable")
        g = gh[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        counts = np.diff(np.r_[starts, len(g)])
        keep = counts >= min_rows
        ks, kc = starts[keep], counts[keep]
        take = np.minimum(kc, n_samples)
        if len(ks):
            # evenly spaced positions within each group's sorted run
            seg = np.concatenate(([0], np.cumsum(take)[:-1]))
            within = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(seg, take)
            pos = np.repeat(ks, take) + (
                within * np.repeat(kc, take) // np.repeat(take, take)
            )
            ids_flat = tbl.column(id_col).take(pa.array(order[pos])).combine_chunks()
            ids = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(take))), type=pa.int32()),
                ids_flat,
            )
            gvals = tbl.column(group_col).take(pa.array(order[ks]))
        else:
            ids = pa.array([], type=pa.list_(id_type))
            gvals = pa.chunked_array([], type=group_type)
        ghk = g[ks].astype(np.int64)
        return pa.table(
            {
                _GH: pa.array(ghk, type=pa.int64()),
                "g": gvals,
                "n": pa.array(kc.astype(np.int64), type=pa.int64()),
                "ids": ids,
                "bkt": pa.array(
                    (ghk.view(np.uint64) % np.uint64(64)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    def sample_reduce(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl.drop_columns(["bkt"]))
        agg = df.group_by(_GH).agg(
            pl.col("n").sum().alias("total"),
            pl.col("g").first(),
            pl.col("ids"),
        )
        out_gh, out_g, out_bounds = [], [], []
        # python loop bounded by BIG groups only (≤ rows / target per bucket)
        for row in agg.filter(
            pl.col("total") > target_rows_per_range
        ).iter_rows(named=True):
            flat = sorted(
                x for sub in row["ids"] for x in sub if x is not None
            )
            n_ranges = min(max_ranges, -(-row["total"] // target_rows_per_range))
            bounds = sorted(
                {flat[(len(flat) * (i + 1)) // n_ranges - 1] for i in range(n_ranges - 1)}
            ) if len(flat) >= 2 else []
            if not bounds:
                continue  # degenerate sample — group falls back to one task
            out_gh.append(row[_GH])
            out_g.append(row["g"])
            out_bounds.append(bounds)
        return pa.table(
            {
                _GH: pa.array(out_gh, type=pa.int64()),
                "g": pa.array(out_g, type=group_type),
                "bounds": pa.array(out_bounds, type=pa.list_(id_type)),
            }
        )

    big_rows = (
        compact.map_batches(sample_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(sample_reduce, batch_format="pyarrow")
        .take_all()  # ≤ #big groups ≤ rows / target_rows_per_range
    )

    def _bounds_array(vals):
        return (
            np.array(vals, dtype=object) if is_str_id else np.asarray(vals, dtype=np.int64)
        )

    big_bounds = {r[_GH]: _bounds_array(r["bounds"]) for r in big_rows}
    big_group_val = {r[_GH]: r["g"] for r in big_rows}
    big_gh_sorted = np.sort(np.fromiter(big_bounds, dtype=np.int64, count=len(big_bounds)))

    def rng_of(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(group hash, range index, is-big mask) per row."""
        gh = hash64_table(tbl, [group_col], seed=0xB0D6)
        rng = np.zeros(len(gh), dtype=np.int32)
        member = np.zeros(len(gh), dtype=bool)
        if len(big_gh_sorted):
            pos = np.searchsorted(big_gh_sorted, gh)
            pos[pos == len(big_gh_sorted)] = 0
            member = big_gh_sorted[pos] == gh
            if member.any():
                vals, nulls = _id_order_values(tbl.column(id_col))
                # loop bounded by #big groups present in the batch
                for g in np.unique(gh[member]):
                    m = gh == g
                    r = np.searchsorted(
                        big_bounds[g], vals[m], side="right"
                    ).astype(np.int32)
                    r[nulls[m]] = 0  # null ids sort FIRST (range 0)
                    rng[m] = r
        return gh, rng, member

    # ---- pass 2: EXACT weight sum per (big group, id range) ------------
    def sums_batch(tbl: pa.Table) -> pa.Table:
        gh, rng, member = rng_of(tbl)
        w = pc.fill_null(
            tbl.column(weight_col).combine_chunks(), 0
        ).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(member)
        df = pl.DataFrame({_GH: gh[sel], _RNG: rng[sel], "w": w[sel]})
        agg = df.group_by([_GH, _RNG]).agg(pl.col("w").sum())
        out = agg.to_arrow()
        bkt = (
            out.column(_GH).to_numpy().view(np.uint64) % np.uint64(64)
        ).astype(np.int64)
        return out.append_column("bkt", pa.array(bkt, type=pa.int64()))

    def sums_reduce(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl.drop_columns(["bkt"]))
            .group_by([_GH, _RNG])
            .agg(pl.col("w").sum())
            .to_arrow()
        )

    if big_bounds:
        sums = (
            compact.map_batches(sums_batch, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bkt")
            .map_groups(sums_reduce, batch_format="pyarrow")
            .take_all()  # ≤ #big groups × max_ranges rows
        )
    else:
        sums = []

    # ---- driver classification: keep-all / drop-all / boundary ---------
    by_group: dict[int, list] = {}
    for r in sums:
        by_group.setdefault(r[_GH], []).append((r[_RNG], r["w"]))
    cls_gh, cls_rng, cls_code, cls_off = [], [], [], []
    for g, pairs in by_group.items():
        budget = fixed if fixed is not None else table.get(big_group_val[g])
        offset = 0
        for rng_i, wsum in sorted(pairs):
            if budget is None:  # dict mode, group absent -> dropped
                code = _DROP_ALL
            elif offset > budget:
                code = _DROP_ALL
            elif offset + wsum <= budget:
                code = _KEEP_ALL
            else:
                code = _BOUNDARY
            cls_gh.append(g)
            cls_rng.append(rng_i)
            cls_code.append(code)
            cls_off.append(offset)
            offset += wsum
    if stats_out is not None:  # tests/stress introspection of the routing
        stats_out.update(
            n_big_groups=len(big_bounds),
            n_keep_all=cls_code.count(_KEEP_ALL),
            n_drop_all=cls_code.count(_DROP_ALL),
            n_boundary=cls_code.count(_BOUNDARY),
            ranges_per_big_group={
                g: len(b) + 1 for g, b in big_bounds.items()
            },
        )
    if cls_gh:
        ukeys = _unit_key(
            np.asarray(cls_gh, dtype=np.int64), np.asarray(cls_rng, dtype=np.int64)
        )
        uorder = np.argsort(ukeys)
        cls_ref = ray.put(
            (
                ukeys[uorder],
                np.asarray(cls_code, dtype=np.uint8)[uorder],
                np.asarray(cls_off)[uorder],
            )
        )
    else:
        cls_ref = None

    def _lookup(ukey: np.ndarray, which: int):
        """Vectorized (class, offset) lookup; class 0 = small group."""
        u_sorted, codes, offs = ray.get(cls_ref)
        pos = np.searchsorted(u_sorted, ukey)
        pos[pos == len(u_sorted)] = 0
        hit = u_sorted[pos] == ukey
        if which == 0:
            out = np.zeros(len(ukey), dtype=np.uint8)
            out[hit] = codes[pos[hit]]
        else:
            out = np.zeros(len(ukey), dtype=offs.dtype)
            out[hit] = offs[pos[hit]]
        return out

    # ---- final routing ---------------------------------------------------
    def route_shuffle(tbl: pa.Table) -> pa.Table:
        gh, rng, _ = rng_of(tbl)
        ukey = _unit_key(gh, rng)
        if cls_ref is not None:
            code = _lookup(ukey, 0)
            keep = (code == 0) | (code == _BOUNDARY)
            sel = pa.array(keep)
            tbl = tbl.filter(sel)
            gh, rng, ukey = gh[keep], rng[keep], ukey[keep]
        bucket = (ukey % np.uint64(num_buckets)).astype(np.int64)
        return (
            tbl.append_column(_GH, pa.array(gh, type=pa.int64()))
            .append_column(_RNG, pa.array(rng, type=pa.int32()))
            .append_column(_BUCKET, pa.array(bucket, type=pa.int64()))
        )

    def keep_all_rows(tbl: pa.Table) -> pa.Table:
        gh, rng, _ = rng_of(tbl)
        code = _lookup(_unit_key(gh, rng), 0)
        return tbl.filter(pa.array(code == _KEEP_ALL))

    def cut(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl.drop_columns([_BUCKET])).sort([_GH, _RNG, id_col])
        # null weights contribute 0 to the running sum and stay ELIGIBLE,
        # matching the SQL mirror (windowed SUM skips NULLs); a plain
        # cum_sum would null the cumulative and silently drop the row
        df = df.with_columns(
            pl.col(weight_col)
            .fill_null(0)
            .cum_sum()
            .over([_GH, _RNG])
            .alias("_cum")
        )
        if cls_ref is not None:
            u = df.select([_GH, _RNG]).to_numpy()
            off = _lookup(
                _unit_key(
                    u[:, 0].astype(np.int64), u[:, 1].astype(np.int64)
                ),
                1,
            )
            df = df.with_columns(_cum=pl.col("_cum") + pl.Series("_off", off))
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
        return out.select([id_col, group_col, weight_col]).to_arrow().cast(out_schema)

    shuffled = (
        compact.map_batches(route_shuffle, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_BUCKET)
        .map_groups(cut, batch_format="pyarrow")
    )
    if not big_bounds:
        return shuffled
    kept = compact.map_batches(
        keep_all_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return shuffled.union(kept)
