"""Distributed equi-join as a Ray-Data-native sort-shuffle bucketed join.

Ray's own ``Dataset.join`` / hash-shuffle machinery deadlocks local
sessions NONDETERMINISTICALLY in this Ray version: 2 CPUs hang every
time (pinned by tests/test_upstream_shuffle.py); 4-16 CPUs were observed
hanging in rounds 1-2 and completing in round 3 under identical configs
(load-dependent — `tools/probe_hash_shuffle.py`).  An intermittent
deadlock is not shippable, so the engine provides the join shape the
instructions call "bucket by key hash when you must co-locate":

1. both sides are padded to one unified schema, tagged with their side, and
   given a ``key-hash % num_buckets`` bucket column (vectorized);
2. one ``groupby(bucket)`` co-locates matching keys (a sort shuffle — the
   only wide op);
3. within each bucket the actual join runs vectorized in polars.

Scale contract: one bucket's rows must fit in a reduce task.
``num_buckets=None`` (default) auto-sizes the fanout from the input row
counts to target ~2M combined rows per reduce task
(:func:`_resolve_join_buckets`); pass an explicit value to override.
Skewed hot keys spread across buckets only if they differ in key — a
single degenerate key lands in one bucket; pre-aggregate such keys first,
or for range joins use ``bin_width`` salting.

Prefer a broadcast lookup (``ray.put`` + ``pyarrow.compute.is_in`` /
dict-join inside ``map_batches``) when one side fits in memory — see the
bloom-semijoin driver query; this operator is for two genuinely large
sides.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from rayhll.functions.hashing import hash64_table

_SIDE_COL = "_join_side"
_BUCKET_COL = "_join_bkt"
_RJ_BIN_COL = "_rj_bin"

_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def _floor_bins(vals: np.ndarray, width) -> np.ndarray:
    """floor(vals / width) as int64, exact for integer/temporal inputs.

    Temporal numpy arrays (datetime64) are viewed as their int64 tick count
    (so ``width`` is in the column's native unit, e.g. microseconds for
    ``timestamp[us]``); float inputs use ``np.floor`` so negatives bin
    toward -inf on both paths."""
    if vals.dtype.kind in ("M", "m"):
        vals = vals.view("int64")
    if vals.dtype.kind in ("i", "u"):
        return np.floor_divide(vals.astype(np.int64), np.int64(width))
    return np.floor(vals.astype(np.float64) / float(width)).astype(np.int64)

_HOWS = ("inner", "left", "right", "full", "semi", "anti")

# fanout sizing target lives in rayhll.functions.partitioning


def _resolve_join_buckets(left, right, num_buckets) -> int:
    """Co-locating bucket fanout for the shuffle joins.

    Explicit ``num_buckets`` wins.  ``None`` auto-sizes from the two inputs'
    METADATA row counts so each ``groupby(bucket).map_groups`` task sees
    roughly ``partitioning.TARGET_ROWS_PER_TASK`` combined rows — a fixed
    default caps reduce parallelism and OOMs tasks at 100-TB inputs.
    Transformed inputs have no metadata count and fall back to 64 (never
    execute a plan to size a fanout); pass ``num_buckets`` explicitly
    there.  Power of two in [64, 2^20]; results are invariant to the
    choice (pinned by tests)."""
    from rayhll.functions.partitioning import buckets_for_rows

    if num_buckets is not None:
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        return int(num_buckets)
    try:
        n = (left._meta_count() or 0) + (right._meta_count() or 0)
    except Exception:
        return 64
    if not n:
        return 64
    return buckets_for_rows(n)


def bucket_equi_join(
    left,
    right,
    on: list[str] | str,
    how: str = "inner",
    num_buckets: int | None = None,
    suffix: str = "_right",
):
    """Join two Datasets on equal ``on`` columns.

    ``how``: ``inner`` | ``left`` (keep unmatched left rows with nulls) |
    ``right`` (keep unmatched right rows) | ``full`` (keep unmatched rows
    of both sides; key columns coalesced) | ``semi`` (left rows with a
    match, left columns only) | ``anti`` (left rows without a match).
    Right-side non-key columns colliding with left names get ``suffix``.

    NULL keys never match (SQL semantics) but unmatched null-key rows are
    kept by the outer variants; all null-key rows co-locate in one bucket,
    so filter them pre-join if nulls dominate a side.
    """
    if isinstance(on, str):
        on = [on]
    if how not in _HOWS:
        raise ValueError(f"how={how!r} not in {_HOWS}")
    num_buckets = _resolve_join_buckets(left, right, num_buckets)

    left_schema = left.schema()
    right_schema = right.schema()
    left_fields = list(zip(left_schema.names, left_schema.types))
    for k in on:
        if k not in left_schema.names or k not in right_schema.names:
            raise ValueError(f"join key {k!r} missing from a side")

    # unified schema: all left fields, then right non-key fields (renamed on
    # collision).  rename map applied to the right side before padding.
    right_out: list[tuple[str, str, object]] = []  # (src, dst, type)
    for name, typ in zip(right_schema.names, right_schema.types):
        if name in on:
            continue
        dst = name + suffix if name in left_schema.names else name
        if dst in left_schema.names:
            raise ValueError(
                f"suffixed right column {dst!r} collides with a left column; "
                "rename one side or choose another suffix"
            )
        right_out.append((name, dst, typ))
    unified = left_fields + [(dst, typ) for _, dst, typ in right_out]

    def pad(tbl: pa.Table, is_right: bool) -> pa.Table:
        n = len(tbl)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for name, typ in unified:
            if not is_right and name in tbl.column_names:
                cols[name] = tbl.column(name).cast(typ)
            elif is_right:
                src = None
                if name in on:
                    src = name
                else:
                    for s, d, _ in right_out:
                        if d == name and s in tbl.column_names:
                            src = s
                            break
                cols[name] = (
                    tbl.column(src).cast(typ) if src is not None else pa.nulls(n, type=typ)
                )
            else:
                cols[name] = pa.nulls(n, type=typ)
        out = pa.table(cols)
        h = hash64_table(out, on, seed=0x10B1)
        out = out.append_column(
            _BUCKET_COL,
            pa.array((h.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)),
        )
        return out.append_column(
            _SIDE_COL, pa.array(np.full(n, is_right, dtype=bool))
        )

    tagged_left = left.map_batches(
        lambda t: pad(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    tagged_right = right.map_batches(
        lambda t: pad(t, True), batch_format="pyarrow", zero_copy_batch=True
    )

    left_names = [n for n, _ in left_fields]
    right_names = [d for _, d, _ in right_out]
    def join_bucket(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl)
        lhs = df.filter(~pl.col(_SIDE_COL)).select(left_names)
        rhs = df.filter(pl.col(_SIDE_COL)).select(on + right_names)
        if how == "full":
            out = lhs.join(rhs, on=on, how="full", coalesce=True)
        else:
            out = lhs.join(rhs, on=on, how=how)
        if how in ("semi", "anti"):
            out = out.select(left_names)
        else:
            out = out.select(left_names + right_names)
        return out.to_arrow()

    return (
        tagged_left.union(tagged_right)
        .groupby(_BUCKET_COL)
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def broadcast_join(
    left,
    small,
    on: list[str] | str,
    how: str = "inner",
    suffix: str = "_right",
    max_small_bytes: int = 4 << 30,
):
    """Shuffle-free join of a large Dataset against a SMALL side.

    The small side (a ``pyarrow.Table`` or a small Dataset, e.g. a dimension
    table) is shipped to the object store ONCE via ``ray.put`` as a polars
    frame; every map task reads it zero-shuffle (Ray caches the deserialized
    object per worker process) and joins its batch locally — the pattern the
    bucketed join's docstring recommends when one side fits in memory, now
    first-class.  No all-to-all exchange: the large side streams.

    ``how``: ``inner`` | ``left`` | ``semi`` | ``anti`` (left = the LARGE
    side).  ``right``/``full`` are not offered — tracking which small rows
    matched would need a global second pass; use :func:`bucket_equi_join`.
    NULL keys never match (SQL semantics); unmatched large-side rows
    survive ``left``.  Duplicate small-side keys cross-product per batch,
    same as SQL.
    """
    import ray

    if isinstance(on, str):
        on = [on]
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how={how!r} not in ('inner', 'left', 'semi', 'anti')")
    if isinstance(small, pa.Table):
        small_tbl = small
    else:
        small_tbl = pa.concat_tables(
            ray.get(small.to_arrow_refs()), promote_options="default"
        )
    if small_tbl.nbytes > max_small_bytes:
        raise ValueError(
            f"broadcast_join small side is {small_tbl.nbytes / 2**30:.2f} GiB "
            f"(max_small_bytes={max_small_bytes / 2**30:.2f} GiB) — every worker "
            "holds a deserialized copy; use bucket_equi_join for two large sides "
            "or raise max_small_bytes knowingly"
        )
    left_schema = left.schema()
    for k in on:
        if k not in left_schema.names or k not in small_tbl.column_names:
            raise ValueError(f"join key {k!r} missing from a side")
    # Unify key dtypes up front (bucket_equi_join casts both sides to one
    # schema; here the large side streams untouched, so cast the small side
    # to the left schema's key types) — otherwise an int32-vs-int64 mismatch
    # surfaces as an opaque polars SchemaError inside distributed map tasks.
    for k in on:
        lt = left_schema.types[left_schema.names.index(k)]
        st = small_tbl.schema.field(k).type
        if st != lt:
            try:
                idx = small_tbl.column_names.index(k)
                small_tbl = small_tbl.set_column(
                    idx, pa.field(k, lt), small_tbl.column(k).cast(lt)
                )
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                raise ValueError(
                    f"broadcast_join key {k!r} dtype mismatch: left is {lt}, "
                    f"small side is {st} and cannot be cast losslessly ({e})"
                ) from None
    rename = {}
    for name in small_tbl.column_names:
        if name in on:
            continue
        if name in left_schema.names:
            dst = name + suffix
            if dst in left_schema.names:
                raise ValueError(
                    f"suffixed right column {dst!r} collides with a left column; "
                    "rename one side or choose another suffix"
                )
            rename[name] = dst
    if rename:
        small_tbl = small_tbl.rename_columns(
            [rename.get(n, n) for n in small_tbl.column_names]
        )
    small_ref = ray.put(pl.from_arrow(small_tbl))
    left_names = list(left_schema.names)
    right_names = [n for n in small_tbl.column_names if n not in on]

    def join_batch(batch: pa.Table) -> pa.Table:
        sm = ray.get(small_ref)  # per-worker deserialization cache
        lhs = pl.from_arrow(batch)
        out = lhs.join(sm, on=on, how=how)
        if how in ("semi", "anti"):
            out = out.select(left_names)
        else:
            out = out.select(left_names + right_names)
        return out.to_arrow()

    return left.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


def range_join(
    left,
    right,
    by: list[str] | str,
    on: str,
    lo: str,
    hi: str,
    num_buckets: int | None = None,
    suffix: str = "_right",
    bin_width=None,
    max_replication: float = 64.0,
):
    """Range (interval) join: left row matches right rows with equal ``by``
    keys and ``right[lo] <= left[on] <= right[hi]`` — inner-join semantics,
    the third of the custom-operator trio (as-of / range / windowed).

    Same bucketing scaffold as :func:`bucket_equi_join`; within a bucket the
    inequality join runs via polars ``join_where``.  A key whose intervals
    overlap many rows produces the true cross product (inherent to range
    joins).  Partitioning assumption (default path): one ``by``-hash bucket
    per reduce task.

    ``bin_width`` (hot-key salting): when set, the ``on`` domain is cut into
    bins of that width (native column units — e.g. microseconds for
    ``timestamp[us]``); each left row goes to its single bin, each right
    interval is replicated to every bin it overlaps, and the co-locating
    bucket hashes ``(by, bin)`` — so one degenerate hot key spreads across
    ``min(num_buckets, domain/bin_width)`` reduce tasks instead of one
    mega-task.  An in-bucket bin-equality predicate keeps every matched pair
    exactly-once (a left row lives in exactly one bin and only meets the
    replica for that bin), so the result set is identical to the unsalted
    path — pinned by tests.  Cost: right rows replicate by
    ``interval_width / bin_width``; pick ``bin_width`` near the typical
    interval width (~1-2 replicas/row).  A batch whose MEAN replication
    factor exceeds ``max_replication`` raises instead of silently
    exploding the exchange (a too-fine ``bin_width`` multiplies shuffle
    payload; widen the bins).  Rows with a null ``on``/``lo``/``hi`` can
    never satisfy the inequalities and are dropped at the map stage on
    this path."""
    if isinstance(by, str):
        by = [by]
    num_buckets = _resolve_join_buckets(left, right, num_buckets)
    left_schema = left.schema()
    right_schema = right.schema()
    for k in [*by, on]:
        if k not in left_schema.names:
            raise ValueError(f"column {k!r} missing from left")
    for k in [*by, lo, hi]:
        if k not in right_schema.names:
            raise ValueError(f"column {k!r} missing from right")
    left_fields = list(zip(left_schema.names, left_schema.types))
    right_out: list[tuple[str, str, object]] = []
    for name, typ in zip(right_schema.names, right_schema.types):
        if name in by:
            continue
        dst = name + suffix if name in left_schema.names else name
        if dst in left_schema.names:
            raise ValueError(
                f"suffixed right column {dst!r} collides with a left column; "
                "rename one side or choose another suffix"
            )
        right_out.append((name, dst, typ))
    unified = left_fields + [(dst, typ) for _, dst, typ in right_out]
    lo_dst = lo + suffix if lo in left_schema.names else lo
    hi_dst = hi + suffix if hi in left_schema.names else hi

    def pad(tbl: pa.Table, is_right: bool) -> pa.Table:
        n = len(tbl)
        cols: dict[str, object] = {}
        for name, typ in unified:
            if not is_right and name in tbl.column_names:
                cols[name] = tbl.column(name).cast(typ)
            elif is_right:
                src = None
                if name in by:
                    src = name
                else:
                    for s, d, _ in right_out:
                        if d == name and s in tbl.column_names:
                            src = s
                            break
                cols[name] = (
                    tbl.column(src).cast(typ) if src is not None else pa.nulls(n, type=typ)
                )
            else:
                cols[name] = pa.nulls(n, type=typ)
        out = pa.table(cols)
        if bin_width is not None:
            if is_right:
                # Drop rows with null lo/hi BEFORE to_numpy: a null bound can
                # never satisfy `on >= lo AND on <= hi`, and converting a
                # nullable int column yields float64 (NaN-filled), which
                # mis-bins values >= 2^53 (same class as the asof_join fix).
                valid_arr = pc.and_(
                    pc.is_valid(out.column(lo_dst)), pc.is_valid(out.column(hi_dst))
                )
                out = out.filter(valid_arr)
                lo_np = out.column(lo_dst).combine_chunks().to_numpy(zero_copy_only=False)
                hi_np = out.column(hi_dst).combine_chunks().to_numpy(zero_copy_only=False)
                b0 = _floor_bins(lo_np, bin_width)
                b1 = _floor_bins(hi_np, bin_width)
                counts = np.maximum(b1 - b0 + 1, 0)
                n_valid = len(out)
                if n_valid and counts.sum() > max_replication * n_valid:
                    raise ValueError(
                        f"range_join bin_width={bin_width} replicates intervals "
                        f"{counts.sum() / n_valid:.1f}x on average "
                        f"(max_replication={max_replication}); widen bin_width "
                        "toward the typical interval width"
                    )
                idx = np.repeat(np.arange(len(out), dtype=np.int64), counts)
                starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                bins = b0[idx] + (np.arange(len(idx), dtype=np.int64) - starts[idx])
                out = out.take(idx)
            else:
                on_valid = ~pc.is_null(out.column(on)).to_numpy(zero_copy_only=False)
                out = out.filter(pa.array(on_valid))
                on_np = out.column(on).combine_chunks().to_numpy(zero_copy_only=False)
                bins = _floor_bins(on_np, bin_width)
            out = out.append_column(_RJ_BIN_COL, pa.array(bins, type=pa.int64()))
        m = len(out)
        h = hash64_table(out, by, seed=0x7A27)
        hv = h.view(np.uint64)
        if bin_width is not None:
            hv = hv ^ (bins.view(np.uint64) * _GOLDEN64)
        out = out.append_column(
            _BUCKET_COL,
            pa.array((hv % np.uint64(num_buckets)).astype(np.int64)),
        )
        return out.append_column(_SIDE_COL, pa.array(np.full(m, is_right, dtype=bool)))

    tagged_left = left.map_batches(
        lambda t: pad(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    tagged_right = right.map_batches(
        lambda t: pad(t, True), batch_format="pyarrow", zero_copy_batch=True
    )

    left_names = [n for n, _ in left_fields]
    right_names = [d for _, d, _ in right_out]

    def join_bucket(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl)
        extra = [_RJ_BIN_COL] if bin_width is not None else []
        lhs = df.filter(~pl.col(_SIDE_COL)).select(left_names + extra)
        rhs = df.filter(pl.col(_SIDE_COL)).select([*by, *right_names, *extra])
        preds = [pl.col(b) == pl.col(f"{b}{suffix}") for b in by]
        preds += [pl.col(on) >= pl.col(lo_dst), pl.col(on) <= pl.col(hi_dst)]
        if bin_width is not None:
            # exactly-once guard: a replica only matches left rows of its bin
            preds.append(pl.col(_RJ_BIN_COL) == pl.col(_RJ_BIN_COL + suffix))
        out = lhs.join_where(rhs, *preds, suffix=suffix)
        return out.select(left_names + right_names).to_arrow()

    return (
        tagged_left.union(tagged_right)
        .groupby(_BUCKET_COL)
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def asof_join(
    left,
    right,
    on: str,
    by: list[str] | str,
    strategy: str = "backward",
    num_buckets: int | None = None,
    suffix: str = "_right",
    tolerance=None,
    bin_width=None,
):
    """As-of join: each left row is matched to the right row with the same
    ``by`` keys and the nearest ``on`` value at-or-before it (``backward``,
    the default), at-or-after (``forward``), or closest (``nearest``) —
    the time-series join Ray Data lacks (custom-operator case (a) of the
    build instructions: map_batches + groupby + in-bucket kernel).

    Left rows without a match keep nulls (left-join semantics, matching
    DuckDB's ``ASOF LEFT JOIN``).  ``on`` must exist in BOTH sides with a
    comparable type; right non-key columns colliding with left names get
    ``suffix``.  Partitioning assumption (default path): all rows of one
    ``by``-hash bucket fit in one reduce task (same contract as session
    windows); raise ``num_buckets`` to shrink buckets.

    ``bin_width`` (hot-key salting, same idea as :func:`range_join`):
    requires a NUMERIC ``tolerance`` (both in the ``on`` column's native
    ticks, e.g. microseconds for ``timestamp[us]``) with
    ``bin_width >= tolerance``.  Each left row goes to its single
    ``on``-bin; each right row replicates to the 2 (backward/forward) or
    3 (nearest) neighboring bins that any tolerance-window can reach, and
    the co-locating bucket hashes ``(by, bin)`` — a hot key spreads across
    the fanout while every left row still sees its true nearest match
    (the tolerance bound guarantees the match lies in the same or adjacent
    bin).  Each left row lives in exactly one bin, so output rows stay
    exactly-once; results are identical to the unsalted path (pinned by
    tests).  Null-``on`` right rows can never match and are dropped on
    this path; null-``on`` left rows survive with null right columns.

    When to salt: unlike the range join (quadratic in-bucket blowup), the
    in-bucket as-of kernel is O(n log n), so a hot key is a MEMORY problem,
    not a CPU one — measured single-node, salting costs ~2.7x wall
    (replication + finer groupby; PERF_NOTES #21).  Salt only when one
    key's rows exceed a reduce task's memory budget; otherwise leave
    ``bin_width`` unset."""
    if isinstance(by, str):
        by = [by]
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(f"strategy={strategy!r}")
    if bin_width is not None:
        if not isinstance(tolerance, (int, float)) or tolerance <= 0:
            raise ValueError(
                "salted asof_join (bin_width set) requires a positive numeric "
                "tolerance in the on column's native ticks"
            )
        if bin_width < tolerance:
            raise ValueError(
                f"bin_width={bin_width} must be >= tolerance={tolerance} "
                "(a match may otherwise live beyond the adjacent bin)"
            )
    num_buckets = _resolve_join_buckets(left, right, num_buckets)
    _bin_offsets = {"backward": (0, 1), "forward": (-1, 0), "nearest": (-1, 0, 1)}[
        strategy
    ]

    left_schema = left.schema()
    right_schema = right.schema()
    for k in [*by, on]:
        if k not in left_schema.names or k not in right_schema.names:
            raise ValueError(f"as-of column {k!r} missing from a side")
    left_fields = list(zip(left_schema.names, left_schema.types))
    right_out: list[tuple[str, str, object]] = []
    for name, typ in zip(right_schema.names, right_schema.types):
        if name in by or name == on:
            continue
        dst = name + suffix if name in left_schema.names else name
        if dst in left_schema.names:
            raise ValueError(
                f"suffixed right column {dst!r} collides with a left column; "
                "rename one side or choose another suffix"
            )
        right_out.append((name, dst, typ))
    unified = left_fields + [(dst, typ) for _, dst, typ in right_out]

    def pad(tbl: pa.Table, is_right: bool) -> pa.Table:
        n = len(tbl)
        cols: dict[str, object] = {}
        for name, typ in unified:
            if not is_right and name in tbl.column_names:
                cols[name] = tbl.column(name).cast(typ)
            elif is_right:
                src = None
                if name in by or name == on:
                    src = name
                else:
                    for s, d, _ in right_out:
                        if d == name and s in tbl.column_names:
                            src = s
                            break
                cols[name] = (
                    tbl.column(src).cast(typ) if src is not None else pa.nulls(n, type=typ)
                )
            else:
                cols[name] = pa.nulls(n, type=typ)
        out = pa.table(cols)
        if bin_width is not None:
            if is_right:
                valid = ~pc.is_null(out.column(on)).to_numpy(zero_copy_only=False)
                out = out.filter(pa.array(valid))
                vals = out.column(on).combine_chunks().to_numpy(zero_copy_only=False)
                fb = _floor_bins(vals, bin_width)
                idx = np.repeat(
                    np.arange(len(out), dtype=np.int64), len(_bin_offsets)
                )
                bins = (fb[:, None] + np.array(_bin_offsets, dtype=np.int64)).ravel()
                out = out.take(idx)
            else:
                col = out.column(on).combine_chunks()
                null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
                if null_mask.any():
                    # fill first so integer columns stay integer through
                    # to_numpy (a null-driven float64 round-trip would
                    # mis-bin values >= 2^53)
                    col = pc.fill_null(col, pa.scalar(0).cast(col.type))
                vals = col.to_numpy(zero_copy_only=False)
                bins = _floor_bins(vals, bin_width)
                bins[null_mask] = 0  # null-on left rows: any bucket, no match
            out = out.append_column(_RJ_BIN_COL, pa.array(bins, type=pa.int64()))
        m = len(out)
        h = hash64_table(out, by, seed=0xA50F)
        hv = h.view(np.uint64)
        if bin_width is not None:
            hv = hv ^ (bins.view(np.uint64) * _GOLDEN64)
        out = out.append_column(
            _BUCKET_COL,
            pa.array((hv % np.uint64(num_buckets)).astype(np.int64)),
        )
        return out.append_column(_SIDE_COL, pa.array(np.full(m, is_right, dtype=bool)))

    tagged_left = left.map_batches(
        lambda t: pad(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    tagged_right = right.map_batches(
        lambda t: pad(t, True), batch_format="pyarrow", zero_copy_batch=True
    )

    left_names = [n for n, _ in left_fields]
    right_names = [d for _, d, _ in right_out]

    def join_bucket(tbl: pa.Table) -> pa.Table:
        import datetime
        import warnings

        df = pl.from_arrow(tbl)
        lhs = df.filter(~pl.col(_SIDE_COL)).select(left_names).sort(on)
        rhs = df.filter(pl.col(_SIDE_COL)).select([*by, on, *right_names]).sort(on)
        tol = tolerance
        if isinstance(tol, (int, float)) and isinstance(df.schema[on], pl.Datetime):
            # numeric tolerances are in native ticks; polars wants a duration
            unit = df.schema[on].time_unit
            us = float(tol) / (1000.0 if unit == "ns" else 1.0)
            us = us * 1000.0 if unit == "ms" else us
            tol = datetime.timedelta(microseconds=us)
        with warnings.catch_warnings():
            # both frames ARE sorted on `on` (two lines up); polars just
            # can't verify per-`by`-group sortedness and warns
            warnings.simplefilter("ignore", UserWarning)
            out = lhs.join_asof(
                rhs, on=on, by=by, strategy=strategy, tolerance=tol
            )
        return out.select(left_names + right_names).to_arrow()

    return (
        tagged_left.union(tagged_right)
        .groupby(_BUCKET_COL)
        .map_groups(join_bucket, batch_format="pyarrow")
    )
