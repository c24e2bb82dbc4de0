"""Sketch-table sources/sinks.

A "sketch table" is any Arrow/parquet table with one or more binary columns
of storage-spec v1.0.0 sketches (the engine's standard output shape:
``group_cols..., sketch, estimate, rows_in``).  Helpers here convert between
the binary form and the PostgreSQL ``\\x``-hex wire form so results can move
into postgresql-hll (``hll`` column type) and back, and re-finalize
estimates after external round-trips.
"""

from __future__ import annotations

import pyarrow as pa

from rayhll.core import serde


def sketches_to_hex(table: pa.Table, sketch_cols: list[str] | None = None) -> pa.Table:
    """Replace binary sketch columns with ``\\x``-prefixed hex strings."""
    sketch_cols = sketch_cols or [
        f.name for f in table.schema if pa.types.is_binary(f.type)
    ]
    for c in sketch_cols:
        hexes = [serde.to_pg_hex(b.as_py()) for b in table.column(c)]
        idx = table.schema.get_field_index(c)
        table = table.set_column(idx, c, pa.array(hexes, type=pa.string()))
    return table


def hex_to_sketches(table: pa.Table, sketch_cols: list[str]) -> pa.Table:
    """Inverse of :func:`sketches_to_hex`."""
    for c in sketch_cols:
        blobs = [serde.from_pg_hex(s.as_py()) for s in table.column(c)]
        idx = table.schema.get_field_index(c)
        table = table.set_column(idx, c, pa.array(blobs, type=pa.binary()))
    return table


def refinalize_estimates(
    table: pa.Table, sketch_col: str = "sketch", estimate_col: str = "estimate"
) -> pa.Table:
    """(Re)compute the integer estimate column from serialized sketches —
    used after reading sketch tables written by an earlier run or another
    implementation."""
    ests = [serde.from_bytes(b.as_py()).cardinality() for b in table.column(sketch_col)]
    arr = pa.array(ests, type=pa.int64())
    if estimate_col in table.column_names:
        idx = table.schema.get_field_index(estimate_col)
        return table.set_column(idx, estimate_col, arr)
    return table.append_column(estimate_col, arr)


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Format-dispatching Dataset reader: ``.parquet`` (column-pruned at the
    read — pass ``columns``), ``.csv``, ``.json``/``.jsonl`` (one object per
    line).  Non-parquet formats cannot prune at the read; the projection is
    applied as a first ``select_columns`` so downstream stages see one
    schema regardless of source format."""
    import ray.data as rd

    lower = path.lower()
    if lower.endswith(".parquet") or lower.endswith(".pq"):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if lower.endswith(".csv"):
        ds = rd.read_csv(path, **kwargs)
    elif lower.endswith(".json") or lower.endswith(".jsonl"):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported source format: {path!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds
