"""Flagship pipeline: distinct-count sketches over the source-code table.

The BASELINE north-star job: over a Parquet table ``(repo, path, commit,
lang, content)``, estimate distinct ``content``, ``path`` and ``(repo,
commit)`` — globally and per ``(repo, lang)`` group — with the per-row
``sha256(content)`` invariant emitted alongside.

Stage layout (all Ray-Data-native, streaming):

1. :class:`HashStage` — ``map_batches`` actor pool, zero-copy Arrow in/out:
   appends ``content_sha256`` (the invariant digest) and ``content_raw64``
   (first 8 digest bytes as signed int64 — the HLL raw value, so sha256 is
   computed once per row, not once per use).
2. :class:`MultiKeyBuild` — per batch, per group: three partial sketches
   (content / path / repo+commit) in one pass over the batch; emits one
   fixed-size row per (batch, group).
3. ``groupby(("repo","lang")).map_groups`` — merges partial sketches per
   group; the shuffle carries only sketch rows (~4 KiB per group per block),
   so a pathological repo costs O(#blocks) sketch rows, never O(rows).
4. finalize — integer estimates per key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayhll.core import batchbuild
from rayhll.core.serde import from_bytes
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch
from rayhll.functions import hashing
from rayhll.stages import build as build_stage

GROUP_COLS = ("repo", "lang")
KEYS = ("content", "path", "repo_commit")
SKETCH_COLS = tuple(f"sketch_{k}" for k in KEYS)
EST_COLS = tuple(f"est_distinct_{k}" for k in KEYS)


class HashStage:
    """Append ``content_sha256`` (hex) + ``content_raw64`` (int64) columns.

    Null contract: a NULL ``content`` hashes as the empty string (the
    sha256 invariant is defined over UTF-8 bytes, and the flagship treats
    null ≡ b"" — one distinct value).  This differs from the SQL-aligned
    ``ignore_nulls`` default of the generic ``ray_agg`` paths, where NULL
    keys contribute nothing; the flagship's digest column is a per-row
    invariant and must exist for every row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        texts = batch.column("content").to_pylist()
        digests = [
            hashlib.sha256(
                t.encode("utf-8", "surrogatepass") if t is not None else b""
            ).digest()
            for t in texts
        ]
        hexes = [d.hex() for d in digests]
        raw = np.frombuffer(b"".join(d[:8] for d in digests), dtype=">i8").astype(np.int64)
        batch = batch.append_column("content_sha256", pa.array(hexes, type=pa.string()))
        return batch.append_column("content_raw64", pa.array(raw, type=pa.int64()))


class MultiKeyBuild:
    """One partial-sketch row per (batch, group) with all three key sketches.

    ``content`` uses the precomputed ``content_raw64`` column when present
    (sha256-derived, the invariant hash), else the fast vectorized hash.
    """

    def __init__(
        self,
        settings: HllSettings | None = None,
        grouped: bool = True,
        num_buckets: int = 64,
    ):
        self.settings = settings or HllSettings(11, 5)
        self.grouped = grouped
        self.num_buckets = num_buckets

    def _raws(self, batch: pa.Table) -> dict[str, np.ndarray]:
        if "content_raw64" in batch.column_names:
            content_raw = batch.column("content_raw64").to_numpy()
        else:
            content_raw = hashing.hash64_table(batch, ["content"])
        return {
            "content": content_raw,
            "path": hashing.hash64_table(batch, ["path"]),
            "repo_commit": hashing.hash64_table(batch, ["repo", "commit"]),
        }

    def _sketch_row(self, raws: dict[str, np.ndarray], sel: np.ndarray | slice) -> list[bytes]:
        out = []
        for k in KEYS:
            sk = HllSketch(self.settings)
            sk.add_batch(raws[k][sel])
            out.append(sk.to_bytes())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = self._raws(batch)
        if not self.grouped:
            blobs = self._sketch_row(raws, slice(None))
            cols = {c: pa.array([b], type=pa.binary()) for c, b in zip(SKETCH_COLS, blobs)}
            cols["rows_in"] = pa.array([len(batch)], type=pa.int64())
            return pa.table(cols)
        ghash = hashing.hash64_table(batch, list(GROUP_COLS), seed=0x6E0)
        per_key = {}
        uniq = first_idx = counts = None
        for k in KEYS:
            uniq, first_idx, counts, per_key[k] = batchbuild.build_grouped_sketches(
                self.settings, ghash, raws[k]
            )
        out = batch.select(list(GROUP_COLS)).take(pa.array(first_idx))
        for k, c in zip(KEYS, SKETCH_COLS):
            out = out.append_column(c, pa.array(per_key[k], type=pa.binary()))
        out = out.append_column("rows_in", pa.array(counts, type=pa.int64()))
        out = out.append_column(build_stage.GHASH_COL, pa.array(uniq, type=pa.int64()))
        bucket = (uniq.view(np.uint64) % np.uint64(self.num_buckets)).astype(np.int64)
        return out.append_column(build_stage.BUCKET_COL, pa.array(bucket, type=pa.int64()))


def _merge_rows(table: pa.Table) -> tuple[list[HllSketch], int]:
    accs: list[HllSketch | None] = [None] * len(KEYS)
    for i, c in enumerate(SKETCH_COLS):
        for blob in table.column(c):
            sk = from_bytes(blob.as_py())
            if accs[i] is None:
                accs[i] = sk
            else:
                accs[i].union(sk)
    rows = int(pc.sum(table.column("rows_in")).as_py() or 0)
    return accs, rows


def merge_partials_block(batch: pa.Table) -> pa.Table:
    """Tree-merge step for the ungrouped variant."""
    accs, rows = _merge_rows(batch)
    cols = {
        c: pa.array([a.to_bytes() if a else b""], type=pa.binary())
        for c, a in zip(SKETCH_COLS, accs)
    }
    cols["rows_in"] = pa.array([rows], type=pa.int64())
    return pa.table(cols)


def flagship_grouped(
    ds,
    settings: HllSettings | None = None,
    batch_size: int | None = 262144,
    concurrency=None,
    include_sketches: bool = False,
    hash_content: bool = True,
    premerge_batch: int | None = None,
    num_buckets: int | None = None,
):
    """Per-(repo, lang) distinct estimates for all three keys.

    Returns a Dataset with columns ``repo, lang, est_distinct_content,
    est_distinct_path, est_distinct_repo_commit, rows_in`` (plus the three
    serialized sketch columns when ``include_sketches``).

    ``premerge_batch``: size of the local combiner stage between build and
    shuffle — partial rows sharing a group hash within each combiner batch
    merge before the sort, shrinking shuffle ROWS ~2.6× when #groups ≈
    build batch size (measured, PERF_NOTES #10) at a measured ~15-18%%
    single-node CPU cost.  ``None`` = cluster-aware AUTO: ON when the live
    Ray cluster spans multiple nodes or $RAYHLL_NETWORK_BOUND is set (the
    exchange is network-bound there, so the byte cut dominates), OFF on a
    single node where the sort is CPU-bound; ``0`` forces off — see
    ``stages.build.resolve_premerge_batch``.

    ``num_buckets`` (reduce fanout for the grouped merge) auto-sizes from
    the input's METADATA row count when ``None`` — an upper bound since the
    shuffle carries pre-aggregated rows; transformed inputs (no metadata
    count) keep the 64 floor (``functions.partitioning``)."""
    from rayhll.functions.partitioning import resolve_num_buckets

    num_buckets = resolve_num_buckets(ds, num_buckets)
    if hash_content:
        ds = ds.map_batches(
            HashStage(), batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
        )
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    if concurrency is not None:
        partials = ds.map_batches(
            MultiKeyBuild,
            fn_constructor_kwargs=dict(
                settings=settings, grouped=True, num_buckets=num_buckets
            ),
            concurrency=concurrency,
            **kwargs,
        )
    else:
        partials = ds.map_batches(
            MultiKeyBuild(settings=settings, grouped=True, num_buckets=num_buckets),
            **kwargs,
        )
    premerge_batch = build_stage.resolve_premerge_batch(premerge_batch)
    if premerge_batch:
        pre = build_stage.make_local_premerge(list(GROUP_COLS), list(SKETCH_COLS))
        partials = partials.map_batches(
            pre, batch_format="pyarrow", batch_size=premerge_batch
        )
    merger = build_stage.make_bucket_merger(
        list(GROUP_COLS),
        list(SKETCH_COLS),
        list(EST_COLS),
        include_sketch=include_sketches,
    )
    return partials.groupby(build_stage.BUCKET_COL).map_groups(
        merger, batch_format="pyarrow"
    )


def flagship_global(
    ds,
    settings: HllSettings | None = None,
    batch_size: int | None = 262144,
    hash_content: bool = True,
) -> pa.Table:
    """Global distinct estimates for the three keys; one-row Arrow table."""
    if hash_content:
        ds = ds.map_batches(
            HashStage(), batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
        )
    partials = ds.map_batches(
        MultiKeyBuild(settings=settings, grouped=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    level1 = partials.map_batches(
        merge_partials_block, batch_format="pyarrow", batch_size=4096
    )
    final = level1.repartition(1).map_batches(
        merge_partials_block, batch_format="pyarrow", batch_size=None
    )
    rows = final.take(1)
    empty = HllSketch(settings or HllSettings(11, 5))
    cols: dict[str, list] = {}
    for k, sc, ec in zip(KEYS, SKETCH_COLS, EST_COLS):
        # empty input produces b"" partial blobs — substitute an EMPTY sketch
        blob = rows[0][sc] if rows else b""
        sk = from_bytes(blob) if blob else empty
        cols[ec] = [sk.cardinality()]
    cols["rows_in"] = [rows[0]["rows_in"] if rows else 0]
    return pa.table(
        {k: pa.array(v, type=pa.int64()) for k, v in cols.items()}
    )
