"""Deterministic global-shuffle manifest: every row's position in a
seeded random permutation of the corpus, as metadata — ``(doc_id, rank,
shard, pos)`` where ``rank`` is the row's index in the permutation,
``shard = rank % num_shards`` and ``pos = rank // num_shards``.  A
training loader reads shard files round-robin and gets the exact global
permutation without any data ever moving: epoch shuffling becomes a
manifest join (new seed = new manifest), reproducible across reruns,
resumable mid-epoch at any (shard, pos).

The permutation key is the first 8 bytes (big-endian) of
``sha256(f"{id}:{seed}")`` with ``(key, id)`` lexicographic order — sha256
so the DuckDB oracle can mirror the EXACT permutation
(``ORDER BY substring(sha256(id || ':' || seed), 1, 16), id``; the first
16 hex chars order identically to the uint64 key, and the id tie-break
pins the ~2^-65-probability key-collision case both sides).  The per-row
sha256 runs over the tiny id string only — the same documented hashlib
exception as :func:`rayhll.functions.hashing.sha256_hex`, NOT a per-row
loop over content.

Global rank is a sequential recurrence, solved with the same two-pass
range prefix as :func:`rayhll.pipelines.packing.pack_sequences`: ONE
projection to compact ``(id, key)`` rows, a bounded boundary sample over
the KEY space (uniform by construction — sha256 output — so sampled
quantiles split evenly), exact per-range counts + a driver exclusive
prefix, then ONE key-range-co-located exchange where each range sorts
locally and adds its offset.  No task ever holds the corpus; nothing
text-sized moves at all.

Input contract: ``id_col`` is UNIQUE and non-null; for the SQL mirror to
hold it must render identically via ``str(id)`` and ``CAST(id AS
VARCHAR)`` (integer ids do).

reference: no counterpart in /root/reference (python-hll is sketch-only);
builder-brief training-data-pipeline requirement (epoch shuffling).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

__all__ = ["shuffle_manifest", "write_shards"]


def shuffle_manifest(
    ds,
    id_col: str = "doc_id",
    seed: int = 0,
    num_shards: int = 64,
    target_rows_per_range: int = 1_000_000,
    max_ranges: int = 4096,
    stats_out: dict | None = None,
):
    """Seeded permutation manifest: ``(id_col, rank, shard, pos)`` rows.

    ``rank`` ∈ [0, n) is the row's position in the permutation induced by
    the seeded hash key; ``shard``/``pos`` lay the permutation out
    round-robin across ``num_shards`` shard files.  All-integer output —
    the driver oracle gates it hash-exactly."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    suffix = f":{int(seed)}"

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        keys = np.empty(len(ids), dtype=np.uint64)
        for i, v in enumerate(ids.to_pylist()):
            s = v if isinstance(v, str) else str(v)
            keys[i] = int.from_bytes(
                hashlib.sha256((s + suffix).encode()).digest()[:8], "big"
            )
        return pa.table({id_col: ids, "_k": pa.array(keys, type=pa.uint64())})

    proj = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    total_rows = proj.count()
    if total_rows == 0:
        return proj.map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    "rank": pa.array([], type=pa.int64()),
                    "shard": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    num_ranges = int(min(max_ranges, max(1, -(-total_rows // target_rows_per_range))))

    # bounded boundary sample over the KEY space: <= 64 keys per block
    def sample_keys(batch: pa.Table) -> pa.Table:
        k = batch.column("_k").to_numpy()
        stride = max(1, len(k) // 64)
        return pa.table({"_k": pa.array(k[::stride], type=pa.uint64())})

    sampled = np.sort(
        proj.map_batches(sample_keys, batch_format="pyarrow", batch_size=None)
        .to_pandas()["_k"]
        .to_numpy()
        .astype(np.uint64)
    )
    if num_ranges > 1:
        qpos = (np.arange(1, num_ranges) * len(sampled)) // num_ranges
        bounds = np.unique(sampled[qpos])  # range r = keys in [bounds[r-1], bounds[r])
    else:
        bounds = np.empty(0, dtype=np.uint64)
    n_ranges = len(bounds) + 1

    def range_counts(batch: pa.Table) -> pa.Table:
        k = batch.column("_k").to_numpy()
        r = np.searchsorted(bounds, k, side="right")
        counts = np.bincount(r, minlength=n_ranges).astype(np.int64)
        return pa.table(
            {
                "_r": pa.array(np.arange(n_ranges, dtype=np.int64)),
                "_count": pa.array(counts, type=pa.int64()),
            }
        )

    per_block = proj.map_batches(range_counts, batch_format="pyarrow", batch_size=None).to_pandas()
    range_totals = np.zeros(n_ranges, dtype=np.int64)
    np.add.at(range_totals, per_block["_r"].to_numpy(), per_block["_count"].to_numpy())
    offsets = np.concatenate(([0], np.cumsum(range_totals)[:-1]))
    if stats_out is not None:
        stats_out["n_ranges"] = n_ranges
        stats_out["range_totals"] = range_totals.tolist()

    def attach_range(batch: pa.Table) -> pa.Table:
        k = batch.column("_k").to_numpy()
        r = np.searchsorted(bounds, k, side="right").astype(np.int64)
        return batch.append_column("_r", pa.array(r, type=pa.int64()))

    def rank_range(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        k = tbl.column("_k").to_numpy()
        r = int(tbl.column("_r")[0].as_py())
        order = np.lexsort((ids, k))
        rank = int(offsets[r]) + np.arange(len(k), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "rank": pa.array(rank, type=pa.int64()),
                "shard": pa.array(rank % num_shards, type=pa.int64()),
                "pos": pa.array(rank // num_shards, type=pa.int64()),
            }
        )

    return (
        proj.map_batches(attach_range, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_r")
        .map_groups(rank_range, batch_format="pyarrow")
    )


def write_shards(
    ds,
    manifest,
    out_dir: str,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
):
    """Apply a :func:`shuffle_manifest` to the corpus and write ONE
    parquet file per shard, rows in exact permutation (``pos``) order —
    the resumable training-shard layout: a loader streams
    ``shard-NNNN.parquet`` files round-robin and sees the global seeded
    permutation; a crashed writer rerun skips finished shards (the
    ``shards.json`` manifest is updated atomically after each shard file
    lands, and shard files themselves are written temp-and-rename).

    Shape: ONE bucketed equi-join attaches (rank, shard, pos) to the
    corpus, then a shard-keyed groupby sorts each shard locally by
    ``pos`` and its reduce task writes the file — every shard is an
    independent task, so shard COUNT is the memory knob (one shard's
    rows incl. payloads sit in one task; size ``num_shards`` so a shard
    fits a worker, exactly how training loaders size their files).

    Returns per-shard receipt rows ``(shard, n_rows, pos_contiguous,
    first_<id>, last_<id>)`` as a Dataset — integers/booleans, so a SQL
    mirror can gate the whole layout hash-exactly."""
    import ray.data as rd

    from rayhll.functions.join import bucket_equi_join

    os.makedirs(out_dir, exist_ok=True)

    def _load_done() -> dict[int, dict]:
        # the per-shard .done.json receipts ARE the resume state: each is
        # written atomically by the worker AFTER its parquet landed, so a
        # crashed run's finished shards survive with no global state file
        # to lose
        out: dict[int, dict] = {}
        for name in os.listdir(out_dir):
            if name.endswith(".done.json"):
                with open(os.path.join(out_dir, name)) as f:
                    r = json.load(f)
                out[int(r["shard"])] = r
        return out

    def _receipt_table(done: dict[int, dict]) -> pa.Table:
        rows = [
            {
                "shard": s,
                "n_rows": v["n_rows"],
                "pos_contiguous": v["pos_contiguous"],
                f"first_{id_col}": v["first"],
                f"last_{id_col}": v["last"],
            }
            for s, v in sorted(done.items())
        ]
        return pa.Table.from_pylist(rows)

    done = _load_done()
    if done:
        # true partition resume: drop finished shards' manifest rows
        # BEFORE the join, so their corpus rows never enter the exchange.
        # The count() executes only the compact manifest projection — a
        # fully-finished rerun must not shuffle the corpus at all.
        finished = np.fromiter(sorted(done), dtype=np.int64)

        def pending_only(t: pa.Table) -> pa.Table:
            keep = ~np.isin(t.column("shard").to_numpy(), finished)
            return t.filter(pa.array(keep))

        manifest = manifest.map_batches(pending_only, batch_format="pyarrow")
        if manifest.count() == 0:
            return rd.from_arrow(_receipt_table(done))

    joined = bucket_equi_join(ds, manifest, on=id_col, num_buckets=num_buckets)

    def write_shard(tbl: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shard = int(tbl.column("shard")[0].as_py())
        pos = tbl.column("pos").to_numpy()
        order = np.argsort(pos)
        tbl = tbl.take(pa.array(order)).drop_columns(["shard"])
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        pos_sorted = pos[order]
        contiguous = bool(
            len(pos_sorted) == 0
            or (np.diff(pos_sorted) == 1).all()
        )
        ids = tbl.column(id_col)
        receipt = {
            "shard": shard,
            "n_rows": tbl.num_rows,
            "pos_contiguous": contiguous,
            "first": ids[0].as_py(),
            "last": ids[len(ids) - 1].as_py(),
        }
        rpath = os.path.join(out_dir, f"shard-{shard:05d}.done.json")
        with open(rpath + ".tmp", "w") as f:
            json.dump(receipt, f)
        os.replace(rpath + ".tmp", rpath)
        return pa.table(
            {
                "shard": pa.array([shard], type=pa.int64()),
                "n_rows": pa.array([tbl.num_rows], type=pa.int64()),
            }
        )

    # drive the writes to completion; receipts come from the .done files
    # (the only source of truth a crash can't split from the parquet)
    joined.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow"
    ).materialize()
    return rd.from_arrow(_receipt_table(_load_done()))
