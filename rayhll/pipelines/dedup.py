"""Deduplication pipelines: exact, MinHash+LSH, SimHash, embedding-cosine.

Shapes (all Ray-Data-native; the only wide ops are groupbys over compact
derived rows, never over document payloads):

* **exact**: vectorized content hash per batch → groupby hash-bucket →
  keep min-id per hash (vectorized within bucket).  The shuffle carries
  (hash, id) pairs only.
* **MinHash+LSH**: tokenize → shingle hashes → per-doc MinHash signature
  (one ragged ``reduceat`` per permutation) → band hashes → explode to
  (band, band_hash, doc_id) rows → groupby band bucket → candidate pairs →
  signature-verified Jaccard ≥ threshold.
* **SimHash**: 64-bit simhash per doc (sign-sum of token-hash bits) →
  4×16-bit chunk bucketing (pigeonhole: hamming ≤ 3 ⇒ some chunk equal) →
  verify hamming within buckets.
* **embedding**: random-hyperplane simhash of normalized vectors → bucket →
  exact cosine verify within buckets (the scale path for all-pairs near-dup;
  brute-force all-pairs is quadratic and never materialized).
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from rayhll.functions.hashing import hash64_table, splitmix64

logger = logging.getLogger(__name__)
from rayhll.pipelines.text import TOKEN_PATTERN
from rayhll.sketches.minhash import band_hashes, signatures_for_offsets

# ----------------------------------------------------------------------
# exact dedup


def exact_dedup_keep_ids(ds, text_col: str, id_col: str, num_buckets: int | None = None):
    """Dataset of the ids kept by exact dedup (min id per distinct text).

    Equivalent SQL: ``SELECT MIN(id) FROM t GROUP BY text``.  ``num_buckets``
    auto-sizes from the input row count when ``None``
    (``functions.partitioning``)."""
    from rayhll.functions.partitioning import resolve_num_buckets

    num_buckets = resolve_num_buckets(ds, num_buckets)

    def hash_stage(batch: pa.Table) -> pa.Table:
        h = hash64_table(batch, [text_col], seed=0xDD)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "_h": pa.array(h, type=pa.int64()),
                "_bucket": pa.array(
                    (h.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    def keep_min(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl)
        out = df.group_by("_h").agg(pl.col(id_col).min()).select([id_col])
        return out.to_arrow()

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow", zero_copy_batch=True)
    return hashed.groupby("_bucket").map_groups(keep_min, batch_format="pyarrow")


# ----------------------------------------------------------------------
# MinHash + LSH near-dup


class MinHashStage:
    """Per-batch: tokenize, shingle, MinHash-sign every document.

    Emits (id, band_0..band_{B-1}) plus the signature bytes.  Stateful
    actor-friendly: permutation seeds fixed in ``__init__``.
    """

    def __init__(
        self,
        text_col: str,
        id_col: str,
        num_perm: int = 128,
        num_bands: int = 32,
        gram: int = 3,
        emit_texthash: bool = False,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.gram = gram
        self.emit_texthash = emit_texthash

    def shingle_hashes(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(flat shingle hashes uint64, offsets int64[n+1]) for the batch."""
        df = pl.from_arrow(batch.select([self.text_col]))
        toks = df.select(
            pl.col(self.text_col).fill_null("").str.extract_all(TOKEN_PATTERN).alias("t")
        )["t"]
        lengths = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls()
        tok_h = (
            pl.DataFrame({"t": flat})
            .select(pl.col("t").hash(seed=41).alias("h"))["h"]
            .to_numpy()
            .astype(np.uint64)
        )
        g = self.gram
        rolled = tok_h.copy()
        for k in range(1, g):
            rolled = splitmix64(rolled ^ np.roll(tok_h, -k))
        valid = np.maximum(lengths - g + 1, 0)
        # short docs: use their token hashes directly as shingles
        shingle_counts = np.where(valid > 0, valid, lengths)
        tok_offsets = np.concatenate(([0], np.cumsum(lengths)))
        out_offsets = np.concatenate(([0], np.cumsum(shingle_counts)))
        total = int(shingle_counts.sum())
        flat_shingles = np.empty(total, dtype=np.uint64)
        nz = np.flatnonzero(shingle_counts)
        if len(nz):
            cnt = shingle_counts[nz]
            seg_starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            within = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(seg_starts, cnt)
            src = np.repeat(tok_offsets[nz], cnt) + within
            use_rolled = np.repeat(valid[nz] > 0, cnt)
            flat_shingles[np.repeat(out_offsets[nz], cnt) + within] = np.where(
                use_rolled, rolled[src], tok_h[src]
            )
        return flat_shingles, out_offsets

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = self.shingle_hashes(batch)
        sigs = signatures_for_offsets(flat, offsets, self.num_perm)
        bands = band_hashes(sigs, self.num_bands)
        out = {self.id_col: batch.column(self.id_col)}
        out["signature"] = pa.array(
            [s.tobytes() for s in sigs.astype("<u8")], type=pa.binary()
        )
        if self.emit_texthash:
            th = hash64_table(batch, [self.text_col], seed=0x7E47)
            out["texthash"] = pa.array(th, type=pa.int64())
        for b in range(self.num_bands):
            out[f"band_{b}"] = pa.array(bands[:, b], type=pa.int64())
        return pa.table(out)


def _sig_from_bytes(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype="<u8").astype(np.uint64)


def _binary_fixed_matrix(col, width: int, dtype: str = "<u8") -> np.ndarray:
    """Zero-copy decode of a fixed-length binary column into a
    (n, width) matrix of ``dtype`` straight from the Arrow buffers.
    Rows must all be ``width * itemsize`` bytes (signature/vector columns
    are by construction); anything else is a caller bug and raises."""
    itemsize = np.dtype(dtype).itemsize
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, width), dtype=dtype)
    # polars round-trips binary as large_binary (64-bit offsets)
    if pa.types.is_large_binary(col.type):
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
        )
    else:
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=len(col) + 1, offset=col.offset * 4
        )
    if not np.all(np.diff(offs) == width * itemsize):
        raise ValueError(
            f"expected fixed {width * itemsize}-byte binary rows; got ragged lengths"
        )
    return np.frombuffer(
        col.buffers()[2], dtype=dtype, count=len(col) * width, offset=int(offs[0])
    ).reshape(len(col), width)


def _fixed_binary_column(mat: np.ndarray) -> pa.Array:
    """(n, w) matrix -> binary column of n fixed-size row blobs (one buffer,
    no per-row bytes objects)."""
    n, w = mat.shape
    itemsize = mat.dtype.itemsize
    buf = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
    offsets = pa.array(
        np.arange(0, (n + 1) * w * itemsize, w * itemsize, dtype=np.int32),
        type=pa.int32(),
    )
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], buf]
    )


def _segment_bounds(sorted_keys: np.ndarray) -> np.ndarray:
    """Boundaries of equal-key runs in a sorted key array (incl. 0 and n)."""
    return np.concatenate(
        ([0], np.flatnonzero(np.diff(sorted_keys)) + 1, [len(sorted_keys)])
    )


#: target exploded rows per co-locating reduce task.  ~2M rows × ~0.3 KiB
#: (id + truncated signature slots) ≈ 600 MiB working set per task worst
#: case, comfortably inside a worker heap; on a cluster, more buckets only
#: add (cheap) sort keys, while too few buckets OOM the reduce tasks.
from rayhll.functions.partitioning import (  # noqa: E402 - canonical values
    TARGET_ROWS_PER_TASK,
    buckets_for_rows,
)


def _resolve_num_buckets(
    ds, num_buckets, rows_per_doc: int, approx_rows: int | None = None
) -> int:
    """Co-locating bucket fanout for the dedup groupbys.

    Explicit ``num_buckets`` wins.  ``None`` auto-sizes from the input row
    count so each ``groupby(bkt).map_groups`` reduce task sees roughly
    ``TARGET_ROWS_PER_TASK`` exploded rows (docs × rows_per_doc — bands,
    simhash chunks, or hyperplane tables), the fix for the fixed 64-way
    fanout that would OOM reduce tasks at 100-TB inputs however vectorized
    the kernel is.  Sizing uses the dataset's METADATA count only
    (``functions.partitioning``) — transformed inputs fall back to 64
    rather than executing the plan.  Result is a power of two in [64, 2^20] —
    pair sets are invariant to the choice (pinned by
    tests/test_ray_pipelines.py::test_dedup_pairs_bucket_invariance)."""
    from rayhll.functions.partitioning import resolve_num_buckets

    return resolve_num_buckets(
        ds, num_buckets, rows_per_input_row=rows_per_doc, approx_rows=approx_rows
    )


def _mod_bucket_col(values: np.ndarray, num_buckets: int) -> pa.Array:
    """int64 bucket column ``values % num_buckets`` (via the uint64 view so
    negative hash keys bucket uniformly)."""
    return pa.array(
        (values.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64),
        type=pa.int64(),
    )


def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_perm: int = 128,
    num_bands: int = 32,
    gram: int = 3,
    carry_signatures: bool = True,
    max_bucket_size: int = 1000,
    verify_text_hash: bool = False,
    sig_store_dir: str | None = None,
    sig_slot_bytes: int = 2,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
):
    """Dataset of near-duplicate pairs ``(id_a, id_b, jaccard)`` with
    ``id_a < id_b`` and signature-estimated Jaccard >= threshold.

    ``verify_text_hash=True`` (carry-signatures variant only) additionally
    requires the 64-bit text hashes to match — the LSH-prefilter + exact
    verify shape for exact dedup at ``threshold=1.0``, where all-signature
    collisions between very-high-Jaccard near-dups would otherwise surface.

    ``sig_slot_bytes`` (1, 2, 4 or 8): signature slots are truncated to this
    many low bytes wherever they cross the shuffle — slot-equality false
    positives add only ~256^-b to the Jaccard estimate (1.5e-5 at the
    2-byte default, far below the 1/num_perm estimator granularity) while
    cutting the sort payload 8/b× (measured 95% of dedup wall, PERF_NOTES
    #12-13).  Both variants truncate identically so their pair sets match.

    ``carry_signatures=True`` (default) ships each doc's signature inside its
    band rows — simplest, but duplicates ~1 KiB × num_bands per doc through
    the shuffle.  ``carry_signatures=False`` is the 100 TB shape: band rows
    carry only (band_key, id), candidate pairs are generated unverified, and
    the two signatures are joined back (bucketed tagged-union equi-join)
    for the Jaccard check — shuffle volume drops ~num_bands× on the wide leg.
    Buckets larger than ``max_bucket_size`` are skipped in both variants
    (degenerate content; quadratic pair blow-up).

    ``num_buckets`` sizes the co-locating reduce fanout (see
    ``_resolve_num_buckets``); ``None`` auto-targets ~2M exploded rows per
    reduce task, sizing from ``approx_rows`` when ``ds`` is a transformed
    dataset with no metadata count.  Pair sets are invariant to the value."""
    if sig_slot_bytes not in (1, 2, 4, 8):
        raise ValueError("sig_slot_bytes must be 1, 2, 4 or 8")
    num_buckets = _resolve_num_buckets(ds, num_buckets, num_bands, approx_rows)
    if not carry_signatures:
        if verify_text_hash:
            raise ValueError("verify_text_hash requires carry_signatures=True")
        return _minhash_lsh_pairs_join(
            ds,
            text_col,
            id_col,
            threshold,
            num_perm,
            num_bands,
            gram,
            max_bucket_size,
            sig_store_dir=sig_store_dir,
            sig_slot_bytes=sig_slot_bytes,
            num_buckets=num_buckets,
        )
    if sig_store_dir is not None:
        raise ValueError("sig_store_dir requires carry_signatures=False")
    stage = MinHashStage(
        text_col, id_col, num_perm, num_bands, gram, emit_texthash=verify_text_hash
    )
    signed = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
    slot_dtype = f"<u{sig_slot_bytes}"

    # explode to one (band_key, id, truncated signature[, texthash]) row per
    # band — the shuffle payload is num_perm * sig_slot_bytes per row
    def explode_bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch.column(id_col)
        sig_mat = _binary_fixed_matrix(batch.column("signature"), num_perm)
        sig = _fixed_binary_column(sig_mat.astype(slot_dtype))
        keys = []
        for b in range(num_bands):
            bh = batch.column(f"band_{b}").to_numpy()
            # band id folded into the key so different bands never collide
            keys.append(splitmix64(bh.view(np.uint64) ^ np.uint64(b + 1)).view(np.int64))
        band_key = np.concatenate(keys)

        def tiled(col):
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return pa.concat_arrays([col] * num_bands)

        cols = {
            "band_key": pa.array(band_key, type=pa.int64()),
            # co-locating bucket: many band keys per reduce task
            "bkt": _mod_bucket_col(band_key, num_buckets),
            id_col: tiled(ids),
            "signature": tiled(sig),
        }
        if verify_text_hash:
            cols["texthash"] = tiled(batch.column("texthash"))
        return pa.table(cols)

    exploded = signed.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        # vectorized bucket segmentation: one lexsort over the whole task's
        # rows; the Python loop below runs only over multi-member band
        # buckets (near-dup clusters + rare collisions), never the millions
        # of singleton buckets (PERF_NOTES #12)
        keys = tbl.column("band_key").to_numpy()
        all_ids = tbl.column(id_col).to_numpy()
        sig_mat = _binary_fixed_matrix(tbl.column("signature"), num_perm, slot_dtype)
        all_th = tbl.column("texthash").to_numpy() if verify_text_hash else None
        order = np.lexsort((all_ids, keys))
        k_sorted = keys[order]
        bounds = _segment_bounds(k_sorted)
        sizes = np.diff(bounds)
        cand = np.flatnonzero((sizes >= 2) & (sizes <= max_bucket_size))
        a_ids, b_ids, jac = [], [], []
        for s in cand.tolist():
            sel = order[bounds[s] : bounds[s + 1]]
            ids = all_ids[sel]
            uniq_ids, first = np.unique(ids, return_index=True)
            if len(uniq_ids) < 2:
                continue
            sigs = sig_mat[sel[first]]
            th = all_th[sel[first]] if all_th is not None else None
            for i in range(len(uniq_ids) - 1):
                eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                hit = eq >= threshold
                if th is not None:
                    hit &= th[i + 1 :] == th[i]
                hit = np.flatnonzero(hit)
                for j in hit:
                    a_ids.append(int(uniq_ids[i]))
                    b_ids.append(int(uniq_ids[i + 1 + j]))
                    jac.append(float(eq[j]))
        return pa.table(
            {
                "id_a": pa.array(a_ids, type=pa.int64()),
                "id_b": pa.array(b_ids, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )

    pairs = exploded.groupby("bkt").map_groups(bucket_pairs, batch_format="pyarrow")

    # distinct pairs (a pair can surface from several bands)
    def add_pair_bucket(tbl: pa.Table) -> pa.Table:
        a = tbl.column("id_a").to_numpy()
        return tbl.append_column("pbkt", _mod_bucket_col(a, num_buckets))

    def dedup_pairs(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl)
            .unique(subset=["id_a", "id_b"])
            .select(["id_a", "id_b", "jaccard"])
            .to_arrow()
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )


def _make_candidate_pairs_fn(key_col: str, id_col: str, max_bucket_size: int):
    """Unverified candidate-pair kernel for the id-only (join) dedup
    variants: ONE lexsort segments the task's rows into equal-key buckets;
    the Python loop runs only over multi-member segments, never the
    millions of singleton buckets (PERF_NOTES #12 convention)."""

    def candidate_pairs(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).to_numpy()
        all_ids = tbl.column(id_col).to_numpy()
        order = np.lexsort((all_ids, keys))
        k_sorted = keys[order]
        bounds = _segment_bounds(k_sorted)
        sizes = np.diff(bounds)
        cand_segs = np.flatnonzero((sizes >= 2) & (sizes <= max_bucket_size))
        a_ids, b_ids = [], []
        for s in cand_segs.tolist():
            ids = np.unique(all_ids[order[bounds[s] : bounds[s + 1]]])
            if len(ids) < 2 or len(ids) > max_bucket_size:
                continue
            iu = np.triu_indices(len(ids), k=1)
            a_ids.append(ids[iu[0]])
            b_ids.append(ids[iu[1]])
        if not a_ids:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_ids), type=pa.int64()),
                "id_b": pa.array(np.concatenate(b_ids), type=pa.int64()),
            }
        )

    return candidate_pairs


def _write_or_validate_sig_store(signed, sig_store_dir: str, manifest: dict) -> None:
    """Write ``signed`` as a parquet signature store with ``manifest``, or —
    when the store already exists — validate its ``_MANIFEST.json`` against
    the parameters that determine signature CONTENT and reuse it (the
    signing pass is the expensive leg).  Any mismatch (including
    ``format_version``, which covers the hashing scheme itself) raises
    instead of producing silently wrong candidate pairs."""
    import glob as _glob
    import json
    import os

    manifest_path = os.path.join(sig_store_dir, "_MANIFEST.json")
    if not _glob.glob(os.path.join(sig_store_dir, "*.parquet")):
        signed.write_parquet(sig_store_dir)
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)
    else:
        try:
            with open(manifest_path) as f:
                found = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"signature store {sig_store_dir} has no _MANIFEST.json "
                "(pre-manifest store?) — delete the directory to rebuild"
            ) from None
        if found != manifest:
            raise ValueError(
                f"signature store {sig_store_dir} was built with "
                f"{found}, but this run needs {manifest} — delete the "
                "directory to rebuild (reusing it would produce silently "
                "wrong candidate pairs)"
            )


def build_minhash_sig_store(
    signed,
    sig_store_dir: str,
    text_col: str,
    id_col: str,
    num_perm: int,
    num_bands: int,
    gram: int,
    texthash: bool = False,
) -> None:
    """Write (or validate and reuse) the MinHash parquet signature store
    (``signed`` = MinHashStage output) — see
    :func:`_write_or_validate_sig_store` for the reuse contract.
    ``texthash=True`` marks a store whose rows also carry the 64-bit text
    hash (``MinHashStage(emit_texthash=True)``) for exact-dedup
    verification; the manifest keys the flag so a store without the column
    is never silently reused by a run that needs it."""
    from rayhll.sketches.base import Sketch

    manifest = {
        "format_version": Sketch.format_version,
        "num_perm": num_perm,
        "num_bands": num_bands,
        "gram": gram,
        "text_col": text_col,
        "id_col": id_col,
    }
    if texthash:
        manifest["texthash"] = True
    _write_or_validate_sig_store(signed, sig_store_dir, manifest)


#: max distinct candidate-pair member ids the verify-join prefilter will
#: broadcast (int64 ids: ~256 MiB at this value).  Above it the prefilter
#: is skipped — the bucketed join stays exact, it just pays the full
#: payload-side shuffle; a candidate set that dense means near-everything
#: is a dup and semi-filtering would not shrink the payload anyway.
PREFILTER_MAX_IDS = 32_000_000


def _prefilter_payload_by_candidates(cand, payload, id_col: str, max_ids: int | None = None):
    """Semi-filter the corpus-scale payload side of a pair-verify join down
    to candidate-pair members BEFORE the bucketed equi-join.

    The signature/vector/shingle side of the verify join is one row per
    corpus document while the candidate-pair side is sparse (LSH contract) —
    without this, the join shuffles the whole corpus a second time (~2×
    exchange bytes at 100 TB).  Collects the distinct pair-member ids from
    the MATERIALIZED ``cand`` (one pass over compact id pairs), broadcasts
    them ONCE via ``ray.put``, and filters ``payload`` per batch with a
    vectorized ``pyarrow.compute.is_in`` — the ``bloom_semijoin`` pattern
    with an exact id set (zero false positives, so downstream results are
    byte-identical to the unfiltered join; pinned by tests).

    Returns ``(prefiltered_payload, n_member_ids | None)`` — ``None`` means
    the id set exceeded ``max_ids`` (module-level :data:`PREFILTER_MAX_IDS`
    when ``None``) and the payload passes through unfiltered (correctness
    unaffected)."""
    import ray

    if max_ids is None:
        max_ids = PREFILTER_MAX_IDS

    id_type = dict(zip(cand.schema().names, cand.schema().types))["id_a"]

    def block_ids(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t.column("id_a").combine_chunks(), t.column("id_b").combine_chunks()]
        )
        return pa.table({"cid": pc.unique(both).cast(id_type)})

    parts = ray.get(cand.map_batches(block_ids, batch_format="pyarrow").to_arrow_refs())
    # empty input blocks pass through map_batches with the INPUT schema
    chunks = [
        c for t in parts if "cid" in t.column_names for c in t.column("cid").chunks
    ]
    if sum(len(c) for c in chunks) > max_ids:
        # per-block distinct already exceeds the cap pre-union: skip early
        logger.warning(
            "pair-verify prefilter skipped: >%d candidate member ids; "
            "the payload side of the verify join shuffles unfiltered",
            max_ids,
        )
        return payload, None
    ids = (
        pc.unique(pa.concat_arrays(chunks))
        if chunks
        else pa.array([], type=id_type)
    )
    if len(ids) > max_ids:
        logger.warning(
            "pair-verify prefilter skipped: %d candidate member ids > max_ids=%d",
            len(ids),
            max_ids,
        )
        return payload, None
    ids_ref = ray.put(ids)

    def semifilter(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ids_ref)  # per-worker deserialization cache
        return batch.filter(pc.is_in(batch.column(id_col), value_set=value_set))

    return (
        payload.map_batches(semifilter, batch_format="pyarrow", zero_copy_batch=True),
        len(ids),
    )


def _bucket_join_sig(pairs, sigs, id_col: str, key_col: str, out_sig_col: str, num_buckets: int = 64):
    """Attach ``sigs``' signature to each pair row matching on
    ``pairs[key_col] == sigs[id_col]`` — a sort-shuffle bucketed equi-join:
    pad both sides to one schema, tag, union, groupby a key bucket, join
    within each bucket with polars.  Avoids ``Dataset.join``'s hash-shuffle
    aggregator actors (which deadlock small-CPU sessions in this Ray
    version)."""
    pair_schema = pairs.schema()
    pair_fields = list(zip(pair_schema.names, pair_schema.types))

    def tag_pairs(tbl: pa.Table) -> pa.Table:
        key = tbl.column(key_col).to_numpy()
        out = tbl.append_column(out_sig_col, pa.nulls(len(tbl), type=pa.binary()))
        out = out.append_column(
            "_jb", pa.array((key % num_buckets).astype(np.int64), type=pa.int64())
        )
        return out.append_column("_is_sig", pa.array(np.zeros(len(tbl), dtype=bool)))

    def tag_sigs(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        cols = {}
        for name, typ in pair_fields:
            if name == key_col:
                cols[name] = tbl.column(id_col).cast(typ)
            else:
                cols[name] = pa.nulls(n, type=typ)
        cols[out_sig_col] = tbl.column("signature")
        key = tbl.column(id_col).to_numpy()
        cols["_jb"] = pa.array((key % num_buckets).astype(np.int64), type=pa.int64())
        cols["_is_sig"] = pa.array(np.ones(n, dtype=bool))
        return pa.table(cols)

    left = pairs.map_batches(tag_pairs, batch_format="pyarrow")
    right = sigs.map_batches(tag_sigs, batch_format="pyarrow")

    def join_bucket(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl)
        sig_rows = (
            df.filter(pl.col("_is_sig"))
            .select([key_col, out_sig_col])
            .unique(subset=[key_col])
        )
        pair_rows = df.filter(~pl.col("_is_sig")).drop(["_jb", "_is_sig", out_sig_col])
        return pair_rows.join(sig_rows, on=key_col, how="inner").to_arrow()

    return left.union(right).groupby("_jb").map_groups(join_bucket, batch_format="pyarrow")


def _minhash_lsh_pairs_join(
    ds,
    text_col,
    id_col,
    threshold,
    num_perm,
    num_bands,
    gram,
    max_bucket_size,
    sig_store_dir: str | None = None,
    sig_slot_bytes: int = 2,
    num_buckets: int = 64,
):
    """Scale variant of minhash_lsh_pairs (see its docstring).

    ``sig_store_dir`` selects the signature-store backend:

    * ``None`` (small inputs): ``materialize()`` pins the projected
      (id, signature) rows in the object store; the band explode re-runs the
      signature stage once more.
    * a path (the 100 TB shape): the signature table (id, signature,
      band_*) is written to partitioned parquet ONCE, and both consumers —
      the band explode and the two join sides — are column-pruned reads of
      that store.  One signature pass total, no object-store pinning, and a
      failed run can resume from the store."""
    stage = MinHashStage(text_col, id_col, num_perm, num_bands, gram)
    signed = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
    if sig_store_dir is not None:
        import ray.data as rd

        build_minhash_sig_store(
            signed, sig_store_dir, text_col, id_col, num_perm, num_bands, gram
        )
        sigs = rd.read_parquet(sig_store_dir, columns=[id_col, "signature"])
        signed = rd.read_parquet(
            sig_store_dir, columns=[id_col] + [f"band_{b}" for b in range(num_bands)]
        )
    else:
        sigs = signed.select_columns([id_col, "signature"]).materialize()

    def explode_ids(batch: pa.Table) -> pa.Table:
        keys, ids = [], []
        for b in range(num_bands):
            bh = batch.column(f"band_{b}").to_numpy()
            keys.append(splitmix64(bh.view(np.uint64) ^ np.uint64(b + 1)).view(np.int64))
            ids.append(batch.column(id_col))
        band_key = np.concatenate(keys)
        return pa.table(
            {
                "band_key": pa.array(band_key, type=pa.int64()),
                "bkt": _mod_bucket_col(band_key, num_buckets),
                id_col: pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in ids]
                ),
            }
        )

    exploded = signed.map_batches(explode_ids, batch_format="pyarrow")
    candidate_pairs = _make_candidate_pairs_fn("band_key", id_col, max_bucket_size)

    def dedup_cand(tbl: pa.Table) -> pa.Table:
        return pl.from_arrow(tbl).unique(subset=["id_a", "id_b"]).to_arrow()

    cand = (
        exploded.groupby("bkt")
        .map_groups(candidate_pairs, batch_format="pyarrow")
        .map_batches(
            lambda t, nb=num_buckets: t.append_column(
                "pbkt", _mod_bucket_col(t.column("id_a").to_numpy(), nb)
            ),
            batch_format="pyarrow",
        )
        .groupby("pbkt")
        .map_groups(dedup_cand, batch_format="pyarrow")
        .drop_columns(["pbkt"])
    )

    # join the two signatures back.  NOTE: ray's Dataset.join (hash-shuffle
    # aggregator actors) deadlocks under small-CPU sessions in this Ray
    # version, so this uses a self-contained bucketed tag-union join: union
    # the (padded-schema) pair and signature rows, groupby a key bucket, and
    # join within each bucket with polars.  Two passes, one per pair side.
    # The sigs side is semi-filtered to candidate members first so the
    # verify join never re-shuffles the full corpus (pairs are sparse).
    cand = cand.materialize()
    sigs, n_members = _prefilter_payload_by_candidates(cand, sigs, id_col)
    if n_members is not None:
        # both join sides are now candidate-bounded: size the fanout from
        # the known pair count, not the corpus-sized resolver value
        join_buckets = buckets_for_rows(2 * cand.count() + n_members)
    else:
        join_buckets = num_buckets
    joined = _bucket_join_sig(cand, sigs, id_col, "id_a", "sig_a", num_buckets=join_buckets)
    joined = _bucket_join_sig(joined, sigs, id_col, "id_b", "sig_b", num_buckets=join_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        # truncate to the same slot width as the carry variant so both
        # variants compute identical estimates (store keeps full 64-bit)
        slot = np.dtype(f"<u{sig_slot_bytes}")
        sa = _binary_fixed_matrix(batch.column("sig_a"), num_perm).astype(slot)
        sb = _binary_fixed_matrix(batch.column("sig_b"), num_perm).astype(slot)
        jac = (sa == sb).mean(axis=1)
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def _embedding_near_dup_pairs_join(
    signed, id_col, threshold, num_tables, max_bucket_size, verify_block,
    num_buckets: int = 64,
):
    """Wide-embedding scale variant (see embedding_near_dup_pairs): id-only
    candidate generation, pair-joined vector verify."""
    from rayhll.functions.join import bucket_equi_join

    vecs = signed.select_columns([id_col, "norm_vec"]).materialize()

    def explode_ids(batch: pa.Table) -> pa.Table:
        parts = []
        for t in range(num_tables):
            sig = batch.column(f"sig_{t}").to_numpy()
            parts.append(
                pa.table(
                    {
                        "sig": batch.column(f"sig_{t}"),
                        "bkt": _mod_bucket_col(sig, num_buckets),
                        id_col: batch.column(id_col),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = signed.map_batches(explode_ids, batch_format="pyarrow")
    candidate_pairs = _make_candidate_pairs_fn("sig", id_col, max_bucket_size)

    def dedup_cand(tbl: pa.Table) -> pa.Table:
        return pl.from_arrow(tbl).unique(subset=["id_a", "id_b"]).to_arrow()

    cand = (
        exploded.groupby("bkt")
        .map_groups(candidate_pairs, batch_format="pyarrow")
        .map_batches(
            lambda t, nb=num_buckets: t.append_column(
                "pbkt", _mod_bucket_col(t.column("id_a").to_numpy(), nb)
            ),
            batch_format="pyarrow",
        )
        .groupby("pbkt")
        .map_groups(dedup_cand, batch_format="pyarrow")
        .drop_columns(["pbkt"])
    )

    # semi-filter the corpus-scale vector side to candidate members before
    # the per-pair verify joins (pairs are sparse; see the prefilter helper)
    cand = cand.materialize()
    vecs, n_members = _prefilter_payload_by_candidates(cand, vecs, id_col)
    join_buckets = (
        buckets_for_rows(2 * cand.count() + n_members)
        if n_members is not None
        else num_buckets
    )

    def renamed(dst):
        return vecs.map_batches(
            lambda t, d=dst: t.rename_columns([d, f"vec_{d}"]), batch_format="pyarrow"
        )

    joined = bucket_equi_join(cand, renamed("id_a"), on="id_a", how="inner", num_buckets=join_buckets)
    joined = bucket_equi_join(joined, renamed("id_b"), on="id_b", how="inner", num_buckets=join_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        from rayhll.pipelines.similarity import _vec_matrix

        va = _vec_matrix(batch, "vec_id_a")
        vb = _vec_matrix(batch, "vec_id_b")
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "cosine": pa.array(cos[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------------------------------------
# exact n-gram Jaccard near-dup (LSH candidates + exact set verify)


class ShingleSetStage:
    """Per-doc sorted-unique shingle-hash set, serialized as little-endian
    uint64 bytes — the compact exact representation for n-gram Jaccard.
    Reuses MinHashStage's vectorized shingling."""

    def __init__(self, text_col: str, id_col: str, gram: int = 3):
        self._mh = MinHashStage(text_col, id_col, num_perm=1, num_bands=1, gram=gram)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = self._mh.shingle_hashes(batch)
        # one lexsort dedups every doc's shingle set simultaneously
        # (same trick as core/batchbuild): sort by (doc, hash), drop
        # consecutive duplicates within a doc, then slice per doc.
        n = len(batch)
        counts = np.diff(offsets)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((flat, doc_idx))
        d = doc_idx[order]
        h = flat[order]
        keep = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
        d = d[keep]
        le = h[keep].astype("<u8")
        starts = np.searchsorted(d, np.arange(n, dtype=np.int64))
        ends = np.r_[starts[1:], len(d)]
        buf = le.tobytes()
        blobs = [buf[s * 8 : e * 8] for s, e in zip(starts.tolist(), ends.tolist())]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "shingles": pa.array(blobs, type=pa.binary()),
            }
        )


def _binary_ragged_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """Ragged little-endian-uint64 binary column -> (flat values, per-row
    counts), decoded straight from the Arrow buffers (no ``to_pylist``).
    Rows must be multiples of 8 bytes (shingle-set blobs are by
    construction)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    # polars round-trips binary as large_binary (64-bit offsets)
    if pa.types.is_large_binary(col.type):
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
        )
    else:
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=len(col) + 1, offset=col.offset * 4
        ).astype(np.int64)
    lengths = np.diff(offs)
    if np.any(lengths % 8):
        raise ValueError("expected rows of little-endian uint64 (multiples of 8 bytes)")
    flat = np.frombuffer(
        col.buffers()[2],
        dtype="<u8",
        count=int(offs[-1] - offs[0]) // 8,
        offset=int(offs[0]),
    ).astype(np.uint64)
    return flat, (lengths // 8).astype(np.int64)


def ngram_jaccard_pairs(
    ds,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    gram: int = 3,
    candidate_slack: float = 0.15,
    num_perm: int = 128,
    num_bands: int = 32,
    max_bucket_size: int = 1000,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
):
    """Pairs with EXACT n-gram (shingle-set) Jaccard >= threshold.

    Shape: MinHash+LSH generates candidates at ``threshold -
    candidate_slack`` (recall head-room for the estimator's ±1/√num_perm
    noise) over the SAME ``gram`` shingles as the exact verify, the per-doc
    sorted shingle-hash sets are joined back to each pair side with the
    engine's bucketed equi-join, and the exact Jaccard |A∩B| / |A∪B| is
    computed for ALL candidates in one vectorized merge pass (one lexsort
    over the batch's concatenated sorted sets; equal adjacent values within
    a pair count the intersection — each side is duplicate-free, so a value
    appears at most twice per pair).  Returns (id_a, id_b, jaccard) with
    exact values."""
    from rayhll.functions.join import bucket_equi_join

    cand = minhash_lsh_pairs(
        ds,
        text_col,
        id_col,
        approx_rows=approx_rows,
        threshold=max(threshold - candidate_slack, 0.0),
        num_perm=num_perm,
        num_bands=num_bands,
        gram=gram,
        max_bucket_size=max_bucket_size,
        num_buckets=num_buckets,
    ).drop_columns(["jaccard"])
    # semi-filter the corpus to candidate-pair members BEFORE shingling
    # (pairs are sparse): non-candidate docs skip both the shingle compute
    # and the verify-join shuffle
    cand = cand.materialize()
    ds_members, n_members = _prefilter_payload_by_candidates(cand, ds, id_col)
    join_buckets = buckets_for_rows(2 * cand.count() + n_members) if n_members is not None else None

    shingles = ds_members.map_batches(
        ShingleSetStage(text_col, id_col, gram),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def renamed(dst: str):
        return shingles.map_batches(
            lambda t, d=dst: t.rename_columns([d, f"shingles_{d}"]),
            batch_format="pyarrow",
        )

    joined = bucket_equi_join(cand, renamed("id_a"), on="id_a", how="inner", num_buckets=join_buckets)
    joined = bucket_equi_join(joined, renamed("id_b"), on="id_b", how="inner", num_buckets=join_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        n = len(batch)
        flat_a, cnt_a = _binary_ragged_u64(batch.column("shingles_id_a"))
        flat_b, cnt_b = _binary_ragged_u64(batch.column("shingles_id_b"))
        rng = np.arange(n, dtype=np.int64)
        pair_idx = np.concatenate([np.repeat(rng, cnt_a), np.repeat(rng, cnt_b)])
        vals = np.concatenate([flat_a, flat_b])
        order = np.lexsort((vals, pair_idx))
        p, v = pair_idx[order], vals[order]
        dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(p[1:][dup], minlength=n)
        union = cnt_a + cnt_b - inter
        # two empty sets: trivially identical
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------------------------------------
# SimHash near-dup


class SimHashStage:
    """64-bit SimHash per document (Charikar 2002): sign of the per-bit sum
    of token hashes.  Vectorized: popcount via bit-unpacking of the token
    hash matrix, one ``reduceat`` per batch."""

    def __init__(self, text_col: str, id_col: str, emit_chunks: bool = True):
        self.text_col = text_col
        self.id_col = id_col
        # chunk columns feed the parquet sig-store format (checkpointed
        # path); the streaming pair path recomputes them inside
        # hamming64_pairs, so it opts out to skip 4 dead int64 columns
        self.emit_chunks = emit_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col]))
        toks = df.select(
            pl.col(self.text_col).fill_null("").str.extract_all(TOKEN_PATTERN).alias("t")
        )["t"]
        lengths = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls()
        tok_h = (
            pl.DataFrame({"t": flat})
            .select(pl.col("t").hash(seed=314).alias("h"))["h"]
            .to_numpy()
            .astype(np.uint64)
        )
        n = len(lengths)
        sim = np.zeros(n, dtype=np.uint64)
        if len(tok_h):
            bits = np.unpackbits(tok_h.view(np.uint8).reshape(-1, 8), axis=1).astype(
                np.int32
            )  # (n_tokens, 64) in little-endian-byte order (consistent, that's all we need)
            contrib = 2 * bits - 1
            starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            nonempty = lengths > 0
            sums = np.add.reduceat(contrib, starts[nonempty], axis=0)
            bitvals = (sums > 0).astype(np.uint8)
            packed = np.packbits(bitvals, axis=1).copy().view(np.uint64).ravel()
            sim[nonempty] = packed
        out = pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash64": pa.array(sim.view(np.int64), type=pa.int64()),
            }
        )
        # 4 x 16-bit chunk keys for hamming<=3 candidate bucketing
        if self.emit_chunks:
            for c in range(4):
                chunk = ((sim >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
                out = out.append_column(
                    f"chunk_{c}", pa.array(chunk * 4 + c, type=pa.int64())
                )
        return out


def _make_simhash_bucket_pairs_fn(
    id_col: str, max_hamming: int, max_bucket_size: int, hash_col: str = "simhash64"
):
    """In-bucket hamming pair kernel over (chunk_key, id, <hash64>) rows:
    one lexsort segments the task's rows into equal-chunk-key buckets,
    Python loops only over multi-member buckets (shared by the streaming
    and checkpointed SimHash variants and :func:`hamming64_pairs`)."""

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        keys = tbl.column("chunk_key").to_numpy()
        all_ids = tbl.column(id_col).to_numpy()
        all_sims = tbl.column(hash_col).to_numpy().astype(np.int64).view(np.uint64)
        order = np.lexsort((all_ids, keys))
        k_sorted = keys[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(k_sorted)) + 1, [len(k_sorted)])
        )
        sizes = np.diff(bounds)
        cand = np.flatnonzero((sizes >= 2) & (sizes <= max_bucket_size))
        a_ids, b_ids, dist = [], [], []
        for s in cand.tolist():
            sel = order[bounds[s] : bounds[s + 1]]
            ids = all_ids[sel]
            uniq_ids, first = np.unique(ids, return_index=True)
            sims = all_sims[sel[first]]
            if len(uniq_ids) < 2:
                continue
            for i in range(len(uniq_ids) - 1):
                x = sims[i + 1 :] ^ sims[i]
                hd = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                hit = np.flatnonzero(hd <= max_hamming)
                for j in hit:
                    a_ids.append(int(uniq_ids[i]))
                    b_ids.append(int(uniq_ids[i + 1 + j]))
                    dist.append(int(hd[j]))
        return pa.table(
            {
                "id_a": pa.array(a_ids, type=pa.int64()),
                "id_b": pa.array(b_ids, type=pa.int64()),
                "hamming": pa.array(dist, type=pa.int64()),
            }
        )

    return bucket_pairs


def build_simhash_sig_store(signed, sig_store_dir: str, text_col: str, id_col: str) -> None:
    """Write (or validate and reuse) a SimHash signature store: the
    SimHashStage output (id, simhash64, chunk_0..3) as parquet — see
    :func:`_write_or_validate_sig_store` for the reuse contract."""
    from rayhll.sketches.base import Sketch

    _write_or_validate_sig_store(
        signed,
        sig_store_dir,
        {
            "format_version": Sketch.format_version,
            "family": "simhash",
            "text_col": text_col,
            "id_col": id_col,
        },
    )


def simhash_pairs(
    ds,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int = 4096,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
):
    """Near-duplicate pairs by SimHash hamming distance <= max_hamming.

    Chunk buckets larger than ``max_bucket_size`` are skipped (same
    degenerate-content contract as the MinHash and embedding paths: a
    bucket that large means near-identical content en masse, which exact
    dedup handles; verifying it would be O(b²) pairs).  ``num_buckets``
    as in ``minhash_lsh_pairs`` (auto-sized when ``None``, from
    ``approx_rows`` for transformed inputs)."""
    signed = ds.map_batches(
        SimHashStage(text_col, id_col, emit_chunks=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hamming64_pairs(
        signed,
        id_col,
        hash_col="simhash64",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        num_buckets=_resolve_num_buckets(ds, num_buckets, 4, approx_rows),
    )


def hamming64_pairs(
    ds,
    id_col: str,
    hash_col: str = "simhash64",
    max_hamming: int = 3,
    max_bucket_size: int = 4096,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
):
    """Near-duplicate id pairs by hamming distance over ANY 64-bit
    fingerprint column — SimHash text prints, perceptual image dHashes
    (``multimodal.PerceptualHashStage``), or caller-computed signatures.

    4x16-bit chunk bucketing: the pigeonhole principle GUARANTEES recall
    for ``max_hamming <= 3`` (two hashes within 3 bit flips share at least
    one intact 16-bit chunk); above 3 the candidate stage is best-effort.
    Oversized chunk buckets are skipped under the same degenerate-content
    contract as ``simhash_pairs``.  Null fingerprints never pair."""
    num_buckets = _resolve_num_buckets(ds, num_buckets, 4, approx_rows)

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(hash_col)
        if col.null_count:
            batch = batch.filter(pc.is_valid(col.combine_chunks()))
            col = batch.column(hash_col)
        h = col.to_numpy().astype(np.int64).view(np.uint64)
        parts = []
        for c in range(4):
            ck = ((h >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(
                np.int64
            ) * 4 + c
            parts.append(
                pa.table(
                    {
                        "chunk_key": pa.array(ck, type=pa.int64()),
                        "bkt": _mod_bucket_col(ck, num_buckets),
                        id_col: batch.column(id_col),
                        hash_col: batch.column(hash_col),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    bucket_pairs = _make_simhash_bucket_pairs_fn(
        id_col, max_hamming, max_bucket_size, hash_col=hash_col
    )
    pairs = exploded.groupby("bkt").map_groups(bucket_pairs, batch_format="pyarrow")

    def add_pair_bucket(tbl: pa.Table) -> pa.Table:
        a = tbl.column("id_a").to_numpy()
        return tbl.append_column("pbkt", _mod_bucket_col(a, num_buckets))

    def dedup_pairs(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl)
            .unique(subset=["id_a", "id_b"])
            .select(["id_a", "id_b", "hamming"])
            .to_arrow()
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )


# ----------------------------------------------------------------------
# embedding-cosine near-dup


class HyperplaneStage:
    """Multi-table random-hyperplane signature of normalized embeddings
    (vector SimHash): ``num_tables`` independent sets of ``num_planes``
    seeded hyperplanes; per table, signature bit = sign of projection.
    Repetition (tables) buys recall the same way MinHash bands do; planes
    buy bucket granularity.  All plane matrices are generated once per actor
    in ``__init__``; vector extraction is the zero-copy flatten-reshape
    (no per-row Python objects)."""

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        dim: int,
        num_planes: int = 16,
        num_tables: int = 4,
        seed: int = 0,
    ):
        from rayhll.pipelines.similarity import _vec_matrix

        self._vec_matrix = _vec_matrix
        self.vec_col = vec_col
        self.id_col = id_col
        rng = np.random.default_rng(seed)
        # one (dim, num_planes) matrix per table, all from one seeded stream
        self.planes = rng.standard_normal((num_tables, dim, num_planes))
        self.num_planes = num_planes
        self.num_tables = num_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = self._vec_matrix(batch, self.vec_col)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        n, d = mat.shape
        # zero-copy list column: flat values + arithmetic offsets.  float32:
        # the vector only feeds the in-bucket cosine verify, where ~1e-7
        # rounding is far below any sane threshold margin — and it halves
        # the shuffle payload (the dominant cost class, PERF_NOTES #13)
        norm_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), type=pa.int32()),
            pa.array(mat.ravel().astype(np.float32), type=pa.float32()),
        )
        out = {self.id_col: batch.column(self.id_col), "norm_vec": norm_col}
        weights = np.uint64(1) << np.arange(self.num_planes, dtype=np.uint64)
        for t in range(self.num_tables):
            bits = (mat @ self.planes[t] > 0).astype(np.uint64)
            sig = bits @ weights  # pack sign bits into one uint64 per row
            # salt the table index in so different tables never share buckets
            key = splitmix64(sig ^ (np.uint64(0xBEE) * np.uint64(t + 1)))
            out[f"sig_{t}"] = pa.array(key.view(np.int64), type=pa.int64())
        return pa.table(out)


def _chunked_cosine_pairs(
    ids: np.ndarray, mat: np.ndarray, threshold: float, block: int = 1024
) -> tuple[list, list, list]:
    """All (i < j) pairs with ``mat[i] @ mat[j] >= threshold``, computed in
    ``block``-row strips so peak memory is O(block × n), never O(n²)."""
    a_out, b_out, c_out = [], [], []
    for i0 in range(0, len(ids), block):
        sub = mat[i0 : i0 + block]
        sims = sub @ mat.T  # (<=block, n)
        ii, jj = np.nonzero(sims >= threshold)
        keep = (ii + i0) < jj  # upper triangle only
        if keep.any():
            a_out.append(ids[ii[keep] + i0])
            b_out.append(ids[jj[keep]])
            c_out.append(sims[ii[keep], jj[keep]])
    return a_out, b_out, c_out


def _make_embedding_bucket_pairs_fn(
    id_col: str, threshold: float, max_bucket_size: int, verify_block: int
):
    """In-bucket cosine-verify kernel over (sig, id, norm_vec) rows: one
    lexsort segments equal-sig buckets, chunked strip verify per bucket
    (shared by the streaming and checkpointed variants)."""

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        from rayhll.pipelines.similarity import _vec_matrix

        df_ids = tbl.column(id_col).to_numpy()
        sigs = tbl.column("sig").to_numpy()
        mats = _vec_matrix(tbl, "norm_vec")
        order = np.lexsort((df_ids, sigs))
        sig_sorted = sigs[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(sig_sorted)) + 1, [len(sig_sorted)])
        )
        a_out, b_out, c_out = [], [], []
        for s in range(len(bounds) - 1):
            lo, hi = bounds[s], bounds[s + 1]
            if hi - lo < 2:
                continue
            sel = order[lo:hi]
            ids = df_ids[sel]
            uniq_ids, first = np.unique(ids, return_index=True)
            if len(uniq_ids) < 2 or len(uniq_ids) > max_bucket_size:
                continue  # singleton or degenerate bucket (see docstring)
            a, b, c = _chunked_cosine_pairs(
                uniq_ids, mats[sel][first], threshold, verify_block
            )
            a_out += a
            b_out += b
            c_out += c
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "id_b": pa.array(np.concatenate(b_out), type=pa.int64()),
                "cosine": pa.array(np.concatenate(c_out), type=pa.float64()),
            }
        )

    return bucket_pairs


def build_embedding_sig_store(
    signed,
    sig_store_dir: str,
    vec_col: str,
    id_col: str,
    dim: int,
    num_planes: int,
    num_tables: int,
    seed: int = 0,
) -> None:
    """Write (or validate and reuse) a hyperplane signature store: the
    HyperplaneStage output (id, norm_vec float32, sig_0..sig_{T-1}) as
    parquet with a parameter manifest — same contract as
    :func:`build_minhash_sig_store`."""
    from rayhll.sketches.base import Sketch

    _write_or_validate_sig_store(
        signed,
        sig_store_dir,
        {
            "format_version": Sketch.format_version,
            "family": "hyperplane",
            "vec_col": vec_col,
            "id_col": id_col,
            "dim": dim,
            "num_planes": num_planes,
            "num_tables": num_tables,
            "seed": seed,
        },
    )


def embedding_near_dup_pairs(
    ds,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 16,
    num_tables: int = 4,
    max_bucket_size: int = 4096,
    verify_block: int = 1024,
    carry_vectors: bool = True,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
):
    """Pairs with cosine similarity >= threshold via multi-table
    hyperplane-LSH buckets and chunked exact-cosine verification.

    Scale contract (the 100 TB story):

    * buckets with more than ``max_bucket_size`` members are SKIPPED — a
      bucket that large means degenerate content (e.g. millions of identical
      vectors), which exact dedup handles; verifying it would be O(b²).
    * within a bucket the cosine verify runs in ``verify_block``-row strips
      (O(block × b) peak memory), never materializing a b×b matrix.
    * recall comes from ``num_tables`` independent plane sets (band-style
      repetition); granularity from ``num_planes`` (2^planes buckets/table).
    * ``carry_vectors=True`` (default) ships each normalized vector inside
      its table rows — num_tables× the vector volume through the shuffle.
      ``carry_vectors=False`` is the wide-embedding 100 TB shape: table
      rows carry only (sig, id), candidate pairs are generated unverified
      within buckets, and the two normalized vectors are joined back per
      PAIR (bucketed equi-join) for a vectorized cosine verify — shuffle
      volume drops from num_tables×vectors to 2×candidate-pairs.
    * ``num_buckets`` as in ``minhash_lsh_pairs`` (auto-sized when
      ``None``).
    """
    num_buckets = _resolve_num_buckets(ds, num_buckets, num_tables, approx_rows)
    stage = HyperplaneStage(vec_col, id_col, dim, num_planes, num_tables)
    signed = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
    if not carry_vectors:
        return _embedding_near_dup_pairs_join(
            signed, id_col, threshold, num_tables, max_bucket_size, verify_block,
            num_buckets=num_buckets,
        )

    def explode_tables(batch: pa.Table) -> pa.Table:
        parts = []
        for t in range(num_tables):
            sig = batch.column(f"sig_{t}").to_numpy()
            parts.append(
                pa.table(
                    {
                        "sig": batch.column(f"sig_{t}"),
                        # co-locating bucket: many sig buckets per reduce task
                        "bkt": _mod_bucket_col(sig, num_buckets),
                        id_col: batch.column(id_col),
                        "norm_vec": batch.column("norm_vec"),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = signed.map_batches(explode_tables, batch_format="pyarrow")
    bucket_pairs = _make_embedding_bucket_pairs_fn(
        id_col, threshold, max_bucket_size, verify_block
    )
    pairs = exploded.groupby("bkt").map_groups(bucket_pairs, batch_format="pyarrow")

    # a pair can surface from several tables — distinct on (id_a, id_b)
    def add_pair_bucket(tbl: pa.Table) -> pa.Table:
        a = tbl.column("id_a").to_numpy()
        return tbl.append_column("pbkt", _mod_bucket_col(a, num_buckets))

    def dedup_pairs(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl)
            .unique(subset=["id_a", "id_b"])
            .select(["id_a", "id_b", "cosine"])
            .to_arrow()
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )
