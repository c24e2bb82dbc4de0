"""Cross-document duplication profile: per document, how much of its token
n-gram set also appears in OTHER documents (the RefinedWeb/Dolma-style
"duplicate text fraction" corpus-hygiene signal; Penedo et al. 2023 §4.2).

Shape: a gram can be shared by documents living in different blocks, so
this is a genuinely wide operator — ONE gram-hash-bucketed exchange of
DISTINCT ``(gram_hash, doc_id)`` pairs (the map stage dedups within doc, so
repeated grams inside one doc ship once), a per-bucket vectorized count
(docs-per-gram run lengths -> per-doc partials), then a tiny second
groupby over ``(doc, bucket)`` partial rows.  Nothing text-sized ever
crosses the exchange; gram identity is the shared 64-bit gram hash
(:func:`rayhll.pipelines.text.token_gram_hashes` — equality == token-
sequence equality modulo 2^-64 collisions, the documented tolerance).

reference: no counterpart in /root/reference; builder-brief
training-data-pipeline requirement.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.text import TOKEN_PATTERN, token_gram_hashes

__all__ = ["cross_doc_duplication"]


def cross_doc_duplication(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 3,
    num_buckets: int | None = None,
    token_pattern: str = TOKEN_PATTERN,
):
    """Per-document duplicate-gram profile.

    Returns a Dataset of ``(id_col, n_grams, n_shared_grams, dup_frac)``
    rows — one per document with at least one ``gram``-gram: ``n_grams``
    distinct grams, ``n_shared_grams`` of them appearing in at least one
    OTHER document, and their float64 ratio.  Documents shorter than
    ``gram`` tokens produce no grams and are omitted (mirror of the SQL
    oracle's CTE semantics).

    Input contract: ``id_col`` is UNIQUE (one row per document, like the
    other per-document pipelines).  The in-map distinct-(doc, gram) dedup is
    per batch, so a doc_id appearing in multiple rows would double-ship its
    grams and inflate ``n_grams``/``n_shared_grams``."""
    from rayhll.functions.partitioning import resolve_num_buckets

    # the exchange carries ~distinct-grams-per-doc rows per input row
    num_buckets = resolve_num_buckets(ds, num_buckets, rows_per_input_row=50.0)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        texts = pl.from_arrow(batch.column(text_col).combine_chunks())
        valid_lens, grams = token_gram_hashes(texts, gram, token_pattern)
        ids = batch.column(id_col).to_numpy()
        doc_idx = np.repeat(np.arange(len(valid_lens), dtype=np.int64), valid_lens)
        if len(grams):
            # DISTINCT (doc, gram) within the batch's docs: doc-salted
            # single-key argsort, keep first occurrences
            salt = splitmix64(
                np.arange(len(valid_lens), dtype=np.uint64) * np.uint64(2654435769)
            )
            salted = splitmix64(grams ^ salt[doc_idx])
            order = np.argsort(salted)
            s = salted[order]
            keep = order[np.concatenate(([True], s[1:] != s[:-1]))]
            doc_idx, grams = doc_idx[keep], grams[keep]
        bucket = (grams % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx]),
                "_g": pa.array(grams.view(np.int64), type=pa.int64()),
                "_bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    def bucket_partials(tbl: pa.Table) -> pa.Table:
        g = tbl.column("_g").to_numpy()
        d = tbl.column(id_col).to_numpy()
        order = np.argsort(g, kind="stable")
        gs, ds_ = g[order], d[order]
        first = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(first)
        run_lens = np.diff(np.concatenate((starts, [len(gs)])))
        # pairs are distinct per doc, so a gram's run length IS its distinct
        # doc count; rows in runs >= 2 are shared grams
        shared = np.repeat(run_lens >= 2, run_lens)
        uniq_d, inv = np.unique(ds_, return_inverse=True)
        n_grams_p = np.bincount(inv, minlength=len(uniq_d)).astype(np.int64)
        n_shared_p = np.bincount(
            inv, weights=shared.astype(np.float64), minlength=len(uniq_d)
        ).astype(np.int64)
        dbucket = (
            splitmix64(uniq_d.astype(np.uint64)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(uniq_d),
                "n_grams": pa.array(n_grams_p, type=pa.int64()),
                "n_shared_grams": pa.array(n_shared_p, type=pa.int64()),
                "_dbucket": pa.array(dbucket, type=pa.int64()),
            }
        )

    pairs = ds.map_batches(explode_pairs, batch_format="pyarrow", zero_copy_batch=True)
    partials = pairs.groupby("_bucket").map_groups(
        bucket_partials, batch_format="pyarrow"
    )

    def rollup(tbl: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(tbl.drop_columns(["_dbucket"]))
            .group_by(id_col)
            .agg(pl.col("n_grams").sum(), pl.col("n_shared_grams").sum())
        )
        out = df.to_arrow()
        frac = out.column("n_shared_grams").to_numpy() / out.column(
            "n_grams"
        ).to_numpy().astype(np.float64)
        return out.append_column("dup_frac", pa.array(frac, type=pa.float64()))

    # second exchange: O(docs x gram-buckets-touched) partial rows — up to
    # the pair-exchange size when grams/doc <= num_buckets — so it reuses
    # the SAME auto-sized fanout (a scale-proof upper bound), with a
    # whole-bucket polars rollup (never one Python call per doc)
    return partials.groupby("_dbucket").map_groups(rollup, batch_format="pyarrow")
