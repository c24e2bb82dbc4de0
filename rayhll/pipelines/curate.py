"""Composed training-data curation pipeline: quality-filter -> exact
dedup -> per-language rollup.

This is the canonical LLM-corpus curation flow built from the engine's own
operators, kept fully SQL-mirrorable so the driver oracle gates the whole
composition (not just each stage):

1. ``TextStats`` scores every document (vectorized polars exprs whose
   definitions match DuckDB expressions — pipelines/text.py:34-38);
2. documents under ``min_tokens`` are dropped at the map stage (prune
   BEFORE the shuffle: the only wide op sees survivors only);
3. exact dedup keeps the minimum id per content hash (same 64-bit xxhash
   contract as ``pipelines/dedup.exact_dedup_keep_ids``), carrying the
   rollup columns through the bucket reduce so no second join is needed;
4. a per-batch partial rollup + one tiny ``groupby(lang)`` merge emits
   (lang, n_docs, sum_tokens, min_doc_id).

Scale shape: one content-hash bucket shuffle over (hash, id, lang,
n_tokens) — no text crosses the exchange — then a groupby over ~|langs|
partial rows.  reference: no counterpart (python-hll has no text surface);
required by the builder brief's training-data operator set.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from rayhll.functions.hashing import hash64_table
from rayhll.pipelines.text import TextStats


class _GateStage:
    """Fused curation gate stage: one tokenize+hash pass per batch yields
    ``n_tokens`` (= ``TextStats``'s regex token count), the duplicate-token
    fraction (when the repetition gate is on), and the benchmark
    contamination flag (when a bench set is broadcast)."""

    def __init__(self, text_col: str, bench_ref=None, gram: int = 8, need_rep=False):
        import ray

        self.text_col = text_col
        self.bench = ray.get(bench_ref) if bench_ref is not None else None
        self.gram = gram
        self.need_rep = need_rep

    def __call__(self, t: pa.Table) -> pa.Table:
        from rayhll.pipelines.decontam import count_distinct_gram_hits
        from rayhll.pipelines.text import (
            distinct_per_doc,
            gram_hashes_from_stream,
            token_hash_stream,
        )

        text_arr = t.column(self.text_col).combine_chunks()
        texts = pl.from_arrow(text_arr)
        n_tok, flat_h = token_hash_stream(texts)
        # n_tokens is NULL for null texts — matching TextStats (the ungated
        # branch) and the SQL mirror, so enabling a gate never changes
        # which null-text docs survive the min_tokens filter
        null_mask = (
            np.asarray(pc.is_null(text_arr)) if text_arr.null_count else None
        )
        out = t.append_column(
            "n_tokens", pa.array(n_tok, type=pa.int64(), mask=null_mask)
        )
        if self.need_rep:
            dup = (n_tok - distinct_per_doc(n_tok, flat_h)) / np.maximum(n_tok, 1)
            out = out.append_column(
                "dup_token_frac", pa.array(dup, type=pa.float64())
            )
        if self.bench is not None:
            vl, grams = gram_hashes_from_stream(n_tok, flat_h, self.gram)
            hits = count_distinct_gram_hits(vl, grams, self.bench)
            out = out.append_column(
                "contaminated", pa.array(hits > 0, type=pa.bool_())
            )
        return out


def curate_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_tokens: int = 40,
    max_dup_token_frac: float | None = None,
    bench_texts=None,
    decontam_gram: int = 8,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
):
    """Quality-filter + exact-dedup + per-language rollup (see module doc),
    optionally extended with the two other corpus-hygiene gates:

    * ``max_dup_token_frac`` — drop repetition-heavy documents
      (Gopher-style duplicate-token fraction, ``pipelines.text.
      RepetitionStats``);
    * ``bench_texts`` — drop benchmark-contaminated documents
      (``pipelines.decontam``: token ``decontam_gram``-gram overlap with
      the given eval corpus, broadcast membership — still zero extra
      shuffles; all gates apply in the fused map BEFORE the one bucket
      exchange).

    Returns a Dataset of ``(lang, n_docs, sum_tokens, min_doc_id)`` rows,
    one per surviving language.  ``num_buckets`` auto-sizes from the input
    row count when ``None`` (``functions.partitioning``); when ``ds`` is
    already transformed (no metadata count), pass the caller's post-filter
    row estimate as ``approx_rows`` so sizing does not fall to the floor."""
    from rayhll.functions.partitioning import resolve_num_buckets

    num_buckets = resolve_num_buckets(ds, num_buckets, approx_rows=approx_rows)
    gated = max_dup_token_frac is not None or bench_texts is not None
    if gated:
        # fused gate stage: ONE tokenize+hash pass per batch feeds the
        # token count, the duplicate-token fraction, and the benchmark
        # gram membership (PERF_NOTES #29 — the chained TextStats +
        # RepetitionStats + DecontaminateStage stack tokenized 3x)
        import ray

        from rayhll.pipelines.decontam import benchmark_gram_hashes

        bench_ref = (
            ray.put(benchmark_gram_hashes(bench_texts, decontam_gram))
            if bench_texts is not None
            else None
        )
        stats = ds.map_batches(
            _GateStage,
            fn_constructor_kwargs={
                "text_col": text_col,
                "bench_ref": bench_ref,
                "gram": decontam_gram,
                "need_rep": max_dup_token_frac is not None,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    else:
        stats = ds.map_batches(
            TextStats(text_col), batch_format="pyarrow", zero_copy_batch=True
        )

    def filter_and_hash(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t.column("n_tokens"), pa.scalar(min_tokens))
        if max_dup_token_frac is not None:
            mask = pc.and_(
                mask,
                pc.less_equal(
                    t.column("dup_token_frac"), pa.scalar(float(max_dup_token_frac))
                ),
            )
        if bench_texts is not None:
            mask = pc.and_(mask, pc.invert(t.column("contaminated").combine_chunks()))
        t = t.filter(mask)
        h = hash64_table(t, [text_col], seed=0xDD)  # exact-dedup hash contract
        return pa.table(
            {
                id_col: t.column(id_col),
                lang_col: t.column(lang_col),
                "n_tokens": t.column("n_tokens"),
                "_h": pa.array(h, type=pa.int64()),
                "_bucket": pa.array(
                    (h.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    hashed = stats.map_batches(
        filter_and_hash, batch_format="pyarrow", zero_copy_batch=True
    )

    def keep_min_then_partial(tbl: pa.Table) -> pa.Table:
        # min-id row per content hash, then a per-bucket partial rollup —
        # the global groupby sees ~|langs| rows per bucket, not per doc
        df = (
            pl.from_arrow(tbl)
            .sort(id_col)
            .unique(subset=["_h"], keep="first", maintain_order=True)
        )
        return (
            df.group_by(lang_col)
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_tokens").sum().alias("sum_tokens"),
                pl.col(id_col).min().alias("min_doc_id"),
            )
            .to_arrow()
        )

    partials = hashed.groupby("_bucket").map_groups(
        keep_min_then_partial, batch_format="pyarrow"
    )

    def rollup(tbl: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(tbl)
            .group_by(lang_col)
            .agg(
                pl.col("n_docs").sum(),
                pl.col("sum_tokens").sum(),
                pl.col("min_doc_id").min(),
            )
            .sort(lang_col)
            .to_arrow()
        )

    return partials.groupby(lang_col).map_groups(rollup, batch_format="pyarrow")
