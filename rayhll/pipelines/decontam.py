"""Benchmark decontamination: flag/remove training documents that share
token n-grams with an evaluation/benchmark set.

The standard large-scale curation step (GPT-3 appendix C / Gopher §A.5
style): a training document is *contaminated* when any of its token
``gram``-grams also appears in the benchmark corpus.  Engine shape:

* the benchmark side is SMALL BY CONTRACT (eval sets are thousands of
  documents — millions of grams at most).  Its distinct gram-hash set is
  built once, sorted, and broadcast with ONE ``ray.put``; every map task
  reads the same zero-copy object-store buffer.  At 10M bench grams the
  broadcast is ~80 MB — object-store-resident, never re-shipped per batch.
* the corpus side STREAMS: one vectorized ``map_batches`` stage tokenizes,
  rolls gram hashes (:func:`rayhll.pipelines.text.token_gram_hashes`), and
  membership-tests the whole batch with one ``np.searchsorted`` against the
  sorted benchmark array — no shuffle, no join, no per-row Python.

Contamination counts are DISTINCT-gram counts (a doc repeating one leaked
gram five times counts once), matching the SQL oracle's
``COUNT(DISTINCT g)``.  Gram-hash equality equals token-sequence equality
modulo 64-bit collisions (~n·m/2^64 — negligible and deterministic for a
fixed corpus).

reference: no counterpart in /root/reference (python-hll is sketch-only);
builder-brief training-data-pipeline requirement.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from rayhll.pipelines.text import TOKEN_PATTERN, token_gram_hashes

__all__ = ["benchmark_gram_hashes", "DecontaminateStage", "decontaminate"]


def benchmark_gram_hashes(
    texts: pa.Array | pa.ChunkedArray | list[str],
    gram: int = 8,
    token_pattern: str = TOKEN_PATTERN,
) -> np.ndarray:
    """Sorted unique uint64 gram-hash set of the benchmark corpus.

    Driver-side by design: the benchmark side is small by contract (this is
    the same small-side-broadcast stance as ``bloom_semijoin`` /
    ``broadcast_join``).  For a benchmark too large for one process, build
    per-shard with this function and ``np.union1d`` the results.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        series = pl.from_arrow(texts)
    else:
        series = pl.Series(texts)
    _, grams = token_gram_hashes(series.rename("text"), gram, token_pattern)
    return np.unique(grams)


class DecontaminateStage:
    """Actor-pool ``map_batches`` stage appending contamination columns.

    ``__init__`` fetches the broadcast benchmark array once per actor
    (zero-copy from the object store); ``__call__`` is one tokenize +
    gram-roll + ``searchsorted`` membership pass per batch.

    Appended columns:

    * ``n_gram_hits``  — DISTINCT benchmark grams the doc contains (int64);
    * ``contaminated`` — ``n_gram_hits > 0`` (bool).
    """

    def __init__(
        self,
        bench_ref,
        gram: int = 8,
        text_col: str = "text",
        token_pattern: str = TOKEN_PATTERN,
    ):
        self.bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        self.gram = gram
        self.text_col = text_col
        self.token_pattern = token_pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pl.from_arrow(batch.column(self.text_col).combine_chunks())
        valid_lens, grams = token_gram_hashes(texts, self.gram, self.token_pattern)
        hits = count_distinct_gram_hits(valid_lens, grams, self.bench)
        return batch.append_column(
            "n_gram_hits", pa.array(hits, type=pa.int64())
        ).append_column("contaminated", pa.array(hits > 0, type=pa.bool_()))


def count_distinct_gram_hits(
    valid_lens: np.ndarray, grams: np.ndarray, bench: np.ndarray
) -> np.ndarray:
    """DISTINCT benchmark-gram hits per document: one ``searchsorted``
    membership pass + one lexsort for the distinct-(doc, gram) count."""
    hits = np.zeros(len(valid_lens), dtype=np.int64)
    if len(grams) and len(bench):
        idx = np.searchsorted(bench, grams)
        idx[idx == len(bench)] = 0
        is_hit = bench[idx] == grams
        if is_hit.any():
            doc_idx = np.repeat(np.arange(len(valid_lens), dtype=np.int64), valid_lens)
            hd, hg = doc_idx[is_hit], grams[is_hit]
            # distinct (doc, gram) pairs via one lexsort — no doc loop
            order = np.lexsort((hg, hd))
            hd, hg = hd[order], hg[order]
            first = np.concatenate(([True], (hd[1:] != hd[:-1]) | (hg[1:] != hg[:-1])))
            np.add.at(hits, hd[first], 1)
    return hits


def decontaminate(
    ds,
    bench_texts,
    gram: int = 8,
    text_col: str = "text",
    mode: str = "annotate",
    token_pattern: str = TOKEN_PATTERN,
):
    """Annotate (or drop) documents sharing token ``gram``-grams with a
    benchmark corpus.

    ``mode="annotate"`` appends ``n_gram_hits``/``contaminated``;
    ``mode="filter"`` returns only clean documents (columns unchanged).
    """
    if mode not in ("annotate", "filter"):
        raise ValueError(f"mode must be 'annotate' or 'filter', got {mode!r}")
    bench = benchmark_gram_hashes(bench_texts, gram, token_pattern)
    bench_ref = ray.put(bench)
    out = ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={
            "bench_ref": bench_ref,
            "gram": gram,
            "text_col": text_col,
            "token_pattern": token_pattern,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    if mode == "filter":
        import pyarrow.compute as pc

        def drop_contaminated(t: pa.Table) -> pa.Table:
            keep = t.filter(pc.invert(t.column("contaminated").combine_chunks()))
            return keep.drop_columns(["n_gram_hits", "contaminated"])

        return out.map_batches(
            drop_contaminated, batch_format="pyarrow", zero_copy_batch=True
        )
    return out
