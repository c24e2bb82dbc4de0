"""Corpus-trained bigram language-model scoring — the CCNet-style
"perplexity filter" stage of a training-data pipeline (Wenzek et al.
2020): score every document by its mean bigram log-probability under a
count-based LM, so downstream curation can drop/keep/bucket by fluency.

Model: stupid backoff (Brants et al. 2007) over token-hash n-grams —
``S(w2|w1) = c(w1 w2)/c(w1)`` when the bigram was seen, else
``alpha * c(w2)/N`` (with a count floor of 1 for OOV tokens); a
document's score is the mean natural log of S over its bigrams.  Counts
come from ``train_ds`` (defaults to the scored corpus itself — the usual
self-scoring setup; a curated reference corpus gives the CCNet shape).

Engine shape (two passes, both streaming):

* counts — ONE tokenize pass emits per-batch pre-aggregated ``(hash,
  kind, partial_count)`` rows (unigram and bigram tables share the
  exchange; ``np.unique`` in-map first, so the exchange carries unique
  hashes per batch, not tokens), one hash-bucketed reduce sums them, and
  the driver collects the tables (BOUNDED by ``max_table_entries`` —
  vocabulary-scale, not corpus-scale; ``min_count`` prunes the long tail
  for web-scale corpora, pruned bigrams falling through to backoff).
* score — the sorted count tables broadcast via one ``ray.put`` each
  (zero-copy in every task); the corpus streams through an actor-pool
  stage: token-hash kernel, two ``searchsorted`` lookups, per-doc
  ``reduceat`` mean.  No shuffle.

Gram-hash equality equals token-sequence equality modulo 2^-64 collisions
(the repo-wide documented tolerance).

reference: no counterpart in /root/reference (python-hll is sketch-only);
builder-brief training-data-pipeline requirement.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.text import TOKEN_PATTERN, token_hash_stream
from rayhll.sketches.countmin import CountMinSketch

__all__ = ["bigram_lm_score"]

#: driver-side collection bound for the count tables (16 B/entry)
MAX_TABLE_ENTRIES = 32_000_000

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bigram_stream(lengths: np.ndarray, flat_h: np.ndarray):
    """(n_bigrams_per_doc, w1_hashes, w2_hashes, bigram_hashes) for a
    batch's token-hash stream; bigram hashing matches
    :func:`rayhll.pipelines.text.gram_hashes_from_stream` at gram=2."""
    valid = np.maximum(lengths - 1, 0)
    total = int(valid.sum())
    if total == 0:
        e = np.empty(0, dtype=np.uint64)
        return valid, e, e, e
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    seg_starts = np.concatenate(([0], np.cumsum(valid)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, valid)
    gidx = np.repeat(offsets, valid) + within
    w1 = flat_h[gidx]
    w2 = flat_h[gidx + 1]
    return valid, w1, w2, splitmix64((w1 * _GOLDEN) ^ w2)


def _count_tables(
    train_ds, text_col, token_pattern, num_buckets, max_entries, min_count
):
    """(uni_hashes, uni_counts, bi_hashes, bi_counts, total_tokens) —
    sorted uint64 hash arrays with aligned int64 counts."""
    from rayhll.functions.partitioning import resolve_num_buckets

    buckets = resolve_num_buckets(train_ds, num_buckets, rows_per_input_row=60.0)

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = pl.from_arrow(batch.column(text_col).combine_chunks())
        lengths, flat_h = token_hash_stream(texts, token_pattern)
        _, _, _, big = _bigram_stream(lengths, flat_h)
        uh, uc = np.unique(flat_h, return_counts=True)
        bh, bc = np.unique(big, return_counts=True)
        h = np.concatenate((uh, bh))
        kind = np.concatenate(
            (np.zeros(len(uh), dtype=np.int8), np.ones(len(bh), dtype=np.int8))
        )
        cnt = np.concatenate((uc, bc)).astype(np.int64)
        return pa.table(
            {
                "_h": pa.array(h.view(np.int64), type=pa.int64()),
                "_kind": pa.array(kind, type=pa.int8()),
                "_cnt": pa.array(cnt, type=pa.int64()),
                "_bucket": pa.array(
                    (h % np.uint64(buckets)).astype(np.int64), type=pa.int64()
                ),
            }
        )

    def sum_bucket(tbl: pa.Table) -> pa.Table:
        h = tbl.column("_h").to_numpy()
        if len(h) == 0:
            return pa.table(
                {
                    "_h": pa.array([], type=pa.int64()),
                    "_kind": pa.array([], type=pa.int8()),
                    "_cnt": pa.array([], type=pa.int64()),
                }
            )
        kind = tbl.column("_kind").to_numpy()
        cnt = tbl.column("_cnt").to_numpy()
        order = np.lexsort((h, kind))
        hs, ks, cs = h[order], kind[order], cnt[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        first[1:] = (hs[1:] != hs[:-1]) | (ks[1:] != ks[:-1])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(cs, starts)
        keep = sums >= min_count
        return pa.table(
            {
                "_h": pa.array(hs[starts[keep]], type=pa.int64()),
                "_kind": pa.array(ks[starts[keep]], type=pa.int8()),
                "_cnt": pa.array(sums[keep], type=pa.int64()),
            }
        )

    partials = train_ds.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby("_bucket").map_groups(
        sum_bucket, batch_format="pyarrow"
    ).materialize()
    n = counts.count()
    if n > max_entries:
        raise ValueError(
            f"count tables hold {n} entries > max_table_entries={max_entries}; "
            "raise min_count (prune the bigram tail into backoff) or the cap"
        )
    df = counts.to_pandas()
    out = []
    total_tokens = 0
    for kind in (0, 1):
        part = df[df["_kind"] == kind]
        h = part["_h"].to_numpy().view(np.uint64)
        c = part["_cnt"].to_numpy()
        order = np.argsort(h)
        out.append(h[order])
        out.append(c[order].astype(np.int64))
        if kind == 0:
            total_tokens = int(c.sum())
    return (*out, total_tokens)


class _DualCountMin:
    """Unigram + bigram count-min pair, duck-typed for
    :func:`rayhll.ray_agg.aggregate_family` (merge/to_bytes/from_bytes) —
    ONE corpus pass builds both tables.  ``uni.total`` carries the exact
    token count (count-min adds are exact in total mass)."""

    def __init__(self, depth: int, width: int, seed: int = 99):
        self.uni = CountMinSketch(depth, width, seed)
        self.bi = CountMinSketch(depth, width, seed + 131)

    def merge(self, other: "_DualCountMin") -> None:
        self.uni.merge(other.uni)
        self.bi.merge(other.bi)

    def to_bytes(self) -> bytes:
        u = self.uni.to_bytes()
        return len(u).to_bytes(4, "little") + u + self.bi.to_bytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "_DualCountMin":
        data = bytes(data)
        n = int.from_bytes(data[:4], "little")
        obj = cls.__new__(cls)
        obj.uni = CountMinSketch.from_bytes(data[4 : 4 + n])
        obj.bi = CountMinSketch.from_bytes(data[4 + n :])
        return obj


class _LmScoreStage:
    """Actor-pool score pass: broadcast tables ``ray.get`` once per actor;
    each batch is one token-hash kernel + two vectorized table lookups +
    a per-doc ``reduceat`` mean.  Stupid backoff for unseen bigrams."""

    def __init__(
        self, refs, mode, text_col, id_col, token_pattern, backoff, round_to
    ):
        self.mode = mode
        if mode == "exact":
            self.uni_h, self.uni_c, self.bi_h, self.bi_c, self.total = [
                ray.get(r) for r in refs
            ]
        else:
            dual = _DualCountMin.from_bytes(ray.get(refs[0]))
            self.uni_cm, self.bi_cm = dual.uni, dual.bi
            self.total = dual.uni.total
        self.text_col = text_col
        self.id_col = id_col
        self.token_pattern = token_pattern
        self.backoff = backoff
        self.round_to = round_to

    @staticmethod
    def _lookup(table_h, table_c, h):
        if not len(table_h):
            return np.zeros(len(h), dtype=np.int64)
        idx = np.searchsorted(table_h, h)
        idx[idx == len(table_h)] = 0
        cnt = table_c[idx]
        cnt[table_h[idx] != h] = 0
        return cnt

    def _c_uni(self, h):
        if self.mode == "exact":
            return self._lookup(self.uni_h, self.uni_c, h)
        return self.uni_cm.estimate_batch(h.view(np.int64))

    def _c_bi(self, h):
        if self.mode == "exact":
            return self._lookup(self.bi_h, self.bi_c, h)
        return self.bi_cm.estimate_batch(h.view(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pl.from_arrow(batch.column(self.text_col).combine_chunks())
        lengths, flat_h = token_hash_stream(texts, self.token_pattern)
        valid, w1, w2, big = _bigram_stream(lengths, flat_h)
        c2 = self._c_bi(big)
        c1 = self._c_uni(w1)
        cw2 = self._c_uni(w2)
        seen = (c2 > 0) & (c1 > 0)
        logp = np.empty(len(big), dtype=np.float64)
        logp[seen] = np.log(c2[seen] / c1[seen])
        # stupid backoff: alpha * c(w2)/N, count-floor 1 for OOV w2
        miss = ~seen
        logp[miss] = np.log(
            self.backoff * np.maximum(cw2[miss], 1) / max(self.total, 1)
        )
        seg = np.concatenate(([0], np.cumsum(valid)[:-1]))
        starts = np.flatnonzero(valid)
        sums = (
            np.add.reduceat(logp, seg[starts]) if len(starts) else np.empty(0)
        )
        score = np.full(len(lengths), np.nan)
        score[starts] = sums / valid[starts]
        if self.round_to is not None:
            score = np.round(score, self.round_to)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_bigrams": pa.array(valid, type=pa.int64()),
                # from_pandas=True maps NaN (short docs) to null
                "score": pa.array(score, type=pa.float64(), from_pandas=True),
            }
        )


def bigram_lm_score(
    ds,
    train_ds=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_pattern: str = TOKEN_PATTERN,
    table_mode: str = "exact",
    num_buckets: int | None = None,
    max_table_entries: int = MAX_TABLE_ENTRIES,
    min_count: int = 1,
    cm_depth: int = 4,
    cm_width: int = 1 << 18,
    backoff: float = 0.4,
    round_to: int | None = None,
    concurrency=None,
):
    """Per-document mean bigram log-probability under a count LM trained
    on ``train_ds`` (default: ``ds`` itself).

    Returns a Dataset of ``(id_col, n_bigrams, score)`` rows; documents
    with fewer than two tokens get ``n_bigrams = 0`` and a null score.
    ``round_to`` rounds the score (the driver oracle uses 4 so the
    float-aggregation order of Ray and DuckDB cannot flip the hash).

    ``table_mode="exact"`` builds exact count tables (one bucketed
    exchange of in-map pre-aggregated partials, bounded driver collection;
    ``min_count`` prunes rare entries into the backoff path — the backoff
    denominator N then measures the RETAINED unigram mass, a consistent
    model).  ``table_mode="sketch"`` is the 100-TB shape: per-block dual
    count-min sketches tree-merged by ``aggregate_family`` — the
    per-block partial is FIXED-SIZE (2 x depth x width counters)
    regardless of corpus cardinality, no corpus-scale counts exchange and
    no driver cap; counts become one-sided overestimates (eps = e/width
    of total mass per table, the count-min contract), exact-equal to the
    exact tables whenever the sketch is collision-free."""
    train = train_ds if train_ds is not None else ds
    if table_mode == "exact":
        tables = _count_tables(
            train, text_col, token_pattern, num_buckets, max_table_entries,
            min_count,
        )
        refs = [ray.put(t) for t in tables]
    elif table_mode == "sketch":
        from rayhll.ray_agg import aggregate_family

        def build(batch: pa.Table) -> bytes:
            texts = pl.from_arrow(batch.column(text_col).combine_chunks())
            lengths, flat_h = token_hash_stream(texts, token_pattern)
            _, _, _, big = _bigram_stream(lengths, flat_h)
            dual = _DualCountMin(cm_depth, cm_width)
            dual.uni.add_batch(flat_h.view(np.int64))
            dual.bi.add_batch(big.view(np.int64))
            return dual.to_bytes()

        dual = aggregate_family(train, build, _DualCountMin)
        refs = [ray.put(dual.to_bytes())]
    else:
        raise ValueError(f"unknown table_mode {table_mode!r}")
    if concurrency is None:
        concurrency = (1, max(8, int(ray.cluster_resources().get("CPU", 8))))
    return ds.map_batches(
        _LmScoreStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_args=(
            refs, table_mode, text_col, id_col, token_pattern, backoff, round_to
        ),
        concurrency=concurrency,
    )
