"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` callables over Arrow batches
(polars/pyarrow.compute kernels; regexes compiled once per actor in
``__init__``): quality stats, token counting, language-ID, and document
fingerprinting.  Semantics of the oracle-gated columns are chosen to be
exactly SQL-expressible (DuckDB equivalents noted per column).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from rayhll.functions.hashing import splitmix64

TOKEN_PATTERN = r"[A-Za-z0-9_]+"  # DuckDB: regexp_extract_all(text, ...)

# Tiny stopword inventories for the n-gram/stopword language heuristic.
# Public common-word lists; enough signal to separate the testdata's langs.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "es": ["que", "los", "las", "por", "con", "una", "para", "del", "como", "más"],
    "fr": ["les", "des", "est", "dans", "pour", "une", "qui", "pas", "sur", "avec"],
}


class TextStats:
    """Quality-scoring stage: length / punctuation / stopword-style ratios.

    Output columns (DuckDB oracle equivalents):

    * ``n_chars_calc``  — ``length(text)``
    * ``n_tokens``      — ``length(regexp_extract_all(text, '[A-Za-z0-9_]+'))``
    * ``n_spaces``      — ``length(text) - length(replace(text, ' ', ''))``
    * ``alpha_ratio``   — alphabetic chars / chars (float64; rows-only check)
    * ``quality_score`` — composite in [0,1] (rows-only check)
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col]))
        t = pl.col(self.text_col)
        stats = df.select(
            t.str.len_chars().cast(pl.Int64).alias("n_chars_calc"),
            t.str.count_matches(TOKEN_PATTERN).cast(pl.Int64).alias("n_tokens"),
            (t.str.len_chars() - t.str.replace_all(" ", "", literal=True).str.len_chars())
            .cast(pl.Int64)
            .alias("n_spaces"),
            (
                t.str.count_matches(r"[A-Za-zÀ-ÿ一-鿿]")
                / pl.max_horizontal(t.str.len_chars(), pl.lit(1))
            ).alias("alpha_ratio"),
        ).to_arrow()
        alpha = stats.column("alpha_ratio").to_numpy()
        n_tokens = stats.column("n_tokens").to_numpy()
        n_chars = stats.column("n_chars_calc").to_numpy()
        avg_tok = n_chars / np.maximum(n_tokens, 1)
        # crude composite: alphabetic, reasonable token length, non-trivial size
        quality = (
            0.5 * np.clip(alpha, 0, 1)
            + 0.3 * np.exp(-0.5 * np.abs(avg_tok - 6.0) / 6.0)
            + 0.2 * np.clip(np.log1p(n_chars) / np.log(1000), 0, 1)
        )
        out = batch
        for name in ("n_chars_calc", "n_tokens", "n_spaces", "alpha_ratio"):
            out = out.append_column(name, stats.column(name))
        return out.append_column("quality_score", pa.array(quality, type=pa.float64()))


#: BPE-ish pre-tokenizer (GPT-2-style, simplified to drop the lookahead so
#: both the rust regex engine (polars) and RE2 (DuckDB) accept it):
#: contraction suffixes, space-prefixed letter runs, digit runs, punctuation
#: runs, whitespace runs.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
#: whitespace tokenization: maximal non-space runs
WS_TOKEN_PATTERN = r"\S+"


class TokenCount:
    """Token-count stage (training-data costing staple): per document,

    * ``n_tokens_ws``  — whitespace tokens (``\\S+`` runs);
    * ``n_tokens_bpe`` — BPE-ish pre-tokenizer segments
      (:data:`BPE_TOKEN_PATTERN`), the standard proxy for subword token
      cost before a real tokenizer model runs.

    Both are single vectorized polars ``count_matches`` passes and both
    have exact DuckDB mirrors (``length(regexp_extract_all(...))``) —
    oracle-gated in the driver."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col]))
        t = pl.col(self.text_col)
        counts = df.select(
            t.str.count_matches(WS_TOKEN_PATTERN).cast(pl.Int64).alias("n_tokens_ws"),
            t.str.count_matches(BPE_TOKEN_PATTERN).cast(pl.Int64).alias("n_tokens_bpe"),
        ).to_arrow()
        return batch.append_column(
            "n_tokens_ws", counts.column("n_tokens_ws")
        ).append_column("n_tokens_bpe", counts.column("n_tokens_bpe"))


class LangId:
    """Stopword + script heuristic language identification.

    Stateful actor stage: the per-language stopword regexes compile once per
    actor.  CJK detection by Unicode block; alphabetic languages by
    stopword-hit scoring normalized per token.  Deterministic; accuracy is
    asserted against the testdata's ``lang`` labels in tests.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.patterns = {
            lang: r"(?i)\b(" + "|".join(words) + r")\b"
            for lang, words in STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col]))
        t = pl.col(self.text_col)
        exprs = [
            t.str.count_matches(pat).alias(f"hits_{lang}")
            for lang, pat in self.patterns.items()
        ]
        exprs.append(t.str.count_matches(r"[一-鿿]").alias("hits_zh"))
        exprs.append(t.str.count_matches(TOKEN_PATTERN).alias("_n_tok"))
        scores = df.select(exprs).to_arrow()
        langs = list(self.patterns) + ["zh"]
        mat = np.stack([scores.column(f"hits_{l}").to_numpy() for l in langs]).astype(
            np.float64
        )
        n_tok = np.maximum(scores.column("_n_tok").to_numpy(), 1)
        mat[:-1] /= n_tok  # stopword hit rate per token
        mat[-1] = (mat[-1] > 3).astype(np.float64) * 10.0  # CJK chars dominate
        best = mat.argmax(axis=0)
        conf = mat.max(axis=0)
        pred = np.where(conf > 0.02, np.array(langs, dtype=object)[best], "und")
        return batch.append_column(
            "lang_pred", pa.array(pred.tolist(), type=pa.string())
        ).append_column("lang_conf", pa.array(conf, type=pa.float64()))


def token_hash_stream(
    texts: pl.Series, token_pattern: str = TOKEN_PATTERN
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize every document once and hash each token (polars xxhash,
    seed 77).  Returns ``(lengths, flat_h)``: per-doc token counts and the
    flattened uint64 token-hash stream in document order.

    NULL texts count as 0 tokens (the flagship's null ≡ empty-content
    stance, pipelines/distinct.py) — a null row must never crash a
    corpus-scale stage; without the fill, polars' null list length becomes
    INT64_MIN through the NaN cast and ``np.repeat`` blows up."""
    if len(texts) == 0 or texts.dtype == pl.Null:  # all-null/untyped empties
        return np.zeros(len(texts), dtype=np.int64), np.empty(0, dtype=np.uint64)
    texts = texts.fill_null("")
    toks = (
        texts.to_frame("t").select(pl.col("t").str.extract_all(token_pattern))["t"]
    )
    lengths = toks.list.len().to_numpy().astype(np.int64)
    # empty_as_null pinned explicitly: empty token lists must vanish on
    # explode (the polars<2.0 default turned them into null rows we then
    # dropped — same stream, but implicit and deprecation-warned)
    flat = toks.explode(empty_as_null=False)
    flat_h = (
        pl.DataFrame({"t": flat})
        .select(pl.col("t").hash(seed=77).alias("h"))["h"]
        .to_numpy()
        .astype(np.uint64)
    )
    return lengths, flat_h


def gram_hashes_from_stream(
    lengths: np.ndarray, flat_h: np.ndarray, gram: int
) -> tuple[np.ndarray, np.ndarray]:
    """Roll a token-hash stream (:func:`token_hash_stream`) into per-doc
    ``gram``-gram hashes; see :func:`token_gram_hashes` for semantics."""
    valid_lens = np.maximum(lengths - gram + 1, 0)
    if not len(flat_h):
        return valid_lens, np.empty(0, dtype=np.uint64)
    rolled = flat_h.copy()
    # position-sensitive fold: multiplying the accumulator by an odd
    # constant before the xor breaks the symmetry of a plain xor-fold
    # ("a b" vs "b a", and "x x" vs "y y") that would otherwise alias
    # distinct grams
    _GOLDEN = np.uint64(0x9E3779B97F4A7C15)
    for k in range(1, gram):
        shifted = np.roll(flat_h, -k)
        rolled = splitmix64((rolled * _GOLDEN) ^ shifted)
    # valid gram positions per doc: [offset, offset + len - gram]; gather
    # them with one concatenated-range index (no doc loop)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    nz = np.flatnonzero(valid_lens)
    if not len(nz):
        return valid_lens, np.empty(0, dtype=np.uint64)
    vl = valid_lens[nz]
    seg_starts = np.concatenate(([0], np.cumsum(vl)[:-1]))
    within = np.arange(int(vl.sum()), dtype=np.int64) - np.repeat(seg_starts, vl)
    pos = np.repeat(offsets[nz], vl) + within
    return valid_lens, rolled[pos]


def distinct_per_doc(doc_lens: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Distinct-value count per document over a flattened per-doc stream
    (64-bit-hash distinct — the exact-dedup collision tolerance).  One
    doc-SALTED single-key argsort (mix a per-doc salt into the value, sort
    once): 3.2x faster than a two-key lexsort at equal results."""
    ndocs = len(doc_lens)
    out = np.zeros(ndocs, dtype=np.int64)
    if not len(values):
        return out
    salt = splitmix64(np.arange(ndocs, dtype=np.uint64) * np.uint64(2654435769))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), doc_lens)
    salted = splitmix64(values ^ salt[doc_idx])
    order = np.argsort(salted)
    s = salted[order]
    first = np.concatenate(([True], s[1:] != s[:-1]))
    np.add.at(out, doc_idx[order][first], 1)
    return out


def token_gram_hashes(
    texts: pl.Series, gram: int, token_pattern: str = TOKEN_PATTERN
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-document token n-gram hash stream.

    Tokenizes every document with ``token_pattern``, hashes each token
    (polars xxhash, seed 77), and rolls ``gram`` consecutive token hashes
    into one SplitMix64-mixed 64-bit gram hash — one kernel pass across the
    whole batch, no per-document loop.  Two gram hashes are equal iff the
    underlying token sequences are equal (modulo 64-bit collisions), which
    makes the stream directly comparable to a SQL ``array_to_string``
    join-of-tokens gram (the decontamination oracle relies on this).

    Returns ``(valid_lens, grams)``: ``valid_lens[i]`` is the number of
    n-grams document ``i`` produces (``max(n_tokens - gram + 1, 0)``) and
    ``grams`` is the flattened uint64 gram-hash stream in document order
    (``np.repeat(doc_idx, valid_lens)`` maps positions back to documents).
    """
    lengths, flat_h = token_hash_stream(texts, token_pattern)
    return gram_hashes_from_stream(lengths, flat_h, gram)


class RepetitionStats:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A.1.1) —
    the standard "is this document boilerplate/spam" filters for
    training-data curation.  Per document:

    * ``n_lines`` / ``n_distinct_lines`` / ``dup_line_frac`` — duplicate-line
      fraction (``str_split`` on newline; DuckDB ``list_distinct`` mirror);
    * ``n_distinct_tokens`` / ``dup_token_frac`` — duplicate-token fraction
      (distinct over 64-bit token hashes — the same collision tolerance as
      the exact-dedup contract, ~n²/2⁶⁴ per doc);
    * ``top_2gram_count`` — occurrences of the document's most frequent
      token 2-gram (DuckDB ``MAX(COUNT(*)) GROUP BY doc, gram`` mirror).

    One vectorized pass: polars list kernels for the line/token counts, the
    shared :func:`token_gram_hashes` stream + one lexsort for the per-doc
    2-gram mode count (no per-document loop).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col]))
        # null text ≡ "" (one empty line, 0 tokens) — same stance as
        # token_hash_stream; a null row must never crash or NaN-poison
        t = pl.col(self.text_col).fill_null("")
        stats = df.select(
            t.str.split("\n").list.len().cast(pl.Int64).alias("n_lines"),
            t.str.split("\n").list.n_unique().cast(pl.Int64).alias("n_distinct_lines"),
        ).to_arrow()
        n_lines = stats.column("n_lines").to_numpy()
        n_dlines = stats.column("n_distinct_lines").to_numpy()
        dup_line = (n_lines - n_dlines) / np.maximum(n_lines, 1)

        # tokenize + hash ONCE; token counts, distinct tokens (64-bit-hash
        # distinct — the same collision tolerance the exact-dedup contract
        # documents) and the 2-gram mode all derive from the one stream
        n_tok, flat_h = token_hash_stream(df[self.text_col])
        ndocs = len(n_tok)
        n_dtok = distinct_per_doc(n_tok, flat_h)
        dup_tok = (n_tok - n_dtok) / np.maximum(n_tok, 1)

        valid_lens, grams = gram_hashes_from_stream(n_tok, flat_h, 2)
        top2 = np.zeros(len(valid_lens), dtype=np.int64)
        if len(grams):
            salt = splitmix64(
                np.arange(ndocs, dtype=np.uint64) * np.uint64(2654435769)
            )
            doc_idx = np.repeat(np.arange(len(valid_lens), dtype=np.int64), valid_lens)
            salted = splitmix64(grams ^ salt[doc_idx])
            order = np.argsort(salted)
            s = salted[order]
            # run lengths over equal (doc, gram); scatter-max per doc
            first = np.concatenate(([True], s[1:] != s[:-1]))
            starts = np.flatnonzero(first)
            run_lens = np.diff(np.concatenate((starts, [len(s)])))
            np.maximum.at(top2, doc_idx[order][starts], run_lens)
        out = batch
        for name, arr, typ in (
            ("n_lines", n_lines, pa.int64()),
            ("n_distinct_lines", n_dlines, pa.int64()),
            ("dup_line_frac", dup_line, pa.float64()),
            ("n_distinct_tokens", n_dtok, pa.int64()),
            ("dup_token_frac", dup_tok, pa.float64()),
            ("top_2gram_count", top2, pa.int64()),
        ):
            out = out.append_column(name, pa.array(arr, type=typ))
        return out


#: Default PII patterns: lookaround-free so polars (rust regex) and DuckDB
#: (RE2) match identically; applied in dict order (emails first so their
#: digit runs cannot be re-matched by the narrower numeric patterns).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


class PiiRedact:
    """PII scrubbing stage for training-data curation: count and redact
    emails / SSN-style ids / IPv4 addresses (extensible pattern table).

    Appends ``n_<name>`` int64 match counts per pattern and
    ``text_redacted`` with every match replaced by its placeholder, in one
    vectorized polars pass per batch.  Each pattern is counted on the
    PROGRESSIVELY-REDACTED text (after every earlier pattern's replacement),
    so ``n_<name>`` equals the number of ``[<NAME>]`` placeholders actually
    inserted — a match nested inside an earlier pattern's span (e.g. the
    digits of ``1.2.3.4@example.com``) is neither counted nor re-matched.
    Patterns are a shared lookaround-free dialect, so the DuckDB oracle
    (staged CTEs counting with ``regexp_extract_all`` before each
    ``regexp_replace(..., 'g')``) reproduces the output byte-for-byte.
    """

    def __init__(
        self,
        text_col: str = "text",
        patterns: dict[str, tuple[str, str]] | None = None,
    ):
        self.text_col = text_col
        self.patterns = dict(patterns if patterns is not None else PII_PATTERNS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col])).rename(
            {self.text_col: "text_redacted"}
        )
        for name, (pat, repl) in self.patterns.items():
            # both exprs read the step's INPUT text: count pattern i on the
            # text with patterns < i already redacted, then redact it
            df = df.with_columns(
                pl.col("text_redacted")
                .str.count_matches(pat)
                .cast(pl.Int64)
                .alias(f"n_{name}"),
                pl.col("text_redacted").str.replace_all(pat, repl),
            )
        cols = df.to_arrow()
        out = batch
        for name in [*(f"n_{n}" for n in self.patterns), "text_redacted"]:
            out = out.append_column(name, cols.column(name))
        return out


class Fingerprint:
    """Winnowing-style document fingerprint (Schleimer et al. 2003, simplified):

    * ``fingerprint64`` — 64-bit hash of the full text (polars xxhash);
    * ``shingle_min64`` — minimum SplitMix64-mixed hash over the text's
      token 3-grams (robust to small edits; equal values => near-identical
      prefix content).
    """

    def __init__(self, text_col: str = "text", gram: int = 3):
        self.text_col = text_col
        self.gram = gram

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([self.text_col]))
        fp = (
            df.select(pl.col(self.text_col).hash(seed=1234).alias("h"))["h"]
            .to_numpy()
            .view(np.int64)
        )
        valid_lens, grams = token_gram_hashes(df[self.text_col], self.gram)
        mins = np.full(len(valid_lens), (1 << 64) - 1, dtype=np.uint64)
        if len(grams):
            nz = np.flatnonzero(valid_lens)
            vl = valid_lens[nz]
            seg_starts = np.concatenate(([0], np.cumsum(vl)[:-1]))
            mins[nz] = np.minimum.reduceat(grams, seg_starts)
        # docs with < gram tokens: fall back to the full-text hash
        short = valid_lens == 0
        mins[short] = fp[short].view(np.uint64)
        return batch.append_column(
            "fingerprint64", pa.array(fp, type=pa.int64())
        ).append_column("shingle_min64", pa.array(mins.view(np.int64), type=pa.int64()))


class HashingVectorizer:
    """Model-free document embeddings via the hashing trick (Weinberger et
    al. 2009): each token hash lands in one of ``dim`` buckets with a ±1
    sign bit, accumulated and L2-normalized — a bag-of-words vector with no
    vocabulary to ship, so the stage is stateless and the output column
    feeds the engine's embedding operators (ANN top-k, k-means, embedding
    near-dup) directly.

    Properties the oracle pins: token-order invariance (cosine(doc,
    permutation) == 1), near-orthogonality of disjoint vocabularies, and
    determinism.  One ``bincount`` over (doc, bucket) per batch — no
    per-document loop.  Appends ``<out_col>`` (list<float32>; all-zero for
    empty/null docs)."""

    def __init__(self, dim: int = 256, text_col: str = "text", out_col: str = "embedding"):
        self.dim = dim
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pl.from_arrow(batch.column(self.text_col).combine_chunks())
        lengths, flat_h = token_hash_stream(texts)
        n = len(lengths)
        mat = np.zeros((n, self.dim), dtype=np.float64)
        if len(flat_h):
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            bucket = (flat_h % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((flat_h >> np.uint64(63)).astype(bool), -1.0, 1.0)
            flat = np.bincount(
                doc_idx * self.dim + bucket, weights=sign, minlength=n * self.dim
            )
            mat = flat.reshape(n, self.dim)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)
        return batch.append_column(
            self.out_col,
            pa.array(list(mat.astype(np.float32)), type=pa.list_(pa.float32())),
        )
