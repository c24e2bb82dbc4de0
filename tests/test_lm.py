"""bigram_lm_score (CCNet-style count-LM fluency scoring): exact-score
verification against a pure-python reference, the stupid-backoff contract
for unseen bigrams/OOV tokens, min_count pruning-into-backoff, short/null
doc semantics, the broadcast cap, bigram-hash consistency with the shared
gram kernel, and the DuckDB mirror the driver oracle uses."""

import math
from collections import Counter

import duckdb
import numpy as np
import polars as pl
import pyarrow as pa
import pytest
import ray.data as rd

from rayhll.pipelines.lm import _bigram_stream, bigram_lm_score

TOKEN_SPLIT = None  # whitespace corpora below tokenize identically via \w+


def _ref_scores(train_texts, score_texts, backoff=0.4, min_count=1):
    """Pure-python reference: stupid-backoff mean bigram logprob."""
    uni, bi = Counter(), Counter()
    for t in train_texts:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    uni = {w: c for w, c in uni.items() if c >= min_count}
    bi = {g: c for g, c in bi.items() if c >= min_count}
    total = sum(uni.values())
    out = []
    for t in score_texts:
        toks = t.split()
        if len(toks) < 2:
            out.append((0, None))
            continue
        lps = []
        for w1, w2 in zip(toks, toks[1:]):
            if (w1, w2) in bi and w1 in uni:
                lps.append(math.log(bi[(w1, w2)] / uni[w1]))
            else:
                lps.append(math.log(backoff * max(uni.get(w2, 0), 1) / total))
        out.append((len(lps), sum(lps) / len(lps)))
    return out


def _run(ds_texts, train_texts=None, **kw):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(ds_texts)), type=pa.int64()),
            "text": pa.array(ds_texts),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    train = None
    if train_texts is not None:
        train = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(train_texts)), type=pa.int64()),
                    "text": pa.array(train_texts),
                }
            )
        ).repartition(2)
    df = bigram_lm_score(ds, train_ds=train, **kw).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


CORPUS = [
    "the cat sat on the mat",
    "the cat ran on the mat",
    "the dog sat on a log",
    "a dog ran",
    "single",
    "",
]


def test_self_scored_exact(ray_session):
    got = _run(CORPUS)
    want = _ref_scores(CORPUS, CORPUS)
    assert got["n_bigrams"].tolist() == [w[0] for w in want]
    for g, (_, s) in zip(got["score"], want):
        if s is None:
            assert np.isnan(g)
        else:
            assert g == pytest.approx(s, abs=1e-12)


def test_backoff_for_unseen_bigrams(ray_session):
    train = ["the cat sat", "the dog sat"]
    # "cat dog": bigram unseen, both words known -> 0.4 * c(dog)/N;
    # "cat zzz": w2 OOV -> 0.4 * 1/N
    got = _run(["cat dog", "cat zzz"], train_texts=train)
    want = _ref_scores(train, ["cat dog", "cat zzz"])
    for g, (_, s) in zip(got["score"], want):
        assert g == pytest.approx(s, abs=1e-12)


def test_min_count_prunes_into_backoff(ray_session):
    train = ["a b a b a b", "c d"]  # (c,d) appears once, (a,b) thrice
    got = _run(["c d", "a b"], train_texts=train, min_count=2)
    want = _ref_scores(train, ["c d", "a b"], min_count=2)
    for g, (_, s) in zip(got["score"], want):
        assert g == pytest.approx(s, abs=1e-12)
    # and the pruned run scores differently from the unpruned one
    unpruned = _run(["c d"], train_texts=train)
    assert got.loc[0, "score"] != pytest.approx(unpruned.loc[0, "score"])


def test_short_and_null_docs(ray_session):
    got = _run(["", "one", "two words here"])
    assert got["n_bigrams"].tolist() == [0, 0, 2]
    assert got["score"].isna().tolist() == [True, True, False]


def test_table_cap_raises(ray_session):
    with pytest.raises(ValueError, match="min_count"):
        _run(CORPUS, max_table_entries=3)


def test_sketch_mode_matches_exact_when_collision_free(ray_session):
    """table_mode='sketch' (dual count-min, the 100-TB shape) reproduces
    the exact scores bit-for-bit when the sketch width dwarfs the distinct
    gram count (count-min is exact without collisions)."""
    ex = _run(CORPUS, round_to=None)
    sk = _run(CORPUS, table_mode="sketch", cm_width=1 << 16, round_to=None)
    assert ex["n_bigrams"].tolist() == sk["n_bigrams"].tolist()
    for a, b in zip(ex["score"], sk["score"]):
        assert (np.isnan(a) and np.isnan(b)) or a == b


def test_sketch_mode_collision_heavy_stays_sane(ray_session):
    """A deliberately tiny sketch (width 64 over a 50-word vocabulary)
    still yields finite scores for every scoreable doc — collisions only
    inflate counts (count-min overestimates), never zero them out."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(100)]
    sk = _run(texts, table_mode="sketch", cm_width=64, cm_depth=2)
    assert sk["score"].notna().all() and np.isfinite(sk["score"]).all()
    ex = _run(texts)
    assert sk["n_bigrams"].tolist() == ex["n_bigrams"].tolist()


def test_unknown_table_mode_raises(ray_session):
    with pytest.raises(ValueError, match="table_mode"):
        _run(CORPUS, table_mode="bogus")


def test_bigram_hash_matches_shared_kernel():
    from rayhll.pipelines.text import gram_hashes_from_stream, token_hash_stream

    texts = pl.Series(["alpha beta gamma delta", "x", "", "beta gamma"])
    lengths, flat_h = token_hash_stream(texts)
    valid, _, _, big = _bigram_stream(lengths, flat_h)
    want_lens, want = gram_hashes_from_stream(lengths, flat_h, 2)
    np.testing.assert_array_equal(valid, want_lens)
    np.testing.assert_array_equal(big, want)


def test_duckdb_mirror(ray_session):
    """The driver oracle's SQL reproduces (n_bigrams, rounded score)."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 40)))
        for _ in range(300)
    ] + ["", "one"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    sql = """
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS t FROM documents),
    big AS (SELECT doc_id,
      unnest(list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], chr(31)))) AS bg,
      unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1
      FROM toks WHERE len(t) >= 2),
    uni AS (SELECT w, COUNT(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
    bgc AS (SELECT bg, COUNT(*) AS c2 FROM big GROUP BY bg),
    scored AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(LN(c2 / CAST(c1 AS DOUBLE))), 4) AS score
               FROM big JOIN bgc USING(bg) JOIN uni ON big.w1 = uni.w GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams, s.score
    FROM documents d LEFT JOIN scored s USING(doc_id) ORDER BY doc_id
    """
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(sql).df()
    got = _run(texts, round_to=4)
    assert got["n_bigrams"].tolist() == want["n_bigrams"].tolist()
    for g, w in zip(got["score"], want["score"]):
        assert (np.isnan(g) and np.isnan(w)) or g == w
