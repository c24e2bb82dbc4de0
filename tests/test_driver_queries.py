"""Pin the self-verifying / crafted-corpus driver queries.

These are the `queries()` entries upgraded from rows-only to oracle-gated
in round 3 (VERDICT r2 item 4): the tests pin the exact expected outputs
so a regression fails here before it fails at the driver's oracle gate.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__ as e

    return e


def test_hll_sketch_hex_dump_roundtrip_ok(entry):
    df = entry.queries()["hll_sketch_hex_dump"](SF).to_pandas()
    assert len(df) == 5
    assert df["roundtrip_ok"].all()


def test_minhash_near_dup_pairs_planted_exact(entry):
    """Planted (i, 100+i) near-dup pairs, i < 12, nothing else.  True
    J≈0.97 vs threshold 0.8: with 128 perms the estimator margin is >5σ
    and the permutation seed is fixed, so the pair set is deterministic."""
    df = entry.queries()["minhash_near_dup_pairs"](SF).to_pandas()
    got = sorted(map(tuple, df[["id_a", "id_b"]].to_numpy().tolist()))
    assert got == [(i, 100 + i) for i in range(12)]


def test_ngram_jaccard_pairs_planted_exact_values(entry):
    """Planted pairs score exactly 55/61 (3 of 58 token-trigrams change
    when 1 of 60 tokens is swapped); unrelated disjoint-vocab docs 0."""
    df = entry.queries()["ngram_jaccard_pairs"](SF).to_pandas()
    got = sorted(map(tuple, df[["id_a", "id_b"]].to_numpy().tolist()))
    assert got == [(i, 100 + i) for i in range(12)]
    np.testing.assert_allclose(df["jaccard"].to_numpy(), 55 / 61, rtol=0, atol=0)


def test_multimodal_decode_meta_all_ok(entry):
    df = entry.queries()["multimodal_decode_meta"](SF).to_pandas()
    assert len(df) == 200
    assert df["decode_ok"].all()
    audio = df[df["media_type"] == "audio"]
    assert (audio["sample_rate"] == 8000).all()
    assert (df[df["media_type"] != "audio"]["sample_rate"] == -1).all()


def test_simhash_fingerprints_self_verified(entry):
    """Order-invariance + fresh-instance reproducibility hold per doc."""
    df = entry.queries()["simhash_fingerprints"](SF).to_pandas()
    assert len(df) == 500 and sorted(df.columns) == ["doc_id", "sim_ok"]
    assert df["sim_ok"].all()


def test_lang_id_documents_self_verified(entry):
    """Label-set membership, conf range, und-threshold contract, and
    reproducibility hold per doc."""
    df = entry.queries()["lang_id_documents"](SF).to_pandas()
    assert len(df) == 500 and sorted(df.columns) == ["doc_id", "lang_ok"]
    assert df["lang_ok"].all()


def test_fingerprint_documents_self_verified(entry):
    """Whitespace-padding invariance of shingle_min64, full-text-hash
    sensitivity of fingerprint64, and reproducibility hold per doc."""
    df = entry.queries()["fingerprint_documents"](SF).to_pandas()
    assert len(df) == 500 and sorted(df.columns) == ["doc_id", "fp_ok"]
    assert df["fp_ok"].all()


def test_fingerprint_verdict_short_doc_fallback(ray_session):
    """Docs under the 3-gram window use the documented fallback contract
    (shingle_min64 == fingerprint64) instead of padding invariance."""
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as e

    # mimic the driver query's verdict on crafted short docs
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["one", "two words", "now three tokens here"]),
        }
    )
    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        df = e.queries()["fingerprint_documents"](d).to_pandas()
    assert len(df) == 3 and df["fp_ok"].all()


def test_curation_docs_by_lang_composition(entry):
    """The composed curation flow (filter -> dedup -> rollup) matches its
    single-statement DuckDB mirror on sf0.001."""
    import duckdb
    import pandas as pd

    df = entry.queries()["curation_docs_by_lang"](SF).to_pandas()
    want = duckdb.sql(entry.oracle_sql()["curation_docs_by_lang"].replace(
        "documents", f"read_parquet('{SF}/documents.parquet')"
    )).df()
    cols = sorted(df.columns)
    g = df[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    assert g["n_docs"].sum() < 500  # the filter/dedup really prune


def test_demoted_queries_match_oracle(entry):
    """Every queries() entry past the driver's 50-query sample cut must
    still match its oracle SQL — the registry reorder (round-5 item 1)
    demotes only queries with r4 driver evidence, and this keeps them
    hard-gated in-repo."""
    import duckdb
    import glob
    import os

    import pandas as pd
    import pyarrow as pa_

    q = entry.queries()
    osql = entry.oracle_sql()
    demoted = list(q)[50:]
    assert demoted, "registry should exceed the 50-query driver sample"
    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
            f"SELECT * FROM read_parquet('{p}')"
        )
    for name in demoted:
        res = q[name](SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if isinstance(res, pa_.Table):
            df = res.to_pandas()
        want = con.execute(osql[name]).df()
        cols = sorted(df.columns)
        assert cols == sorted(want.columns), name
        g = df[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False, obj=name)


def test_pii_redact_documents_matches_duckdb(entry):
    """PII counts-on-progressively-redacted-text semantics match the staged
    CTE DuckDB mirror byte-for-byte (counts == placeholders inserted)."""
    import duckdb
    import pandas as pd

    df = entry.queries()["pii_redact_documents"](SF).to_pandas()
    want = duckdb.sql(entry.oracle_sql()["pii_redact_documents"].replace(
        "documents", f"read_parquet('{SF}/documents.parquet')"
    )).df()
    cols = sorted(df.columns)
    g = df[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    assert (g["n_email"] > 0).all()  # every augmented row has the planted email


def test_token_counts_documents_matches_duckdb(entry):
    """Whitespace + BPE-ish token counts agree with DuckDB's RE2 on the
    same lookahead-free patterns, including unicode edge texts."""
    import duckdb
    import pandas as pd

    df = entry.queries()["token_counts_documents"](SF).to_pandas()
    want = duckdb.sql(entry.oracle_sql()["token_counts_documents"].replace(
        "documents", f"read_parquet('{SF}/documents.parquet')"
    )).df()
    cols = sorted(df.columns)
    g = df[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    assert (g["n_tokens_bpe"] >= g["n_tokens_ws"]).all()  # BPE splits finer
