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
