"""Checkpoint/resume: crash mid-run, resume, byte-identical final output."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayhll.state.checkpoint import Manifest, flagship_checkpointed, run_checkpointed


@pytest.fixture()
def code_files(tmp_path):
    """Three small input-hint parquet shards."""
    from rayhll.sources.synth import synth_code_batch
    import numpy as np

    files = []
    total = 3000
    for i in range(3):
        t = synth_code_batch(np.arange(i * 1000, (i + 1) * 1000), total)
        p = tmp_path / f"shard-{i}.parquet"
        pq.write_table(t, p)
        files.append(str(p))
    return files


def test_crash_resume_byte_identical(ray_session, code_files, tmp_path):
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    clean = flagship_checkpointed(code_files, clean_dir)

    with pytest.raises(RuntimeError, match="simulated crash"):
        flagship_checkpointed(code_files, crash_dir, fail_after=1)
    # resume: completes only the remaining partitions
    resumed = flagship_checkpointed(code_files, crash_dir)
    assert resumed.equals(clean)
    # result files byte-identical
    a = open(os.path.join(clean_dir, "result", "result.parquet"), "rb").read()
    b = open(os.path.join(crash_dir, "result", "result.parquet"), "rb").read()
    assert a == b


def test_resume_skips_done_partitions(ray_session, code_files, tmp_path):
    out = str(tmp_path / "out")
    flagship_checkpointed(code_files, out)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert all(p["status"] == "done" for p in manifest["partitions"].values())
    assert all(p["attempts"] == 1 for p in manifest["partitions"].values())
    # second run: no partition re-executed (attempts unchanged)
    flagship_checkpointed(code_files, out)
    manifest2 = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest2 == manifest
    # per-partition metrics exist
    for pid in manifest["partitions"]:
        m = json.load(open(os.path.join(out, "metrics", f"part-{pid}.json")))
        assert m["rows_out"] > 0 and m["wall_s"] >= 0


def test_settings_mismatch_refuses(tmp_path):
    out = str(tmp_path / "out")
    inputs = {"a": pa.table({"x": [1]})}

    run_checkpointed(out, inputs, lambda t: t, lambda ps: pq.read_table(ps[0]), settings_obj="s1")
    with pytest.raises(ValueError, match="settings mismatch"):
        run_checkpointed(
            out, inputs, lambda t: t, lambda ps: pq.read_table(ps[0]), settings_obj="s2"
        )


def test_manifest_atomicity(tmp_path):
    m = Manifest.load_or_create(str(tmp_path), "h", ["p1", "p2"])
    m.mark_done("p1", rows_out=5)
    m2 = Manifest.load_or_create(str(tmp_path), "h", ["p1", "p2"])
    assert m2.partitions["p1"]["status"] == "done"
    assert m2.pending() == ["p2"]


@pytest.fixture()
def dup_docs_file(tmp_path):
    """Documents with injected exact+near duplicates for dedup checkpointing."""
    import duckdb

    src = "/root/testdata/sf0.001/documents.parquet"
    t = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{src}') "
        "UNION ALL SELECT doc_id + 1000000, text FROM read_parquet('{}') "
        "WHERE doc_id < 30".format(src)
    ).arrow()
    p = tmp_path / "docs.parquet"
    pq.write_table(t, p)
    return str(p)


def test_dedup_crash_resume_byte_identical(ray_session, dup_docs_file, tmp_path):
    from rayhll.state.checkpoint import minhash_dedup_checkpointed

    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    clean = minhash_dedup_checkpointed([dup_docs_file], clean_dir, num_buckets=8)
    assert clean.num_rows >= 30  # the planted exact dups are found

    with pytest.raises(RuntimeError, match="simulated crash"):
        minhash_dedup_checkpointed([dup_docs_file], crash_dir, num_buckets=8, fail_after=3)
    # crash left some buckets pending
    mf = json.load(open(os.path.join(crash_dir, "manifest.json")))
    assert any(p["status"] != "done" for p in mf["partitions"].values())

    resumed = minhash_dedup_checkpointed([dup_docs_file], crash_dir, num_buckets=8)
    assert resumed.equals(clean)
    a = open(os.path.join(clean_dir, "result", "result.parquet"), "rb").read()
    b = open(os.path.join(crash_dir, "result", "result.parquet"), "rb").read()
    assert a == b
    # resume reused the signature store (still exactly one manifest) and
    # only re-ran pending buckets
    mf2 = json.load(open(os.path.join(crash_dir, "manifest.json")))
    attempts = [p["attempts"] for p in mf2["partitions"].values()]
    assert attempts.count(1) == len(attempts)  # done buckets never re-ran


def test_dedup_checkpointed_matches_streaming(ray_session, dup_docs_file, tmp_path):
    """The checkpointed pair set equals minhash_lsh_pairs on the same input."""
    import ray.data as rd

    from rayhll.pipelines.dedup import minhash_lsh_pairs
    from rayhll.state.checkpoint import minhash_dedup_checkpointed

    ckpt = minhash_dedup_checkpointed(
        [dup_docs_file], str(tmp_path / "out"), num_buckets=8, threshold=0.8
    )
    ds = rd.read_parquet(dup_docs_file, columns=["doc_id", "text"])
    stream = (
        minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.8)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = ckpt.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got[["id_a", "id_b"]].values.tolist() == stream[["id_a", "id_b"]].values.tolist()


def test_dedup_checkpointed_texthash_matches_streaming(
    ray_session, dup_docs_file, tmp_path
):
    """verify_text_hash=True (the exact-dedup shape, VERDICT r3 item 6):
    the checkpointed pair set equals the streaming variant's with the same
    flag, the sig store carries the texthash column keyed in its manifest,
    and a store built WITHOUT the column is refused by a run needing it."""
    import json as _json

    import ray.data as rd

    from rayhll.pipelines.dedup import minhash_lsh_pairs
    from rayhll.state.checkpoint import minhash_dedup_checkpointed

    ckpt = minhash_dedup_checkpointed(
        [dup_docs_file], str(tmp_path / "th"), num_buckets=8,
        threshold=1.0, verify_text_hash=True,
    )
    ds = rd.read_parquet(dup_docs_file, columns=["doc_id", "text"])
    stream = (
        minhash_lsh_pairs(ds, "text", "doc_id", threshold=1.0, verify_text_hash=True)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = ckpt.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert (
        got[["id_a", "id_b"]].values.tolist()
        == stream[["id_a", "id_b"]].values.tolist()
    )
    assert len(got) >= 30  # the planted exact dups
    mf = _json.load(open(os.path.join(str(tmp_path / "th"), "sigs", "_MANIFEST.json")))
    assert mf["texthash"] is True
    # a plain store must not be silently reused by a texthash run
    plain_dir = str(tmp_path / "plain")
    minhash_dedup_checkpointed([dup_docs_file], plain_dir, num_buckets=8)
    import shutil

    th2_dir = str(tmp_path / "th2")
    os.makedirs(th2_dir)
    shutil.copytree(
        os.path.join(plain_dir, "sigs"), os.path.join(th2_dir, "sigs")
    )
    with pytest.raises(ValueError, match="signature store"):
        minhash_dedup_checkpointed(
            [dup_docs_file], th2_dir, num_buckets=8,
            threshold=1.0, verify_text_hash=True,
        )


def test_simhash_checkpointed_crash_resume_and_streaming_parity(
    ray_session, dup_docs_file, tmp_path
):
    """simhash_dedup_checkpointed: crash-mid-run resume is byte-identical to
    a clean run, and the pair set equals streaming simhash_pairs."""
    import ray.data as rd

    from rayhll.pipelines.dedup import simhash_pairs
    from rayhll.state.checkpoint import simhash_dedup_checkpointed

    clean_dir = str(tmp_path / "s_clean")
    crash_dir = str(tmp_path / "s_crash")

    clean = simhash_dedup_checkpointed([dup_docs_file], clean_dir, num_buckets=8)
    assert clean.num_rows >= 30  # planted exact dups are hamming-0 pairs

    with pytest.raises(RuntimeError, match="simulated crash"):
        simhash_dedup_checkpointed(
            [dup_docs_file], crash_dir, num_buckets=8, fail_after=3
        )
    resumed = simhash_dedup_checkpointed([dup_docs_file], crash_dir, num_buckets=8)
    assert resumed.equals(clean)
    a = open(os.path.join(clean_dir, "result", "result.parquet"), "rb").read()
    b = open(os.path.join(crash_dir, "result", "result.parquet"), "rb").read()
    assert a == b

    ds = rd.read_parquet(dup_docs_file, columns=["doc_id", "text"])
    stream = (
        simhash_pairs(ds, "text", "doc_id")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = clean.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert (
        got[["id_a", "id_b"]].values.tolist()
        == stream[["id_a", "id_b"]].values.tolist()
    )


@pytest.fixture()
def dup_vecs_file(tmp_path):
    """Embeddings with planted near-duplicate copies (deterministic noise)."""
    import numpy as np
    import pyarrow.parquet as pqq

    src = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = src.column("vec_id").to_numpy()
    mat = np.array(src.column("embedding").to_pylist(), dtype=np.float64)
    keep = ids < 50
    rng = np.random.default_rng(13)
    noisy = mat[keep] + rng.normal(0, 1e-3, size=mat[keep].shape)
    import pyarrow as pa_

    dup = pa_.table(
        {
            "vec_id": pa_.array(ids[keep] + 1_000_000, type=pa_.int64()),
            "embedding": pa_.array(noisy.tolist(), type=src.schema.field("embedding").type),
        }
    )
    out = pa_.concat_tables([src, dup])
    p = tmp_path / "vecs.parquet"
    pqq.write_table(out, p)
    return str(p)


def test_embedding_checkpointed_crash_resume_and_streaming_parity(
    ray_session, dup_vecs_file, tmp_path
):
    """embedding_dedup_checkpointed: crash-mid-run resume is byte-identical
    to a clean run, and the pair set equals streaming
    embedding_near_dup_pairs."""
    import ray.data as rd

    from rayhll.pipelines.dedup import embedding_near_dup_pairs
    from rayhll.state.checkpoint import embedding_dedup_checkpointed

    clean_dir = str(tmp_path / "e_clean")
    crash_dir = str(tmp_path / "e_crash")

    clean = embedding_dedup_checkpointed([dup_vecs_file], clean_dir, num_buckets=8)
    assert clean.num_rows >= 50  # every planted copy found

    with pytest.raises(RuntimeError, match="simulated crash"):
        embedding_dedup_checkpointed(
            [dup_vecs_file], crash_dir, num_buckets=8, fail_after=3
        )
    resumed = embedding_dedup_checkpointed([dup_vecs_file], crash_dir, num_buckets=8)
    assert resumed.equals(clean)
    a = open(os.path.join(clean_dir, "result", "result.parquet"), "rb").read()
    b = open(os.path.join(crash_dir, "result", "result.parquet"), "rb").read()
    assert a == b

    ds = rd.read_parquet(dup_vecs_file, columns=["vec_id", "embedding"])
    stream = (
        embedding_near_dup_pairs(ds, "embedding", "vec_id", dim=64, threshold=0.95)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = clean.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert (
        got[["id_a", "id_b"]].values.tolist()
        == stream[["id_a", "id_b"]].values.tolist()
    )
