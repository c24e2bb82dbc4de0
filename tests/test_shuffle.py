"""shuffle_manifest: exact-permutation property, multi-range == single
range, seed determinism, and the integer-exact DuckDB sha256 mirror the
driver oracle uses."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayhll.pipelines.shuffle import shuffle_manifest, write_shards


def _manifest(ids, seed=0, num_shards=4, **kw):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    ).repartition(3)
    return (
        shuffle_manifest(ds, seed=seed, num_shards=num_shards, **kw)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )


def test_permutation_property(ray_session):
    got = _manifest(list(range(200)), seed=1, num_shards=7)
    assert sorted(got["rank"]) == list(range(200))
    assert sorted(got["doc_id"]) == list(range(200))
    assert (got["shard"] == got["rank"] % 7).all()
    assert (got["pos"] == got["rank"] // 7).all()
    # a permutation, not the identity: some doc moved
    assert (got["doc_id"].to_numpy() != np.arange(200)).any()


def test_multi_range_equals_single(ray_session):
    ids = list(np.random.default_rng(5).permutation(500).astype(int))
    one = _manifest(ids, seed=3, target_rows_per_range=10**9)
    many = _manifest(ids, seed=3, target_rows_per_range=20)
    assert one.equals(many)


def test_seed_determinism(ray_session):
    a = _manifest(list(range(100)), seed=9)
    b = _manifest(list(range(100)), seed=9)
    c = _manifest(list(range(100)), seed=10)
    assert a.equals(b)
    assert not a["doc_id"].equals(c["doc_id"])


def test_empty_and_validation(ray_session):
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))
    assert len(shuffle_manifest(empty).to_pandas()) == 0
    with pytest.raises(ValueError, match="num_shards"):
        shuffle_manifest(empty, num_shards=0)


def test_string_ids(ray_session):
    """String ids permute too (the SQL mirror needs integers, but the
    operator itself only needs str(id) uniqueness)."""
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([f"url/{i}" for i in range(60)])})
    ).repartition(3)
    df = shuffle_manifest(ds, seed=1, num_shards=4, target_rows_per_range=15).to_pandas()
    assert sorted(df["rank"]) == list(range(60))
    assert sorted(df["doc_id"]) == sorted(f"url/{i}" for i in range(60))


def test_write_shards_layout_and_resume(ray_session, tmp_path):
    """write_shards: every shard file holds its permutation slice in pos
    order (rank = pos*S + shard reconstructs the global order), receipts
    are complete, finished shards survive a rerun untouched, and a
    deleted shard is the only thing a resume rewrites."""
    import os

    import pyarrow.parquet as pq

    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(120)), type=pa.int64()),
                "text": [f"doc {i}" for i in range(120)],
            }
        )
    ).repartition(3)
    man = shuffle_manifest(corpus, seed=5, num_shards=4, target_rows_per_range=30)
    man = man.materialize()
    out = str(tmp_path / "shards")
    rec = write_shards(corpus, man, out).to_pandas().sort_values("shard")
    assert rec["shard"].tolist() == [0, 1, 2, 3]
    assert rec["n_rows"].sum() == 120
    assert rec["pos_contiguous"].all()

    # reconstruct the global permutation from the shard files
    mdf = man.to_pandas().set_index("doc_id")
    for s in range(4):
        t = pq.read_table(os.path.join(out, f"shard-{s:05d}.parquet"))
        ids = t.column("doc_id").to_pylist()
        ranks = [mdf.loc[i, "rank"] for i in ids]
        # pos order within the shard == rank order; rank = pos*4 + s
        assert ranks == sorted(ranks)
        assert all(r % 4 == s for r in ranks)
        assert t.column("pos").to_pylist() == [r // 4 for r in ranks]

    # rerun: nothing rewritten
    mtimes = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    rec2 = write_shards(corpus, man, out).to_pandas().sort_values("shard")
    assert rec2["n_rows"].tolist() == rec["n_rows"].tolist()
    assert {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    } == mtimes

    # delete one shard (parquet + receipt): resume rewrites ONLY it
    os.remove(os.path.join(out, "shard-00002.parquet"))
    os.remove(os.path.join(out, "shard-00002.done.json"))
    rec3 = write_shards(corpus, man, out).to_pandas().sort_values("shard")
    assert rec3["n_rows"].tolist() == rec["n_rows"].tolist()
    for f, m in mtimes.items():
        if "00002" not in f:
            assert os.path.getmtime(os.path.join(out, f)) == m
    assert os.path.exists(os.path.join(out, "shard-00002.parquet"))


def test_duckdb_mirror(ray_session):
    ids = [int(i) for i in np.random.default_rng(11).permutation(300)]
    got = _manifest(ids, seed=42, num_shards=8, target_rows_per_range=50)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i})" for i in ids)
        + ") t(doc_id)"
    )
    want = con.execute(
        "WITH k AS (SELECT doc_id, "
        "substring(sha256(CAST(doc_id AS VARCHAR) || ':42'), 1, 16) AS h FROM docs), "
        "r AS (SELECT doc_id, "
        "CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS rank FROM k) "
        "SELECT doc_id, rank, rank % 8 AS shard, rank // 8 AS pos "
        "FROM r ORDER BY rank"
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["shard"].tolist() == want["shard"].tolist()
    assert got["pos"].tolist() == want["pos"].tolist()
