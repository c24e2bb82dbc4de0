"""Windowed aggregates + heavy hitters vs DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
EV = f"{SF}/events.parquet"


def test_tumbling_window_distinct(ray_session):
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.pipelines import windows

    ds = rd.read_parquet(EV, columns=["ts", "user_id"])
    got = (
        windows.tumbling_window_distinct(ds, "ts", ["user_id"], settings=ray_agg.EXACT_MODE)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT date_trunc('hour', ts) ws, COUNT(DISTINCT user_id) e "
        f"FROM read_parquet('{EV}') GROUP BY 1 ORDER BY 1"
    ).df()
    assert got["window_start"].tolist() == want["ws"].tolist()
    assert got["estimate"].tolist() == want["e"].tolist()


def test_sliding_window_distinct(ray_session):
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.pipelines import windows

    ds = rd.read_parquet(EV, columns=["ts", "user_id"])
    got = (
        windows.sliding_window_distinct(
            ds, "ts", ["user_id"], size_us=3 * windows.US_PER_HOUR,
            step_us=windows.US_PER_HOUR, settings=ray_agg.EXACT_MODE,
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT ws, COUNT(DISTINCT user_id) e FROM ("
        "SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS ws, user_id "
        f"FROM read_parquet('{EV}'), (VALUES (0),(1),(2)) t(k)) GROUP BY 1 ORDER BY 1"
    ).df()
    assert got["estimate"].tolist() == want["e"].tolist()
    with pytest.raises(ValueError, match="multiple"):
        windows.sliding_window_distinct(ds, "ts", ["user_id"], size_us=2500, step_us=1000)


def test_sliding_window_distinct_high_fanout(ray_session):
    """Merge-of-tumbling must stay exact at the overlap factor the perf
    claim applies to (fanout 12 — PERF_NOTES #23), not just the driver
    query's fanout 3."""
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.pipelines import windows

    ds = rd.read_parquet(EV, columns=["ts", "user_id"])
    got = (
        windows.sliding_window_distinct(
            ds, "ts", ["user_id"], size_us=12 * windows.US_PER_HOUR,
            step_us=windows.US_PER_HOUR, settings=ray_agg.EXACT_MODE,
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    ks = ",".join(f"({k})" for k in range(12))
    want = duckdb.sql(
        "SELECT ws, COUNT(DISTINCT user_id) e FROM ("
        "SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS ws, user_id "
        f"FROM read_parquet('{EV}'), (VALUES {ks}) t(k)) GROUP BY 1 ORDER BY 1"
    ).df()
    assert got["window_start"].tolist() == want["ws"].tolist()
    assert got["estimate"].tolist() == want["e"].tolist()


def test_session_windows_match_sql_windows(ray_session):
    import ray.data as rd

    from rayhll.pipelines import windows

    ds = rd.read_parquet(EV, columns=["ts", "user_id"])
    got = (
        windows.session_windows(ds, "ts", "user_id", gap_us=windows.US_PER_HOUR)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT user_id, MIN(ts) s, MAX(ts) e, COUNT(*) n FROM ("
        "SELECT user_id, ts, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) sid "
        "FROM (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts) > INTERVAL 1 HOUR THEN 1 ELSE 0 END ns "
        f"FROM read_parquet('{EV}'))) GROUP BY user_id, sid ORDER BY user_id, s"
    ).df()
    assert got["session_start"].tolist() == want["s"].tolist()
    assert got["session_end"].tolist() == want["e"].tolist()
    assert got["n_events"].tolist() == want["n"].tolist()


def test_session_windows_boundary_merge_hot_key(ray_session):
    """Chunked sessionization must be byte-identical to single-task
    sessionization when sessions CROSS chunk boundaries: a hot key with one
    session chaining across many chunks, merge/no-merge edges exactly at
    the gap, and interior sessions that never touch a boundary."""
    import pyarrow as pa
    import ray.data as rd

    from rayhll.pipelines import windows

    gap = 100  # us; chunk = 4 * gap = 400
    rows = []
    # hot key: events every `gap` us for 40 chunks -> ONE session chaining
    # across every chunk boundary (each fragment must merge)
    for i in range(160):
        rows.append(("hot", i * gap))
    # edge key: session ends exactly gap before a chunk end, next event at
    # the chunk start -> diff == gap -> MERGE; then a gap+1 split
    rows += [("edge", 300), ("edge", 400), ("edge", 501), ("edge", 1500)]
    # interior key: two sessions fully inside one chunk (never candidates)
    rows += [("in", 150), ("in", 170), ("in", 281), ("in", 299)]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    stats = {}
    got = (
        windows.session_windows(
            ds, "ts", "user_id", gap_us=gap, num_buckets=8, chunk_gaps=4,
            stats_out=stats,
        )
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    # the hot key really fragmented and chain-merged across chunks
    assert stats["n_fragments"] >= 40
    assert stats["n_candidates"] >= 40
    sess = [
        # pandas Timestamp.value is ns; events were authored in us
        (r.user_id, r.session_start.value // 1000, r.session_end.value // 1000,
         r.n_events)
        for r in got.itertuples()
    ]
    assert sess == [
        ("edge", 300, 400, 2),  # 400-300 == gap merges ACROSS the boundary
        ("edge", 501, 501, 1),  # 501-400 == gap+1 splits within the chunk
        ("edge", 1500, 1500, 1),
        ("hot", 0, 159 * gap, 160),  # one session chained across 40 chunks
        ("in", 150, 170, 2),
        ("in", 281, 299, 2),
    ]


def test_heavy_hitters(ray_session):
    import ray.data as rd

    from rayhll.pipelines import windows

    ds = rd.read_parquet(EV, columns=["event_type"])
    got = windows.heavy_hitters(ds, "event_type", k=3).to_pydict()
    want = duckdb.sql(
        f"SELECT event_type, COUNT(*) c FROM read_parquet('{EV}') "
        "GROUP BY 1 ORDER BY c DESC, event_type LIMIT 3"
    ).df()
    assert got["event_type"] == want["event_type"].tolist()
    assert got["est_count"] == want["c"].tolist()


def test_heavy_hitters_adversarial_spread(ray_session):
    """A globally-heavy value spread so thin it NEVER appears in any
    batch's local top-4k must still be found (the candidate stage's
    frequency-bar guarantee: global count > N/candidate_capacity ->
    candidate, regardless of batch layout)."""
    import pyarrow as pa
    import ray.data as rd

    from rayhll.pipelines import windows

    # 64 blocks; each block: 'hot' x5 plus 200 block-unique decoys x20.
    # Local top-40 is all decoys (20 > 5), so the old top-4k-only candidate
    # rule would drop 'hot' from every batch.  Globally: hot = 64*5 = 320,
    # every decoy = 20 -> true top-1 is 'hot' by 16x.
    blocks = []
    for b in range(64):
        vals = [f"d{b:02d}_{i:03d}" for i in range(200) for _ in range(20)]
        vals += ["hot"] * 5
        rng = np.random.default_rng(b)
        order = rng.permutation(len(vals))
        blocks.append(
            pa.table({"v": pa.array([vals[i] for i in order], type=pa.string())})
        )
    ds = rd.from_arrow(blocks)
    got = windows.heavy_hitters(ds, "v", k=3, width=1 << 17).to_pydict()
    assert got["v"][0] == "hot"
    assert got["est_count"][0] == 320
    assert all(c == 20 for c in got["est_count"][1:])


def test_grouped_tdigest_quantiles(ray_session):
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.sketches.tdigest import TDigest

    li = f"{SF}/lineitem.parquet"

    def build(sub):
        td = TDigest(200)
        td.add_batch(sub.column("l_extendedprice").to_numpy())
        return td.to_bytes()

    ds = rd.read_parquet(li, columns=["l_returnflag", "l_extendedprice"])
    got = (
        ray_agg.grouped_aggregate_family(
            ds,
            ["l_returnflag"],
            build,
            TDigest,
            finalize=lambda td: {"p50": td.quantile(0.5), "n": int(td.total_weight)},
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) p50, COUNT(*) n "
        f"FROM read_parquet('{li}') GROUP BY 1 ORDER BY 1"
    ).df()
    assert got["n"].tolist() == want["n"].tolist()
    rel = (got["p50"] - want["p50"]).abs() / want["p50"]
    assert rel.max() < 0.02


def test_tumbling_window_family_tdigest(ray_session):
    """Windowed family aggregate: hourly t-digest medians land within the
    interpolated-median rank granularity of each window's exact CDF."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from rayhll.pipelines import windows
    from rayhll.sketches.tdigest import TDigest

    ev = "/root/testdata/sf0.001/events.parquet"

    def build(sub: pa.Table) -> bytes:
        td = TDigest(200)
        td.add_batch(sub.column("value").to_numpy())
        return td.to_bytes()

    ds = rd.read_parquet(ev, columns=["ts", "value"])
    out = windows.tumbling_window_family(
        ds,
        "ts",
        build,
        TDigest,
        finalize=lambda td: {"p50": td.quantile(0.5), "n": int(td.total_weight)},
    ).take_all()
    assert len(out) > 100
    est = pa.table(
        {
            "window_start": [r["window_start"] for r in out],
            "p50": pa.array([r["p50"] for r in out], type=pa.float64()),
            "n": pa.array([r["n"] for r in out], type=pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("est", est)
    df = con.execute(
        "SELECT est.n, ABS(COUNT(*) FILTER (e2.value <= est.p50) * 1.0 / COUNT(*) - 0.5) AS err "
        f"FROM (SELECT date_trunc('hour', ts) AS window_start, value FROM read_parquet('{ev}')) e2 "
        "JOIN est USING (window_start) GROUP BY est.n, est.window_start"
    ).df()
    assert ((df.err <= (2.5 / df.n).clip(lower=0.02)) | (df.n == 1)).all()
    # window row counts are exact
    exact_n = duckdb.sql(
        f"SELECT COUNT(*) c FROM read_parquet('{ev}') GROUP BY date_trunc('hour', ts)"
    ).df()["c"].sum()
    assert sum(r["n"] for r in out) == exact_n


def test_sliding_window_family_countmin(ray_session):
    """Sliding family windows: per-window count-min totals equal exact
    per-window row counts (width >> distinct, so count-min is exact)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from rayhll.functions.hashing import hash64_table
    from rayhll.pipelines import windows
    from rayhll.sketches.countmin import CountMinSketch

    ev = "/root/testdata/sf0.001/events.parquet"

    def build(sub: pa.Table) -> bytes:
        cm = CountMinSketch(4, 1 << 12)
        cm.add_batch(hash64_table(sub, ["event_type"], seed=5))
        return cm.to_bytes()

    ds = rd.read_parquet(ev, columns=["ts", "event_type"])
    out = windows.sliding_window_family(
        ds,
        "ts",
        build,
        CountMinSketch,
        size_us=3 * windows.US_PER_HOUR,
        step_us=windows.US_PER_HOUR,
        finalize=lambda cm: {"total": int(cm.total)},
    ).to_pandas()
    want = duckdb.sql(
        "SELECT window_start, CAST(COUNT(*) AS BIGINT) AS total FROM ("
        "SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start "
        f"FROM read_parquet('{ev}'), (VALUES (0), (1), (2)) t(k)) GROUP BY 1"
    ).df()
    g = out.sort_values("window_start").reset_index(drop=True)
    w = want.sort_values("window_start").reset_index(drop=True)
    assert list(g["window_start"]) == list(w["window_start"])
    assert list(g["total"]) == list(w["total"])


def test_tumbling_window_family_extra_group_cols(ray_session):
    """Windowed family aggregate with extra group keys: per-(window,
    event_type) counts stay exact."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from rayhll.functions.hashing import hash64_table
    from rayhll.pipelines import windows
    from rayhll.sketches.countmin import CountMinSketch

    ev = "/root/testdata/sf0.001/events.parquet"

    def build(sub: pa.Table) -> bytes:
        cm = CountMinSketch(4, 1 << 10)
        cm.add_batch(hash64_table(sub, ["user_id"], seed=2))
        return cm.to_bytes()

    ds = rd.read_parquet(ev, columns=["ts", "event_type", "user_id"])
    out = windows.tumbling_window_family(
        ds,
        "ts",
        build,
        CountMinSketch,
        finalize=lambda cm: {"total": int(cm.total)},
        extra_group_cols=["event_type"],
    ).to_pandas()
    want = duckdb.sql(
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS total FROM read_parquet('{ev}') GROUP BY 1, 2"
    ).df()
    cols = ["window_start", "event_type"]
    g = out.sort_values(cols).reset_index(drop=True)
    w = want.sort_values(cols).reset_index(drop=True)
    assert list(g["total"]) == list(w["total"]) and len(g) == len(w)
