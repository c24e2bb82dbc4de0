"""Windowed aggregates + heavy hitters vs DuckDB oracles."""

from __future__ import annotations

import duckdb
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
