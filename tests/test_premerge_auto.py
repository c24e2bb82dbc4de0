"""Cluster-aware premerge combiner auto-default (VERDICT r2 item 6)."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_resolve_premerge_batch_semantics(ray_session, monkeypatch):
    from rayhll.stages import build

    monkeypatch.delenv(build.NETWORK_BOUND_ENV, raising=False)
    # single-node session, no env -> auto resolves OFF
    assert build.resolve_premerge_batch(None) is None
    # explicit values pass through; 0/False force off
    assert build.resolve_premerge_batch(1000) == 1000
    assert build.resolve_premerge_batch(0) is None
    assert build.resolve_premerge_batch(False) is None
    # network-bound env flips auto ON
    monkeypatch.setenv(build.NETWORK_BOUND_ENV, "1")
    assert build.resolve_premerge_batch(None) == build.DEFAULT_PREMERGE_BATCH
    # explicit still wins over env
    assert build.resolve_premerge_batch(0) is None
    assert build.resolve_premerge_batch(2048) == 2048


def test_premerge_auto_on_results_invariant(ray_session, monkeypatch):
    """With the combiner auto-enabled (env route), grouped estimates are
    byte-identical to the combiner-off path."""
    import ray.data as rd

    from rayhll import ray_agg
    from rayhll.stages import build

    ev = f"{SF}/events.parquet"

    def run():
        ds = rd.read_parquet(ev, columns=["event_type", "user_id"])
        return (
            ray_agg.grouped_approx_distinct(ds, ["event_type"], ["user_id"])
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )

    monkeypatch.delenv(build.NETWORK_BOUND_ENV, raising=False)
    off = run()
    monkeypatch.setenv(build.NETWORK_BOUND_ENV, "1")
    on = run()
    assert off.equals(on)
    # and the estimates are the exact counts at this scale/mode
    want = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) c FROM read_parquet('{ev}') "
        "GROUP BY 1 ORDER BY 1"
    ).df()
    assert (off["estimate"].to_numpy() > 0).all()
    assert len(off) == len(want)
