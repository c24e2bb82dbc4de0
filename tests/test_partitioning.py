"""Fanout auto-sizing: metadata-only counting, floors, and result
invariance across bucket counts for the grouped sketch paths."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_resolve_uses_metadata_only(ray_session):
    import ray.data as rd

    from rayhll.functions.partitioning import buckets_for_rows, resolve_num_buckets

    raw = rd.range(10_000_000)
    assert resolve_num_buckets(raw, None) == 64  # 10M/2M = 5 -> floor 64
    big = rd.range(500_000_000)
    assert resolve_num_buckets(big, None) == 256
    # transformed plan: no metadata count -> floor, NEVER executes
    calls = []

    def spy(b: pa.Table) -> pa.Table:
        calls.append(1)
        return b

    transformed = big.map_batches(spy, batch_format="pyarrow")
    assert resolve_num_buckets(transformed, None) == 64
    assert not calls  # sizing did not run the upstream pipeline
    assert resolve_num_buckets(raw, 7) == 7  # explicit wins
    with pytest.raises(ValueError):
        resolve_num_buckets(raw, 0)
    assert buckets_for_rows(1) == 64 and buckets_for_rows(10**12) == 1 << 19


def test_grouped_distinct_invariant_to_fanout(ray_session):
    import ray.data as rd

    from rayhll import ray_agg

    t = pa.table(
        {
            "g": pa.array([f"g{i % 7}" for i in range(4000)]),
            "v": pa.array([i % 611 for i in range(4000)]),
        }
    )
    outs = []
    for nb in (None, 4, 512):
        df = (
            ray_agg.grouped_approx_distinct(
                rd.from_arrow(t).repartition(6),
                ["g"],
                ["v"],
                settings=ray_agg.EXACT_MODE,
                num_buckets=nb,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    want = (
        t.to_pandas().groupby("g")["v"].nunique().sort_index().to_numpy()
    )
    assert (outs[0].sort_values("g")["estimate"].to_numpy() == want).all()


def test_flagship_grouped_invariant_to_fanout(ray_session):
    import ray.data as rd

    from rayhll.pipelines import distinct

    rows = []
    for i in range(900):
        rows.append(
            {
                "repo": f"r{i % 3}",
                "lang": f"l{i % 2}",
                "path": f"p{i}.py",
                "commit": f"c{i % 50}",
                "content": f"content-{i % 400}",
            }
        )
    t = pa.Table.from_pylist(rows)
    outs = []
    for nb in (None, 4, 256):
        df = (
            distinct.flagship_grouped(
                rd.from_arrow(t).repartition(5), num_buckets=nb
            )
            .to_pandas()
            .sort_values(["repo", "lang"])
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
