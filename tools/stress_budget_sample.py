"""Hot-group stress for token_budget_sample's two-pass prefix: ONE group
owns 90% of the rows (the dominant-language shape of real web corpora).

Measures wall time and pins the scale claim (VERDICT r4 item 2): the hot
group is detected big, split into id ranges, and NO reduce task holds the
whole group — only the boundary range (+ small groups) shuffles, keep-all
ranges stream out through a broadcast filter.  Exactness is checked
against a driver-side polars reference on the same synthesized rows.

Usage: python tools/stress_budget_sample.py [n_rows] [num_cpus]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import polars as pl
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 32
TARGET = max(50_000, N // 20)  # rows per id-range of a big group (~18 hot ranges)
HOT_FRAC = 0.9

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from rayhll.functions.hashing import splitmix64
from rayhll.functions.sample import token_budget_sample

N_SMALL_GROUPS = 1000


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.uint64)
    h = splitmix64(ids)
    hot = (h % np.uint64(100)) < np.uint64(int(HOT_FRAC * 100))
    gidx = splitmix64(h) % np.uint64(N_SMALL_GROUPS)
    lang = np.where(hot, "hot", np.char.add("g", gidx.astype(np.int64).astype(str)))
    w = (splitmix64(h ^ np.uint64(7)) % np.uint64(7)).astype(np.int64)  # 0..6
    return pa.table(
        {
            "doc_id": pa.array(ids.view(np.int64)),
            "lang": pa.array(lang.tolist(), type=pa.string()),
            "n_tokens": pa.array(w),
        }
    )


ds = rd.range(N, override_num_blocks=max(NCPU * 4, 64)).map_batches(
    gen, batch_format="pyarrow"
)

# budget cuts the hot group roughly in half (mean weight 3)
budget = int(N * HOT_FRAC * 3 // 2)

t0 = time.perf_counter()
stats: dict = {}
out = token_budget_sample(
    ds,
    budgets=budget,
    target_rows_per_range=TARGET,
    stats_out=stats,
).materialize()
wall = time.perf_counter() - t0

hot_rows = int(N * HOT_FRAC)  # approximate (hash-split)
n_ranges = max(stats["ranges_per_big_group"].values()) if stats["n_big_groups"] else 0
print(
    f"n_rows={N:,} cpus={NCPU} wall={wall:.1f}s rows_per_sec={N / wall:,.0f} "
    f"big_groups={stats['n_big_groups']} hot_ranges={n_ranges} "
    f"keep_all={stats['n_keep_all']} drop_all={stats['n_drop_all']} "
    f"boundary={stats['n_boundary']} out_rows={out.count():,}"
)

# --- scale claim: the hot group was split, and only ONE of its ranges
# (the boundary) plus the small groups went through the shuffle ---------
assert stats["n_big_groups"] == 1, stats
assert n_ranges >= min(64, hot_rows // TARGET // 2), (n_ranges, hot_rows // TARGET)
assert stats["n_boundary"] <= 1
assert stats["n_keep_all"] >= 1 and stats["n_drop_all"] >= 1
# boundary range ≈ hot_rows / n_ranges ≪ hot_rows: no task held the group
assert hot_rows / n_ranges < 0.3 * hot_rows

# --- exactness vs a driver-side polars reference (same deterministic gen) ---
ref = (
    pl.from_arrow(gen(pa.table({"id": pa.array(np.arange(N, dtype=np.int64))})))
    .sort(["lang", "doc_id"])
    .with_columns(pl.col("n_tokens").cum_sum().over("lang").alias("_c"))
    .filter(pl.col("_c") <= budget)
)
tables = [t for t in (ray.get(r) for r in out.to_arrow_refs()) if t.num_rows]
got_ids = np.sort(pa.concat_tables(tables).column("doc_id").to_numpy())
ref_ids = np.sort(ref["doc_id"].to_numpy())
assert len(got_ids) == len(ref_ids), (len(got_ids), len(ref_ids))
assert np.array_equal(got_ids, ref_ids)
print("exactness OK vs driver polars reference")
ray.shutdown()
