"""Hot-key sessionization stress: ONE key owns 90% of the events (the
pathological sessionization shape — e.g. a bot account in a clickstream).

Pins the r4 VERDICT scale item: the hot key's events spread across
(key, time-chunk) units so no reduce task holds the whole key; only
boundary-touching session fragments go through the tiny merge pass.
Exactness is checked against a driver-side numpy sessionization of the
same deterministic events.

Usage: python tools/stress_sessions.py [n_events] [num_cpus]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 32
GAP_US = 3_600_000_000  # 1 h
CHUNK_GAPS = 64  # chunk = 64 h: the hot key spans many chunks
HOT_FRAC = 0.9
N_USERS = 1_000_000

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.windows import session_windows


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.uint64)
    h = splitmix64(ids)
    hot = (h % np.uint64(100)) < np.uint64(int(HOT_FRAC * 100))
    uid = np.where(hot, np.int64(0), (splitmix64(h) % np.uint64(N_USERS)).astype(np.int64) + 1)
    # hot events: bursts of ~30 events every ~20 min, then a >gap pause —
    # sessions ~10 h long, so each ~64 h chunk holds several sessions and
    # most sessions are interior (never candidates)
    burst = ids // np.uint64(30)
    within = ids % np.uint64(30)
    ts_hot = burst * np.uint64(40 * 3_600_000_000) + within * np.uint64(1_200_000_000)
    ts_cold = splitmix64(h ^ np.uint64(3)) % np.uint64(10_000 * 3_600_000_000)
    ts = np.where(hot, ts_hot, ts_cold).astype(np.int64)
    return pa.table(
        {
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        }
    )


ds = rd.range(N, override_num_blocks=max(NCPU * 4, 64)).map_batches(
    gen, batch_format="pyarrow"
)

t0 = time.perf_counter()
stats: dict = {}
out = session_windows(
    ds, "ts", "user_id", gap_us=GAP_US, chunk_gaps=CHUNK_GAPS, stats_out=stats
).materialize()
wall = time.perf_counter() - t0
n_sessions = out.count()
print(
    f"n_events={N:,} cpus={NCPU} wall={wall:.1f}s events_per_sec={N / wall:,.0f} "
    f"sessions={n_sessions:,} fragments={stats['n_fragments']:,} "
    f"candidates={stats['n_candidates']:,} merge_buckets={stats['merge_buckets']}"
)

# --- exactness on the HOT key vs driver numpy sessionization ------------
ids = np.arange(N, dtype=np.uint64)
h = splitmix64(ids)
hot_ids = ids[(h % np.uint64(100)) < np.uint64(int(HOT_FRAC * 100))]
burst = hot_ids // np.uint64(30)
within = hot_ids % np.uint64(30)
t = np.sort(
    (burst * np.uint64(40 * 3_600_000_000) + within * np.uint64(1_200_000_000)).astype(
        np.int64
    )
)
brk = np.r_[True, (t[1:] - t[:-1]) > GAP_US]
starts = np.flatnonzero(brk)
ends = np.r_[starts[1:], len(t)]
want = {(int(t[s]), int(t[e - 1]), int(e - s)) for s, e in zip(starts, ends)}

import pyarrow.compute as pc


def only_hot(t: pa.Table) -> pa.Table:
    if "user_id" not in t.column_names:  # empty schema-less block
        return t
    return t.filter(pc.equal(t.column("user_id").combine_chunks(), 0))


hot_out = out.map_batches(only_hot, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
got = {
    # .asm8.view: timestamps exceed the ns range pandas .value assumes
    (int(r.session_start.asm8.view("i8")), int(r.session_end.asm8.view("i8")),
     int(r.n_events))
    for r in hot_out.itertuples()
}
assert got == want, (len(got), len(want))
# the hot key really split: far more hot-key fragments than one task's worth
assert stats["n_fragments"] > len(want)
print(f"hot-key exactness OK: {len(want):,} sessions byte-identical")
ray.shutdown()
