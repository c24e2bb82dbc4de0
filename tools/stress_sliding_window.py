"""Sliding-window build-CPU stress at high overlap (fanout = size/step).

Times ``sliding_window_distinct`` over a synthetic high-rate event stream
with size = FANOUT x step.  The pre-r4 encoding exploded every EVENT
``fanout``x before the sketch build (build CPU scales with the overlap);
the merge-of-tumbling encoding sketches each event ONCE into its step
window and replicates only the per-step sketch rows (~1.3 KiB each), so
build CPU stays 1x.  Run this script in two worktrees (old vs new
encoding), interleaved best-of-2 per PERF_NOTES #11, to A/B.

Usage: python tools/stress_sliding_window.py [n_events] [fanout]
Defaults: 5_000_000 events, fanout 12 (size = 12h, step = 1h).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
FANOUT = int(sys.argv[2]) if len(sys.argv) > 2 else 12

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from rayhll.pipelines.windows import sliding_window_distinct

HOUR_US = 3_600_000_000
rng = np.random.default_rng(7)
SPAN_HOURS = 240
ts = rng.integers(0, SPAN_HOURS * HOUR_US, size=N, dtype=np.int64)
users = rng.integers(0, 200_000, size=N, dtype=np.int64)
tbl = pa.table(
    {
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
    }
)

best = None
for attempt in range(2):
    ds = rd.from_arrow(tbl).map_batches(lambda b: b, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = sliding_window_distinct(
        ds, "ts", ["user_id"], size_us=FANOUT * HOUR_US, step_us=HOUR_US
    )
    rows = out.count()
    dt = time.perf_counter() - t0
    print(f"  pass {attempt}: {dt:.2f}s  windows={rows}")
    best = dt if best is None else min(best, dt)

print(
    f"sliding fanout={FANOUT} n={N}: best {best:.2f}s "
    f"({N / best / 1e6:.2f}M events/s)"
)
ray.shutdown()
