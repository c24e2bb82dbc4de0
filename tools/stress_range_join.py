"""Hot-key range-join stress: salted (bin_width) vs unsalted.

One degenerate ``by`` key owns ALL probes and ALL intervals — the worst
case for the co-locating bucket join (the whole key lands in one reduce
task unsalted).  Salting bins the ``on`` domain so the hot key spreads
across the fanout; this script measures both paths at a scale where the
unsalted mega-task is visibly the bottleneck and checks the match counts
agree.

Usage: timeout 600 python tools/stress_range_join.py [n_left] [n_intervals]
Defaults: 5_000_000 probes x 100_000 intervals (~5M matches: interval
width == spacing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

N_LEFT = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_IV = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from rayhll.functions.join import range_join

rng = np.random.default_rng(11)
DOMAIN = N_IV * 40  # interval width 40 == spacing 40: ~1 match per probe
left = pa.table(
    {
        "k": pa.array(np.zeros(N_LEFT, dtype=np.int64)),  # ONE hot key
        "pos": pa.array(rng.integers(0, DOMAIN, size=N_LEFT, dtype=np.int64)),
    }
)
lo = np.arange(N_IV, dtype=np.int64) * 40
right = pa.table(
    {
        "k": pa.array(np.zeros(N_IV, dtype=np.int64)),
        "lo": pa.array(lo),
        "hi": pa.array(lo + 39),
        "rid": pa.array(np.arange(N_IV, dtype=np.int64)),
    }
)

for label, kwargs in [
    ("salted bin_width=40", dict(bin_width=40)),
    ("salted bin_width=400", dict(bin_width=400)),
    ("unsalted", dict()),
]:
    t0 = time.perf_counter()
    n = range_join(
        rd.from_arrow(left).repartition(64),
        rd.from_arrow(right),
        by="k",
        on="pos",
        lo="lo",
        hi="hi",
        num_buckets=64,
        **kwargs,
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"{label:22s}: {dt:6.1f}s  {n} matches  "
        f"({N_LEFT / dt / 1e6:.2f}M probes/s)",
        flush=True,
    )

ray.shutdown()
