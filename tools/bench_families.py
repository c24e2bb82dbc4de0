"""Single-core add-path throughput of every sketch family (warm best-of-3).

Usage: python tools/bench_families.py [n_values]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
vals = np.random.default_rng(1).integers(-(2**62), 2**62, size=N, dtype=np.int64)
u = vals.view(np.uint64)

from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch
from rayhll.sketches.bloom import BloomFilter
from rayhll.sketches.countmin import CountMinSketch
from rayhll.sketches.kll import KLLSketch
from rayhll.sketches.minhash import MinHash
from rayhll.sketches.tdigest import TDigest
from rayhll.sketches.theta import ThetaSketch

floats = (u % np.uint64(1 << 30)).astype(np.float64)


def timed(make, add):
    best = 1e18
    for _ in range(3):
        sk = make()
        t0 = time.perf_counter()
        add(sk)
        best = min(best, time.perf_counter() - t0)
    return round(N / best)


out = {
    "hll": timed(lambda: HllSketch(HllSettings(11, 5)), lambda s: s.add_batch(vals)),
    "theta_kmv": timed(lambda: ThetaSketch(k=1 << 14), lambda s: s.add_batch(vals)),
    "bloom": timed(lambda: BloomFilter.for_capacity(N, 0.01), lambda s: s.add_batch(vals)),
    "countmin": timed(lambda: CountMinSketch(5, 1 << 16), lambda s: s.add_batch(vals)),
    "tdigest": timed(lambda: TDigest(200), lambda s: s.add_batch(floats)),
    "kll": timed(lambda: KLLSketch(k=200), lambda s: s.add_batch(floats)),
    "minhash128": timed(lambda: MinHash(128), lambda s: s.add_batch(vals)),
}
print(json.dumps({"n": N, "values_per_sec_per_core": out}))
