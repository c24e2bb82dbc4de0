"""Decontamination throughput stress: synthesize N ~80-token docs, plant a
benchmark corpus of B docs whose 24-token prefixes leak into a known subset
of the training docs, and measure docs/s through
``rayhll.pipelines.decontam.decontaminate``.

Checks exactness while it measures: every planted leak (and nothing else)
must be flagged, with the predicted distinct-gram hit count.

Usage: python tools/stress_decontam.py [n_docs] [n_bench] [num_cpus]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32
GRAM = 8
DOC_LEN = 80
PREFIX = 24

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.decontam import decontaminate

WORDS = np.array([f"w{w:05d}" for w in range(40_000)])


def _texts_for(ids: np.ndarray) -> list[str]:
    cells = ids[:, None] * np.uint64(131) + np.arange(DOC_LEN, dtype=np.uint64)[None, :]
    wi = (splitmix64(cells.ravel()) % np.uint64(len(WORDS))).reshape(len(ids), DOC_LEN)
    return [" ".join(row) for row in WORDS[wi]]


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.uint64)
    texts = _texts_for(ids)
    # docs with id < B are "leaked": their first PREFIX tokens are a bench doc
    return pa.table(
        {"doc_id": pa.array(ids.view(np.int64)), "text": pa.array(texts)}
    )


# benchmark corpus: the 24-token prefixes of docs 0..B-1 (built driver-side,
# exactly as a real eval set would be loaded)
bench = [" ".join(t.split(" ")[:PREFIX]) for t in _texts_for(np.arange(B, dtype=np.uint64))]

ds = rd.range(N).map_batches(gen, batch_format="pyarrow")

t0 = time.perf_counter()
out = decontaminate(ds, bench, gram=GRAM, mode="annotate")


def keep_flagged(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return t.select(["doc_id", "n_gram_hits"]).filter(
        pc.equal(t.column("contaminated").combine_chunks(), True)
    )


flagged = out.map_batches(
    keep_flagged, batch_format="pyarrow", zero_copy_batch=True
).to_pandas()
wall = time.perf_counter() - t0

expect_hits = PREFIX - GRAM + 1
ok_ids = sorted(flagged["doc_id"]) == list(range(B))
ok_hits = (flagged["n_gram_hits"] == expect_hits).all()
print(
    f"n_docs={N} n_bench={B} cpus={NCPU} wall={wall:.1f}s "
    f"docs_per_sec={N / wall:,.0f} flagged={len(flagged)} "
    f"ids_exact={ok_ids} hits_exact={bool(ok_hits)}"
)
assert ok_ids and ok_hits
ray.shutdown()
