"""Decontamination throughput stress: synthesize N ~80-token docs, plant a
benchmark corpus of B docs whose 24-token prefixes leak into a known subset
of the training docs, and measure docs/s through
``rayhll.pipelines.decontam.decontaminate``.

Checks exactness while it measures: every planted leak (and nothing else)
must be flagged, with the predicted distinct-gram hit count.

With ``n_decoy_grams`` > 0 (r5, VERDICT item 4) the benchmark set is
padded with that many synthetic decoy gram hashes (deterministic SplitMix64
bijection of arange — disjoint from real text grams with probability
1-2^-40ish) and shipped as 16 RANGE-PARTITIONED SHARDS, one ``ray.put``
each — the sharded-broadcast path for bench sets past the single-object
comfort zone.  Exactness must be unchanged and per-batch cost ~flat vs the
small set (membership is one shift + per-shard searchsorted over disjoint
subsets; only the log factor of shard size grows).

Usage: python tools/stress_decontam.py [n_docs] [n_bench] [num_cpus] [n_decoy_grams]
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
DECOY = int(sys.argv[4]) if len(sys.argv) > 4 else 0
NUM_SHARDS = 16
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
if DECOY:
    from rayhll.pipelines.decontam import benchmark_gram_hashes

    real = benchmark_gram_hashes(bench, gram=GRAM)
    decoys = splitmix64(np.arange(DECOY, dtype=np.uint64) + np.uint64(0xDEC0))
    grams = np.unique(np.concatenate([real, decoys]))
    shift = np.uint64(64 - (NUM_SHARDS.bit_length() - 1))
    edges = np.arange(1, NUM_SHARDS, dtype=np.uint64) << shift
    shards = [ray.put(s) for s in np.split(grams, np.searchsorted(grams, edges))]
    build_wall = time.perf_counter() - t0
    print(
        f"sharded bench: {len(grams):,} grams in {NUM_SHARDS} shards "
        f"(max {max(len(ray.get(s)) for s in shards):,}/shard), built+put in {build_wall:.1f}s"
    )
    t0 = time.perf_counter()
    out = decontaminate(ds, bench_shards=shards, gram=GRAM, mode="annotate")
else:
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
