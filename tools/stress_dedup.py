"""Large-scale text-dedup stress: synthesize N docs (~80 tokens from a
2,000-word pool, deterministic per id), plant near-duplicates for the first
P ids (id+10M = copy with 2 tokens replaced), run exact dedup and
MinHash+LSH, and report wall times + planted-pair recall.

Usage: python tools/stress_dedup.py [n_docs] [n_planted] [num_cpus]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
P = int(sys.argv[2]) if len(sys.argv) > 2 else 500
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.dedup import exact_dedup_keep_ids, minhash_lsh_pairs

WORDS = np.array([f"w{w:04d}" for w in range(2000)])
DOC_LEN = 80


def _texts_for(ids: np.ndarray) -> list[str]:
    cells = ids[:, None] * np.uint64(131) + np.arange(DOC_LEN, dtype=np.uint64)[None, :]
    wi = (splitmix64(cells.ravel()) % np.uint64(len(WORDS))).reshape(len(ids), DOC_LEN)
    flat = WORDS[wi]
    return [" ".join(row) for row in flat]


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.uint64)
    texts = _texts_for(ids)
    out_ids = ids.view(np.int64).tolist()
    # planted near-dups: ids < P get a twin at id+10M with 2 tokens replaced
    plant = ids[ids < P]
    if len(plant):
        twins = []
        for t in _texts_for(plant):
            toks = t.split(" ")
            toks[3] = "zzz3"
            toks[40] = "zzz40"
            twins.append(" ".join(toks))
        texts += twins
        out_ids += (plant.view(np.int64) + 10_000_000).tolist()
    return pa.table({"doc_id": pa.array(out_ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


ds = rd.range(N, override_num_blocks=max(64, N // 20_000)).map_batches(
    gen, batch_format="pyarrow"
)

t0 = time.perf_counter()
kept = exact_dedup_keep_ids(ds, "text", "doc_id").count()
t_exact = time.perf_counter() - t0

t0 = time.perf_counter()
pairs = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.7).to_pandas()
t_minhash = time.perf_counter() - t0
got = set(zip(pairs.id_a, pairs.id_b))
planted = {(i, i + 10_000_000) for i in range(P)}
recall = len(got & planted) / P
extras = len(got - planted)

print(
    json.dumps(
        {
            "docs": N + P,
            "num_cpus": NCPU,
            "exact_dedup_sec": round(t_exact, 1),
            "exact_kept": kept,
            "minhash_sec": round(t_minhash, 1),
            "minhash_docs_per_sec": round((N + P) / t_minhash),
            "planted": P,
            "planted_recall": recall,
            "non_planted_pairs": extras,
        }
    )
)
ray.shutdown()
