"""Curation-pipeline stress: synthesize N docs (deterministic ~80-token
texts with a lang column, exact duplicates planted for the first P ids),
run ``pipelines/curate.curate_documents`` end-to-end and report wall time
plus a conservation check (docs kept == docs generated - planted dups,
since every synthetic doc clears the token filter).

Usage: python tools/stress_curate.py [n_docs] [n_planted] [num_cpus]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
P = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.curate import curate_documents

WORDS = np.array([f"w{w:04d}" for w in range(2000)])
LANGS = np.array(["en", "de", "es", "fr", "zh"])
DOC_LEN = 80


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.uint64)
    cells = ids[:, None] * np.uint64(131) + np.arange(DOC_LEN, dtype=np.uint64)[None, :]
    wi = (splitmix64(cells.ravel()) % np.uint64(len(WORDS))).reshape(len(ids), DOC_LEN)
    texts = [" ".join(row) for row in WORDS[wi]]
    langs = LANGS[(ids % np.uint64(len(LANGS))).astype(np.int64)]
    out_ids = ids.view(np.int64).tolist()
    out_langs = langs.tolist()
    # exact duplicates: ids < P get a twin at id+10M with IDENTICAL text
    plant = np.flatnonzero(ids < P)
    if len(plant):
        out_ids += (ids[plant].view(np.int64) + 10_000_000).tolist()
        out_langs += langs[plant].tolist()
        texts += [texts[i] for i in plant.tolist()]
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "lang": pa.array(out_langs, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


FULL = "--full" in sys.argv

ds = rd.range(N).repartition(128).map_batches(gen, batch_format="pyarrow")
kwargs = {"min_tokens": 40}
expect_kept = N
if FULL:
    # add the repetition + decontamination gates: bench corpus = the
    # 24-token prefixes of docs 0..499 -> those 500 originals (plus their
    # planted twins, if any) are dropped as contaminated; synthetic texts
    # draw 80 tokens from 2000 words so dup_token_frac ~ 0.02 << 0.6
    B = 500
    cells = np.arange(B, dtype=np.uint64)[:, None] * np.uint64(131) + np.arange(
        DOC_LEN, dtype=np.uint64
    )[None, :]
    wi = (splitmix64(cells.ravel()) % np.uint64(len(WORDS))).reshape(B, DOC_LEN)
    bench = [" ".join(row[:24]) for row in WORDS[wi]]
    kwargs.update(max_dup_token_frac=0.6, bench_texts=bench)
    expect_kept = N - B

t0 = time.perf_counter()
out = curate_documents(ds, **kwargs).to_pandas()
dt = time.perf_counter() - t0
kept = int(out["n_docs"].sum())
print(
    json.dumps(
        {
            "mode": "full" if FULL else "base",
            "n_docs": N + P,
            "kept": kept,
            "expect_kept": expect_kept,
            "conserved": kept == expect_kept,
            "sec": round(dt, 2),
            "docs_per_sec": round((N + P) / dt),
            "num_cpus": NCPU,
        }
    )
)
ray.shutdown()
