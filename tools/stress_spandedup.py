"""Duplicate-span detection stress: synthesize N ~80-token docs of unique
filler, plant a shared 24-token passage into the middle of every doc whose
id % plant_mod == 0 (so the passage is duplicated across N/plant_mod
documents), and measure docs/s through
``rayhll.pipelines.spandedup.duplicate_spans`` — BOTH engine shapes.

Checks exactness while it measures: every planted doc (and nothing else)
must report exactly one span covering exactly the planted token range
[30, 54), and broadcast/join outputs must be identical.

Usage: python tools/stress_spandedup.py [n_docs] [plant_mod] [num_cpus] [num_shards]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
PLANT_MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 100
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32
NUM_SHARDS = int(sys.argv[4]) if len(sys.argv) > 4 else 4
GRAM = 8
DOC_LEN = 80
PLANT_AT = 30
PLANT_LEN = 24

import ray

ray.init(address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from rayhll.functions.hashing import splitmix64
from rayhll.pipelines.spandedup import duplicate_spans

WORDS = np.array([f"w{w:05d}" for w in range(40_000)])
PASSAGE = " ".join(f"planted{i:02d}" for i in range(PLANT_LEN))


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.uint64)
    cells = ids[:, None] * np.uint64(131) + np.arange(DOC_LEN, dtype=np.uint64)[None, :]
    wi = (splitmix64(cells.ravel()) % np.uint64(len(WORDS))).reshape(len(ids), DOC_LEN)
    texts = []
    for rid, row in zip(ids, WORDS[wi]):
        if rid % PLANT_MOD == 0:
            # globally-unique guard tokens around the passage: without
            # them, two planted docs sharing the single filler token next
            # to the passage make the straddling 8-gram GENUINELY
            # duplicated (expected ~pairs/40000 such collisions), which
            # is correct behavior but breaks the exact-bounds assertion
            toks = (
                list(row[: PLANT_AT - 1])
                + [f"uniq{rid}a"]
                + PASSAGE.split(" ")
                + [f"uniq{rid}b"]
                + list(row[PLANT_AT + PLANT_LEN + 1 :])
            )
            texts.append(" ".join(toks))
        else:
            texts.append(" ".join(row))
    return pa.table({"doc_id": pa.array(ids.view(np.int64)), "text": pa.array(texts)})


def run(method: str):
    ds = rd.range(N, override_num_blocks=max(NCPU * 2, 8)).map_batches(
        gen, batch_format="pyarrow"
    )
    t0 = time.perf_counter()
    kw = dict(num_shards=NUM_SHARDS) if method == "broadcast" else {}
    spans = duplicate_spans(ds, gram=GRAM, method=method, **kw).to_pandas()
    wall = time.perf_counter() - t0
    planted = np.arange(0, N, PLANT_MOD)
    got = spans.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert len(got) == len(planted), (len(got), len(planted))
    assert (got["doc_id"].to_numpy() == planted).all(), "wrong docs flagged"
    assert (got["span_start"] == PLANT_AT).all() and (
        got["span_end"] == PLANT_AT + PLANT_LEN
    ).all(), "span bounds wrong"
    print(
        f"{method:9s}: {N} docs, {len(planted)} planted spans exact -> "
        f"{wall:.1f}s = {N / wall / 1000:.1f}k docs/s"
    )
    return got


a = run("broadcast")
b = run("join")
assert a.equals(b), "broadcast and join disagree"
print("broadcast == join: identical span tables")
ray.shutdown()
