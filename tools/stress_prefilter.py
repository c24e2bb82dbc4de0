"""Pair-verify prefilter stress (VERDICT r3 item 2): synthesize N docs with
P planted near-dup twins (sparse candidates), run the carry_signatures=False
minhash variant with the candidate-id prefilter ON and OFF, and report the
payload-leg row reduction, wall times, and pair-set equality.

The payload leg of the two sig-attach joins is one (id, signature) row per
corpus doc when unfiltered; with the prefilter it is one row per
candidate-pair MEMBER — the ratio is the shuffled-bytes cut on that leg
(row width is identical on both paths).

Usage: python tools/stress_prefilter.py [n_docs] [n_planted] [num_cpus]
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

import rayhll.pipelines.dedup as dd
from rayhll.functions.hashing import splitmix64

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

captured = {}
_orig = dd._prefilter_payload_by_candidates


def spy(cand, payload, id_col, max_ids=None):
    out, n = _orig(cand, payload, id_col, max_ids=max_ids)
    captured["n_members"] = n
    return out, n


dd._prefilter_payload_by_candidates = spy


def run():
    t0 = time.perf_counter()
    pairs = dd.minhash_lsh_pairs(
        ds, "text", "doc_id", threshold=0.7, carry_signatures=False
    ).to_pandas()
    return time.perf_counter() - t0, set(zip(pairs.id_a, pairs.id_b))


# warm-up pass absorbs cold-start bias; then interleave ON/OFF twice and
# take best-of-2 per variant (PERF_NOTES #11: A/B runs have order bias)
run()
t_on1, pairs_on = run()
members = captured["n_members"]
dd.PREFILTER_MAX_IDS = 0  # force the skip path: payload leg = full corpus
t_off1, pairs_off = run()
assert captured["n_members"] is None
dd.PREFILTER_MAX_IDS = 32_000_000
t_on2, _ = run()
dd.PREFILTER_MAX_IDS = 0
t_off2, _ = run()
t_on, t_off = min(t_on1, t_on2), min(t_off1, t_off2)

corpus = N + P
print(
    json.dumps(
        {
            "docs": corpus,
            "num_cpus": NCPU,
            "pairs": len(pairs_on),
            "pair_sets_identical": pairs_on == pairs_off,
            "payload_rows_unfiltered": corpus,
            "payload_rows_prefiltered": members,
            "payload_leg_cut_x": round(corpus / max(members, 1), 1),
            "minhash_sec_prefilter_on": round(t_on, 2),
            "minhash_sec_prefilter_off": round(t_off, 2),
        }
    )
)
ray.shutdown()
