"""Many-query ANN stress (VERDICT r3 item 5): prove the distributed
top-k reduce holds when n_queries stops being tiny.

Synthesizes N unit vectors distributed (one deterministic rng per block —
never materialized on the driver), runs ``brute_force_topk`` with
N_QUERIES queries, and checks (a) exactly n_queries*k output rows with
dense 0..k-1 ranks per query, (b) exact agreement with a driver-side
numpy top-k on a smaller verification corpus.

Usage: python tools/stress_ann.py [n_vectors] [n_queries] [dim]
Defaults: 1_000_000 x 1024 queries x 64 dims.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64
K = 10

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from rayhll.pipelines.similarity import brute_force_topk


def gen_vectors(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 1)
    mat = rng.standard_normal((len(ids), DIM)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), type=pa.float32()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )


queries = np.random.default_rng(99).standard_normal((NQ, DIM))

# -- exactness on a small corpus (full numpy cross-check) --------------
N_VERIFY = 50_000
ds_small = rd.range(N_VERIFY).map_batches(gen_vectors, batch_format="pyarrow")
got = brute_force_topk(ds_small, queries, k=K).to_pandas()
assert len(got) == NQ * K, len(got)
assert (got.groupby("query_idx")["rank"].count() == K).all()
small_tbl = ds_small.to_pandas().sort_values("vec_id")
mat = np.stack(small_tbl["embedding"].to_numpy()).astype(np.float64)
vec_ids = small_tbl["vec_id"].to_numpy()
matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
sims = qn @ matn.T
want = np.argsort(-sims, axis=1)[:, :K]
bad = 0
for qi in range(NQ):
    have = set(got[got.query_idx == qi]["vec_id"].tolist())
    exp = set(vec_ids[want[qi]].tolist())
    if have != exp:
        bad += 1
print(f"verify n={N_VERIFY} nq={NQ}: mismatched queries = {bad}")
assert bad == 0

# -- throughput at full scale ------------------------------------------
best = None
for attempt in range(2):
    ds = rd.range(N).map_batches(gen_vectors, batch_format="pyarrow")
    t0 = time.perf_counter()
    out = brute_force_topk(ds, queries, k=K)
    dt = time.perf_counter() - t0
    assert len(out) == NQ * K
    print(f"  pass {attempt}: {dt:.2f}s")
    best = dt if best is None else min(best, dt)

print(
    f"ann n={N} nq={NQ} dim={DIM} k={K}: best {best:.2f}s "
    f"({N / best / 1e6:.2f}M vecs/s, {N * NQ / best / 1e9:.1f}G sims/s)"
)
ray.shutdown()
