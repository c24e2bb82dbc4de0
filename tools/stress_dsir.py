"""Scale stress for DSIR importance resampling: histogram both corpora
(fixed-size tree-merged partials), weigh a many-million-doc raw corpus
against a small target, select top-k — verifying the selection is
exactly the planted target-like docs and printing docs/s.

Usage: python tools/stress_dsir.py [n_docs] [k]
"""

import sys
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

sys.path.insert(0, ".")

from rayhll.pipelines.dsir import (  # noqa: E402
    dsir_log_weights,
    dsir_select,
    hashed_ngram_counts,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    # planted: doc i is target-like iff splitmix-derived flag fires at
    # ~2*k/n rate, and target-like docs carry MORE target vocab than any
    # non-planted doc can reach — top-k by weight must be a subset of
    # the planted set (k <= planted count)
    rate = max(2 * k / n, 1e-6)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        texts = []
        planted = []
        for i in ids:
            rr = np.random.default_rng(int(i) + 99)
            is_t = rr.random() < rate
            planted.append(bool(is_t))
            n_good = int(rr.integers(25, 40)) if is_t else int(rr.integers(0, 12))
            toks = [f"tgt{rr.integers(50)}" for _ in range(n_good)]
            toks += [f"web{rr.integers(200)}" for _ in range(40 - n_good)]
            texts.append(" ".join(toks))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "planted": pa.array(planted, type=pa.bool_()),
                "text": pa.array(texts),
            }
        )

    raw = rd.range(n).map_batches(gen, batch_format="pyarrow").materialize()
    target = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {
                    "doc_id": i,
                    "text": " ".join(
                        f"tgt{j % 50}" for j in range(i, i + 30)
                    ),
                }
                for i in range(2000)
            ]
        )
    )

    t0 = time.perf_counter()
    nb = 65536
    tc = hashed_ngram_counts(target, num_buckets=nb)
    rc = hashed_ngram_counts(raw, num_buckets=nb)
    hist_wall = time.perf_counter() - t0

    t1 = time.perf_counter()
    w = dsir_log_weights(raw, tc, rc, smoothing=1e-2)
    sel = dsir_select(w, k).to_pandas()
    sel_wall = time.perf_counter() - t1

    ids = set(sel["doc_id"].tolist())

    def planted_only(t: pa.Table) -> pa.Table:
        return t.filter(t.column("planted")).select(["doc_id"])

    planted_ids = set(
        raw.map_batches(planted_only, batch_format="pyarrow")
        .to_pandas()["doc_id"]
        .tolist()
    )
    hit = len(ids & planted_ids)
    print(
        f"docs={n} k={k} planted={len(planted_ids)} | hist={hist_wall:.1f}s "
        f"weigh+select={sel_wall:.1f}s ({n / sel_wall / 1e3:.0f}k docs/s) | "
        f"selected-from-planted {hit}/{k} ({hit / k:.4f})"
    )
    assert hit == k, "top-k strayed outside the planted target-like set"
    ray.shutdown()


if __name__ == "__main__":
    main()
