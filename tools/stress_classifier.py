"""Scale stress for the quality classifier: fit on a small labeled seed
set (the realistic shape — labels are expensive), then score a large
synthetic corpus with the zero-shuffle predict pass.  Verifies exact
class separation on the planted vocabularies and prints docs/s for the
corpus-scale leg.

Usage: python tools/stress_classifier.py [n_docs]
"""

import sys
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

sys.path.insert(0, ".")

from rayhll.pipelines.classifier import logreg_fit, logreg_predict  # noqa: E402
from rayhll.pipelines.text import HashingVectorizer  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    rng = np.random.default_rng(11)
    seed_rows = []
    for i in range(400):
        k = int(rng.integers(10, 30))
        seed_rows.append(
            {"label": 1, "text": " ".join(f"good{rng.integers(80)}" for _ in range(k))}
        )
        seed_rows.append(
            {"label": 0, "text": " ".join(f"spam{rng.integers(80)}" for _ in range(k))}
        )
    vec = HashingVectorizer(dim=256)
    seed = (
        rd.from_arrow(pa.Table.from_pylist(seed_rows))
        .repartition(8)
        .map_batches(vec, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    t0 = time.perf_counter()
    w, hist = logreg_fit(seed, iters=40, lr=4.0)
    fit_wall = time.perf_counter() - t0

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        r = np.random.default_rng(7)  # content seeded per value below
        texts, labels = [], []
        for i in ids:
            cls = int(i) % 2
            rr = np.random.default_rng(int(i))
            word = "good" if cls else "spam"
            texts.append(
                " ".join(f"{word}{rr.integers(80)}" for _ in range(16))
            )
            labels.append(cls)
        del r
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "want": pa.array(labels, type=pa.int64()),
                "text": pa.array(texts),
            }
        )

    corpus = (
        rd.range(n)
        .map_batches(gen, batch_format="pyarrow")
        .map_batches(vec, batch_format="pyarrow", zero_copy_batch=True)
    )
    t1 = time.perf_counter()
    scored = logreg_predict(corpus, w)

    def check(t: pa.Table) -> pa.Table:
        ok = int(
            (t.column("quality_label").to_numpy() == t.column("want").to_numpy()).sum()
        )
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "ok": pa.array([ok], type=pa.int64()),
            }
        )

    agg = scored.map_batches(check, batch_format="pyarrow").to_pandas()
    wall = time.perf_counter() - t1
    total, ok = int(agg["n"].sum()), int(agg["ok"].sum())
    print(
        f"seed=800 fit={fit_wall:.1f}s (40 iters, final loss {hist[-1]:.4f}) | "
        f"scored {total} docs in {wall:.1f}s ({total / wall / 1e3:.0f}k docs/s) "
        f"accuracy={ok / total:.4f}"
    )
    assert ok == total, f"misclassified {total - ok} planted docs"
    ray.shutdown()


if __name__ == "__main__":
    main()
