"""logreg_fit / logreg_predict: separable crafted data converges to
perfect accuracy with monotone loss, the distributed fit matches the
single-matrix reference, label/iters validation, l2 shrinkage, and the
predict column contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayhll.pipelines.classifier import (
    logreg_fit,
    logreg_fit_reference,
    logreg_predict,
)
from rayhll.pipelines.text import HashingVectorizer


def _crafted(n_per_class=60, dim=128):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n_per_class):
        k = int(rng.integers(8, 20))
        rows.append(
            {
                "doc_id": i,
                "label": 1,
                "text": " ".join(f"good{rng.integers(40)}" for _ in range(k)),
            }
        )
        rows.append(
            {
                "doc_id": 1000 + i,
                "label": 0,
                "text": " ".join(f"spam{rng.integers(40)}" for _ in range(k)),
            }
        )
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    return ds.map_batches(
        HashingVectorizer(dim=dim), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def _matrix(ds):
    df = ds.to_pandas().sort_values("doc_id")
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    y = df["label"].to_numpy().astype(np.float64)
    return X, y


def test_separable_converges_and_matches_reference(ray_session):
    ds = _crafted()
    w, hist = logreg_fit(ds, iters=40, lr=4.0)
    # loss monotone non-increasing on a convex problem at this lr
    assert all(hist[i + 1] <= hist[i] + 1e-12 for i in range(len(hist) - 1))
    scored = logreg_predict(ds, w).to_pandas()
    assert (scored["quality_label"] == scored["label"]).all()
    # distributed == single-matrix reference modulo float reduction order
    X, y = _matrix(ds)
    w_ref, hist_ref = logreg_fit_reference(X, y, iters=40, lr=4.0)
    # the distributed pass sums per-block partials; order differs from
    # one big BLAS matmul, so equality is allclose not bit-exact
    assert np.allclose(w, w_ref, atol=1e-8)
    assert np.allclose(hist, hist_ref, atol=1e-10)


def test_l2_shrinks_weights(ray_session):
    ds = _crafted(n_per_class=30)
    w0, _ = logreg_fit(ds, iters=20, lr=2.0, l2=0.0)
    w1, _ = logreg_fit(ds, iters=20, lr=2.0, l2=0.5)
    assert np.linalg.norm(w1[:-1]) < np.linalg.norm(w0[:-1])


def test_predict_contract(ray_session):
    ds = _crafted(n_per_class=20)
    w, _ = logreg_fit(ds, iters=10)
    out = logreg_predict(ds, w, prob_col="p", label_col="l", threshold=0.9)
    df = out.to_pandas()
    assert set(["p", "l"]).issubset(df.columns)
    assert ((df["p"] >= 0) & (df["p"] <= 1)).all()
    assert ((df["l"] == 1) == (df["p"] >= 0.9)).all()


def test_validation(ray_session):
    bad = rd.from_items(
        [{"embedding": [0.1, 0.2], "label": 2}, {"embedding": [0.3, 0.1], "label": 0}]
    )
    with pytest.raises(Exception, match="0/1"):
        logreg_fit(bad, iters=1)
    ds = _crafted(n_per_class=5)
    with pytest.raises(ValueError, match="iters"):
        logreg_fit(ds, iters=0)
