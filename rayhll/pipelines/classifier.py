"""Distributed linear quality classifier: the fastText/CCNet-style
"train a small linear model on labeled seed data, score the whole
corpus" quality-filtering shape (Brown et al. 2020 §A; Wenzek et al.
2020) over the engine's embedding columns (typically
:class:`rayhll.pipelines.text.HashingVectorizer` vectors — no external
model, no vocabulary to ship).

Shape — mirrors :func:`rayhll.pipelines.similarity.kmeans_fit`:

* ``logreg_fit`` — full-batch gradient descent where each iteration is
  ONE streaming pass: every batch computes its partial gradient
  ``X^T (sigmoid(Xw) - y)`` plus loss/count partials against the
  broadcast weights (one ``ray.put`` per iteration), and the driver
  reduces the ~(dim+1) x n_blocks floats — the canonical
  pre-aggregate-before-reduce shape, so the per-iteration exchange is
  O(dim x blocks) regardless of corpus size.  Deterministic given the
  block layout (fixed iteration count, no RNG); the usual 100-TB recipe
  is fit on a labeled SAMPLE (tiny) and score the corpus with ONE
  zero-shuffle pass of ``logreg_predict``.
* ``logreg_predict`` — stateless ``map_batches`` scoring: appends the
  probability and hard label; nothing shuffles.

Labels are {0, 1} (validated); features are ``list<float>`` columns.
The intercept is learned as an implicit all-ones feature.

reference: no counterpart in /root/reference (python-hll is sketch-only);
builder-brief training-data-pipeline requirement (quality scoring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["logreg_fit", "logreg_predict", "logreg_fit_reference"]


def _vec_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable both tails
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _grad_partials(X: np.ndarray, y: np.ndarray, w: np.ndarray):
    """(gradient-sum over rows incl. intercept slot, log-loss sum, n)."""
    z = X @ w[:-1] + w[-1]
    p = _sigmoid(z)
    r = p - y
    g = np.concatenate((X.T @ r, [r.sum()]))
    # stable log-loss: log(1+e^-|z|) + max(z,0) - z*y
    loss = float(np.sum(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0.0) - z * y))
    return g, loss, len(y)


def logreg_fit(
    ds,
    vec_col: str = "embedding",
    label_col: str = "label",
    iters: int = 30,
    lr: float = 4.0,
    l2: float = 0.0,
):
    """Fit logistic-regression weights over the full dataset.

    Returns ``(w, history)``: ``w`` is float64 ``(dim+1,)`` with the
    intercept LAST, ``history`` the mean log-loss per iteration
    (evaluated at the iteration's starting weights — non-increasing on
    any convex problem at a sane ``lr``).  ``lr`` steps the MEAN
    gradient; ``l2`` is the standard ridge penalty on the non-intercept
    weights."""
    import ray

    if iters < 1:
        raise ValueError("iters must be >= 1")

    w: np.ndarray | None = None
    history: list[float] = []

    def make_pass(w_ref):
        def gpass(batch: pa.Table) -> pa.Table:
            wv = ray.get(w_ref)
            X = _vec_matrix(batch, vec_col)
            y = batch.column(label_col).to_numpy().astype(np.float64)
            if ((y != 0.0) & (y != 1.0)).any():
                raise ValueError(f"{label_col} must be 0/1")
            wv = (
                np.zeros(X.shape[1] + 1, dtype=np.float64)
                if wv is None
                else wv
            )
            g, loss, n = _grad_partials(X, y, wv)
            return pa.table(
                {
                    "g": pa.array([g.tobytes()], type=pa.binary()),
                    "loss": pa.array([loss], type=pa.float64()),
                    "n": pa.array([n], type=pa.int64()),
                }
            )

        return gpass

    for _ in range(iters):
        # batch_size=None: ONE gradient partial per BLOCK (the default
        # ~1k-row batches would multiply the driver-collected rows ~1000x)
        parts = ds.map_batches(
            make_pass(ray.put(w)),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ).to_pandas()  # one ~(dim+1)-float row per block — driver-small
        n = int(parts["n"].sum())
        if n == 0:
            raise ValueError("logreg_fit: empty dataset")
        g = np.sum(
            np.stack([np.frombuffer(b, dtype=np.float64) for b in parts["g"]]),
            axis=0,
        )
        if w is None:
            w = np.zeros(len(g), dtype=np.float64)
        history.append(float(parts["loss"].sum()) / n)
        step = g / n
        if l2:
            step = step + l2 * np.concatenate((w[:-1], [0.0]))
        w = w - lr * step
    return w, history


def logreg_fit_reference(
    X: np.ndarray, y: np.ndarray, iters: int = 30, lr: float = 4.0, l2: float = 0.0
):
    """Single-matrix reference implementation (test pin for the
    distributed fit): identical update rule, one numpy matrix."""
    w = np.zeros(X.shape[1] + 1, dtype=np.float64)
    history = []
    for _ in range(iters):
        g, loss, n = _grad_partials(X, y.astype(np.float64), w)
        history.append(loss / n)
        step = g / n
        if l2:
            step = step + l2 * np.concatenate((w[:-1], [0.0]))
        w = w - lr * step
    return w, history


def logreg_predict(
    ds,
    w: np.ndarray,
    vec_col: str = "embedding",
    prob_col: str = "quality_prob",
    label_col: str = "quality_label",
    threshold: float = 0.5,
):
    """Score every row against broadcast weights — one zero-shuffle pass.

    Appends ``prob_col`` (float64 sigmoid probability) and ``label_col``
    (int64 0/1 at ``threshold``)."""
    import ray

    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)  # per-worker deserialization cache
        X = _vec_matrix(batch, vec_col)
        p = _sigmoid(X @ wv[:-1] + wv[-1])
        return batch.append_column(
            prob_col, pa.array(p, type=pa.float64())
        ).append_column(
            label_col, pa.array((p >= threshold).astype(np.int64), type=pa.int64())
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
