"""Approximate nearest-neighbor search over an embedding column.

* :func:`brute_force_topk` — the exactness baseline: every batch computes a
  partial top-k against the broadcast query matrix (one numpy matmul per
  batch; queries travel via ``ray.put`` ONCE, read per task, never
  re-shipped per batch), then a tiny reduce merges partial top-ks.
* :func:`ivf_topk` — the scale path: an IVF index.  Centroids are trained on
  a driver-side sample (k-means on <=50k rows is driver-trivial), broadcast
  once, every batch assigns its vectors to their nearest centroid, and the
  search probes only the ``nprobe`` closest lists.  At 100 TB the assignment
  is a streaming map and the probe prunes ~(1 - nprobe/nlist) of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _vec_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


class _PartialTopK:
    """Per-batch partial top-k vs the broadcast query matrix.

    The similarity matrix is computed in row-chunks of the batch so the
    (n_queries x chunk) float64 buffer stays ~32 MB regardless of block
    size — with many queries an unchunked buffer over a 100-TB-scale
    block (~500k rows) would be multi-GB per task.  Per-chunk top-k rows
    are exact partials of the batch top-k; the final argpartition over
    the k*n_chunks survivors restores exactly k rows per query."""

    _CHUNK_ELEMS = 1 << 22  # sims elements per chunk (~32 MB float64)

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int):
        self.queries = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_vec_matrix(batch, self.vec_col))
        ids = batch.column(self.id_col).to_numpy()
        n_q = self.queries.shape[0]
        chunk = max(self.k, self._CHUNK_ELEMS // max(1, n_q))
        sel_idx, sel_sims = [], []
        for lo in range(0, len(mat), chunk):
            sims = self.queries @ mat[lo : lo + chunk].T  # (n_q, <=chunk)
            k = min(self.k, sims.shape[1])
            part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
            sel_idx.append(part + lo)
            sel_sims.append(np.take_along_axis(sims, part, axis=1))
        cand_idx = np.concatenate(sel_idx, axis=1)  # (n_q, k*n_chunks)
        cand_sims = np.concatenate(sel_sims, axis=1)
        k = min(self.k, cand_sims.shape[1])
        if cand_sims.shape[1] > k:
            part = np.argpartition(-cand_sims, kth=k - 1, axis=1)[:, :k]
            cand_idx = np.take_along_axis(cand_idx, part, axis=1)
            cand_sims = np.take_along_axis(cand_sims, part, axis=1)
        return pa.table(
            {
                "query_idx": pa.array(
                    np.repeat(np.arange(n_q, dtype=np.int64), k), type=pa.int64()
                ),
                self.id_col: pa.array(ids[cand_idx.ravel()], type=pa.int64()),
                "cosine": pa.array(cand_sims.ravel(), type=pa.float64()),
            }
        )


def _topk_within(tbl: pa.Table, k: int) -> pa.Table:
    """Keep the top-k rows by cosine per query_idx, vectorized (one lexsort,
    no per-query Python loop)."""
    if len(tbl) == 0:
        return tbl
    q = tbl.column("query_idx").to_numpy()
    s = tbl.column("cosine").to_numpy()
    order = np.lexsort((-s, q))
    qs = q[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(qs)) + 1))
    counts = np.diff(np.concatenate((starts, [len(qs)])))
    rank = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, counts)
    return tbl.take(pa.array(order[rank < k]))


def _reduce_topk(partial, k: int, id_col: str) -> pa.Table:
    """Distributed top-k reduce (VERDICT r1 item 2): partial candidates are
    tree-merged in ``map_batches`` strips (each strip folds ~thousands of
    candidate rows down to <= n_queries * k), then one ``groupby(query_idx)``
    over the shrunken survivors picks the global top-k per query.  The driver
    only ever collects the final n_queries * k rows — never the
    O(#blocks * k * n_queries) candidate set."""
    combined = partial.map_batches(
        lambda t: _topk_within(t, k), batch_format="pyarrow", batch_size=65536
    )

    def final_topk(tbl: pa.Table) -> pa.Table:
        top = _topk_within(tbl, k)
        # order rows by cosine desc and emit the rank
        order = np.argsort(-top.column("cosine").to_numpy(), kind="stable")
        top = top.take(pa.array(order))
        return top.append_column(
            "rank", pa.array(np.arange(len(top), dtype=np.int64), type=pa.int64())
        )

    merged = combined.groupby("query_idx").map_groups(final_topk, batch_format="pyarrow")
    out = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    order = np.lexsort(
        (out.column("rank").to_numpy(), out.column("query_idx").to_numpy())
    )
    return out.select(["query_idx", id_col, "cosine", "rank"]).take(pa.array(order))


def brute_force_topk(
    ds, queries: np.ndarray, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> pa.Table:
    """Exact cosine top-k of each query row against the dataset.

    Returns an Arrow table (query_idx, id_col, cosine, rank) with k rows per
    query, rank 0 = most similar."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(queries)
    partial = ds.map_batches(
        _PartialTopK(qref, vec_col, id_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _reduce_topk(partial, k, id_col)


def train_centroids(
    ds, vec_col: str, nlist: int, sample_rows: int = 20000, iters: int = 8, seed: int = 0
) -> np.ndarray:
    """k-means centroids from a driver-side sample (normalized)."""
    sample = ds.limit(sample_rows).to_pandas()
    mat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class _IVFProbe:
    """Probe stage: keep only vectors whose centroid is among each query's
    ``nprobe`` nearest lists, then score them."""

    def __init__(self, queries_ref, centroids_ref, vec_col, id_col, k, nprobe):
        self.queries = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        qc = self.queries @ self.centroids.T
        nprobe = min(nprobe, qc.shape[1])
        self.probe_lists = np.argpartition(-qc, kth=nprobe - 1, axis=1)[:, :nprobe]
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_vec_matrix(batch, self.vec_col))
        ids = batch.column(self.id_col).to_numpy()
        assign = (mat @ self.centroids.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(self.queries)):
            mask = np.isin(assign, self.probe_lists[qi])
            if not mask.any():
                continue
            sub = mat[mask]
            sims = sub @ self.queries[qi]
            k = min(self.k, len(sims))
            sel = np.argpartition(-sims, kth=k - 1)[:k]
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_id.append(ids[mask][sel])
            out_sim.append(sims[sel])
        if not out_q:
            return pa.table(
                {
                    "query_idx": pa.array([], type=pa.int64()),
                    self.id_col: pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q), type=pa.int64()),
                self.id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def ivf_build_index(
    ds,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 32,
) -> np.ndarray:
    """Build an on-disk IVF index: vectors written as parquet PARTITIONED BY
    their nearest-centroid list (``index_dir/list_id=<n>/``), centroids
    saved alongside.  Unlike the in-stream :func:`ivf_topk` (which prunes
    compute but still reads every row), a search against this layout reads
    ONLY the probed partitions — I/O pruning, the true IVF scale story.
    Returns the centroid matrix."""
    import json
    import os

    centroids = train_centroids(ds, vec_col, nlist)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = np.asarray(ray.get(cref))
        mat = _normalize(_vec_matrix(batch, vec_col))
        lists = (mat @ cent.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lists, type=pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    return centroids


def ivf_search_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 8,
) -> pa.Table:
    """Top-k search against an :func:`ivf_build_index` layout: only the
    union of the queries' ``nprobe`` nearest lists is READ (path-level
    partition pruning), then the pruned subset is scored exactly (same
    distributed reduce as brute force)."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = _normalize(np.asarray(json.load(f), dtype=np.float64))
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = _normalize(queries)
    qc = qn @ centroids.T
    nprobe = min(nprobe, qc.shape[1])
    probe = np.unique(np.argpartition(-qc, kth=nprobe - 1, axis=1)[:, :nprobe])
    import glob as _glob

    paths = []
    for l in probe:
        paths.extend(
            sorted(_glob.glob(os.path.join(index_dir, f"list_id={int(l)}", "*.parquet")))
        )
    pruned = rd.read_parquet(paths, columns=[id_col, vec_col])
    return brute_force_topk(pruned, queries, k=k, vec_col=vec_col, id_col=id_col)


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 32,
    nprobe: int = 8,
) -> pa.Table:
    """IVF-pruned approximate top-k (same output schema as brute force)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    centroids = train_centroids(ds, vec_col, nlist)
    qref, cref = ray.put(queries), ray.put(centroids)
    partial = ds.map_batches(
        _IVFProbe(qref, cref, vec_col, id_col, k, nprobe),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _reduce_topk(partial, k, id_col)


# ---------------------------------------------------------------------------
# distributed k-means (semantic clustering for data-mixing / semantic dedup)


def kmeans_fit(
    ds,
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 8,
    init_sample: int = 20000,
    seed: int = 0,
):
    """Distributed spherical k-means (Lloyd's) over the FULL dataset.

    Init = sample k-means on the driver (:func:`train_centroids`); then each
    iteration is ONE streaming pass: every batch assigns its vectors to the
    broadcast centroids and emits k partial rows (count, vector sum,
    cosine-sum), and the M-step reduces the ~k x n_blocks partials on the
    driver — the canonical pre-aggregate-before-reduce shape, so the per-
    iteration exchange is O(k x dim x blocks) regardless of corpus size.

    Returns ``(centroids, inertia_history)`` where centroids are unit-norm
    ``(k, dim)`` and inertia is ``sum(1 - cos(vec, centroid))`` per
    iteration.  A cluster that receives no vectors is RE-SEEDED by splitting
    the most populous cluster (:func:`_reseed_empty`: donor centroid plus a
    tiny deterministic perturbation), so no centroid stays dead on skewed
    data; inertia is non-increasing except on the iteration immediately
    after a re-seed fires.
    """
    cent = train_centroids(ds, vec_col, k, sample_rows=init_sample, iters=3, seed=seed)
    k = len(cent)  # may be < requested when the sample is tiny
    history: list[float] = []

    def make_estep(cent_ref):
        def estep(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mat = _normalize(_vec_matrix(batch, vec_col))
            sims = mat @ c.T
            assign = sims.argmax(axis=1)
            best = sims[np.arange(len(mat)), assign]
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            sums = np.zeros((len(c), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            cos_sum = np.zeros(len(c), dtype=np.float64)
            np.add.at(cos_sum, assign, best)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c)), type=pa.int64()),
                    "count": pa.array(counts, type=pa.int64()),
                    "cos_sum": pa.array(cos_sum, type=pa.float64()),
                    "vec_sum": pa.array(
                        [s.tobytes() for s in sums], type=pa.binary()
                    ),
                }
            )

        return estep

    for _ in range(iters):
        cent_ref = ray.put(cent)
        # batch_size=None: ONE k-row partial per BLOCK (the default
        # ~1k-row batches would emit k rows per batch — ~1000x the
        # driver-collected volume at corpus scale; PERF_NOTES #48)
        parts = ds.map_batches(
            make_estep(cent_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ).to_pandas()  # ~k rows per block — driver-small by construction
        dim = cent.shape[1]
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        cos = np.zeros(k, dtype=np.float64)
        cl = parts["cluster"].to_numpy()
        np.add.at(counts, cl, parts["count"].to_numpy())
        np.add.at(cos, cl, parts["cos_sum"].to_numpy())
        blob = np.stack(
            [np.frombuffer(b, dtype=np.float64) for b in parts["vec_sum"]]
        )
        np.add.at(sums, cl, blob)
        n = int(counts.sum())
        history.append(float(n - cos.sum()))
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _reseed_empty(_normalize(cent), counts)
    return cent, history


def _reseed_empty(cent: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Re-seed empty clusters by splitting the largest ones: an empty
    centroid becomes the most populous donor's centroid plus a tiny
    deterministic one-hot perturbation (re-normalized), so the next E-step
    splits the donor's members instead of wasting k on a dead cluster.
    Deterministic — no RNG (retry/resume safety, SURVEY §7.4)."""
    empty = np.flatnonzero(counts == 0)
    if not len(empty) or len(empty) == len(counts):
        return cent
    donors = np.argsort(-counts)[: max(len(counts) - len(empty), 1)]
    cent = cent.copy()
    for rank, e in enumerate(empty):
        d = donors[rank % len(donors)]
        nudged = cent[d].copy()
        nudged[e % cent.shape[1]] += 1e-3
        cent[e] = nudged
    return _normalize(cent)


def kmeans_assign(
    ds, centroids: np.ndarray, vec_col: str = "embedding", id_col: str = "vec_id"
):
    """Assign every vector to its nearest (max-cosine) centroid: a streaming
    broadcast map appending ``cluster`` (int64) and ``cosine`` (float64)."""
    cent_ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _normalize(_vec_matrix(batch, vec_col))
        sims = mat @ c.T
        a = sims.argmax(axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a, type=pa.int64()),
                "cosine": pa.array(sims[np.arange(len(mat)), a], type=pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
