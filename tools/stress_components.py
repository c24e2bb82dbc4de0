"""Scale stress for connected_components (distributed star rounds).

Two adversarial graph shapes at millions of edges:

* ``path`` — one long path (maximum diameter, worst case for star
  rounds: label information must travel the whole chain, so this pins
  the O(log n) round count rather than the per-round cost);
* ``random`` — a sparse Erdos-Renyi-ish graph with a planted giant
  component plus many small ones (the realistic near-dup-graph shape);
* ``star`` — ONE flat component of n_edges+1 nodes all paired with the
  minimum node (the boilerplate/empty-doc case a web corpus
  guarantees): the mu-round's hot-degree broadcast must absorb the
  root, or every edge funnels through one reduce task.

Verifies against the driver method (vectorized min-propagation) at any
size the driver can hold, and prints rounds + wall + edges/s.

Usage: python tools/stress_components.py [n_edges] [shape]
"""

import sys
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

sys.path.insert(0, ".")

from rayhll.pipelines.components import connected_components  # noqa: E402


def build_edges(n_edges: int, shape: str) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(7)
    if shape == "path":
        perm = rng.permutation(n_edges + 1).astype(np.int64)
        return perm[:-1], perm[1:]
    if shape == "star":
        hub = np.full(n_edges, 3, dtype=np.int64)  # hub is NOT id 0 on purpose
        leaves = rng.permutation(n_edges).astype(np.int64) + 4
        return hub, leaves
    # random: half the edges in a giant component over [0, n), half in
    # small cliquelets of 4 over [n, 2n)
    n = n_edges
    a1 = rng.integers(0, n // 2, size=n // 2, dtype=np.int64)
    b1 = rng.integers(0, n // 2, size=n // 2, dtype=np.int64)
    base = (rng.integers(0, n // 8, size=n - n // 2, dtype=np.int64)) * 4 + n
    off = rng.integers(0, 4, size=n - n // 2, dtype=np.int64)
    a2, b2 = base, base + off
    return np.concatenate((a1, a2)), np.concatenate((b1, b2))


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    shape = sys.argv[2] if len(sys.argv) > 2 else "random"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    a, b = build_edges(n_edges, shape)
    pairs = rd.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    ).repartition(64).materialize()

    stats: dict = {}
    t0 = time.perf_counter()
    comp = connected_components(
        pairs, method="distributed", stats_out=stats
    ).materialize()
    wall = time.perf_counter() - t0

    got = comp.to_pandas()
    t1 = time.perf_counter()
    drv = (
        connected_components(pairs, method="driver", max_driver_edges=1 << 40)
        .to_pandas()
    )
    drv_wall = time.perf_counter() - t1
    g = got.sort_values("doc_id").reset_index(drop=True)
    d = drv.sort_values("doc_id").reset_index(drop=True)
    assert g.equals(d), "distributed != driver labels"
    n_comp = g["cluster_id"].nunique()
    print(
        f"shape={shape} edges={n_edges} nodes={len(g)} components={n_comp} "
        f"rounds={stats['rounds']} distributed={wall:.1f}s "
        f"({n_edges / wall / 1e6:.2f}M edges/s) driver={drv_wall:.1f}s"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
