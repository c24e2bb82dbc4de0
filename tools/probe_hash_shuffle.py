"""Probe: does Ray's hash-shuffle strategy (and Dataset.join) work in this
Ray version, or does it still hang (round-1 finding: HASH_SHUFFLE aggregator
actors deadlock local small-CPU sessions in Ray 2.49)?

Run standalone:  timeout 120 python tools/probe_hash_shuffle.py
Exit 0 = works (delete the bucketed tag-union join workaround in
rayhll/pipelines/dedup.py); nonzero/timeout = still broken (keep it).
"""
import sys

import numpy as np
import pyarrow as pa

import ray


def main() -> int:
    ray.init(address="local", num_cpus=4, include_dashboard=False)
    try:
        import ray.data as rd
        from ray.data.context import DataContext, ShuffleStrategy

        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        n = 200_000
        t = pa.table({"k": pa.array(np.arange(n) % 1000), "v": pa.array(np.arange(n))})
        out = rd.from_arrow(t).repartition(8).groupby("k").count().take_all()
        assert len(out) == 1000, len(out)
        print("hash-shuffle groupby: OK")
        left = rd.from_arrow(pa.table({"k": pa.array(np.arange(1000)), "a": pa.array(np.arange(1000))}))
        right = rd.from_arrow(pa.table({"k": pa.array(np.arange(500)), "b": pa.array(np.arange(500))}))
        j = left.join(right, join_type="inner", num_partitions=4, on=("k",)).take_all()
        assert len(j) == 500, len(j)
        print("Dataset.join: OK")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
