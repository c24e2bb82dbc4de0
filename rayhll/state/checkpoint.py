"""Checkpointed, resumable pipeline runs with per-partition lineage + metrics.

Layout under ``out_dir``::

    manifest.json            # lineage: settings hash, partition table, status
    partials/part-<id>.parquet   # one file per completed input partition
    metrics/part-<id>.json       # rows_in, wall_s, bytes_out, attempt count
    result/...                   # final merged output (last step)

A *partition* is one input file (or one synthetic shard) — the unit of
skip-on-resume.  Each partition's partial output is a pure function of
(partition content, settings): partial sketches are deterministic and
register-max is idempotent, so a partition that crashed mid-write is simply
re-run; writes are atomic (temp file + rename).  ``resume`` reads the
manifest, skips completed partitions, and re-merges — producing
byte-identical final sketches regardless of where the previous run died
(asserted in tests/test_checkpoint.py).

This is the batch meaning of "resumable from checkpoint": at 100 TB the
partition table is the file list, a rerun costs only the unfinished tail,
and the merge input is partials/ (thousands of KB-scale sketch files), not
the corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field


def settings_fingerprint(obj) -> str:
    """Stable fingerprint of a settings-like object (repr-based)."""
    return hashlib.sha256(repr(obj).encode()).hexdigest()[:16]


@dataclass
class Manifest:
    out_dir: str
    settings_hash: str = ""
    partitions: dict[str, dict] = field(default_factory=dict)

    @property
    def path(self) -> str:
        return os.path.join(self.out_dir, "manifest.json")

    @classmethod
    def load_or_create(cls, out_dir: str, settings_hash: str, partition_ids: list[str]) -> "Manifest":
        m = cls(out_dir=out_dir, settings_hash=settings_hash)
        if os.path.exists(m.path):
            with open(m.path) as f:
                data = json.load(f)
            if data.get("settings_hash") != settings_hash:
                raise ValueError(
                    "checkpoint settings mismatch: manifest was written with "
                    f"settings {data.get('settings_hash')}, run asked for {settings_hash}; "
                    "use a fresh out_dir"
                )
            m.partitions = data.get("partitions", {})
        for pid in partition_ids:
            m.partitions.setdefault(pid, {"status": "pending"})
        m.flush()
        return m

    def flush(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"settings_hash": self.settings_hash, "partitions": self.partitions}, f, indent=1
            )
        os.replace(tmp, self.path)  # atomic

    def pending(self) -> list[str]:
        return [p for p, st in self.partitions.items() if st.get("status") != "done"]

    def mark_done(self, pid: str, **metrics) -> None:
        self.partitions[pid] = {"status": "done", **metrics}
        self.flush()


def _atomic_write_parquet(table, path: str) -> int:
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return os.path.getsize(path)


def run_checkpointed(
    out_dir: str,
    partition_inputs: dict[str, "object"],
    partial_fn,
    merge_fn,
    settings_obj=None,
    fail_after: int | None = None,
):
    """Run ``partial_fn(partition_input) -> pyarrow.Table`` per pending
    partition (each written atomically + metrics), then
    ``merge_fn(list_of_partial_paths) -> pyarrow.Table`` over ALL partials,
    written to ``result/result.parquet``.  Returns the final table.

    :param fail_after: test hook — raise after N partitions complete, to
        simulate a crash for resume testing.
    """
    import pyarrow.parquet as pq

    sh = settings_fingerprint(settings_obj)
    pids = sorted(partition_inputs)
    manifest = Manifest.load_or_create(out_dir, sh, pids)
    os.makedirs(os.path.join(out_dir, "partials"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "metrics"), exist_ok=True)

    completed_now = 0
    for pid in pids:
        if manifest.partitions[pid].get("status") == "done":
            continue
        t0 = time.perf_counter()
        table = partial_fn(partition_inputs[pid])
        ppath = os.path.join(out_dir, "partials", f"part-{pid}.parquet")
        size = _atomic_write_parquet(table, ppath)
        wall = time.perf_counter() - t0
        metrics = {
            "rows_out": table.num_rows,
            "bytes_out": size,
            "wall_s": round(wall, 4),
            "attempts": manifest.partitions[pid].get("attempts", 0) + 1,
        }
        with open(os.path.join(out_dir, "metrics", f"part-{pid}.json"), "w") as f:
            json.dump({"partition": pid, **metrics}, f)
        manifest.mark_done(pid, **metrics)
        completed_now += 1
        if fail_after is not None and completed_now >= fail_after:
            raise RuntimeError(f"simulated crash after {completed_now} partitions")

    partial_paths = [
        os.path.join(out_dir, "partials", f"part-{pid}.parquet") for pid in pids
    ]
    final = merge_fn(partial_paths)
    os.makedirs(os.path.join(out_dir, "result"), exist_ok=True)
    _atomic_write_parquet(final, os.path.join(out_dir, "result", "result.parquet"))
    return final


def flagship_checkpointed(
    input_files: list[str], out_dir: str, settings=None, fail_after: int | None = None
):
    """Checkpointed flagship run: one partition per input parquet file.

    Partial = grouped multi-key sketch rows for that file; merge = bucketed
    vectorized merge over all partials' rows; result = per-(repo, lang)
    estimates.  Byte-deterministic across resumes."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayhll.pipelines import distinct
    from rayhll.stages import build as bs

    settings = settings or __import__(
        "rayhll.core.settings", fromlist=["HllSettings"]
    ).HllSettings(11, 5)

    def partial_fn(path: str) -> pa.Table:
        ds = rd.read_parquet(path)
        partials = ds.map_batches(
            distinct.MultiKeyBuild(settings=settings, grouped=True),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262144,
        )
        return pa.concat_tables(
            [b for b in partials.iter_batches(batch_format="pyarrow", batch_size=None)]
        )

    def merge_fn(paths: list[str]) -> pa.Table:
        all_parts = pa.concat_tables([pq.read_table(p) for p in paths])
        merger = bs.make_bucket_merger(
            list(distinct.GROUP_COLS),
            list(distinct.SKETCH_COLS),
            list(distinct.EST_COLS),
            include_sketch=True,
        )
        merged = merger(all_parts)
        # canonical order for byte-stable output
        return merged.sort_by([("repo", "ascending"), ("lang", "ascending")])

    inputs = {f"{i:05d}": p for i, p in enumerate(sorted(input_files))}
    return run_checkpointed(
        out_dir, inputs, partial_fn, merge_fn, settings_obj=settings, fail_after=fail_after
    )
