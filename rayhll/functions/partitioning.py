"""Canonical co-locating-bucket fanout sizing for groupby reduce stages.

Every ``groupby(bucket).map_groups`` stage whose reduce input scales with
the RAW row count (dedup hash rows, sessionization events, curation key
rows, join sides) sizes its fanout here: explicit values win, ``None``
auto-targets :data:`TARGET_ROWS_PER_TASK` rows per reduce task so no task
OOMs at 100-TB inputs however vectorized its kernel.  Stages whose reduce
input is combiner-bounded (per-batch top-k cuts, pre-aggregated sketch
partials) keep small fixed fanouts instead — auto-sizing from raw rows
would over-provision them.
"""

from __future__ import annotations

import numpy as np

#: target rows per reduce task (~tens of MB for compact key rows)
TARGET_ROWS_PER_TASK = 2_000_000


def buckets_for_rows(
    n: int, rows_per_input_row: float = 1.0, floor: int = 64, cap: int = 1 << 20
) -> int:
    """Power-of-two fanout targeting ``TARGET_ROWS_PER_TASK`` rows/task."""
    want = max(1, int(np.ceil(n * rows_per_input_row / TARGET_ROWS_PER_TASK)))
    return max(floor, min(cap, 1 << (want - 1).bit_length()))


def resolve_num_buckets(
    ds, num_buckets, rows_per_input_row: float = 1.0, floor: int = 64
) -> int:
    """Explicit ``num_buckets`` wins (validated); ``None`` auto-sizes from
    the dataset's METADATA row count (``_meta_count`` — available for
    un-transformed reads/ranges, the normal call shape, and never executes
    the plan).  Transformed inputs have no metadata count and fall back to
    ``floor`` — auto-sizing must never silently double-execute an upstream
    pipeline; pass ``num_buckets`` explicitly there."""
    if num_buckets is not None:
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        return int(num_buckets)
    try:
        n = ds._meta_count()
    except Exception:
        return floor
    if not n:
        return floor
    return buckets_for_rows(n, rows_per_input_row, floor=floor)
