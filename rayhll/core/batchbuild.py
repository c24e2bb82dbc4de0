"""Vectorized many-sketch builder for grouped pre-aggregation.

A grouped ``map_batches`` pre-aggregation stage builds one sketch per group
per batch; with high-cardinality group keys that is thousands of small
sketches per batch, and generic per-sketch object overhead dominates.  This
module builds ALL of a batch's per-group sketches in one pass:

* one ``np.lexsort`` over (group code, raw value) orders and dedups every
  group's values simultaneously;
* groups whose distinct count stays at or below the EXPLICIT threshold —
  the overwhelming majority under any realistic group-key distribution —
  are serialized straight from slices of one shared big-endian buffer
  (values are already sorted signed-ascending, exactly the storage-spec
  EXPLICIT word order — reference: python_hll/hll.py:708-720);
* only groups that cross the threshold fall back to the full
  :class:`~rayhll.core.sketch.HllSketch` state machine.

The produced bytes are identical to building each group's ``HllSketch``
individually (asserted in tests/test_batchbuild.py).
"""

from __future__ import annotations

import numpy as np

from rayhll.core.hlltype import HllType
from rayhll.core.serde import SCHEMA_VERSION
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch


def _explicit_header(settings: HllSettings) -> bytes:
    if settings.explicit_off:
        cutoff = 0
    elif settings.explicit_auto:
        cutoff = 63
    else:
        cutoff = settings.log2_explicit_threshold() + 1
    return bytes(
        (
            (SCHEMA_VERSION << 4) | int(HllType.EXPLICIT),
            ((settings.regwidth - 1) << 5) | settings.log2m,
            ((0 if settings.sparse_off else 1) << 6) | (cutoff & 0x3F),
        )
    )


def build_grouped_sketches(
    settings: HllSettings,
    codes: np.ndarray,
    raws: np.ndarray,
    valid: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, list[bytes]]:
    """Build one serialized sketch per distinct group code.

    :param codes: int group codes, one per row (any integer dtype).
    :param raws: pre-hashed signed int64 values, one per row.
    :param valid: optional bool mask — rows where it is False keep their
        group membership (first_idx / counts) but contribute NO value to the
        group's sketch (SQL ``COUNT(DISTINCT col)`` ignores NULLs); a group
        with no valid rows gets an EMPTY sketch.
    :returns: (unique codes ascending, first row index of each code in the
        ORIGINAL array, row count per code, serialized sketch per code).
    """
    if valid is not None and not valid.all():
        codes = np.ascontiguousarray(codes)
        # group stats over ALL rows
        all_uniq, inv = np.unique(codes, return_inverse=True)
        first_idx = np.full(len(all_uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_idx, inv, np.arange(len(codes), dtype=np.int64))
        counts = np.bincount(inv, minlength=len(all_uniq)).astype(np.int64)
        # sketch contents over valid rows only
        out: list[bytes] = [HllSketch(settings).to_bytes()] * len(all_uniq)
        if valid.any():
            v_uniq, _, _, v_out = build_grouped_sketches(
                settings, codes[valid], np.ascontiguousarray(raws)[valid]
            )
            for p, blob in zip(np.searchsorted(all_uniq, v_uniq).tolist(), v_out):
                out[p] = blob
        return all_uniq, first_idx, counts, out
    codes = np.ascontiguousarray(codes)
    raws = np.ascontiguousarray(raws, dtype=np.int64)
    order = np.lexsort((raws, codes))
    c = codes[order]
    r = raws[order]
    # drop duplicate (code, raw) pairs — sets are duplicate-insensitive
    keep = np.r_[True, (c[1:] != c[:-1]) | (r[1:] != r[:-1])]
    c = c[keep]
    r = r[keep]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    ends = np.r_[starts[1:], len(c)]
    uniq_codes = c[starts]

    # first occurrence of each code in the original row order + row counts
    pos = np.searchsorted(uniq_codes, codes)
    first_idx = np.full(len(uniq_codes), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_idx, pos, np.arange(len(codes), dtype=np.int64))
    counts = np.bincount(pos, minlength=len(uniq_codes)).astype(np.int64)

    threshold = settings.explicit_threshold
    big = r.astype(">i8")  # one shared big-endian buffer; sorted within group
    header = _explicit_header(settings)
    out: list[bytes] = []
    for s0, e0 in zip(starts.tolist(), ends.tolist()):
        n = e0 - s0  # always >= 1: every emitted group has at least one row
        if n <= threshold:
            out.append(header + big[s0:e0].tobytes())
        else:
            sk = HllSketch(settings)
            sk.add_batch(r[s0:e0])
            out.append(sk.to_bytes())
    return uniq_codes, first_idx, counts, out


def build_single_sketch(settings: HllSettings, raws: np.ndarray) -> bytes:
    """Serialized sketch of one value array (ungrouped fast path)."""
    sk = HllSketch(settings)
    sk.add_batch(np.ascontiguousarray(raws, dtype=np.int64))
    return sk.to_bytes()
