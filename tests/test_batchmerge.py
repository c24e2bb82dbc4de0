"""merge_grouped_blobs must equal per-group sequential HllSketch.union."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayhll.core.batchmerge import blob_cardinality, merge_grouped_blobs
from rayhll.core.serde import from_bytes
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch


def _make_blob(settings, values):
    sk = HllSketch(settings)
    if len(values):
        sk.add_batch(np.asarray(values, dtype=np.int64))
    return sk.to_bytes()


@pytest.mark.parametrize("expthresh", [-1, 4, 18])
@pytest.mark.parametrize("as_arrow", [True, False])
def test_merge_matches_sequential_union(expthresh, as_arrow):
    settings = HllSettings(11, 5, expthresh=expthresh)
    rng = np.random.default_rng(11)
    codes, blobs, streams = [], [], {}
    for g in range(40):
        n_parts = int(rng.integers(1, 6))
        for _ in range(n_parts):
            # sizes spanning EXPLICIT through FULL
            n = int(rng.integers(1, 40 if g % 3 else 3000))
            vals = rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
            codes.append(g)
            blobs.append(_make_blob(settings, vals))
            streams.setdefault(g, []).append(vals)
    codes = np.array(codes, dtype=np.int64)
    col = pa.array(blobs, type=pa.binary()) if as_arrow else blobs

    uniq, first_idx, merged = merge_grouped_blobs(settings, codes, col)
    assert list(uniq) == sorted(streams)
    for g, blob in zip(uniq.tolist(), merged):
        acc = None
        for vals in streams[g]:
            part = HllSketch(settings)
            part.add_batch(vals)
            if acc is None:
                acc = part
            else:
                acc.union(part)
        assert blob == acc.to_bytes(), g
        assert blob_cardinality(blob) == acc.cardinality()


def test_merge_with_empty_blobs():
    settings = HllSettings(11, 5)
    blobs = [
        _make_blob(settings, []),
        _make_blob(settings, [1, 2, 3]),
        _make_blob(settings, []),
    ]
    codes = np.array([0, 0, 1], dtype=np.int64)
    uniq, _, merged = merge_grouped_blobs(settings, codes, blobs)
    assert from_bytes(merged[0]).cardinality() == 3
    assert from_bytes(merged[1]).cardinality() == 0


def test_merge_sliced_arrow_column():
    settings = HllSettings(11, 5)
    blobs = [_make_blob(settings, [i, i + 1]) for i in range(10)]
    col = pa.array(blobs, type=pa.binary()).slice(4, 6)
    codes = np.zeros(6, dtype=np.int64)
    _, _, merged = merge_grouped_blobs(settings, codes, col)
    acc = HllSketch(settings)
    acc.add_batch(np.arange(4, 11, dtype=np.int64))
    assert merged[0] == acc.to_bytes()
