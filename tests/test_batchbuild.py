"""build_grouped_sketches must be byte-identical to per-group HllSketch."""

from __future__ import annotations

import numpy as np
import pytest

from rayhll.core.batchbuild import build_grouped_sketches
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch


@pytest.mark.parametrize("expthresh", [-1, 0, 4, 18])
def test_grouped_bytes_match_individual_sketches(expthresh):
    settings = HllSettings(11, 5, expthresh=expthresh)
    rng = np.random.default_rng(5)
    n = 30_000
    codes = rng.integers(0, 300, size=n, dtype=np.int64)
    # mix of tiny groups and one huge skewed group that crosses thresholds
    codes[: n // 2] = 7
    raws = rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
    # inject duplicates
    raws[1::10] = raws[0::10]

    uniq, first_idx, counts, sketches = build_grouped_sketches(settings, codes, raws)
    assert list(uniq) == sorted(set(codes.tolist()))
    assert counts.sum() == n
    for code, fi, cnt, blob in zip(uniq, first_idx, counts, sketches):
        mask = codes == code
        assert codes[fi] == code
        assert fi == int(np.flatnonzero(mask)[0])
        assert cnt == int(mask.sum())
        ref = HllSketch(settings)
        ref.add_batch(raws[mask])
        assert blob == ref.to_bytes(), code


def test_grouped_single_group():
    settings = HllSettings(11, 5)
    raws = np.arange(100, dtype=np.int64) * 7919
    uniq, first_idx, counts, sketches = build_grouped_sketches(
        settings, np.zeros(100, dtype=np.int64), raws
    )
    ref = HllSketch(settings)
    ref.add_batch(raws)
    assert len(sketches) == 1 and sketches[0] == ref.to_bytes()
