"""Golden-file conformance: replay the postgresql-hll corpus byte-for-byte.

Mirrors the reference's integration harness
(reference: tests/test_integration.py:123-176, tests/data/README.txt): each
row's expected hex is asserted byte-exactly AND re-deserialized as the next
accumulator state, so a mismatch cannot cascade.  Files absent from the
sandbox (listed in /root/reference/.MISSING_LARGE_BLOBS) are skipped.
"""

from __future__ import annotations

import csv
import os

import pytest

from rayhll.core import serde
from rayhll.core.hlltype import HllType
from rayhll.core.sketch import HllSketch

DATA_DIR = "/root/reference/tests/data"

LOG2M = 11
REGWIDTH = 5
EXPLICIT_THRESHOLD = 256
SPARSE_THRESHOLD = 850


def _rows(filename):
    path = os.path.join(DATA_DIR, filename)
    if not os.path.exists(path):
        pytest.skip(f"{filename} absent in sandbox (.MISSING_LARGE_BLOBS)")
    with open(path) as f:
        return list(csv.DictReader(f))


def _from_hex(s: str) -> HllSketch:
    return HllSketch.from_bytes(serde.from_pg_hex(s))


def _to_hex(h: HllSketch) -> str:
    return serde.to_pg_hex(h.to_bytes())


def do_test_add(filename):
    rows = _rows(filename)
    hll = _from_hex(rows[0]["multiset"])
    for line, row in enumerate(rows[1:], start=2):
        hll.add_raw(int(row["raw_value"]))
        assert hll.float_cardinality() == pytest.approx(
            float(row["cardinality"])
        ), f"{filename}:{line}"
        assert _to_hex(hll) == row["multiset"], f"{filename}:{line}"
        hll = _from_hex(row["multiset"])


def do_test_union(filename):
    rows = _rows(filename)
    hll = _from_hex(rows[0]["union_multiset"])
    for line, row in enumerate(rows[1:], start=2):
        other = _from_hex(row["multiset"])
        assert other.float_cardinality() == pytest.approx(
            float(row["cardinality"])
        ), f"{filename}:{line}:multiset"
        hll.union(other)
        assert hll.float_cardinality() == pytest.approx(
            float(row["union_cardinality"])
        ), f"{filename}:{line}"
        assert _to_hex(hll) == row["union_multiset"], f"{filename}:{line}"
        hll = _from_hex(row["union_multiset"])


@pytest.mark.parametrize(
    "filename",
    [
        "cumulative_add_cardinality_correction.csv",
        "cumulative_add_comprehensive_promotion.csv",
        "cumulative_add_sparse_edge.csv",
        "cumulative_add_sparse_random.csv",
        "cumulative_add_sparse_step.csv",
    ],
)
def test_cumulative_add(filename):
    do_test_add(filename)


@pytest.mark.parametrize(
    "filename",
    [
        "cumulative_union_comprehensive.csv",
        "cumulative_union_explicit_explicit.csv",
        "cumulative_union_explicit_promotion.csv",
        "cumulative_union_probabilistic_probabilistic.csv",
        "cumulative_union_sparse_promotion.csv",
        "cumulative_union_sparse_sparse.csv",
    ],
)
def test_cumulative_union(filename):
    do_test_union(filename)


def construct_hll_value(log2m: int, register_index: int, register_value: int) -> int:
    """Raw int64 that sets exactly one chosen register
    (reference: tests/probabilistic_test_util.py:8-23)."""
    return ((1 << (register_value - 1)) << log2m) | register_index


def _new_hll(type: HllType) -> HllSketch:
    return HllSketch.for_testing(
        LOG2M, REGWIDTH, EXPLICIT_THRESHOLD, SPARSE_THRESHOLD, type
    )


def test_cumulative_union_sparse_full_representation():
    """Special-cased per the reference (tests/test_integration.py:67-99)."""
    rows = _rows("cumulative_union_sparse_full_representation.csv")

    def check(hll, union_hll, row, line):
        assert hll.float_cardinality() == pytest.approx(float(row["cardinality"])), line
        assert _to_hex(hll) == row["HLL"], line
        assert union_hll.float_cardinality() == pytest.approx(
            float(row["union_cardinality"])
        ), line
        assert _to_hex(union_hll) == row["union_HLL"], line

    empty_1, empty_2 = _new_hll(HllType.EMPTY), _new_hll(HllType.EMPTY)
    check(empty_1, empty_2, rows[0], 1)

    full_hll = _new_hll(HllType.FULL)
    full_hll.add_raw(construct_hll_value(LOG2M, 0, 1))
    sparse_hll = _new_hll(HllType.SPARSE)
    sparse_hll.add_raw(construct_hll_value(LOG2M, 0, 1))
    check(full_hll, sparse_hll, rows[1], 2)

    full_hll_2 = _new_hll(HllType.FULL)
    full_hll_2.add_raw(construct_hll_value(LOG2M, 1, 1))
    sparse_hll.add_raw(construct_hll_value(LOG2M, 1, 1))
    check(full_hll_2, sparse_hll, rows[2], 3)

    full_hll_3 = _new_hll(HllType.FULL)
    for i in range(2, SPARSE_THRESHOLD + 1):
        full_hll_3.add_raw(construct_hll_value(LOG2M, i, 1))
        sparse_hll.add_raw(construct_hll_value(LOG2M, i, 1))
    check(full_hll_3, sparse_hll, rows[3], 4)
