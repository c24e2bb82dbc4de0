"""Set-operation estimators and sketch-table hex round-trips."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch
from rayhll.functions.setops import (
    estimate_difference,
    estimate_intersection,
    estimate_jaccard,
    estimate_union,
)
from rayhll.sources.io import hex_to_sketches, refinalize_estimates, sketches_to_hex


def _sk(values, settings):
    h = HllSketch(settings)
    h.add_batch(np.asarray(values, dtype=np.int64))
    return h


def test_setops_exact_in_explicit_mode():
    s = HllSettings(11, 5, expthresh=18)
    a = _sk(range(0, 1000), s)
    b = _sk(range(600, 1500), s)
    assert estimate_union(a, b) == 1500
    assert estimate_intersection(a, b) == 400
    assert estimate_difference(a, b) == 600
    assert estimate_jaccard(a, b) == 400 / 1500
    # non-mutating
    assert a.cardinality() == 1000 and b.cardinality() == 900


def test_setops_probabilistic_within_compound_bound():
    s = HllSettings(14, 5, expthresh=0)
    rng = np.random.default_rng(0)
    pool = rng.integers(-(2**63), 2**63 - 1, size=60_000, dtype=np.int64)
    a = _sk(pool[:40_000], s)
    b = _sk(pool[20_000:], s)
    union_err = abs(estimate_union(a, b) - 60_000) / 60_000
    assert union_err < 3 * 1.04 / np.sqrt(2**14)
    inter = estimate_intersection(a, b)
    # inclusion-exclusion combines three estimates; σ ≈ rel_err *
    # sqrt(|A|² + |B|² + |A∪B|²); assert within 4σ (pinned seed)
    sigma = 1.04 / np.sqrt(2**14) * np.sqrt(40_000**2 + 40_000**2 + 60_000**2)
    assert abs(inter - 20_000) < 4 * sigma


def test_hex_roundtrip_and_refinalize():
    s = HllSettings(11, 5)
    blobs = [_sk(range(i * 50), s).to_bytes() for i in range(1, 4)]
    t = pa.table(
        {
            "g": ["a", "b", "c"],
            "sketch": pa.array(blobs, type=pa.binary()),
        }
    )
    hexed = sketches_to_hex(t)
    assert all(h.as_py().startswith("\\x") for h in hexed.column("sketch"))
    back = hex_to_sketches(hexed, ["sketch"])
    assert back.column("sketch").to_pylist() == blobs
    fin = refinalize_estimates(back)
    assert fin.column("estimate").to_pylist() == [
        HllSketch.from_bytes(b).cardinality() for b in blobs
    ]


def test_schema_version_registry():
    """Pluggable schema-version dispatch (reference: serialization.py:563-578):
    v1 registered by default, unknown versions raise, and a registered v2
    takes over deserialization for its nibble without touching callers."""
    import numpy as np
    import pytest

    from rayhll.core import serde
    from rayhll.core.settings import HllSettings
    from rayhll.core.sketch import HllSketch

    sk = HllSketch(HllSettings(11, 5))
    sk.add_batch(np.arange(100, dtype=np.int64) * 977)
    blob = serde.to_bytes(sk)
    assert serde.schema_version_of(blob) == 1
    assert serde.get_schema_version(1).deserialize(blob).to_bytes() == blob

    # unknown version: error names the version and the registry contents
    fake = bytes([(7 << 4) | blob[0] & 0x0F]) + blob[1:]
    with pytest.raises(ValueError, match="schema version 7"):
        serde.from_bytes(fake)
    with pytest.raises(ValueError, match="schema version 7"):
        serde.settings_from_bytes(fake)

    class SchemaVersionSeven:
        schema_version_number = 7

        def serialize(self, sketch):  # pragma: no cover - not exercised
            raise NotImplementedError

        def deserialize(self, data):
            return serde._from_bytes_v1(bytes([data[0] & 0x1F]) + data[1:])

        def settings_from_header(self, data):
            return serde._settings_from_bytes_v1(data)

    serde.register_schema_version(SchemaVersionSeven())
    try:
        assert serde.from_bytes(fake).cardinality() == sk.cardinality()
        assert serde.settings_from_bytes(fake).log2m == 11
    finally:
        del serde.SCHEMA_VERSIONS[7]

    with pytest.raises(ValueError, match="4-bit"):
        class Bad:
            schema_version_number = 16
        serde.register_schema_version(Bad())
