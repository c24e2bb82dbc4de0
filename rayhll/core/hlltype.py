"""HLL representation types.

Semantics: the four runtime representations plus the UNDEFINED sentinel of the
reference promotion hierarchy (reference: python_hll/hlltype.py:9-13).  The
integer values double as the storage-spec v1.0.0 type ordinals written into the
version byte (reference: python_hll/serialization.py:391-397).
"""

from __future__ import annotations

import enum


class HllType(enum.IntEnum):
    """Representation type of an HLL sketch; values are spec v1 ordinals."""

    UNDEFINED = 0  # PostgreSQL sentinel for legacy/corrupt formats; never built
    EMPTY = 1
    EXPLICIT = 2
    SPARSE = 3
    FULL = 4
