"""Set-operation estimators built on HLL unions.

The reference provides union only and leaves intersection/difference to
callers via inclusion-exclusion (SURVEY.md §2.5 "Set ops").  These helpers
make that explicit, with the standard caveat that inclusion-exclusion error
compounds: |A∩B| error is relative to |A∪B|, so small intersections of large
sets are noisy (Dasgupta et al. 2016 discuss better intersection sketches;
out of scope for the reference's semantics).
"""

from __future__ import annotations

from rayhll.core.sketch import HllSketch


def estimate_union(a: HllSketch, b: HllSketch) -> int:
    u = a.copy()
    u.union(b)
    return u.cardinality()


def estimate_intersection(a: HllSketch, b: HllSketch) -> int:
    """max(0, |A| + |B| - |A∪B|) by inclusion-exclusion."""
    return max(0, a.cardinality() + b.cardinality() - estimate_union(a, b))


def estimate_difference(a: HllSketch, b: HllSketch) -> int:
    """max(0, |A| - |A∩B|): elements of A not in B."""
    return max(0, a.cardinality() - estimate_intersection(a, b))


def estimate_jaccard(a: HllSketch, b: HllSketch) -> float:
    """|A∩B| / |A∪B| (0 for two empty sketches).

    For direct Jaccard estimation prefer MinHash signatures
    (rayhll.sketches.minhash), whose error doesn't compound."""
    u = estimate_union(a, b)
    if u == 0:
        return 0.0
    return estimate_intersection(a, b) / u
