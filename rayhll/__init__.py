"""rayhll — a Ray-Data-native distributed sketch / approximate-aggregation
engine with the semantics of AdRoll/python-hll (see SURVEY.md)."""

from rayhll.core.hlltype import HllType
from rayhll.core.settings import HllSettings
from rayhll.core.sketch import HllSketch

__all__ = ["HllType", "HllSettings", "HllSketch"]
__version__ = "0.2.0"

# Ray-layer surfaces (ray_agg, pipelines.*, functions.join, sources.io) are
# imported lazily by callers — importing rayhll alone must not pull in ray.
