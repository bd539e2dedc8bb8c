"""infidex_ray — a Ray-Data-native inverted-index + BM25 search engine.

From-scratch rebuild of the capabilities of lofcz/Infidex (reference studied
at /root/reference) on ray.data.Dataset + Arrow: streaming per-partition index
construction, compressed posting segments, global-stats aggregation, per-
segment BM25 query actors with coverage/fusion reranking, plus the
training-data operators a 100 TB text pipeline needs (dedup, similarity
search, text analysis).
"""

from .config import AutoSegmentSetup, EngineConfig, config_100, config_400  # noqa: F401


def __getattr__(name):  # lazy heavy imports (keep `import infidex_ray` cheap)
    if name in ("Engine", "Query", "Result", "SearchHit", "SystemStatus"):
        from . import engine

        return getattr(engine, name)
    if name == "DistributedEngine":
        from .query.executor import DistributedEngine

        return DistributedEngine
    if name == "SynonymMap":
        from .synonyms import SynonymMap

        return SynonymMap
    if name == "FilterBuilder":
        from .filters import FilterBuilder

        return FilterBuilder
    if name == "TextNormalizer":
        from .analyzer import TextNormalizer

        return TextNormalizer
    raise AttributeError(name)


__all__ = [
    "AutoSegmentSetup", "DistributedEngine", "Engine", "EngineConfig",
    "FilterBuilder", "Query", "Result", "SearchHit", "SynonymMap",
    "SystemStatus", "TextNormalizer", "config_100", "config_400",
]
__version__ = "0.1.0"
