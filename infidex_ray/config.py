"""Engine configuration.

Mirrors the reference's ``ConfigurationParameters`` semantics
(reference: src/Infidex/Core/ConfigurationParameters.cs:34-151) expressed as a
plain dataclass that is cheap to ship to Ray tasks/actors.
"""

from __future__ import annotations

from dataclasses import dataclass, field


START_PAD_CHAR = "￿"  # Tokenizer.cs:17
STOP_PAD_CHAR = "￾"  # Tokenizer.cs:18

# Default word delimiters (TokenizerSetup.cs:36-43)
DEFAULT_DELIMITERS = (
    " ", "-", "/", ".", ",", ":", ";", "'", "`", "–", "—",
    "*", "&", "\\", "_", "(", ")", "{", "}", "[", "]", "\t",
)

# Field weight multipliers High/Med/Low (ConfigurationParameters.cs:16)
DEFAULT_FIELD_WEIGHTS = (1.5, 1.25, 1.0)


@dataclass(frozen=True)
class WordMatcherConfig:
    """WordMatcherSetup (ConfigurationParameters.cs:191-215), config-400 values."""

    max_word_size_exact: int = 8
    max_word_size_ld1: int = 8
    min_word_size_exact: int = 2
    min_word_size_ld1: int = 3
    support_ld1: bool = True
    support_affix: bool = True


@dataclass(frozen=True)
class EngineConfig:
    """Engine configuration; defaults follow the reference's config 400
    (``SearchEngine.CreateDefault`` → ConfigurationParameters.cs:101-124)."""

    index_sizes: tuple[int, ...] = (3,)
    start_pad_size: int = 2
    stop_pad_size: int = 0
    stop_term_limit: int = 1_250_000
    delimiters: tuple[str, ...] = DEFAULT_DELIMITERS
    field_weights: tuple[float, ...] = DEFAULT_FIELD_WEIGHTS
    high_resolution_mode: bool = False
    enable_coverage: bool = True
    enable_word_matcher: bool = True
    word_matcher: WordMatcherConfig = field(default_factory=WordMatcherConfig)
    coverage: "CoverageParams" = field(default_factory=lambda: _default_coverage())
    # Opt-in long-document chunking (AutoSegmenter port; reference leaves
    # invocation to the caller too). Each chunk indexes as its own internal
    # doc sharing the doc key; best chunk per key wins at query time.
    auto_segment: "AutoSegmentSetup | None" = None
    # Synonym groups, e.g. (("car", "automobile"), ("ny", "new", "york")):
    # each group collapses to one canonical term at index + query time
    # (SynonymMap union-find; off by default like CreateDefault)
    synonyms: tuple[tuple[str, ...], ...] = ()

    def synonym_map(self):
        from .synonyms import SynonymMap

        return SynonymMap(self.synonyms) if self.synonyms else None
    coverage_depth: int = 500  # Query.cs:40
    # Custom replacement-map normalizer (analyzer.TextNormalizer) — None =
    # the default fold-table chain (SearchEngine.cs:49,57 hook; the instance
    # is picklable and ships to build tasks/query actors with the config)
    normalizer: "object | None" = None
    # Build-time physical knobs (Ray-specific, not part of rank semantics)
    target_docs_per_segment: int = 250_000
    build_batch_size: int = 4096

    @property
    def min_index_size(self) -> int:
        return min(self.index_sizes)

    @classmethod
    def minimal(cls) -> "EngineConfig":
        """SearchEngine.CreateMinimal (SearchEngine.cs:101): gram-3 only,
        pads (2, 0), coverage rescoring off — the cheap exact-ish profile."""
        return cls(
            index_sizes=(3,),
            start_pad_size=2,
            stop_pad_size=0,
            enable_coverage=False,
        )

def _default_coverage():
    from .query.coverage import CoverageParams

    return CoverageParams()


from .autosegment import AutoSegmentSetup  # noqa: E402  (re-export for configs)


def config_100() -> EngineConfig:
    """Reference config 100: dual n-grams [2,3], no word matcher."""
    return EngineConfig(index_sizes=(2, 3), enable_word_matcher=False)


def config_400() -> EngineConfig:
    """Reference config 400 = ``SearchEngine.CreateDefault()``."""
    return EngineConfig()
