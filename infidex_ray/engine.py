"""High-level engine API: build / load / search.

``Engine`` mirrors the reference's ``SearchEngine`` surface
(src/Infidex/SearchEngine.cs:96-319) on top of the partitioned on-disk index:

* ``Engine.build(ds, out_dir)``  — Ray Data build (see build.py)
* ``Engine.load(index_dir)``     — open segments + global stats ("Load" =
  reading the manifest; nothing is recomputed, IndexPersistence.cs semantics)
* ``engine.search(text, top_k)`` — full pipeline: normalize → stage-1 BM25
  per segment → heap merge → segment consolidation → coverage/fusion
  rescoring → truncation (SearchPipeline.cs:49-206)

This class runs the query path in-process (each SegmentStage1 is the exact
state a distributed query actor holds); the actor-pool serving path in
query/executor.py wraps the same objects.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from .analyzer import normalize, split_words
from .config import EngineConfig
from .query import stage1 as s1
from .segments import SegmentData, read_segment


@dataclass
class SearchHit:
    score: float
    doc_key: int
    tiebreaker: int
    url: str | None = None
    text: str | None = None


def analyze_query(search_text: str, cfg: EngineConfig) -> tuple[bool, bool, str]:
    """QueryAnalyzer.Analyze (src/Infidex/Scoring/QueryAnalyzer.cs:10-55)."""
    min_size = cfg.min_index_size
    words = split_words(search_text, cfg.delimiters)
    if not words:
        return len(search_text) >= min_size, False, search_text
    long_words = [w for w in words if len(w) >= min_size]
    short_count = len(words) - len(long_words)
    can = bool(long_words)
    text = " ".join(long_words) if long_words else search_text
    mixed = short_count > 0 and bool(long_words)
    return can, mixed, text


class DfLookup:
    """Global term-df lookup backed by the sorted stats/df.parquet table."""

    def __init__(self, terms: np.ndarray, dfs: np.ndarray):
        self.terms = terms
        self.dfs = dfs

    @classmethod
    def from_parquet(cls, path: str) -> "DfLookup":
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        name = "term" if "term" in t.column_names else "word"
        return cls(t[name].to_numpy(), t["df"].to_numpy())

    def __call__(self, term: str) -> int:
        i = np.searchsorted(self.terms, term)
        if i < len(self.terms) and self.terms[i] == term:
            return int(self.dfs[i])
        return 0


class Engine:
    def __init__(
        self,
        index_dir: str,
        cfg: EngineConfig,
        segments: list[SegmentData],
        df_lookup: DfLookup,
        word_df: DfLookup,
        total_docs: int,
        avgdl: float,
    ):
        self.index_dir = index_dir
        self.cfg = cfg
        self.segments = segments
        self.df_lookup = df_lookup
        self.word_df = word_df
        self.total_docs = total_docs
        self.avgdl = avgdl
        self.searchers = [s1.SegmentStage1(s, cfg) for s in segments]
        self._coverage = None
        self._wordmatchers = None

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        ds,
        out_dir: str,
        cfg: EngineConfig | None = None,
        text_column: str = "text",
        key_column: str = "url",
    ) -> "Engine":
        from .build import build_index

        cfg = cfg or EngineConfig()
        build_index(ds, out_dir, cfg, text_column, key_column)
        return cls.load(out_dir, cfg)

    @classmethod
    def load(cls, index_dir: str, cfg: EngineConfig | None = None) -> "Engine":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        if cfg is None:
            c = manifest["config"]
            cfg = EngineConfig(
                index_sizes=tuple(c["index_sizes"]),
                start_pad_size=c["start_pad_size"],
                stop_pad_size=c["stop_pad_size"],
                stop_term_limit=c["stop_term_limit"],
                delimiters=tuple(c["delimiters"]),
            )
        seg_root = os.path.join(index_dir, "segments")
        segments = [
            read_segment(os.path.join(seg_root, e["name"]), i)
            for i, e in enumerate(manifest["segments"])
        ]
        df_lookup = DfLookup.from_parquet(os.path.join(index_dir, "stats", "df.parquet"))
        word_df = DfLookup.from_parquet(
            os.path.join(index_dir, "stats", "word_df.parquet")
        )
        stats = manifest["stats"]
        return cls(
            index_dir,
            cfg,
            segments,
            df_lookup,
            word_df,
            stats["total_docs"],
            stats["avg_doc_len"],
        )

    # ----------------------------------------------------------------- search
    def _fuzzy_global_df(self, text: str) -> int:
        """Global cardinality of the LD1 union = Σ per-segment cardinalities
        (segments are doc-disjoint; VectorModel.ExpandMissingTerm sums the
        per-segment lists into one bitmap)."""
        return sum(s.fuzzy_union(text)[1] for s in self.searchers)

    def stage1(
        self, norm_lower_query: str, top_k: int
    ) -> list[tuple[float, int, int]]:
        """Stage-1 BM25 over all segments + heap merge + consolidation."""
        infos = s1.prepare_query_terms(
            norm_lower_query,
            self.cfg,
            self.df_lookup,
            self.total_docs,
            self.avgdl,
            fuzzy_df_fn=self._fuzzy_global_df,
        )
        plan = s1.build_plan(infos)
        return s1.run_stage1(self.searchers, plan, top_k, self.avgdl)

    @property
    def shorts(self):
        """Per-segment short-query scanners, built lazily (actor state)."""
        if getattr(self, "_shorts", None) is None:
            from .analyzer import _word_splitter
            from .query.shortquery import SegmentShortQuery

            splitter = _word_splitter(self.cfg.delimiters)
            self._shorts = [SegmentShortQuery(s, splitter) for s in self.segments]
        return self._shorts

    SHORT_QUERY_MAX_LENGTH = 3  # SearchPipeline.cs:23
    SHORT_QUERY_COVERAGE_DOC_CAP = 500  # SearchPipeline.cs:24

    def search(self, query_text: str, top_k: int = 10, enable_coverage: bool | None = None) -> list[SearchHit]:
        """Full pipeline (SearchPipeline.Execute, SearchPipeline.cs:49-206)."""
        cfg = self.cfg
        q = normalize(query_text.strip()).lower()
        if not q:
            return []
        coverage_on = cfg.enable_coverage if enable_coverage is None else enable_coverage

        can_ngrams, has_mixed, long_words_text = analyze_query(q, cfg)
        coverage_depth = cfg.coverage_depth

        if not can_ngrams:
            from .query import shortquery as sq

            if len(q) == 1:
                stage1_results = sq.run_single_char(self.shorts, q, top_k)
            else:
                stage1_results = sq.run_short_query(
                    self.shorts, q, cfg.min_index_size, cfg.start_pad_size, cfg.delimiters
                )
            stage1_results = s1.consolidate(stage1_results)
        else:
            tfidf_query = long_words_text if has_mixed else q
            if not tfidf_query.strip():
                tfidf_query = q
            stage1_results = self.stage1(tfidf_query, coverage_depth)

        is_short = len(q) <= self.SHORT_QUERY_MAX_LENGTH and not any(
            d in q for d in cfg.delimiters
        )
        if is_short and len(stage1_results) >= top_k:
            return self._to_hits(stage1_results[:top_k])

        # short-query coverage gating (SearchPipeline.cs:122-159)
        allow_short_coverage = skip_short_cap = False
        if is_short:
            short_doc_count = sum(s.count_word_start_docs(q) for s in self.shorts)
            allow_short_coverage = 0 < short_doc_count <= self.SHORT_QUERY_COVERAGE_DOC_CAP
            skip_short_cap = short_doc_count > self.SHORT_QUERY_COVERAGE_DOC_CAP

        if (
            not coverage_on
            or (not can_ngrams and not allow_short_coverage)
            or skip_short_cap
        ):
            return self._to_hits(stage1_results[:top_k])

        final = self._coverage_stage(q, stage1_results, coverage_depth, top_k)
        if final is None:  # coverage unavailable → stage1 backbone
            return self._to_hits(stage1_results[:top_k])
        return self._to_hits(final)

    def _coverage_stage(self, q, stage1_results, coverage_depth, top_k):
        from .query import pipeline as qp

        return qp.coverage_stage(self, q, stage1_results, coverage_depth, top_k)

    def _to_hits(self, entries: list[tuple[float, int, int]]) -> list[SearchHit]:
        return [SearchHit(score=e[0], doc_key=e[1], tiebreaker=e[2]) for e in entries]

    def bm25_all_scores(self, query_text: str) -> list[tuple[int, float]]:
        """Disjunctive full-corpus BM25+ scores in float64 — the SQL-oracle
        surface (no candidate pruning, no fuzzy expansion): every doc matching
        ≥1 query term gets its exact score. Returns (doc_key, score) rows."""
        from .analyzer import tokenize_for_search

        cfg = self.cfg
        q = normalize(query_text.strip()).lower()
        tokens = sorted(
            set(
                tokenize_for_search(
                    q, cfg.index_sizes, cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters
                )
            )
        )
        terms = []
        for t in tokens:
            df = self.df_lookup(t)
            if 0 < df <= cfg.stop_term_limit:
                idf = float(np.log((self.total_docs - df + 0.5) / (df + 0.5) + 1.0))
                terms.append((t, idf))
        out: list[tuple[int, float]] = []
        avgdl = self.avgdl if self.avgdl > 0 else 1.0
        for seg in self.segments:
            acc: dict[int, float] = {}
            for t, idf in terms:
                i = seg.term_lookup(t)
                if i < 0:
                    continue
                docs, weights = seg.term_postings(i)
                dl = seg.doc_len[docs].astype(np.float64)
                dl = np.where(dl <= 0, 1.0, dl)
                tf = weights.astype(np.float64)
                sc = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) + 1.0)
                for d, s in zip(docs.tolist(), sc.tolist()):
                    acc[d] = acc.get(d, 0.0) + s
            keys = seg.doc_keys
            out.extend((int(keys[d]), s) for d, s in acc.items() if s > 0)
        out.sort(key=lambda e: e[0])
        return out

    # convenience for tests
    def doc_text_by_key(self, key: int) -> str | None:
        for seg in self.segments:
            idx = np.flatnonzero(seg.doc_keys == key)
            if len(idx):
                return seg.norm_texts[int(idx[0])]
        return None
