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
import time
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


@dataclass
class Query:
    """Mirror of Infidex.Api.Query (src/Infidex/Api/Query.cs): text + limits
    + Infiscript filter/boosts + sort + facets."""

    text: str
    max_results: int = 10
    filter: "str | object | None" = None  # Infiscript expression or AST node
    # (AST form accepts filters.DerivedFilter — the custom-predicate hook)
    boosts: tuple[tuple[str, int], ...] = ()  # (expression, strength 1-3)
    sort_by: str | None = None
    sort_ascending: bool = True
    enable_facets: bool = False
    enable_coverage: bool | None = None
    # Search timeout in ms, clamped to [0, 10000] at execution
    # (src/Infidex/Api/Query.cs:73-75, SearchEngine.cs:290)
    timeout_ms: int = 1000


@dataclass
class Result:
    """Mirror of Infidex.Api.Result: records + facets + truncation info."""

    records: list[SearchHit]
    facets: dict[str, list[tuple[str, int]]] | None
    truncation_index: int
    truncation_score: float
    total_candidates: int
    # src/Infidex/Api/Result.cs:34 (DidTimeOut): the query exceeded its
    # budget and records are the best-effort stage-1 (or partial) results
    did_timeout: bool = False
    # src/Infidex/Api/Result.cs:44 (ExecutionTimeMs). The reference declares
    # the field but never populates it; we measure the full query wall time.
    execution_time_ms: int = 0


@dataclass
class SystemStatus:
    """Mirror of Infidex.Api.SystemStatus (src/Infidex/Api/SystemStatus.cs:
    6-22): engine status snapshot returned by :meth:`Engine.get_status`."""

    document_count: int = 0
    reindex_required: bool = False
    too_long_search_text: bool = False
    too_long_client_text: bool = False
    index_progress: int = 0  # 0-100 %


@dataclass
class IndexStatistics:
    """Mirror of SearchEngine.IndexStatistics (SearchEngine.cs:385-399):
    (document count, vocabulary size) snapshot."""

    document_count: int = 0
    vocabulary_size: int = 0


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

    def vocab_size(self) -> int:
        return len(self.terms)


class ShardedDfLookup:
    """Vocab df lookup over a DIRECTORY of sorted parquet parts — the layout
    ``build_index`` writes distributed (``agg.sort(col).write_parquet``), so
    the driver never holds the vocabulary. Part key ranges come from parquet
    footer statistics; a probe opens only the parts whose [min, max] covers
    the term and SUMS their dfs (overlapping parts are how incremental delta
    stats are appended without rewriting the base). Per-part arrays load
    lazily and stay cached — actor-local state touching O(parts probed)."""

    def __init__(self, parts: list[tuple[str, str, str]], col: str):
        # parts: (min_term, max_term, path), sorted by min_term
        self.parts = sorted(parts)
        self.col = col
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._merged: tuple[np.ndarray, np.ndarray] | None = None

    @classmethod
    def from_dir(cls, d: str) -> "ShardedDfLookup":
        import glob

        import pyarrow.parquet as pq

        parts = []
        col = None
        for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            pf = pq.ParquetFile(p)
            md = pf.metadata
            if md.num_rows == 0:
                continue
            if col is None:
                names = pf.schema_arrow.names
                col = "term" if "term" in names else "word"
            ci = pf.schema_arrow.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or st.min is None:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins is None:  # stats stripped → conservative full range
                parts.append(("", "\U0010ffff" * 4, p))
            else:
                parts.append((min(mins), max(maxs), p))
        return cls(parts, col or "term")

    def _load(self, path: str) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(path)
        if hit is None:
            import pyarrow.parquet as pq

            t = pq.read_table(path)
            hit = self._cache[path] = (t[self.col].to_numpy(), t["df"].to_numpy())
        return hit

    def __call__(self, term: str) -> int:
        total = 0
        for mn, mx, path in self.parts:
            if mn <= term <= mx:
                terms, dfs = self._load(path)
                i = np.searchsorted(terms, term)
                if i < len(terms) and terms[i] == term:
                    total += int(dfs[i])
        return total

    def vocab_size(self) -> int:
        """Distinct-term count. When part key ranges are pairwise disjoint
        (the base distributed build always writes range-partitioned parts),
        this is the SUM of parquet-footer row counts — zero data read. Only
        overlapping parts (delta appends) fall back to the merged view."""
        import pyarrow.parquet as pq

        disjoint = all(
            self.parts[i][1] < self.parts[i + 1][0]
            for i in range(len(self.parts) - 1)
        )
        if disjoint:
            return sum(
                pq.ParquetFile(p).metadata.num_rows for _, _, p in self.parts
            )
        return len(self._merge_all()[0])

    def _merge_all(self) -> tuple[np.ndarray, np.ndarray]:
        """Full materialized view (duplicate keys summed, sorted) — only for
        small-scale driver conveniences like the contract's term_df dump;
        query paths never call this."""
        if self._merged is None:
            acc: dict = {}
            for _, _, path in self.parts:
                terms, dfs = self._load(path)
                for t, d in zip(terms.tolist(), dfs.tolist()):
                    acc[t] = acc.get(t, 0) + int(d)
            keys = sorted(acc)
            self._merged = (
                np.asarray(keys, dtype=object),
                np.asarray([acc[k] for k in keys], dtype=np.int64),
            )
        return self._merged

    @property
    def terms(self) -> np.ndarray:
        return self._merge_all()[0]

    @property
    def dfs(self) -> np.ndarray:
        return self._merge_all()[1]


def config_from_manifest(manifest: dict) -> "EngineConfig":
    """Reconstruct the build-time EngineConfig from a manifest — shared by
    ``Engine.load`` and stats-only contexts (ops/batchsearch) that need
    the tokenizer/plan parameters without opening any segment."""
    c = manifest["config"]
    return EngineConfig(
        index_sizes=tuple(c["index_sizes"]),
        start_pad_size=c["start_pad_size"],
        stop_pad_size=c["stop_pad_size"],
        stop_term_limit=c["stop_term_limit"],
        delimiters=tuple(c["delimiters"]),
        synonyms=tuple(tuple(g) for g in c.get("synonyms", [])),
        enable_coverage=c.get("enable_coverage", True),
    )


def load_df_lookup(index_dir: str, base: str):
    """Open the vocab stats in any layout: single-file (local/test builds,
    ``stats/<base>.parquet``), a sharded directory (``stats/<base>/``), or
    the fused kind-partitioned layout the distributed build writes
    (``stats/vocab/kind=term|word/``)."""
    f = os.path.join(index_dir, "stats", f"{base}.parquet")
    if os.path.exists(f):
        return DfLookup.from_parquet(f)
    d = os.path.join(index_dir, "stats", base)
    if os.path.isdir(d):
        return ShardedDfLookup.from_dir(d)
    kind = "term" if base == "df" else "word"
    return ShardedDfLookup.from_dir(
        os.path.join(index_dir, "stats", "vocab", f"kind={kind}")
    )


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
        self._seg_map = {s.seg_id: s for s in segments}
        self.synonym_map = cfg.synonym_map()
        self.deleted: set[int] = set()
        tomb = os.path.join(index_dir, "tombstones.json")
        if os.path.exists(tomb):
            with open(tomb) as f:
                self.deleted = set(json.load(f))

    def seg_by_id(self, si: int):
        """Segment by GLOBAL segment id (shard engines hold a subset)."""
        return self._seg_map[si]

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        ds,
        out_dir: str,
        cfg: EngineConfig | None = None,
        text_column: str = "text",
        key_column: str = "url",
        store_columns: tuple[str, ...] = (),
        text_fields: tuple[tuple[str, int], ...] = (),
    ) -> "Engine":
        from .build import build_index

        cfg = cfg or EngineConfig()
        build_index(
            ds, out_dir, cfg, text_column, key_column,
            store_columns=store_columns, text_fields=text_fields,
        )
        return cls.load(out_dir, cfg)

    @classmethod
    def load(cls, index_dir: str, cfg: EngineConfig | None = None, segment_indices=None) -> "Engine":
        """Open an index (or, with ``segment_indices``, a SHARD of it: the
        subset of segments a query actor owns; global stats still apply)."""
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        if cfg is None:
            cfg = config_from_manifest(manifest)
        seg_root = os.path.join(index_dir, "segments")
        indices = (
            range(len(manifest["segments"])) if segment_indices is None else segment_indices
        )
        segments = [
            read_segment(os.path.join(seg_root, manifest["segments"][i]["name"]), i)
            for i in indices
        ]
        df_lookup = load_df_lookup(index_dir, "df")
        word_df = load_df_lookup(index_dir, "word_df")
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

    # ------------------------------------------------------- single-file I/O
    def save_file(self, file_path: str) -> None:
        """Export the whole index as ONE portable file (reference parity:
        ``SearchEngine.Save(filePath)``, src/Infidex/SearchEngine.cs:385-442
        + Indexing/IndexPersistence.cs:15-50). The container is an
        uncompressed tar of the index directory tree (segments + manifest +
        stats + tombstones) written atomically (tmp → rename), so an index
        can be shipped/downloaded as a single artifact; the directory layout
        stays the canonical cluster-serving format."""
        with open(file_path + ".tmp", "wb") as f:
            self.save_stream(f)
        os.replace(file_path + ".tmp", file_path)

    def save_stream(self, fileobj) -> None:
        """``SaveToStream`` parity: tar the index tree into a writable binary
        stream (deterministic member order)."""
        import tarfile

        with tarfile.open(fileobj=fileobj, mode="w") as tar:
            for root, dirs, files in os.walk(self.index_dir):
                dirs.sort()
                for name in sorted(files):
                    if name.endswith(".tmp"):
                        continue
                    full = os.path.join(root, name)
                    arc = os.path.relpath(full, self.index_dir)
                    tar.add(full, arcname=arc, recursive=False)

    @classmethod
    def load_file(
        cls,
        file_path: str,
        extract_dir: str | None = None,
        cfg: EngineConfig | None = None,
    ) -> "Engine":
        """Open a ``save_file`` container: extract the tree (segments are
        mmapped, so they must land on disk) and ``load`` it. ``extract_dir``
        defaults to ``<file_path>.d`` next to the container; an existing
        extraction is reused only if its manifest is present."""
        with open(file_path, "rb") as f:
            return cls.load_stream(f, extract_dir or (file_path + ".d"), cfg)

    @classmethod
    def load_stream(
        cls, fileobj, extract_dir: str, cfg: EngineConfig | None = None
    ) -> "Engine":
        import tarfile

        os.makedirs(extract_dir, exist_ok=True)
        with tarfile.open(fileobj=fileobj, mode="r") as tar:
            tar.extractall(extract_dir, filter="data")
        return cls.load(extract_dir, cfg)

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
        return self.search_ex(query_text, top_k, enable_coverage)[0]

    def search_ex(
        self,
        query_text: str,
        top_k: int = 10,
        enable_coverage: bool | None = None,
        timeout_ms: int | None = None,
    ) -> tuple[list[SearchHit], bool]:
        """Full pipeline with an optional per-query time budget: returns
        (hits, did_timeout). ``timeout_ms=None`` (the plain ``search()``
        path) runs unbudgeted — the budget belongs to the Query API, whose
        default is 1000 ms clamped to [0, 10000] (Query.cs:75,
        SearchEngine.cs:290). A silent default here would make ranking
        wall-clock-dependent on a throttled host. The deadline is checked
        between pipeline stages and inside the coverage candidate loop
        (ProcessMonitor.ShouldAbort pattern, Api/ProcessMonitor.cs:196) —
        on expiry the best-so-far stage-1 backbone is returned flagged."""
        from .query.pipeline import DeadlineExceeded

        if timeout_ms is None:
            deadline = float("inf")
        else:
            ms = max(0, min(int(timeout_ms), 10000))
            deadline = time.monotonic() + ms / 1000.0
        cfg = self.cfg
        from .analyzer import normalize_with

        q = normalize_with(cfg.normalizer, query_text.strip(), is_query=True).lower()
        if self.synonym_map is not None:  # SearchEngine.cs:279-286
            q = self.synonym_map.canonicalize_text(q, frozenset(cfg.delimiters))
        if not q:
            return [], False
        coverage_on = cfg.enable_coverage if enable_coverage is None else enable_coverage

        can_ngrams, has_mixed, long_words_text = analyze_query(q, cfg)
        coverage_depth = cfg.coverage_depth

        # overlap hook: the distributed executor fires the (stage-1-
        # independent) WordMatcher candidate computation on the shard actors
        # here, so it runs concurrently with the stage-1 fan-out
        self._pre_stage1(q, coverage_on and can_ngrams)

        if not can_ngrams:
            if len(q) == 1:
                stage1_results = self._run_single_char(q, top_k)
            else:
                stage1_results = self._run_short_query(q)
            stage1_results = s1.consolidate(stage1_results)
        else:
            tfidf_query = long_words_text if has_mixed else q
            if not tfidf_query.strip():
                tfidf_query = q
            stage1_results = self.stage1(tfidf_query, coverage_depth)

        if self.deleted:  # soft-delete tombstones (TombstoneTracker semantics)
            stage1_results = [e for e in stage1_results if e[1] not in self.deleted]

        if time.monotonic() >= deadline:  # between-stage deadline check
            return self._to_hits(stage1_results[:top_k]), True

        is_short = len(q) <= self.SHORT_QUERY_MAX_LENGTH and not any(
            d in q for d in cfg.delimiters
        )
        if is_short and len(stage1_results) >= top_k:
            return self._to_hits(stage1_results[:top_k]), False

        # short-query coverage gating (SearchPipeline.cs:122-159)
        allow_short_coverage = skip_short_cap = False
        if is_short:
            short_doc_count = self._short_doc_count(q)
            allow_short_coverage = 0 < short_doc_count <= self.SHORT_QUERY_COVERAGE_DOC_CAP
            skip_short_cap = short_doc_count > self.SHORT_QUERY_COVERAGE_DOC_CAP

        if (
            not coverage_on
            or (not can_ngrams and not allow_short_coverage)
            or skip_short_cap
        ):
            return self._to_hits(stage1_results[:top_k]), False

        if time.monotonic() >= deadline:
            return self._to_hits(stage1_results[:top_k]), True

        try:
            final = self._coverage_stage(
                q, stage1_results, coverage_depth, top_k, deadline=deadline
            )
        except DeadlineExceeded:
            return self._to_hits(stage1_results[:top_k]), True
        if final is None:  # coverage unavailable → stage1 backbone
            return self._to_hits(stage1_results[:top_k]), False
        return self._to_hits(final), False

    def _pre_stage1(self, q: str, coverage_likely: bool) -> None:
        """No-op for the in-process engine (sequential anyway)."""

    # overridable primitives (the distributed executor fans these out)
    def _run_single_char(self, q: str, top_k: int):
        from .query import shortquery as sq

        return sq.run_single_char(self.shorts, q, top_k)

    def _run_short_query(self, q: str):
        from .query import shortquery as sq

        return sq.run_short_query(
            self.shorts, q, self.cfg.min_index_size, self.cfg.start_pad_size,
            self.cfg.delimiters,
        )

    def _short_doc_count(self, q: str) -> int:
        return sum(s.count_word_start_docs(q) for s in self.shorts)

    # ------------------------------------------------ incremental / deletes
    def delete_documents(self, keys) -> None:
        """Soft delete: tombstoned keys disappear from results; postings and
        stats are untouched until a rebuild (DeltaIndex/TombstoneTracker
        semantics, src/Infidex/Indexing/Incremental/TombstoneTracker.cs)."""
        self.deleted.update(int(k) for k in keys)
        with open(os.path.join(self.index_dir, "tombstones.json"), "w") as f:
            json.dump(sorted(self.deleted), f)

    def add_documents(self, docs, fields=None) -> None:
        """Incremental add: writes a delta segment + merged stats, then
        refreshes this engine in place (reference finishes incremental adds
        with a full stats rebuild, SearchEngine.cs:194-206)."""
        from .build import append_to_index

        append_to_index(self.index_dir, docs, self.cfg, fields=fields)
        fresh = Engine.load(self.index_dir, self.cfg)
        self.segments = fresh.segments
        self.searchers = fresh.searchers
        self._seg_map = fresh._seg_map
        self.df_lookup = fresh.df_lookup
        self.word_df = fresh.word_df
        self.total_docs = fresh.total_docs
        self.avgdl = fresh.avgdl
        self._wordmatchers = None
        self._shorts = None
        for attr in ("_key_index", "_doc_prep_cache"):
            if hasattr(self, attr):
                delattr(self, attr)

    def _coverage_stage(self, q, stage1_results, coverage_depth, top_k, deadline=None):
        from .query import pipeline as qp

        return qp.coverage_stage(
            self, q, stage1_results, coverage_depth, top_k, deadline=deadline
        )

    def _to_hits(self, entries: list[tuple[float, int, int]]) -> list[SearchHit]:
        return [SearchHit(score=e[0], doc_key=e[1], tiebreaker=e[2]) for e in entries]

    # --------------------------------------------------- Query API (M6)
    def _field_row(self, key: int) -> dict:
        """Stored field values for one doc (url always included)."""
        from .query.pipeline import _key_index_for

        loc = _key_index_for(self).get(key)
        if loc is None:
            return {}
        si, lid = loc
        # si is a GLOBAL segment id (shard engines hold a subset, so
        # positional indexing into self.segments would be wrong there)
        seg = self.seg_by_id(si)
        row = {"url": seg.urls[lid] if seg.urls else None}
        if seg.fields:
            for name, col in seg.fields.items():
                row[name] = col[lid]
        return row

    def _prefetch_field_rows(self, keys) -> None:
        """No-op in-process (stored fields are local); the distributed
        engine overrides this with one batched shard fan-out."""

    def query(self, q: Query) -> Result:
        """SearchEngine.Search(Query) incl. post-processing
        (SearchEngine.cs:290-368: pipeline → filter → boosts → sort →
        facets → take maxResults)."""
        from . import filters as flt

        t_query = time.perf_counter()
        if not q.text or q.text.isspace():
            if q.enable_facets:
                res = self._empty_query_with_facets(q)
                res.execution_time_ms = int((time.perf_counter() - t_query) * 1000)
                return res
            return Result(
                [], None, 0, 0.0, 0,
                execution_time_ms=int((time.perf_counter() - t_query) * 1000),
            )

        hits, did_timeout = self.search_ex(
            q.text, top_k=q.max_results, enable_coverage=q.enable_coverage,
            timeout_ms=q.timeout_ms,
        )
        entries = [(h.score, h.doc_key, h.tiebreaker) for h in hits]

        if q.filter or q.boosts or q.sort_by or q.enable_facets:
            # batch hook: the distributed engine fetches every needed stored
            # row in ONE shard fan-out here; in-process it is a no-op and
            # _field_row reads segments directly
            self._prefetch_field_rows([e[1] for e in entries])

        if q.filter:
            ast = flt.parse(q.filter) if isinstance(q.filter, str) else q.filter
            entries = [
                e for e in entries if flt.matches_row(ast, self._field_row(e[1]))
            ]
        if q.boosts:
            compiled = [
                (flt.parse(expr) if isinstance(expr, str) else expr, int(strength))
                for expr, strength in q.boosts
            ]
            boosted = []
            for score, key, tb in entries:
                row = self._field_row(key)
                total = sum(s for ast, s in compiled if flt.matches_row(ast, row))
                boosted.append((score + total if total > 0 else score, key, tb))
            boosted.sort(key=lambda e: -e[0])  # ResultProcessor.cs:119: score only
            entries = boosted
        if q.sort_by:
            entries = self._apply_sort(entries, q.sort_by, q.sort_ascending)

        facets = self._build_facets(entries) if q.enable_facets else None
        top = entries[: q.max_results]
        return Result(
            self._to_hits(top),
            facets,
            len(top) - 1 if top else 0,
            top[-1][0] if top else 0.0,
            len(entries),
            did_timeout=did_timeout,
            execution_time_ms=int((time.perf_counter() - t_query) * 1000),
        )

    def get_status(self) -> SystemStatus:
        """ISearchEngine.GetStatus (Api/ISearchEngine.cs:16) — a point-in-time
        snapshot; ``index_progress`` reflects an attached build monitor when
        one is running, else 100 for a loaded index."""
        progress = 100
        mon = getattr(self, "monitor", None)
        if mon is not None and getattr(mon, "is_running", False):
            progress = int(getattr(mon, "progress_percent", 0))
        return SystemStatus(
            document_count=sum(len(seg.doc_keys) for seg in self.segments),
            reindex_required=False,
            too_long_search_text=False,
            too_long_client_text=False,
            index_progress=progress,
        )

    def get_document(self, document_key: int) -> dict | None:
        """SearchEngine.GetDocument (SearchEngine.cs:363-368): the stored
        field values for one public document key — ``None`` when the key is
        unknown (or tombstoned). Includes ``url`` plus every stored column."""
        if document_key in getattr(self, "deleted", ()):  # tombstoned
            return None
        row = self._field_row(int(document_key))
        return row or None

    def get_documents(self, document_keys) -> list[dict]:
        """SearchEngine.GetDocuments (SearchEngine.cs:370-375): batch form of
        :meth:`get_document`; unknown keys are skipped (the reference returns
        only found documents)."""
        out = []
        for k in document_keys:
            row = self.get_document(k)
            if row is not None:
                out.append(row)
        return out

    def get_statistics(self) -> "IndexStatistics":
        """SearchEngine.GetStatistics (SearchEngine.cs:378-383):
        (document count, vocabulary size) — vocabulary = distinct WORD terms
        across the index (the reference counts its TermCollection)."""
        wd = self.word_df
        vocab = wd.vocab_size() if hasattr(wd, "vocab_size") else len(wd.terms)
        return IndexStatistics(
            document_count=sum(len(seg.doc_keys) for seg in self.segments),
            vocabulary_size=int(vocab),
        )

    # Match-all + facets walks every stored doc in-process (faithful to the
    # reference's serving-time facets) — refuse beyond this many docs and
    # point callers at the streaming offline path.
    matchall_facet_cap: int = 1_000_000

    def _empty_query_with_facets(self, q: Query) -> Result:
        """SearchEngine.HandleEmptyQueryWithFacets (SearchEngine.cs:322-348)."""
        from . import filters as flt

        total = sum(len(seg.doc_keys) for seg in self.segments)
        if total > self.matchall_facet_cap:
            raise ValueError(
                f"match-all facets over {total} docs exceeds the in-process cap "
                f"({self.matchall_facet_cap}); use "
                "infidex_ray.ops.facets.facet_counts_offline for corpus-scale "
                "facet jobs (streaming Ray groupby)"
            )
        entries = []
        seen = set()
        for seg in self.segments:
            for key in seg.doc_keys.tolist():
                if key in self.deleted or key in seen:
                    continue
                seen.add(key)
                entries.append((float(0xFFFF), int(key), 0))
        if q.filter:
            ast = flt.parse(q.filter) if isinstance(q.filter, str) else q.filter
            entries = [e for e in entries if flt.matches_row(ast, self._field_row(e[1]))]
        top = entries[: q.max_results]
        facets = self._build_facets(top)
        return Result(
            self._to_hits(top), facets, len(top) - 1 if top else 0,
            top[-1][0] if top else 0.0, len(entries),
        )

    def _apply_sort(self, entries, field_name: str, ascending: bool):
        """ResultProcessor.ApplySort (:126-141): same-type comparable values,
        else string ordinal; None sorts first ascending."""

        def sort_key(e):
            v = self._field_row(e[1]).get(field_name)
            if v is None:
                return (0, "", 0.0)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return (1, "", float(v))
            return (2, str(v), 0.0)

        return sorted(entries, key=sort_key, reverse=not ascending)

    def _build_facets(self, entries, max_per_field: int = 100):
        """FacetBuilder.BuildFacets (src/Infidex/Core/FacetBuilder.cs:19-74):
        value counts per stored field over the result set, count desc then
        value asc, capped at 100 values per field."""
        counts: dict[str, dict[str, int]] = {}
        for _, key, _tb in entries:
            row = self._field_row(key)
            for name, value in row.items():
                if name == "url" or value is None:
                    continue
                values = value if isinstance(value, (list, tuple)) else [value]
                field_counts = counts.setdefault(name, {})
                for v in values:
                    s = str(v)
                    field_counts[s] = field_counts.get(s, 0) + 1
        return {
            name: sorted(fc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_per_field]
            for name, fc in counts.items()
            if fc
        }

    def bm25_all_scores(
        self,
        query_text: str,
        include_fuzzy: bool = False,
        fuzzy_df_overrides: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Disjunctive full-corpus BM25+ scores in float64 — the SQL-oracle
        surface (no candidate pruning): every doc matching ≥1 query term
        gets its exact score. With ``include_fuzzy``, terms absent from the
        dictionary (df=0, len ≥ 4) contribute their LD1 virtual-term
        postings (tf=1, df = global union cardinality) exactly like
        stage-1's fuzzy expansion — the float64 mirror of the score the
        search path accumulates in float32. Returns (doc_key, score) rows."""
        from .analyzer import normalize_with, tokenize_for_search

        cfg = self.cfg
        q = normalize_with(cfg.normalizer, query_text.strip(), is_query=True).lower()
        tokens = sorted(
            set(
                tokenize_for_search(
                    q, cfg.index_sizes, cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters
                )
            )
        )
        terms = []
        fuzzy_terms = []
        for t in tokens:
            df = self.df_lookup(t)
            if df == 0 and include_fuzzy and len(t) >= 4:
                # fuzzy_df_overrides: a SHARD engine scoring with the
                # INDEX-global LD1 union cardinality (its own sum covers
                # only its segments — ops.batchsearch.batch_search_sharded
                # round 1 supplies the global value)
                fdf = (
                    fuzzy_df_overrides[t]
                    if fuzzy_df_overrides is not None and t in fuzzy_df_overrides
                    else self._fuzzy_global_df(t)
                )
                if 0 < fdf <= cfg.stop_term_limit:
                    idf = float(
                        np.log((self.total_docs - fdf + 0.5) / (fdf + 0.5) + 1.0)
                    )
                    fuzzy_terms.append((t, idf))
                continue
            if 0 < df <= cfg.stop_term_limit:
                idf = float(np.log((self.total_docs - df + 0.5) / (df + 0.5) + 1.0))
                terms.append((t, idf))
        out: list[tuple[int, float]] = []
        avgdl = self.avgdl if self.avgdl > 0 else 1.0
        for si, seg in enumerate(self.segments):
            acc: dict[int, float] = {}

            def accumulate(docs, tf, idf):
                dl = seg.doc_len[docs].astype(np.float64)
                dl = np.where(dl <= 0, 1.0, dl)
                sc = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) + 1.0)
                for d, s in zip(docs.tolist(), sc.tolist()):
                    acc[d] = acc.get(d, 0.0) + s

            for t, idf in terms:
                i = seg.term_lookup(t)
                if i < 0:
                    continue
                docs, weights = seg.term_postings(i)
                accumulate(docs, weights.astype(np.float64), idf)
            for t, idf in fuzzy_terms:
                docs, _card = self.searchers[si].fuzzy_union(t)
                if len(docs):
                    accumulate(docs, np.ones(len(docs), dtype=np.float64), idf)
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
