"""Pinned regression cases + persistence roundtrip + alternate configs.

Ports of FuzzyRegressionTests.cs:32-60, BugReproductionTests.cs:13-64, and
MovieSearchPersistenceTests-style reload equality.
"""

from __future__ import annotations

import pytest

from infidex_ray.build import build_index_local
from infidex_ray.config import EngineConfig, config_100
from infidex_ray.engine import Engine
from infidex_ray.query import coverage as cov
from infidex_ray.query.fusion import fusion_calculate


def test_the_matrx_ranks_matrix_above_mat(tmp_path):
    """FuzzyRegressionTests: typo 'matrx' must prefer the fuzzy whole-word
    target over a shorter partial-gram match."""
    docs = [
        (1, "The Mat"), (2, "The Matrix"), (3, "The Matriarx"),
        (4, "The Match"), (5, "The Meatrix"),
    ]
    out = str(tmp_path / "idx")
    build_index_local(docs, out, n_segments=2)
    eng = Engine.load(out)
    hits = {h.doc_key: h.score for h in eng.search("the matrx", top_k=10)}
    assert 2 in hits, "The Matrix should be found"
    assert hits[2] > hits.get(1, 0.0), f"Matrix {hits.get(2)} vs Mat {hits.get(1)}"


def test_prefix_preference_revisited_over_reloaded():
    """BugReproductionTests: with word-level IDF available, 'the matrix rev'
    must score The Matrix Revisited above The Matrix Reloaded."""
    query = "the matrix rev"
    idf_cache = {"the": 1.574, "matrix": 9.544, "rev": 9.515}
    cfg = EngineConfig()
    delims = frozenset(cfg.delimiters)
    ctx = cov.prepare_query(
        query, 2, delims, cfg.index_sizes,
        lambda t: 0,                 # no gram stats → log2 fallback idf
        lambda w: None,              # word df unused; inject idf below
        0, cfg.stop_term_limit,
    )
    ctx.word_level_idf = [idf_cache.get(query[o : o + l], 0.0) for o, l in ctx.tokens]

    scores = {}
    for doc in ["The Matrix Reloaded", "The Matrix Revisited"]:
        f = cov.calculate_features(ctx, doc, 0.0, cfg.coverage, delims, cfg.min_index_size)
        scores[doc], _ = fusion_calculate(query, doc, f, 0.5)
    assert scores["The Matrix Revisited"] > scores["The Matrix Reloaded"], scores


def test_persistence_roundtrip(minicorpus, tmp_path):
    """Reload gives identical stats and identical search results
    (PersistenceTests / MovieSearchPersistenceTests intent)."""
    out = str(tmp_path / "p_idx")
    build_index_local(minicorpus, out, n_segments=3)
    a = Engine.load(out)
    b = Engine.load(out)
    assert (a.total_docs, a.avgdl) == (b.total_docs, b.avgdl)
    for q in ["batman", "qick fux", "new york", "speeding", "th", "x"]:
        ra = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in a.search(q, top_k=10)]
        rb = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in b.search(q, top_k=10)]
        assert ra == rb, q


def test_config_100_dual_ngrams(minicorpus, tmp_path):
    """config 100: IndexSizes=[2,3], no word matcher — engine still searches."""
    out = str(tmp_path / "c100_idx")
    build_index_local(minicorpus, out, config_100(), n_segments=2)
    eng = Engine.load(out, config_100())
    hits = eng.search("batman", top_k=5)
    assert hits and hits[0].doc_key == 6
    hits = eng.search("quick brown fox", top_k=5)
    assert hits and hits[0].doc_key == 1


def test_high_resolution_mode(minicorpus, tmp_path):
    """HighResolutionMode adds delimiter-stripped query variants
    (Tokenizer.cs:193-267): 'newyork' written split still finds doc 8."""
    out = str(tmp_path / "hr_idx")
    cfg = EngineConfig(high_resolution_mode=True)
    build_index_local(minicorpus, out, cfg, n_segments=2)
    eng = Engine.load(out, cfg)
    hits = eng.search("new york", top_k=5)
    assert hits and hits[0].doc_key == 8


def test_concurrent_searches(minicorpus, tmp_path):
    """ThreadSafetyTests analogue: concurrent readers get identical results
    (lazy caches may build redundantly but never corrupt)."""
    from concurrent.futures import ThreadPoolExecutor

    out = str(tmp_path / "conc_idx")
    build_index_local(minicorpus, out, n_segments=3)
    eng = Engine.load(out)
    queries = ["batman", "qick fux", "new york", "speeding", "th", "x"] * 4

    def run(q):
        return (q, tuple((h.doc_key, round(h.score, 6)) for h in eng.search(q, top_k=10)))

    baseline = {q: run(q)[1] for q in set(queries)}
    with ThreadPoolExecutor(max_workers=8) as ex:
        for q, res in ex.map(run, queries):
            assert res == baseline[q], q
