"""End-to-end: Ray build → segments → stage-1 BM25 vs the sequential oracle."""

import numpy as np
import pytest

from infidex_ray.config import EngineConfig
from infidex_ray.engine import Engine

from oracle import OracleEngine


QUERIES = [
    "batman",
    "quick fox",
    "qick fux",
    "speeding",
    "new york",
    "the question",
    "glitters gold",
    "superman bullet",
    "journey thousand miles",
    "fox",
    "crime gotham",
    "battamam",
    "incredible speeds",
]


@pytest.fixture(scope="module")
def built(ray_session, minicorpus, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("idx") / "mini")
    rows = [{"url": f"doc://{k}", "text": t, "doc_key": k} for k, t in minicorpus]
    ds = ray.data.from_items(rows)
    cfg = EngineConfig(target_docs_per_segment=1000, enable_word_matcher=False)
    eng = Engine.build(ds, out, cfg, text_column="text", key_column="doc_key")
    oracle = OracleEngine(cfg)
    oracle.index(minicorpus)
    return eng, oracle


def test_manifest_and_stats(built, minicorpus):
    eng, oracle = built
    assert eng.total_docs == len(minicorpus)
    assert abs(eng.avgdl - oracle.avgdl) < 1e-3
    assert len(eng.segments) == 1
    seg = eng.segments[0]
    assert seg.n_docs == 10
    # doc lengths match the oracle exactly
    # (segment rows are in input order since one segment)
    np.testing.assert_allclose(np.sort(seg.doc_len), np.sort(oracle.doc_len))


def test_df_matches_oracle(built):
    eng, oracle = built
    for t, term in oracle.terms.items():
        assert eng.df_lookup(t) == term.df, f"df mismatch for {t!r}"


@pytest.mark.parametrize("q", QUERIES)
def test_stage1_matches_oracle(built, q):
    eng, oracle = built
    from infidex_ray.analyzer import normalize

    nq = normalize(q.strip()).lower()
    got = eng.stage1(nq, 500)
    exp = oracle.stage1(q, 500)
    got_pairs = [(k, round(s, 4)) for s, k, *_ in got]
    exp_pairs = [(k, round(s, 4)) for s, k in exp]
    assert got_pairs == exp_pairs, f"query {q!r}: {got_pairs} != {exp_pairs}"


def test_minicorpus_bm25_sanity(built):
    """ReferenceMatchingTests-style checks at the BM25 (stage-1) level."""
    eng, _ = built
    top = eng.stage1("batman", 10)
    assert top and top[0][1] == 6
    top = eng.stage1("speeding", 10)
    assert top and top[0][1] == 7
    top = eng.stage1("new york", 10)
    assert top and top[0][1] == 8


def test_fuzzy_expansion(built):
    eng, _ = built
    # "battamam" contains unknown grams; LD1 expansion should still reach doc 6
    top = eng.stage1("battamam", 10)
    assert any(k == 6 for _, k, *_ in top)


def test_resume_skips_complete_segments(ray_session, minicorpus, tmp_path):
    import ray.data

    out = str(tmp_path / "idx2")
    rows = [{"url": f"doc://{k}", "text": t, "doc_key": k} for k, t in minicorpus]
    cfg = EngineConfig(target_docs_per_segment=1000)
    ds = ray.data.from_items(rows)
    eng1 = Engine.build(ds, out, cfg, key_column="doc_key")
    seg_name = eng1.segments[0].meta["segment_dir"]
    import os

    mtime = os.path.getmtime(os.path.join(seg_name, "postings.bin"))
    # rebuild over the same input: segment must be reused, not rewritten
    ds2 = ray.data.from_items(rows)
    eng2 = Engine.build(ds2, out, cfg, key_column="doc_key")
    assert os.path.getmtime(os.path.join(seg_name, "postings.bin")) == mtime
    assert eng2.total_docs == eng1.total_docs


@pytest.fixture(scope="module")
def built_multiseg(ray_session, minicorpus, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("idx") / "mini3")
    rows = [{"url": f"doc://{k}", "text": t, "doc_key": k} for k, t in minicorpus]
    cfg = EngineConfig(target_docs_per_segment=4, enable_word_matcher=False)
    eng = Engine.build(
        ray.data.from_items(rows), out, cfg, text_column="text", key_column="doc_key"
    )
    oracle = OracleEngine(cfg)
    oracle.index(minicorpus)
    return eng, oracle


@pytest.mark.parametrize("q", QUERIES)
def test_multisegment_stage1_matches_oracle(built_multiseg, q):
    """3 doc-disjoint segments with global stats must reproduce the
    single-segment ranking (VectorModel.cs:546-585 segment-merge model)."""
    eng, oracle = built_multiseg
    assert len(eng.segments) >= 2
    from infidex_ray.analyzer import normalize

    got = eng.stage1(normalize(q.strip()).lower(), 500)
    exp = oracle.stage1(q, 500)
    assert [(k, round(s, 4)) for s, k, *_ in got] == [(k, round(s, 4)) for s, k in exp]


def test_bm25_all_scores_fuzzy_matches_stage1_ranking(built):
    """bm25_all_scores(include_fuzzy=True) is the float64 SQL-surface mirror
    of the stage-1 score: for a typo query the fuzzy LD1 virtual term must
    contribute, and the float64 scores must rank-agree with the float32
    search path (the search_topk_bm25 contract hash relies on this)."""
    eng, _ = built
    plain = dict(eng.bm25_all_scores("quik fox"))
    fuzzy = dict(eng.bm25_all_scores("quik fox", include_fuzzy=True))
    # the fuzzy expansion must add score mass for the typo'd word
    assert any(fuzzy[k] > plain.get(k, 0.0) + 1e-9 for k in fuzzy)
    hits = eng.search("quik fox", top_k=10, enable_coverage=False)
    ranked_f64 = sorted(
        ((k, s) for k, s in fuzzy.items()),
        key=lambda e: (-np.float32(e[1]), e[0]),
    )
    assert [h.doc_key for h in hits] == [k for k, _ in ranked_f64[: len(hits)]]
