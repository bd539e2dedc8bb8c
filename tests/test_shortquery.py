"""Short-query path parity (M5): 1-char and 2-3-char queries.

Contracts from MovieSearchParityTests.cs:557-621 (single letter: exact title
first), :608-621 ("io" exact over prefixes), :999-1135 (two-letter partial
matches) — replayed on a synthetic fixture; plus segment invariance.
"""

from __future__ import annotations

import pytest

from infidex_ray.build import build_index_local
from infidex_ray.engine import Engine
from infidex_ray.query.shortquery import build_prefix_patterns

TITLES = [
    "Valerian", "Vampire Hunter", "The Vast of Night", "Avatar", "Nova",
    "Rambo", "Raging Bull", "The Raid", "Cobra", "Radius",
    "X", "X-Men", "Xanadu", "Io", "Ion City", "Violet",
    "The Hearse", "Thor", "The Matrix", "A Star Is Born", "Amelie",
]
KEY = {t: i + 1 for i, t in enumerate(TITLES)}


@pytest.fixture(scope="module", params=[1, 2])
def sq_engine(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"sq_idx_{request.param}")
    docs = [(i + 1, t) for i, t in enumerate(TITLES)]
    build_index_local(docs, str(out), n_segments=request.param)
    return Engine.load(str(out))


def test_prefix_patterns():
    # minIndexSize=3, startPad=2, query "th" →
    # pad-prefixed grams, then the word-boundary " th" pattern (:233-252)
    pats = build_prefix_patterns("th", 3, 2)
    assert pats == ["￿￿" + "t", "￿" + "th", "th", " th"]


def test_single_letter_exact_title_first(sq_engine):
    hits = sq_engine.search("x", top_k=10)
    assert hits[0].doc_key == KEY["X"]
    keys = [h.doc_key for h in hits]
    assert KEY["X-Men"] in keys and KEY["Xanadu"] in keys


def test_single_letter_returns_results(sq_engine):
    hits = sq_engine.search("a", top_k=10)
    assert len(hits) > 0
    # word-start docs outrank contains-only docs
    assert hits[0].doc_key in (KEY["A Star Is Born"], KEY["Avatar"], KEY["Amelie"])


def test_two_letters_prefix_first(sq_engine):
    hits = sq_engine.search("va", top_k=10)
    assert hits[0].doc_key in (KEY["Valerian"], KEY["Vampire Hunter"])
    hits = sq_engine.search("ra", top_k=10)
    top3 = {h.doc_key for h in hits[:3]}
    assert top3 <= {KEY["Rambo"], KEY["Raging Bull"], KEY["Radius"], KEY["The Raid"]}


def test_io_exact_over_prefixes(sq_engine):
    hits = sq_engine.search("io", top_k=10)
    assert hits[0].doc_key == KEY["Io"]
    assert hits[1].doc_key == KEY["Ion City"]


def test_th_returns_results(sq_engine):
    hits = sq_engine.search("th", top_k=10)
    assert len(hits) > 0
    the_titles = {KEY["The Vast of Night"], KEY["The Hearse"], KEY["The Matrix"],
                  KEY["The Raid"], KEY["Thor"]}
    assert hits[0].doc_key in the_titles


def test_no_exact_match_partial(sq_engine):
    hits = sq_engine.search("ab", top_k=10)
    assert len(hits) > 0  # fuzzy fallback produced partial matches


def test_short_query_segment_invariance(tmp_path_factory):
    results = []
    for nseg in (1, 3):
        out = tmp_path_factory.mktemp(f"sqinv_{nseg}")
        docs = [(i + 1, t) for i, t in enumerate(TITLES)]
        build_index_local(docs, str(out), n_segments=nseg)
        eng = Engine.load(str(out))
        per_query = {
            q: [(h.doc_key, round(h.score, 6)) for h in eng.search(q, top_k=10)]
            for q in ["x", "a", "va", "ra", "io", "th", "ab"]
        }
        results.append(per_query)
    assert results[0] == results[1]


# ---------------------------------------------------------------------------
# build-time artifacts (sq_champions / sq_prefix) vs the scan path


def test_build_artifacts_present(sq_engine):
    for seg in sq_engine.segments:
        assert seg.short_tables is not None
        assert "sq_champions.parquet" in seg.short_tables
        assert "sq_prefix.parquet" in seg.short_tables


def test_artifact_champions_match_scan(sq_engine):
    """Frozen champion lists must be byte-identical to the on-the-fly scan
    (same entries, same order) for every char in the corpus."""
    from dataclasses import replace

    from infidex_ray.analyzer import _word_splitter
    from infidex_ray.query.shortquery import SegmentShortQuery

    splitter = _word_splitter(sq_engine.cfg.delimiters)
    chars = set("".join(TITLES).lower()) | {"z", "?"}
    for seg in sq_engine.segments:
        s_art = SegmentShortQuery(seg, splitter)
        s_scan = SegmentShortQuery(replace(seg, short_tables=None), splitter)
        assert s_art._champ_map is not None and s_scan._champ_map is None
        for ch in chars:
            assert s_art.champions(ch) == s_scan.champions(ch), ch


def test_artifact_prefix_counts_match_scan(sq_engine):
    from dataclasses import replace

    from infidex_ray.analyzer import _word_splitter
    from infidex_ray.query.shortquery import SegmentShortQuery

    splitter = _word_splitter(sq_engine.cfg.delimiters)
    prefixes = {"v", "va", "val", "x", "io", "th", "the", "zz", "a", "ra"}
    for seg in sq_engine.segments:
        s_art = SegmentShortQuery(seg, splitter)
        s_scan = SegmentShortQuery(replace(seg, short_tables=None), splitter)
        for p in prefixes:
            assert s_art.count_word_start_docs(p) == s_scan.count_word_start_docs(p), p


def test_vectorized_fuzzy_matches_reference_loop(sq_engine):
    """The char→terms index fuzzy pass must accumulate exactly what the
    reference's full-vocabulary loop does (ProcessFuzzyFallback, :310-353)."""
    from infidex_ray.analyzer import _word_splitter
    from infidex_ray.query.shortquery import SegmentShortQuery, build_prefix_patterns

    splitter = _word_splitter(sq_engine.cfg.delimiters)
    for q in ["xq", "io", "zz"]:
        patterns = build_prefix_patterns(q, 3, 2)
        for seg in sq_engine.segments:
            s = SegmentShortQuery(seg, splitter)
            ds_fast, fp_fast = s.prefix_pass(patterns, q)
            s.fuzzy_pass(patterns, q, ds_fast, fp_fast)

            # brute-force reference loop
            ds_ref, fp_ref = s.prefix_pass(patterns, q)
            checked = set(ds_ref.keys())
            for ti, term in enumerate(seg.terms):
                text = str(term)
                if any(text.startswith(p) for p in patterns):
                    continue
                has_b = False
                matches = 0
                for qc in q:
                    if (" " + qc) in text:
                        has_b = True
                        matches += 1
                    elif qc in text:
                        matches += 1
                if has_b or matches > 0:
                    s._accumulate_term(ti, 2 if has_b else 1, ds_ref, fp_ref, checked, q)
            assert ds_fast == ds_ref and fp_fast == fp_ref, q


def test_merged_sq_artifacts_match_recompute(ray_session, tmp_path):
    """_merge_short_tables (the merge fast path) is bit-identical to a
    fresh compute_short_tables over the merged docmap — champion scores
    are doc-local and the rank rule is global, so re-ranking the
    concatenated per-segment top-64 IS the fresh result."""
    import os

    import pyarrow.parquet as pq

    from infidex_ray.build import build_index_local, merge_index
    from infidex_ray.config import EngineConfig

    docs = [
        (k, f"w{k % 7} alpha b{k % 3} {'x' * (k % 5 + 1)} beta gamma")
        for k in range(60)
    ]
    fine = str(tmp_path / "fine")
    build_index_local(docs, fine, EngineConfig(), n_segments=6)
    merged = str(tmp_path / "merged")
    merge_index(fine, merged, use_ray=False, target_segments=1)

    one = str(tmp_path / "one")
    build_index_local(docs, one, EngineConfig(), n_segments=1)

    for f in ("sq_champions.parquet", "sq_prefix.parquet"):
        a = pq.read_table(os.path.join(merged, "segments", "seg-0000", f))
        b = pq.read_table(os.path.join(one, "segments", "seg-0000", f))
        assert a.equals(b), f
