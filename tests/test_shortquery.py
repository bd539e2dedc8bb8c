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
