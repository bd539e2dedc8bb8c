"""Coverage / fusion parity tests (M4).

Golden relative-order assertions in the style of the reference suite:
* ReferenceMatchingTests.cs:39-103 — exact result sets on the 10-doc corpus
* MovieSearchParityTests.cs — typo/prefix/mixed query contracts, replayed on a
  synthetic movie-title fixture (the reference's movies.csv is a missing blob)
* CoverageEngineTests.cs:17-120 — coverage score unit thresholds

Every end-to-end case is asserted at multiple segment counts: partitioning
must not change results (north_rule rank-identity under distribution).
"""

from __future__ import annotations

import pytest

from infidex_ray.build import build_index_local
from infidex_ray.config import EngineConfig
from infidex_ray.engine import Engine
from infidex_ray.query import coverage as cov
from infidex_ray.query.metrics import damerau, lcs_containment


# --- unit: metrics -----------------------------------------------------------


def test_damerau_basics():
    assert damerau("abc", "abc", 2) == 0
    # the swap repair only fires when plain Levenshtein == max+1
    # (LevenshteinDistance.cs:288-295): at budget 2 the lev distance 2 is
    # returned as-is; at budget 1 the transposition reduces it to 1
    assert damerau("abc", "acb", 2) == 2
    assert damerau("abc", "acb", 1) == 1
    assert damerau("abc", "axc", 2) == 1
    assert damerau("abc", "ab", 2) == 1
    # only the FIRST mismatch may be repaired by a swap (:295-338)
    assert damerau("abcd", "badc", 2) == 3
    assert damerau("sh", "h", 1) == 1
    assert damerau("abc", "xyz", 1) == 3  # beyond budget: raw distance


def test_lcs_containment():
    # StringMetrics.cs:25-26 examples
    assert lcs_containment("battamam", "batman", 1) == 4
    assert lcs_containment("speeding", "speeds", 1) == 6
    assert lcs_containment("abc", "xxabcxx", 0) == 3  # containment
    assert lcs_containment("abc", "xyz", 2) == 0


# --- unit: coverage score (CoverageEngineTests port) -------------------------


def _coverage_score(query: str, doc: str) -> tuple[int, int]:
    cfg = EngineConfig()
    delims = frozenset(cfg.delimiters)
    ctx = cov.prepare_query(
        query, 2, delims, cfg.index_sizes, lambda t: 0, None, 0, cfg.stop_term_limit
    )
    f = cov.calculate_features(ctx, doc, 0.0, cfg.coverage, delims, cfg.min_index_size)
    return f.coverage_score, f.word_hits


def test_coverage_exact_match_high():
    score, hits = _coverage_score("hello world", "this is hello world text")
    assert score > 200 and hits == 2


def test_coverage_no_match_low():
    score, _ = _coverage_score("xyz abc", "hello world test")
    assert score < 100


def test_coverage_partial_match_moderate():
    score, hits = _coverage_score("hello world test", "hello world")
    assert score > 100 and hits == 2


def test_coverage_fuzzy_typo():
    score, hits = _coverage_score("batmam", "batman is a superhero")
    assert score > 150 and hits > 0


def test_coverage_joined_words():
    score, _ = _coverage_score("new york", "I live in newyork city")
    assert score > 100


def test_coverage_prefix_match():
    score, _ = _coverage_score("bat", "batman is a superhero")
    assert score > 50


def test_coverage_empty_query():
    score, hits = _coverage_score("", "hello world")
    assert score == 0 and hits == 0


# --- end-to-end: reference matching (exact result sets) ----------------------


@pytest.fixture(scope="module", params=[1, 2, 4])
def mini_engine(request, minicorpus, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"mini_idx_{request.param}")
    build_index_local(minicorpus, str(out), n_segments=request.param)
    return Engine.load(str(out))


def _keys(engine, q, k=10):
    return [h.doc_key for h in engine.search(q, top_k=k)]


def test_ref_batman(mini_engine):
    keys = _keys(mini_engine, "batman")
    assert keys and keys[0] == 6  # ReferenceMatchingTests.cs:40-50


def test_ref_qick_fux(mini_engine):
    assert _keys(mini_engine, "qick fux") == [5, 1]  # :53-64


def test_ref_battamam(mini_engine):
    assert _keys(mini_engine, "battamam") == [6]  # :67-84


def test_ref_new_york(mini_engine):
    assert _keys(mini_engine, "new york") == [8]  # :87-94


def test_ref_speeding(mini_engine):
    assert _keys(mini_engine, "speeding") == [7]  # :97-104


# --- end-to-end: movie-style parity fixture ----------------------------------

MOVIE_TITLES = [
    "The Shawshank Redemption", "Redemption", "Redemption Day", "Redemption Road",
    "Waking the Dead Redemption", "Shaws", "The Matrix", "The Matrix Reloaded",
    "The Matrix Revolutions", "The Match", "Matriarch", "The Hearse",
    "Heart of Gold", "The Godfather", "Pulp Fiction", "The Dark Knight",
    "Fight Club", "Forrest Gump", "Inception", "Goodfellas",
    "The Lord of the Rings The Fellowship of the Ring",
    "The Lord of the Rings The Two Towers",
    "The Lord of the Rings The Return of the King",
    "Star Wars", "Star Trek", "A Star Is Born", "Stardust",
    "Seven Samurai", "City of God", "Spirited Away", "Interstellar",
    "The Silence of the Lambs", "Saving Private Ryan", "The Green Mile",
    "Terminator 2 Judgment Day", "Back to the Future", "The Prestige",
    "Gladiator", "The Lion King", "The Departed", "Whiplash", "The Pianist",
    "Casablanca", "Psycho", "Rear Window", "Alien", "Aliens", "Apocalypse Now",
]
KEY = {t: i + 1 for i, t in enumerate(MOVIE_TITLES)}


@pytest.fixture(scope="module", params=[1, 3])
def movie_engine(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"movie_idx_{request.param}")
    docs = [(i + 1, t) for i, t in enumerate(MOVIE_TITLES)]
    build_index_local(docs, str(out), n_segments=request.param)
    return Engine.load(str(out))


def _top(engine, q, k=10):
    return engine.search(q, top_k=k)


def test_movie_redemption_sh(movie_engine):
    """MovieSearchParityTests.cs:37-65: Shawshank first, strictly higher."""
    hits = _top(movie_engine, "redemption sh")
    assert hits[0].doc_key == KEY["The Shawshank Redemption"]
    assert hits[0].score > hits[1].score


def test_movie_shawshank_exact_and_typos(movie_engine):
    for q in ["shawshank", "Shaaawshank", "shwashan"]:
        hits = _top(movie_engine, q)
        assert hits[0].doc_key == KEY["The Shawshank Redemption"], q


def test_movie_redemption_typos(movie_engine):
    """:104-158 — one- and two-typo variants still prefer Shawshank."""
    for q in ["redeption sh", "redption sh", "redemption shan", "redemption wshan"]:
        hits = _top(movie_engine, q)
        assert hits[0].doc_key == KEY["The Shawshank Redemption"], q


def test_movie_shawsh_over_shaws(movie_engine):
    """:160-192 — prefix of longer title over short near-match."""
    hits = _top(movie_engine, "shawsh")
    keys = [h.doc_key for h in hits]
    assert keys[0] == KEY["The Shawshank Redemption"]
    assert KEY["Shaws"] in keys[1:]


def test_movie_the_amtrix(movie_engine):
    """:214-279 — transposition/doubled-letter typos find The Matrix."""
    for q in ["the amtrix", "the ammtrix", "the matrx", "te matrix", "te matri"]:
        hits = _top(movie_engine, q)
        assert hits[0].doc_key == KEY["The Matrix"], q


def test_movie_fellowship(movie_engine):
    hits = _top(movie_engine, "fellowship of the ring")
    assert hits[0].doc_key == KEY["The Lord of the Rings The Fellowship of the Ring"]


def test_movie_the_hear(movie_engine):
    """:429-446 — 'the hear' prefers The Hearse."""
    hits = _top(movie_engine, "the hear")
    assert hits[0].doc_key == KEY["The Hearse"]


def test_segment_invariance(minicorpus, tmp_path_factory):
    """Same scores/order regardless of partitioning (north_rule)."""
    results = []
    for nseg in (1, 2, 4):
        out = tmp_path_factory.mktemp(f"inv_{nseg}")
        build_index_local(minicorpus, str(out), n_segments=nseg)
        eng = Engine.load(str(out))
        per_query = {}
        for q in ["batman", "qick fux", "new york", "speeding", "quick brown fox"]:
            per_query[q] = [
                (h.doc_key, round(h.score, 6), h.tiebreaker) for h in eng.search(q, top_k=10)
            ]
        results.append(per_query)
    assert results[0] == results[1] == results[2]


# --- mixed-term queries (long + short tokens route differently) --------------

MIXED_TITLES = [
    "San Andreas", "Santa Clarita Diet", "San Francisco Story", "Sand Castle",
    "Two for the Money", "Two Fools", "Two For Joy", "Twofold Trouble",
    "As I Am", "Asteroid City", "Amadeus", "The Godfather", "Heat",
]
MKEY = {t: i + 1 for i, t in enumerate(MIXED_TITLES)}


@pytest.fixture(scope="module")
def mixed_engine(tmp_path_factory):
    out = tmp_path_factory.mktemp("mixed_idx")
    build_index_local([(i + 1, t) for i, t in enumerate(MIXED_TITLES)], str(out), n_segments=2)
    return Engine.load(str(out))


def test_mixed_san_a(mixed_engine):
    """MovieSearchParityTests.cs:623-659: 'san a' — the trailing single char
    must prefer the title whose NEXT word starts with it."""
    hits = mixed_engine.search("san a", top_k=10)
    assert hits[0].doc_key == MKEY["San Andreas"]


def test_mixed_two_f_strict_prefix(mixed_engine):
    """:661-694: 'two f' prefers titles where 'f' starts the second word."""
    hits = mixed_engine.search("two f", top_k=10)
    top3 = [h.doc_key for h in hits[:3]]
    assert set(top3) == {MKEY["Two Fools"], MKEY["Two For Joy"], MKEY["Two for the Money"]}
    assert MKEY["Twofold Trouble"] not in top3


def test_mixed_two_fo_exact_prefixes_first(mixed_engine):
    """:696+: all exact 'fo' prefixes rank before the joined 'Twofold'."""
    hits = mixed_engine.search("two fo", top_k=10)
    keys = [h.doc_key for h in hits]
    joined = keys.index(MKEY["Twofold Trouble"])
    for t in ("Two Fools", "Two For Joy", "Two for the Money"):
        assert keys.index(MKEY[t]) < joined


def test_mixed_as_am(mixed_engine):
    """:862-888: 'as am' prefers 'As I Am'."""
    hits = mixed_engine.search("as am", top_k=10)
    assert hits[0].doc_key == MKEY["As I Am"]


# --- auxiliary metrics (JaccardMetricTests / EditDistanceModelTests ports) ---


def test_jaccard_metrics():
    from infidex_ray.query.metrics import jaccard_of_all_chars, jaccard_of_char_set

    assert jaccard_of_all_chars("abc", "abc") == 1.0
    assert jaccard_of_char_set("abc", "abc") == 1.0
    assert jaccard_of_all_chars("", "abc") == 0.0
    assert jaccard_of_all_chars("aab", "ab") == pytest.approx(2 / 3)
    assert jaccard_of_char_set("aab", "ab") == 1.0
    assert jaccard_of_char_set("abc", "xyz") == 0.0


def test_jaro_winkler():
    from infidex_ray.query.metrics import jaro_similarity, jaro_winkler_similarity

    assert jaro_similarity("", "") == 1.0
    assert jaro_similarity("abc", "abc") == 1.0
    assert jaro_similarity("abc", "xyz") == 0.0
    assert 0.7 < jaro_similarity("martha", "marhta") < 1.0
    assert jaro_winkler_similarity("martha", "marhta") > jaro_similarity("martha", "marhta")


def test_edit_distance_model():
    from infidex_ray.query.metrics import max_edits_for_length

    assert max_edits_for_length(0) == 0
    assert max_edits_for_length(5, p=0.0) == 0
    assert max_edits_for_length(5, p=1.0) == 5
    # typical regime: longer words tolerate more edits, monotonically
    prev = 0
    for ln in (3, 8, 20, 50):
        d = max_edits_for_length(ln, p=0.04, alpha=0.01)
        assert d >= prev
        prev = d
    assert max_edits_for_length(3, p=0.04, alpha=0.01) <= 2


def test_randomized_partition_invariance(tmp_path_factory):
    """Seeded random corpora + typo'd queries: results (scores, tiebreaks,
    order) must be identical at 1, 3 and 7 segments — the partitioning
    half of the north-rule rank-identity requirement, beyond fixed fixtures."""
    import random

    random.seed(99)
    vocab = (
        "alpha beta gamma delta epsilon zeta matrix redemption quick brown fox "
        "jumps lazy batman gotham wonder speed light parquet arrow column"
    ).split()
    for trial in range(2):
        docs = []
        for i in range(60):
            docs.append((i + 1, " ".join(random.choice(vocab) for _ in range(random.randint(1, 12)))))
        queries = []
        for _ in range(6):
            q = " ".join(random.choice(vocab) for _ in range(random.randint(1, 3)))
            if random.random() < 0.5 and len(q) > 4:
                i = random.randrange(len(q) - 1)
                q = q[:i] + q[i + 1] + q[i] + q[i + 2:]  # transposition typo
            queries.append(q)
        results = []
        for nseg in (1, 3, 7):
            out = tmp_path_factory.mktemp(f"rand_{trial}_{nseg}")
            build_index_local(docs, str(out), n_segments=nseg)
            eng = Engine.load(str(out))
            results.append(
                {q: [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in eng.search(q, top_k=10)] for q in queries}
            )
        assert results[0] == results[1] == results[2], (trial, queries)


# ---------------------------------------------------------------------------
# LexicalPrescreen (CoverageSetup.EnableLexicalPrescreen, off by default)


def test_lexical_prescreen(ray_session, tmp_path):
    from dataclasses import replace

    import ray.data

    from infidex_ray.config import EngineConfig
    from infidex_ray.engine import Engine
    from infidex_ray.query.pipeline import lexical_prescreen, prescreen_words

    rows = [
        {"doc_key": 1, "text": "batman fights crime in gotham"},
        {"doc_key": 2, "text": "superman flies over metropolis"},
        {"doc_key": 3, "text": "totally unrelated cooking recipes"},
    ]
    cfg = EngineConfig()
    cfg = replace(cfg, coverage=replace(cfg.coverage, enable_lexical_prescreen=True))
    eng = Engine.build(
        ray.data.from_items(rows), str(tmp_path / "ps_idx"), cfg,
        text_column="text", key_column="doc_key",
    )
    # candidates: all three docs; query word present only in doc 1
    top = [(3.0, 1, 0), (2.0, 2, 0), (1.0, 3, 0)]
    assert prescreen_words(cfg, "batman") == {"batman"}
    out = lexical_prescreen(eng, "batman", top)
    assert [e[1] for e in out] == [1]
    # typo (df == 0) → conservative skip, candidates unchanged
    assert lexical_prescreen(eng, "batmna", top) == top
    # word filtering everything → fall back to unfiltered
    # search still returns results with prescreen enabled
    hits = eng.search("batman gotham", top_k=3)
    assert hits and hits[0].doc_key == 1


def test_autocomplete_scoring():
    """AutocompleteScoring port: LCS bit-parallel == DP; Jaro-like ranges."""
    import itertools
    import random

    from infidex_ray.query.metrics import (
        jaro_like_score, lcs_bitparallel, lcs_dp, lcs_length,
    )

    assert lcs_length("uni", "university") == 3
    assert lcs_length("uni", "hi") == 1
    assert lcs_length("", "abc") == 0
    assert lcs_length("abc", "abc") == 3

    rng = random.Random(5)
    alpha = "abcdef"
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        assert lcs_bitparallel(a, b) == lcs_dp(a, b), (a, b)

    # long strings route through DP
    assert lcs_length("a" * 80, "a" * 70) == 70

    # exact match scores 1.0; disjoint scores 0
    assert jaro_like_score("university", "university") == 1.0
    assert jaro_like_score("xyz", "abc") == 0.0
    # Winkler-style prefix bonus: common prefix beats same-LCS non-prefix
    assert jaro_like_score("abc", "abcdef") > jaro_like_score("abc", "xabcdef")
    assert 0.0 <= jaro_like_score("uni", "university") <= 1.0


def test_batch_jaro_like_parity():
    """ops.autocomplete._batch_jaro_like matches the per-string surfaces:
    lcs == metrics.lcs_length, prefix == common prefix, and the float64
    score tracks the reference float32 jaro_like_score within f32 eps."""
    import numpy as np

    from infidex_ray.ops.autocomplete import _batch_jaro_like
    from infidex_ray.query.metrics import jaro_like_score, lcs_length

    q = "merge sort"
    texts = [
        "merge sort algorithms in practice",
        "MERGE join and sort operators",
        "",
        None,
        "xyz",
        "m",
        "sorted merge of runs",
        "ab" * 40,  # longer than candidate_chars
        "mérge sort",  # non-ASCII char: no match in the ASCII map
    ]
    lcs, prefix, score = _batch_jaro_like(texts, q, 32, 0.1)
    for i, t in enumerate(texts):
        cand = (t or "")[:32].lower()
        assert lcs[i] == lcs_length(q, cand), (i, t)
        exp_pref = 0
        for a, b in zip(q, cand):
            if a != b:
                break
            exp_pref += 1
        assert prefix[i] == exp_pref, (i, t)
        ref = jaro_like_score(q, cand)
        assert abs(score[i] - ref) < 1e-5, (i, t, score[i], ref)
