"""char_jaccard / typo_budget / packed_lcs_score: DuckDB side-by-side on
adversarial content + cross-checks against the per-string reference ports
in query/metrics.py (JaccardMetric.cs, EditDistanceModel.cs,
PackedBitParallelLcs.cs)."""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from infidex_ray import sqlgen
from infidex_ray.ops.autocomplete import _batch_packed_lcs
from infidex_ray.ops.charmetrics import (
    _WS_PAT,
    _batch_char_jaccard,
    binom_max_edits,
)
from infidex_ray.query.metrics import (
    jaccard_of_all_chars,
    jaccard_of_char_set,
    lcs_bitparallel,
    max_edits_for_length,
)

ADVERSARIAL = [
    "the quick brown fox",
    "",
    "aaaa bbbb aaaa",
    "x\xa0y z w",  # NBSP / LS inside text
    "café déjà vu",  # Latin-1 range chars (< 256, in the char map domain)
    "MIXED Case QUICK",
    "a",
    "merge sort quick merge sort",
    "zzzz qqqq",
    "日本語 text",  # codepoints ≥ 256: never match the packed map
]


@pytest.fixture(scope="module")
def docs_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL)), pa.int64()),
            "text": pa.array(ADVERSARIAL, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def con(docs_table):
    c = duckdb.connect()
    c.register("documents", docs_table)
    return c


def _r4(v):
    return np.floor(np.abs(v) * 1e4 + 0.5) * np.sign(v) / 1e4


def test_char_jaccard_oracle_parity(docs_table, con):
    query = "quick café"
    qarr = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    qcodes, qcounts = np.unique(qarr, return_counts=True)
    ja, js = _batch_char_jaccard(ADVERSARIAL, qcodes, qcounts, len(query))
    orc = con.execute(sqlgen.char_jaccard_sql(query)).df()
    np.testing.assert_array_equal(_r4(ja), orc["jaccard_all"].to_numpy())
    np.testing.assert_array_equal(_r4(js), orc["jaccard_set"].to_numpy())


def test_char_jaccard_matches_per_string_port():
    query = "quick café"
    qarr = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    qcodes, qcounts = np.unique(qarr, return_counts=True)
    ja, js = _batch_char_jaccard(ADVERSARIAL, qcodes, qcounts, len(query))
    for i, t in enumerate(ADVERSARIAL):
        assert ja[i] == pytest.approx(jaccard_of_all_chars(query, t), abs=0)
        assert js[i] == pytest.approx(jaccard_of_char_set(query, t), abs=0)


def test_typo_budget_oracle_parity(docs_table, con):
    ws = re.compile(_WS_PAT)
    from collections import Counter

    c = Counter()
    for t in ADVERSARIAL:
        for w in ws.split(t):
            if w:
                c[len(w)] += 1
    p, alpha = 0.04, 0.01
    mine = sorted(
        (L, n, binom_max_edits(L, p, 1.0 - p, 1.0 - alpha))
        for L, n in c.items()
    )
    orc = con.execute(sqlgen.typo_budget_sql(p, alpha)).df()
    assert [tuple(r) for r in orc.itertuples(index=False)] == mine


def test_binom_max_edits_matches_pow_port():
    """Sequential-product q^L (the oracle-mirrorable form) must agree with
    the Math.Pow-shaped per-string port for every practical length."""
    for p, alpha in [(0.04, 0.01), (0.03, 0.05), (0.1, 0.001)]:
        q, target = 1.0 - p, 1.0 - alpha
        for L in range(0, 201):
            assert binom_max_edits(L, p, q, target) == max_edits_for_length(
                L, p, alpha
            ), (p, alpha, L)


def test_packed_lcs_reference_example():
    """PackedBitParallelLcs.cs:72-74 documented example."""
    lm, total, matched, _pfx, _s = _batch_packed_lcs(
        ["university"], ["uni", "vers", "ity"], 32, 0.1
    )
    assert lm[0].tolist() == [3, 4, 3]
    assert total[0] == 10 and matched[0] == 3


def test_packed_lcs_matches_per_word_bitparallel():
    """Boundary masks must isolate words: the packed register result
    equals running the plain Hyyrö automaton per word independently."""
    words = ["merge", "sort", "ab", "quick"]
    lm, _t, _m, _p, _s = _batch_packed_lcs(ADVERSARIAL, words, 32, 0.1)
    for i, t in enumerate(ADVERSARIAL):
        cand = t[:32].lower()
        for wi, w in enumerate(words):
            assert lm[i, wi] == lcs_bitparallel(w, cand), (t, w)


def test_packed_lcs_oracle_parity(docs_table, con):
    words = ["merge", "sort", "quick"]
    lm, total, matched, prefix, score = _batch_packed_lcs(
        ADVERSARIAL, words, 32, 0.1
    )
    orc = con.execute(sqlgen.packed_lcs_sql(words)).df()
    for wi in range(len(words)):
        np.testing.assert_array_equal(lm[:, wi], orc[f"lcs_{wi}"].to_numpy())
    np.testing.assert_array_equal(total, orc["total_lcs"].to_numpy())
    np.testing.assert_array_equal(matched, orc["matched_words"].to_numpy())
    np.testing.assert_array_equal(prefix, orc["prefix"].to_numpy())
    np.testing.assert_array_equal(_r4(score), orc["score"].to_numpy())


def test_packed_lcs_validates():
    with pytest.raises(ValueError, match="1..60"):
        _batch_packed_lcs(["x"], ["a" * 61], 32, 0.1)
    with pytest.raises(ValueError):
        sqlgen.packed_lcs_sql(["a" * 61])
    with pytest.raises(ValueError):
        sqlgen.char_jaccard_sql("")


def test_packed_lcs_case_expanding_codepoints():
    """'İ' (U+0130) lowercases to TWO codepoints — the candidate matrix
    must widen instead of desyncing the reshape, and word offsets must
    track the LOWERED lengths (review finding)."""
    texts = ["İ" * 32, "istanbul city", ""]
    lm, total, _m, _p, score = _batch_packed_lcs(texts, ["istanbul"], 32, 0.1)
    assert lm.shape == (3, 1) and np.isfinite(score).all()
    # a case-expanding WORD keeps masks in sync (İ -> 'i̇' = 2 positions)
    lm2, _t2, _m2, _p2, _s2 = _batch_packed_lcs(
        ["istanbul"], ["İst"], 32, 0.1
    )
    from infidex_ray.query.metrics import lcs_bitparallel

    assert lm2[0, 0] == lcs_bitparallel("İst".lower(), "istanbul")
    # oracle constants stay consistent too (no ValueError / desync)
    sql = sqlgen.packed_lcs_sql(["İst"])
    assert "bit_count" in sql


def test_autocomplete_case_expanding_candidate():
    from infidex_ray.ops.autocomplete import _batch_jaro_like

    lcs, prefix, score = _batch_jaro_like(["İ" * 32, "merge sort"], "merge", 32, 0.1)
    assert len(lcs) == 2 and np.isfinite(score).all()
