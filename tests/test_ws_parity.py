"""Exotic-whitespace parity: ops whose oracles use RE2 ``\\s``/``\\S`` or
DuckDB ``trim()`` must match DuckDB on text containing NBSP/NEL/U+2028/FS/
ideographic space — the round-3 driver ``repetition_signals`` hash FAIL was
exactly this class (Python ``str.split()`` treats Unicode whitespace as
separators; RE2 ``\\s`` is ASCII-only; DuckDB ``trim()`` strips Zs only).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

ADVERSARIAL = [
    "x\xa0y x\xa0y z",  # NBSP inside oracle tokens, split by Python
    "p q\x85p q",  # NEL
    "one two one two",  # LS
    "a\x1cb a\x1cb",  # file separator (control, not RE2 \s, not Zs)
    "l1\nl1\nl2\r\nl2 w w",
    "tail ",  # trailing Zs (DuckDB trim strips)
    "tail\x85",  # trailing NEL (DuckDB trim KEEPS)
    "　lead ideographic",
    "a b a b a b a b",  # thin space vs ASCII space 2-gram tie
    "",
    "single",
    "  plain ascii words words  ",
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


def _oracle(con, key: str):
    import __ray_entry__ as E

    return (
        con.execute(E.oracle_sql()[key])
        .fetchdf()
        .sort_values("doc_id", kind="stable")
        .reset_index(drop=True)
    )


def _cmp(ray_df, ora_df, float_cols=()):
    ray_df = ray_df.sort_values("doc_id", kind="stable").reset_index(drop=True)
    assert len(ray_df) == len(ora_df)
    for col in ora_df.columns:
        a, b = ray_df[col], ora_df[col]
        if col in float_cols:
            assert (a.astype(float) - b.astype(float)).abs().max() < 1e-12, col
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), col


def test_repetition_signals_ws_parity(docs_table, con):
    from infidex_ray.ops.textstats import repetition_signals_batch

    _cmp(
        repetition_signals_batch(docs_table).to_pandas(),
        _oracle(con, "repetition_signals"),
        float_cols=(
            "n_lines",  # DuckDB sum() comes back float64 through fetchdf
            "frac_dup_lines",
            "frac_dup_line_chars",
            "top_2gram_frac",
        ),
    )


def test_token_count_ws_parity(docs_table, con):
    from infidex_ray.ops.textstats import token_count_batch

    _cmp(token_count_batch(docs_table).to_pandas(), _oracle(con, "token_count"))


def test_gopher_rules_ws_parity(docs_table, con):
    from infidex_ray.ops.textstats import gopher_rules_batch

    _cmp(
        gopher_rules_batch(docs_table).to_pandas(),
        _oracle(con, "gopher_rules"),
        float_cols=(
            "mean_word_len",
            "frac_bullet_lines",
            "frac_ellipsis_lines",
            "symbol_word_ratio",
            "frac_alpha_words",
        ),
    )


def test_hashed_bow_ws_parity(docs_table, con):
    from infidex_ray.ops.vectorize import hashed_bow_batch

    ray_df = (
        hashed_bow_batch(docs_table, dim=64)
        .to_pandas()
        .sort_values(["doc_id", "bucket"], kind="stable")
        .reset_index(drop=True)
    )
    import __ray_entry__ as E

    ora = (
        con.execute(E.oracle_sql()["hashed_bow"])
        .fetchdf()
        .sort_values(["doc_id", "bucket"], kind="stable")
        .reset_index(drop=True)
    )
    assert ray_df["doc_id"].tolist() == ora["doc_id"].tolist()
    assert ray_df["bucket"].tolist() == ora["bucket"].tolist()
    assert ray_df["tf"].tolist() == ora["tf"].tolist()


def test_html_trim_matches_duckdb(con):
    """html_to_text's final collapse+trim == regexp_replace(\\s+)+trim."""
    from infidex_ray.ops.html import html_to_text

    for t in ADVERSARIAL:
        got = html_to_text(f"<p>{t}</p>".encode())
        want = con.execute(
            "SELECT trim(regexp_replace(' ' || ? || ' ', '\\s+', ' ', 'g'))",
            [t],
        ).fetchone()[0]
        assert got == want, repr(t)


def test_ascii_split_matches_duckdb(con):
    from infidex_ray.ops.asciiws import split_ascii_ws

    for t in ADVERSARIAL:
        want = con.execute(
            "SELECT list_filter(string_split_regex(?, '\\s+'), x -> x <> '')",
            [t],
        ).fetchone()[0]
        assert split_ascii_ws(t) == list(want), repr(t)
