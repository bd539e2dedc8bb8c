"""Infiscript filter language + Query post-processing (M6).

Semantics ported from FilterParserTests.cs / BytecodeVMTests.cs /
TernaryFilterTests.cs / FacetingTests.cs (representative subset) plus the
reference execution rules in FilterVM.cs:200-359.
"""

from __future__ import annotations

import pytest

from infidex_ray import filters as flt
from infidex_ray.build import build_index_local
from infidex_ray.engine import Engine, Query


def m(expr: str, row: dict) -> bool:
    return flt.matches_row(flt.parse(expr), row)


# --- parser + row semantics --------------------------------------------------


def test_basic_comparisons():
    row = {"genre": "Sci-Fi", "year": 2010, "rating": 8.5}
    assert m("genre = 'Sci-Fi'", row)
    assert m("genre = 'sci-fi'", row)  # equality is case-insensitive
    assert not m("genre != 'Sci-Fi'", row)
    assert m("year >= 2000", row)
    assert m("year > 2009", row)
    assert not m("year < 2010", row)
    assert m("year <= 2010", row)
    assert m("rating >= 8.0", row)


def test_equality_is_stringly():
    # FilterVM.AreEqual compares ToString() values: 2000 == '2000',
    # but 2000.5 != '2000'
    assert m("year = '2000'", {"year": 2000})
    assert not m("year = '2000'", {"year": 2000.5})


def test_boolean_logic():
    row = {"genre": "Fantasy", "year": 2005}
    assert m("genre = 'Fantasy' AND year >= 2000", row)
    assert not m("genre = 'Horror' AND year >= 2000", row)
    assert m("genre = 'Horror' OR year >= 2000", row)
    assert m("NOT genre = 'Horror'", row)
    assert m("genre = 'Fantasy' && year >= 2000", row)
    assert m("genre = 'Horror' || year >= 2000", row)
    assert m("!(genre = 'Horror')", row)
    assert m(
        "(genre = 'Fantasy' AND year >= 2000) OR (genre = 'Horror' AND year >= 1980)",
        row,
    )


def test_string_operations():
    row = {"title": "The Matrix Reloaded", "email": "neo@zion.org"}
    assert m("title CONTAINS 'matrix'", row)  # case-insensitive
    assert m("title STARTS WITH 'the'", row)
    assert m("title ENDS WITH 'RELOADED'", row)
    assert m("title LIKE '%matrix%'", row)
    assert m("title LIKE 'The_Matrix%'", row)  # _ wildcard
    assert not m("title LIKE 'Matrix%'", row)
    assert m(r"email MATCHES '^[\w\.-]+@[\w\.-]+\.\w+$'", row)
    assert not m("email MATCHES '['", row)  # invalid regex → false


def test_in_between_null():
    row = {"genre": "Fantasy", "year": 2010, "director": None, "note": ""}
    assert m("genre IN ('Sci-Fi', 'Fantasy', 'Adventure')", row)
    assert not m("genre IN ('Horror', 'Drama')", row)
    assert m("year BETWEEN 2000 AND 2020", row)
    assert m("year BETWEEN 2010 AND 2010", row)  # inclusive
    assert not m("year BETWEEN 2011 AND 2020", row)
    assert m("director IS NULL", row)
    assert m("note IS NULL", row)  # empty string counts as null
    assert not m("director IS NOT NULL", row)
    assert m("genre IS NOT NULL", row)


def test_ternary():
    # filter truth requires the expression to yield exactly True
    assert m("year >= 2000 ? genre = 'Fantasy' : genre = 'Horror'",
             {"year": 2010, "genre": "Fantasy"})
    assert m("year >= 2000 ? genre = 'Fantasy' : genre = 'Horror'",
             {"year": 1990, "genre": "Horror"})
    # string-yielding ternary is never True as a filter
    assert not m("year >= 2000 ? 'adult' : 'minor'", {"year": 2010})


def test_missing_field_semantics():
    assert not m("nope = 'x'", {})
    assert m("nope IS NULL", {})
    assert not m("nope > 5", {})  # null < number


def test_parse_errors():
    for bad in ["", "   ", "year >", "year BETWEEN 1 OR 2", "name = 'unterminated",
                "( year = 1", "= 5"]:
        with pytest.raises(flt.FilterParseError):
            flt.parse(bad)


def test_arrow_pushdown_roundtrip():
    import pyarrow as pa

    table = pa.table({"year": [1999, 2005, 2015], "genre": ["a", "b", "a"]})
    import pyarrow.dataset as pds

    ds = pds.dataset(table)
    expr = flt.to_arrow_expression(flt.parse("year >= 2000 AND year < 2015"))
    assert ds.to_table(filter=expr)["year"].to_pylist() == [2005]
    expr = flt.to_arrow_expression(flt.parse("genre IN ('a')"))
    assert ds.to_table(filter=expr)["year"].to_pylist() == [1999, 2015]
    with pytest.raises(flt.UnsupportedExpression):
        flt.to_arrow_expression(flt.parse("genre CONTAINS 'a'"))


# --- Query API: filter / boosts / sort / facets over a real index ------------

MOVIES = [
    (1, "The Matrix", {"genre": "Sci-Fi", "year": 1999}),
    (2, "The Matrix Reloaded", {"genre": "Sci-Fi", "year": 2003}),
    (3, "The Matrix Revolutions", {"genre": "Sci-Fi", "year": 2003}),
    (4, "The Match", {"genre": "Drama", "year": 2021}),
    (5, "Matriarch Rising", {"genre": "Horror", "year": 2018}),
]


@pytest.fixture(scope="module")
def field_engine(tmp_path_factory):
    out = tmp_path_factory.mktemp("field_idx")
    docs = [(k, t) for k, t, _ in MOVIES]
    fields = [f for _, _, f in MOVIES]
    build_index_local(docs, str(out), n_segments=2, fields=fields)
    return Engine.load(str(out))


def test_query_filter(field_engine):
    res = field_engine.query(Query("matrix", max_results=10, filter="year >= 2000"))
    keys = [h.doc_key for h in res.records]
    assert set(keys) <= {2, 3, 4, 5}
    assert 2 in keys and 3 in keys

    res = field_engine.query(Query("matrix", max_results=10, filter="genre = 'Sci-Fi'"))
    assert {h.doc_key for h in res.records} <= {1, 2, 3}


def test_query_boosts(field_engine):
    plain = field_engine.query(Query("matrix", max_results=10))
    boosted = field_engine.query(
        Query("matrix", max_results=10, boosts=(("year >= 2003 AND year <= 2003", 3),))
    )
    pscore = {h.doc_key: h.score for h in plain.records}
    bscore = {h.doc_key: h.score for h in boosted.records}
    for k in (2, 3):
        assert bscore[k] == pytest.approx(pscore[k] + 3)
    assert bscore[1] == pytest.approx(pscore[1])


def test_query_sort(field_engine):
    res = field_engine.query(Query("matrix", max_results=10, sort_by="year"))
    years = [field_engine._field_row(h.doc_key)["year"] for h in res.records]
    assert years == sorted(years)
    res = field_engine.query(
        Query("matrix", max_results=10, sort_by="year", sort_ascending=False)
    )
    years = [field_engine._field_row(h.doc_key)["year"] for h in res.records]
    assert years == sorted(years, reverse=True)


def test_query_facets(field_engine):
    res = field_engine.query(Query("matrix", max_results=10, enable_facets=True))
    assert res.facets and "genre" in res.facets
    genre_counts = dict(res.facets["genre"])
    assert genre_counts.get("Sci-Fi", 0) >= 2


def test_empty_query_with_facets(field_engine):
    res = field_engine.query(Query("", max_results=10, enable_facets=True,
                                   filter="genre = 'Sci-Fi'"))
    assert len(res.records) == 3
    assert dict(res.facets["genre"]) == {"Sci-Fi": 3}


def test_filter_dataset_roundtrip(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"year": 1999, "name": "a"}, {"year": 2005, "name": "ab"},
         {"year": 2015, "name": "abc"}]
    )
    out = flt.filter_dataset(ds, "year >= 2000").to_pandas()
    assert sorted(out["year"].tolist()) == [2005, 2015]
    out = flt.filter_dataset(ds, "name CONTAINS 'b'").to_pandas()
    assert sorted(out["year"].tolist()) == [2005, 2015]


# --- FilterBuilder fluent API (Api/FilterBuilder.cs:20-138) -----------------


def test_filter_builder_basic_chain():
    from infidex_ray.filters import FilterBuilder, matches_row

    f = FilterBuilder.where("lang", "en").and_range("n_chars", 200, 1500).build()
    assert matches_row(f, {"lang": "en", "n_chars": 500})
    assert not matches_row(f, {"lang": "de", "n_chars": 500})
    assert not matches_row(f, {"lang": "en", "n_chars": 1501})


def test_filter_builder_matches_parsed_expression():
    """The builder must produce the same decisions as the string parser."""
    from infidex_ray.filters import FilterBuilder, matches_row, parse

    built = (
        FilterBuilder.where("lang", "en")
        .or_(lambda b: b.where("lang", "de").and_range("tier", 1, 3))
        .build()
    )
    parsed = parse("lang = 'en' OR (lang = 'de' AND tier BETWEEN 1 AND 3)")
    rows = [
        {"lang": "en", "tier": 9},
        {"lang": "de", "tier": 2},
        {"lang": "de", "tier": 7},
        {"lang": "fr", "tier": 2},
    ]
    for r in rows:
        assert matches_row(built, r) == matches_row(parsed, r)


def test_filter_builder_not_and_open_ranges():
    from infidex_ray.filters import FilterBuilder, matches_row

    f = FilterBuilder.where_range("x", low=10).not_().build()
    assert matches_row(f, {"x": 5}) and not matches_row(f, {"x": 15})
    g = FilterBuilder.where_range("x", high=10).build()
    assert matches_row(g, {"x": 5}) and not matches_row(g, {"x": 15})


def test_filter_builder_in_query_api(ray_session, tmp_path):
    """Built AST plugs into Query.filter like a parsed string."""
    from infidex_ray.filters import FilterBuilder, filter_dataset
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "lang": "en" if i % 2 else "de", "n": i} for i in range(10)]
    )
    built = FilterBuilder.where("lang", "en").and_range("n", 3, 8).build()
    got = sorted(r["doc_id"] for r in filter_dataset(ds, built).take_all())
    assert got == [3, 5, 7]
