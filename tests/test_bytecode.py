"""Infiscript bytecode: compiler + VM differential parity with the AST
evaluator, INFISCRIPT-V1 round-trip, and the DerivedFilter escape hatch."""

import pytest

from infidex_ray import bytecode as bc
from infidex_ray import filters as flt

ROWS = [
    {"genre": "sci-fi", "year": 1999, "title": "The Matrix", "rating": 8.7},
    {"genre": "Fantasy", "year": 2001, "title": "The Fellowship", "rating": 8.8},
    {"genre": "horror", "year": 1980, "title": "The Shining", "rating": None},
    {"genre": "", "year": None, "title": "", "rating": 5},
    {"genre": "Drama", "year": 2020, "title": "Nomadland", "rating": 7.3},
]

EXPRS = [
    "genre = 'sci-fi'",
    "genre != 'horror'",
    "year < 2000",
    "year <= 2001",
    "year > 1990 AND genre = 'fantasy'",
    "year >= 2020 OR rating > 8.5",
    "NOT genre = 'drama'",
    "title CONTAINS 'the'",
    "title STARTS WITH 'the'",
    "title ENDS WITH 'land'",
    "title LIKE 'The %'",
    "title MATCHES '^no.*d$'",
    "genre IN ('sci-fi', 'Drama')",
    "year BETWEEN 1990 AND 2010",
    "rating IS NULL",
    "rating IS NOT NULL",
    "genre IS NULL",
    "year >= 2000 ? genre = 'Fantasy' : genre = 'horror'",
    "(year > 1990 AND year < 2010) OR genre = 'Drama'",
    "NOT (genre = 'horror' OR rating IS NULL)",
]


@pytest.mark.parametrize("expr", EXPRS)
def test_vm_matches_ast_evaluator(expr):
    ast = flt.parse(expr)
    cf = bc.compile_filter(ast)
    vm = bc.FilterVM()
    for row in ROWS:
        assert vm.execute(cf, row) == flt.matches_row(ast, row), (expr, row)


@pytest.mark.parametrize("expr", EXPRS)
def test_serialization_roundtrip(expr):
    cf = bc.compile_filter(expr)
    data = bc.serialize(cf)
    assert data[:13] == b"INFISCRIPT-V1"
    assert bc.is_valid_bytecode(data) and bc.get_version(data) == 1
    cf2 = bc.deserialize(data)
    assert len(cf2.instructions) == len(cf.instructions)
    assert [(i.opcode, i.op1) for i in cf2.instructions] == [
        (i.opcode, i.op1) for i in cf.instructions
    ]
    assert cf2.constants.constants == cf.constants.constants
    vm = bc.FilterVM()
    for row in ROWS:
        assert vm.execute(cf2, row) == vm.execute(cf, row)


def test_save_load_file(tmp_path):
    cf = bc.compile_filter("year BETWEEN 1990 AND 2010 AND genre != 'horror'")
    p = str(tmp_path / "filter.infiscript")
    bc.save_to_file(cf, p)
    cf2 = bc.load_from_file(p)
    vm = bc.FilterVM()
    for row in ROWS:
        assert vm.execute(cf2, row) == vm.execute(cf, row)


def test_invalid_bytecode_rejected():
    with pytest.raises(ValueError, match="Invalid magic header"):
        bc.deserialize(b"NOTINFISCRIPT" + b"\x00" * 20)
    assert not bc.is_valid_bytecode(b"short")


def test_constant_pool_dedup():
    cf = bc.compile_filter("genre = 'x' OR genre = 'x' OR genre = 'y'")
    # 'genre' and 'x' appear once each in the pool (ConstantPool dedup)
    strings = [c for c in cf.constants.constants if isinstance(c, str)]
    assert strings.count("genre") == 1 and strings.count("x") == 1


def test_disassemble():
    txt = bc.compile_filter("a = '1' AND b = '2'").disassemble()
    assert "Constant Pool" in txt and "JUMP_IF_FALSE" in txt and "HALT" in txt


def test_short_circuit_structure():
    cf = bc.compile_filter("a = '1' AND b = '2'")
    ops = [i.opcode for i in cf.instructions]
    # reference pattern: left, DUP, JUMP_IF_FALSE, POP, right, HALT
    assert bc.DUP in ops and bc.JUMP_IF_FALSE in ops and bc.POP in ops


def test_derived_filter_evaluates_but_wont_compile():
    df = flt.DerivedFilter(lambda row: row.get("year", 0) and row["year"] > 2000)
    assert flt.matches_row(df, {"year": 2010})
    assert not flt.matches_row(df, {"year": 1990})
    combined = flt.BoolOp("and", flt.parse("genre = 'Drama'"), df)
    assert flt.matches_row(combined, {"genre": "drama", "year": 2020})
    assert not flt.matches_row(combined, {"genre": "drama", "year": 1990})
    with pytest.raises(bc.CompileError, match="DerivedFilter"):
        bc.compile_filter(df)
    with pytest.raises(flt.UnsupportedExpression):
        flt.to_arrow_expression(df)


def test_derived_filter_in_query(ray_session, minicorpus, tmp_path):
    import ray.data

    from infidex_ray.config import EngineConfig
    from infidex_ray.engine import Engine, Query

    rows = [{"doc_key": k, "text": t} for k, t in minicorpus]
    eng = Engine.build(
        ray.data.from_items(rows), str(tmp_path / "idx"), EngineConfig(),
        text_column="text", key_column="doc_key",
    )
    # DerivedFilter keyed on the stored url/doc fields
    pred = flt.DerivedFilter(lambda row: row.get("url") is not None)
    res = eng.query(Query("fox", max_results=10, filter=pred))
    assert res.records
