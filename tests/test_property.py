"""Property-based tests (hypothesis): posting codec round-trip, canonical
rounding vs decimal, bytecode VM ≡ AST evaluator on generated filters,
and short-artifact parity on generated corpora."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


@SETTINGS
@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=400, unique=True),
    st.data(),
)
def test_postings_codec_roundtrip(ids, data):
    from infidex_ray.segments import decode_block_max, decode_postings, encode_postings

    doc_ids = np.asarray(sorted(ids), dtype=np.uint32)
    weights = np.asarray(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=len(ids), max_size=len(ids)
            )
        ),
        dtype=np.uint8,
    )
    blob = encode_postings(doc_ids, weights)
    d2, w2 = decode_postings(memoryview(blob))
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(w2, weights)
    bm = decode_block_max(memoryview(blob))
    # block-max invariant: every weight ≤ its block's max
    for i, w in enumerate(weights):
        assert w <= bm[i // 128]


@SETTINGS
@given(st.floats(-1e6, 1e6, allow_nan=False))
def test_round_half_up4_matches_decimal(x):
    import decimal

    from infidex_ray.ops.dedup import round_half_up4, round_half_up4_arr

    got = round_half_up4(x)
    arr_got = float(round_half_up4_arr(np.asarray([x]))[0])
    assert got == arr_got  # scalar and vectorized stay in lockstep
    # against decimal ROUND_HALF_UP on the exact float value
    want = float(
        decimal.Decimal(x).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )
    # float-ulp tolerance only — a 1e-4 tolerance would accept truncation
    assert abs(got - want) <= 1e-9


_IDENTS = ["a", "b", "name", "year"]
_VALUES = ["", "x", "X", "1", "2.5", "-3", "hello world", "null"]


def _filters_strategy():
    leaf = st.one_of(
        st.builds(
            lambda f, op, v: f"{f} {op} '{v}'",
            st.sampled_from(_IDENTS),
            st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            st.sampled_from(_VALUES),
        ),
        st.builds(
            lambda f, op, v: f"{f} {op} '{v}'",
            st.sampled_from(_IDENTS),
            st.sampled_from(["CONTAINS", "LIKE", "MATCHES"]),
            st.sampled_from(["x", "1", "%l%", "^h", "o$"]),
        ),
        st.builds(
            lambda f, neg: f"{f} IS {'NOT ' if neg else ''}NULL",
            st.sampled_from(_IDENTS),
            st.booleans(),
        ),
        st.builds(
            lambda f, a, b: f"{f} BETWEEN '{a}' AND '{b}'",
            st.sampled_from(_IDENTS),
            st.sampled_from(["0", "1", "a"]),
            st.sampled_from(["5", "z", "99"]),
        ),
        st.builds(
            lambda f, vs: f"{f} IN ({', '.join(repr(v) for v in vs)})",
            st.sampled_from(_IDENTS),
            st.lists(st.sampled_from(_VALUES), min_size=1, max_size=3),
        ),
    )
    return st.recursive(
        leaf,
        lambda children: st.one_of(
            st.builds(lambda l, r: f"({l}) AND ({r})", children, children),
            st.builds(lambda l, r: f"({l}) OR ({r})", children, children),
            st.builds(lambda c: f"NOT ({c})", children),
            st.builds(
                lambda c, a, b: f"({c}) ? ({a}) : ({b})", children, children, children
            ),
        ),
        max_leaves=6,
    )


_ROWS = [
    {"a": "x", "b": "1", "name": "hello world", "year": 2001},
    {"a": "", "b": None, "name": "X", "year": 0},
    {"a": "2.5", "b": "hello", "name": None, "year": -3},
    {},
]


@SETTINGS
@given(_filters_strategy())
def test_bytecode_vm_equals_evaluator(expr):
    from infidex_ray import bytecode as bc
    from infidex_ray import filters as flt

    ast = flt.parse(expr)
    cf = bc.compile_filter(ast)
    cf2 = bc.deserialize(bc.serialize(cf))  # and through INFISCRIPT-V1
    vm = bc.FilterVM()
    for row in _ROWS:
        want = flt.matches_row(ast, row)
        assert vm.execute(cf, row) == want, (expr, row)
        assert vm.execute(cf2, row) == want, (expr, row)


@SETTINGS
@given(
    st.lists(
        st.text(
            alphabet="ab c-xyz.12",
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_short_artifacts_match_scan_generated(texts):
    """compute_short_tables champions/prefix counts == the scan path on
    arbitrary corpora (the artifact is a frozen copy of the scan)."""
    from dataclasses import replace

    from infidex_ray.analyzer import _word_splitter
    from infidex_ray.config import DEFAULT_DELIMITERS
    from infidex_ray.query.coverage import lower_1to1
    from infidex_ray.query.shortquery import CHAMPION_SIZE, compute_short_tables

    splitter = _word_splitter(DEFAULT_DELIMITERS)
    lower = [lower_1to1(t) for t in texts]
    words = [[w for w in splitter.split(t) if w] for t in lower]
    keys = np.arange(1, len(texts) + 1, dtype=np.int64)
    tables = compute_short_tables(lower, words, keys, seg_id=0)

    # scan-path reference (the pre-artifact per-doc formula)
    champs = {}
    pc_ref: dict[str, int] = {}
    for lid, (lo, ws) in enumerate(zip(lower, words)):
        seen = set()
        for w in set(ws):
            for L in range(1, min(3, len(w)) + 1):
                seen.add(w[:L])
        for p in seen:
            pc_ref[p] = pc_ref.get(p, 0) + 1
        if not lo:
            continue
        for ch in set(lo):
            char_count = lo.count(ch)
            first_idx = lo.index(ch)
            starts = [i for i, w in enumerate(ws) if w[0] == ch]
            has_ws = bool(starts)
            pre = 0
            if has_ws:
                pre |= 128
                if starts[0] == 0:
                    pre |= 64
            if any(len(w) == 1 and w[0] == ch for w in ws):
                pre |= 32
            if ws and len(ws[0]) == 1 and ws[0][0] == ch:
                pre |= 16
            if len(lo) == 1 and lo[0] == ch:
                pre |= 8
            if len(ws) <= 3:
                pre |= 32
            if has_ws:
                raw = min(max(255 - min(starts[0] * 16, 240) + min(len(starts) * 8, 32), 0), 255)
                base = raw / 255.0
            else:
                raw = min(max(200 - min(first_idx * 4, 180) + min(char_count * 4, 40), 0), 200)
                base = max(1, raw) / 255.0
            champs.setdefault(ch, []).append((float(pre) + base, int(keys[lid]), lid))
    for ch in champs:
        champs[ch].sort(key=lambda e: (-e[0], e[1]))
        champs[ch] = champs[ch][:CHAMPION_SIZE]

    t = tables["sq_champions.parquet"]
    got = {}
    for ch, sc, dk, lid in zip(
        t["ch"].to_pylist(), t["score"].to_pylist(),
        t["doc_key"].to_pylist(), t["lid"].to_pylist(),
    ):
        got.setdefault(ch, []).append((sc, dk, lid))
    assert got == champs

    tp = tables["sq_prefix.parquet"]
    got_pc = dict(zip(tp["prefix"].to_pylist(), tp["n_docs"].to_pylist()))
    assert got_pc == pc_ref
