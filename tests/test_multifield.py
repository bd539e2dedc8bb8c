"""Multi-field documents with field weights (SchoolSearchParityTests style).

Reference semantics: DocumentFields.GetSearchableTexts '§' concatenation in
weight order (High=0 first), VectorModel.DetermineFieldWeight position →
multiplier (1.5/1.25/1.0), Term.FirstCycleAdd weighted byte accumulation
with banker's rounding (round(1.5)=2, round(1.25)=1).
"""

from __future__ import annotations

import pytest

from infidex_ray.analyzer import analyze_fielded, concat_fields, field_weight_at
from infidex_ray.build import build_index_local
from infidex_ray.config import DEFAULT_FIELD_WEIGHTS, EngineConfig
from infidex_ray.engine import Engine

SCHOOLS = [
    (1, {"title": "Riverside High School", "description": "a school near the waterfront"}),
    (2, {"title": "Mountain View Academy", "description": "school with riverside views of the valley"}),
    (3, {"title": "Lakeshore Elementary", "description": "elementary school by the lake"}),
    (4, {"title": "Hilltop Institute", "description": "research institute on the hilltop"}),
]
TEXT_FIELDS = (("title", 0), ("description", 1))


def test_concat_fields_boundaries():
    text, bounds = concat_fields(["Alpha", "beta gamma"], [0, 1])
    assert text == "Alpha§beta gamma"
    assert bounds == [(0, 0), (6, 1)]
    # array field: one boundary per element, trailing delimiter
    text, bounds = concat_fields([["x", "y"], "z"], [0, 2])
    assert text == "x§y§z"
    assert bounds == [(0, 0), (2, 0), (4, 2)]


def test_field_weight_at():
    bounds = [(0, 0), (6, 1)]
    assert field_weight_at(0, bounds, DEFAULT_FIELD_WEIGHTS) == 1.5
    assert field_weight_at(5, bounds, DEFAULT_FIELD_WEIGHTS) == 1.5
    assert field_weight_at(6, bounds, DEFAULT_FIELD_WEIGHTS) == 1.25
    assert field_weight_at(100, bounds, DEFAULT_FIELD_WEIGHTS) == 1.25
    assert field_weight_at(3, [], DEFAULT_FIELD_WEIGHTS) == 1.0


def test_analyze_fielded_weight_rounding():
    cfg = EngineConfig()
    # a 3-char word hits the same term TWICE (gram "abc" + word "abc", just
    # like the reference's Term sharing): High field → round(1.5)=2, then
    # accumulate 2+1.5=3.5 → banker's round = 4
    out = analyze_fielded(
        "abc", [(0, 0)], cfg.field_weights, cfg.index_sizes,
        cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters,
    )
    assert out["abc"][0] == 4
    # Med field: round(1.25)=1, then 1+1.25=2.25 → 2
    out = analyze_fielded(
        "abc", [(0, 1)], cfg.field_weights, cfg.index_sizes,
        cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters,
    )
    assert out["abc"][0] == 2
    # a longer word's leading gram occurs once: pure first-add rounding
    out = analyze_fielded(
        "abcdef", [(0, 0)], cfg.field_weights, cfg.index_sizes,
        cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters,
    )
    assert out["￿￿a"][0] == 2  # round(1.5), single occurrence


@pytest.fixture(scope="module", params=[1, 2])
def school_engine(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"school_{request.param}")
    build_index_local(
        SCHOOLS, str(out), n_segments=request.param, text_fields=TEXT_FIELDS
    )
    return Engine.load(str(out))


def test_title_outranks_description(school_engine):
    hits = school_engine.search("riverside", top_k=5)
    assert [h.doc_key for h in hits[:2]] == [1, 2]
    assert hits[0].score > hits[1].score


def test_posting_weights_are_field_weighted(school_engine):
    weights = {}
    for seg in school_engine.segments:
        i = seg.term_lookup("riverside")
        if i >= 0:
            docs, w = seg.term_postings(i)
            for d, ww in zip(docs.tolist(), w.tolist()):
                weights[int(seg.doc_keys[d])] = ww
    assert weights == {1: 2, 2: 1}  # title=round(1.5), description=round(1.25)


def test_exact_title_search(school_engine):
    hits = school_engine.search("lakeshore elementary", top_k=5)
    assert hits[0].doc_key == 3


def test_ray_build_with_text_fields(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": k, **fields} for k, fields in SCHOOLS]
    )
    eng = Engine.build(
        ds, str(tmp_path / "ray_school"),
        EngineConfig(target_docs_per_segment=2),
        key_column="doc_id", text_fields=TEXT_FIELDS,
    )
    hits = eng.search("riverside", top_k=5)
    assert [h.doc_key for h in hits[:2]] == [1, 2]
