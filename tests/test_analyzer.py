"""Analyzer contract tests (reference: TokenizerTests.cs, TextNormalizer.cs)."""

import numpy as np
import pytest

from infidex_ray import analyzer as az
from infidex_ray.config import START_PAD_CHAR as SP, STOP_PAD_CHAR as EP


def test_normalize_whitespace_collapse():
    assert az.normalize("a\tb\nc\rd") == "a b c d"
    assert az.normalize("a   b") == "a b"
    assert az.normalize("a \t\n b") == "a b"
    assert az.normalize(" x ") == " x "
    assert az.normalize("") == ""


def test_normalize_diacritics():
    assert az.normalize("Škoda") == "Skoda"
    assert az.normalize("café") == "cafe"
    assert az.normalize("naïve") == "naive"
    assert az.normalize("Łódź") == "Lodz"
    assert az.normalize("straße") == "strase"
    assert az.normalize("Þórr ætlar") == "Torr etlar"
    # İ folds to I BEFORE lowercasing (order matters, SURVEY §2.2)
    assert az.normalize("İstanbul").lower() == "istanbul"


def test_ngrams_size3_with_pads():
    # "bat" with startPad=2: padded = [P,P,b,a,t]; 3-grams: PPb, Pba, bat
    toks = az.tokenize_for_indexing("bat", (3,), 2, 0, az.DEFAULT_DELIMITERS)
    grams = [(t, p) for t, p in toks]
    assert (SP + SP + "b", 0) in grams
    assert (SP + "ba", 1) in grams
    assert ("bat", 2) in grams
    # word "bat" also emitted at position startPad+0
    assert grams.count(("bat", 2)) == 2  # once as gram, once as word


def test_ngrams_sizes_2_3():
    toks = [t for t, _ in az.tokenize_for_indexing("bat", (2, 3), 2, 0, None)]
    # the all-pad 2-gram [P,P] is excluded by IsAllPadding (Tokenizer.cs:322-329)
    assert toks == [SP + "b", "ba", "at", SP + SP + "b", SP + "ba", "bat"]


def test_all_padding_excluded():
    toks = [t for t, _ in az.tokenize_for_indexing("x", (2, 3), 2, 0, None)]
    # padded = [P,P,x], len 3 > min 2 → sizes 2 and 3 both run
    assert SP + SP not in toks
    assert set(toks) == {SP + "x", SP + SP + "x"}


def test_short_text_only_min_size():
    # padded length <= min size → only min size runs (Tokenizer.cs:288-298)
    toks = [t for t, _ in az.tokenize_for_indexing("a", (2, 3), 1, 0, None)]
    assert toks == [SP + "a"]


def test_word_emission_positions():
    toks = az.tokenize_for_indexing("the fox", (3,), 2, 0, az.DEFAULT_DELIMITERS)
    words = [(t, p) for t, p in toks if t in ("the", "fox")]
    # gram "the" occurs at padded pos 2; word "the" at 2; word "fox" at 2+4=6
    assert ("the", 2) in words
    assert ("fox", 6) in words


def test_search_tokens_words_first():
    toks = az.tokenize_for_search("quick fox", (3,), 2, 0, az.DEFAULT_DELIMITERS)
    assert toks[0] == "quick"
    assert toks[1] == "fox"
    assert SP + SP + "q" in toks
    assert "ick" in toks


def test_gram_key_roundtrip():
    for t in ["abc", "ab", "xyž", SP + SP + "b", SP + "ba", "€ab"]:
        assert az.decode_gram_key(az.encode_gram_key(t)) == t


def test_count_tokens_matches_exact_tokenizer():
    texts = [
        "the quick brown fox",
        "batman and robin",
        "a",
        "",
        "the the the fox",
    ]
    counts = az.count_tokens_batch(texts, (3,), 2, 0, az.DEFAULT_DELIMITERS)
    # reconstruct per-(doc, term) counts from the exact tokenizer
    expected: dict[tuple[int, str], int] = {}
    for d, t in enumerate(texts):
        for tok, _ in az.tokenize_for_indexing(t, (3,), 2, 0, az.DEFAULT_DELIMITERS):
            expected[(d, tok)] = expected.get((d, tok), 0) + 1
    got: dict[tuple[int, str], int] = {}
    for d, k, c in zip(counts.gram_doc, counts.gram_key, counts.gram_count):
        got[(int(d), az.decode_gram_key(k))] = int(c)
    for w, (docs, cs) in counts.word_counts.items():
        for d, c in zip(docs, cs):
            got[(int(d), w)] = got.get((int(d), w), 0) + int(c)
    assert got == expected
    # doc_len = total token occurrences (no saturation here)
    for d, t in enumerate(texts):
        n = len(az.tokenize_for_indexing(t, (3,), 2, 0, az.DEFAULT_DELIMITERS))
        assert counts.doc_len[d] == n


def test_count_tokens_config100():
    texts = ["ab cd abc", "ääöö"]
    counts = az.count_tokens_batch(texts, (2, 3), 2, 0, az.DEFAULT_DELIMITERS)
    expected: dict[tuple[int, str], int] = {}
    for d, t in enumerate(texts):
        for tok, _ in az.tokenize_for_indexing(t, (2, 3), 2, 0, az.DEFAULT_DELIMITERS):
            expected[(d, tok)] = expected.get((d, tok), 0) + 1
    got: dict[tuple[int, str], int] = {}
    for d, k, c in zip(counts.gram_doc, counts.gram_key, counts.gram_count):
        got[(int(d), az.decode_gram_key(k))] = got.get((int(d), az.decode_gram_key(k)), 0) + int(c)
    for w, (docs, cs) in counts.word_counts.items():
        for d, c in zip(docs, cs):
            got[(int(d), w)] = got.get((int(d), w), 0) + int(c)
    assert got == expected


def test_split_words_offsets():
    assert az.split_words_with_offsets("the-fox, a") == [
        ("the", 0),
        ("fox", 4),
        ("a", 9),
    ]


# --- custom TextNormalizer replacement maps (TextNormalizer.cs:8-209) -------


def test_normalizer_default_matches_module_normalize():
    from infidex_ray.analyzer import TextNormalizer, normalize

    tn = TextNormalizer.create_default()
    for s in ["", "héllo  wörld\tfoo\nbar", "Ærø — Škoda", "a  b   c", "ÐðÞþİ"]:
        assert tn.normalize(s) == normalize(s)


def test_normalizer_custom_string_replacements_before_charmap():
    """General path: string replacements first (insertion order, all
    occurrences), then the char map — TextNormalizer.Normalize :120-135."""
    from infidex_ray.analyzer import TextNormalizer

    tn = TextNormalizer(
        string_replacements={"&": " and ", "™": ""},
        char_replacements={"é": "e"},
    )
    assert tn.normalize("café & bar™") == "cafe  and  bar"
    # no whitespace collapse in the general path (only the standard set
    # triggers the single-scan whitespace fast path)
    assert tn.normalize("a  b") == "a  b"


def test_normalizer_one_way_mode_query_side():
    from infidex_ray.analyzer import TextNormalizer, normalize, normalize_with

    tn = TextNormalizer(string_replacements={"colour": "color"}, one_way_mode=True)
    assert normalize_with(tn, "colour", is_query=False) == "color"
    assert normalize_with(tn, "colour", is_query=True) == normalize("colour")


def test_engine_config_normalizer_end_to_end(ray_session, tmp_path):
    """A custom replacement map changes what gets indexed: '&' → ' and '
    makes the doc findable by the word 'and'-joined form."""
    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.analyzer import TextNormalizer
    from infidex_ray.engine import Engine

    tn = TextNormalizer(
        string_replacements={"  ": " ", "\t": " ", "\n": " ", "\r": " ", "&": " and "},
    )
    # NOTE: adding a 5th replacement disables the std-whitespace fast path
    # detection in the reference too (exact-4 check, TextNormalizer.cs:50-57)
    rows = [
        {"doc_id": 0, "text": "fish & chips shop"},
        {"doc_id": 1, "text": "plain fish restaurant"},
    ]
    ds = ray.data.from_items(rows)
    eng = Engine.build(
        ds, str(tmp_path / "idx"), EngineConfig(normalizer=tn, target_docs_per_segment=10),
        text_column="text", key_column="doc_id",
    )
    hits = eng.search("fish and chips", top_k=2)
    assert hits and hits[0].doc_key == 0
