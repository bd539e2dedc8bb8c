"""Short-query path: queries below the n-gram threshold (len 1-3).

Port of ShortQueryProcessor (src/Infidex/Scoring/ShortQueryProcessor.cs:15-435):

* 1-char queries  — full doc scan scoring word-starts / char positions
  (SearchSingleCharacter, :19-152)
* 2-3-char / short-token queries — prefix patterns over the term dictionary
  (pad-prefixed grams + raw prefix + " "+query), weight×10 accumulation,
  fuzzy fallback when < 100 docs matched, precedence bits
  (SearchShortQuery, :154-434)

The reference resolves prefix patterns via the FST (4096-term budget per
prefix); here each doc-range segment scans its sorted term dictionary with a
binary-search range (same lexicographic enumeration). Cross-segment protocol:
docs live in exactly one segment, so per-segment passes return partial
(doc_key → raw score) maps; the driver sums matched-doc counts (fuzzy-fallback
gate), takes the global max raw score (normalization), and computes the final
precedence+normalized floats — identical to the single-process reference.
"""

from __future__ import annotations

import numpy as np

from ..config import START_PAD_CHAR

MAX_TERMS_PER_PREFIX = 4096  # ShortQueryProcessor.cs:17
FUZZY_FALLBACK_DOC_LIMIT = 100  # :221


def build_prefix_patterns(search_lower: str, min_index_size: int, start_pad_size: int) -> list[str]:
    """ShortQueryProcessor.BuildPrefixPatterns (:233-252)."""
    patterns: list[str] = []
    pad_len = start_pad_size
    for i in range(min(min_index_size, pad_len + len(search_lower))):
        pad_count = max(0, pad_len - i)
        query_count = min(len(search_lower), min_index_size - pad_count)
        if query_count > 0:
            patterns.append(START_PAD_CHAR * pad_count + search_lower[:query_count])
    patterns.append(" " + search_lower)
    return patterns


class SegmentShortQuery:
    """Per-segment scan state (what a query actor holds for this path)."""

    def __init__(self, seg, splitter):
        self.seg = seg
        self.splitter = splitter
        self._lower_texts: list[str] | None = None
        self._words: list[list[str]] | None = None

    @property
    def lower_texts(self) -> list[str]:
        if self._lower_texts is None:
            from .coverage import lower_1to1

            self._lower_texts = [lower_1to1(t) for t in self.seg.norm_texts]
        return self._lower_texts

    @property
    def words(self) -> list[list[str]]:
        if self._words is None:
            self._words = [
                [w for w in self.splitter.split(t) if w] for t in self.lower_texts
            ]
        return self._words

    CHAMPION_SIZE = 64  # ShortQueryResolver.cs:23

    def champions(self, ch: str) -> list[tuple]:
        """Top-64 single-char entries per segment, computed once per char
        (champion lists, ShortQueryResolver.TryGetChampions). Exact for any
        global top-k ≤ 64: per-doc scores are independent, so the global
        top-k is contained in the union of per-segment champions."""
        cache = getattr(self, "_champions", None)
        if cache is None:
            cache = self._champions = {}
        hit = cache.get(ch)
        if hit is None:
            entries = self.single_char_entries(ch)
            entries.sort(key=lambda e: (-e[0], -e[2], e[1]))
            hit = cache[ch] = entries[: self.CHAMPION_SIZE]
        return hit

    # -- single char (SearchSingleCharacter, :19-152) ----------------------
    def single_char_entries(self, ch: str) -> list[tuple[float, int, int]]:
        out: list[tuple[float, int, int]] = []
        for lid, lower in enumerate(self.lower_texts):
            if not lower:
                continue
            char_count = lower.count(ch)
            if char_count == 0:
                continue
            first_char_index = lower.index(ch)
            words = self.words[lid]
            has_word_start = False
            first_word_index = 1 << 30
            word_start_count = 0
            for i, w in enumerate(words):
                if w and w[0] == ch:
                    has_word_start = True
                    word_start_count += 1
                    if i < first_word_index:
                        first_word_index = i
            any_exact = any(len(w) == 1 and w[0] == ch for w in words)
            first_token_exact = bool(words) and len(words[0]) == 1 and words[0][0] == ch
            title_equals = len(lower) == 1 and lower[0] == ch

            precedence = 0
            if has_word_start:
                precedence |= 128
                if first_word_index == 0:
                    precedence |= 64
            if any_exact:
                precedence |= 32
            if first_token_exact:
                precedence |= 16
            if title_equals:
                precedence |= 8
            if len(words) <= 3:
                precedence |= 32

            if has_word_start:
                pos_c = 255 - min(first_word_index * 16, 240)
                dens_c = min(word_start_count * 8, 32)
                raw = min(max(pos_c + dens_c, 0), 255)
                base = raw / 255.0
            else:
                pos_c = 200 - min(max(first_char_index, 0) * 4, 180)
                dens_c = min(char_count * 4, 40)
                raw = min(max(pos_c + dens_c, 0), 200)
                base = max(1, raw) / 255.0
            out.append((float(precedence) + base, int(self.seg.doc_keys[lid]), 0, self.seg.seg_id, lid))
        return out

    # -- prefix pass (SearchShortQuery term loop, :179-219) ----------------
    def prefix_pass(
        self, patterns: list[str], search_lower: str
    ) -> tuple[dict[int, int], set[int]]:
        """Returns (doc_key → raw score, first-token-prefix doc keys)."""
        seg = self.seg
        doc_scores: dict[int, int] = {}
        first_prefix: set[int] = set()
        checked_prefix: set[int] = set()
        for pattern in patterns:
            lo, hi = seg.term_prefix_range(pattern)
            hi = min(hi, lo + MAX_TERMS_PER_PREFIX)
            for ti in range(lo, hi):
                self._accumulate_term(
                    ti, 10, doc_scores, first_prefix, checked_prefix, search_lower
                )
        return doc_scores, first_prefix

    def _accumulate_term(
        self, ti: int, multiplier: int, doc_scores, first_prefix, checked_prefix, search_lower
    ) -> None:
        docs, weights = self.seg.term_postings(ti)
        keys = self.seg.doc_keys[docs]
        for local, key, weight in zip(docs.tolist(), keys.tolist(), weights.tolist()):
            doc_scores[key] = doc_scores.get(key, 0) + int(weight) * multiplier
            if key not in checked_prefix:
                checked_prefix.add(key)
                if self.lower_texts[local].startswith(search_lower):
                    first_prefix.add(key)

    # -- fuzzy fallback (ProcessFuzzyFallback, :310-353) -------------------
    def fuzzy_pass(
        self,
        patterns: list[str],
        search_lower: str,
        doc_scores: dict[int, int],
        first_prefix: set[int],
    ) -> None:
        seg = self.seg
        checked_prefix: set[int] = set(doc_scores.keys())
        for ti, term in enumerate(seg.terms):
            text = str(term)
            if any(text.startswith(p) for p in patterns):
                continue
            has_word_boundary = False
            char_matches = 0
            for q_char in search_lower:
                if (" " + q_char) in text:
                    has_word_boundary = True
                    char_matches += 1
                elif q_char in text:
                    char_matches += 1
            if has_word_boundary or char_matches > 0:
                self._accumulate_term(
                    ti,
                    2 if has_word_boundary else 1,
                    doc_scores,
                    first_prefix,
                    checked_prefix,
                    search_lower,
                )

    # -- final scoring (BuildFinalScores + ComputePrecedence, :355-434) ----
    def final_entries(
        self,
        doc_scores: dict[int, int],
        first_prefix: set[int],
        max_score: int,
        search_lower: str,
        query_tokens: list[str],
    ) -> list[tuple[float, int, int]]:
        key_to_local = self._key_to_local()
        out: list[tuple[float, int, int]] = []
        for key, raw in doc_scores.items():
            lid = key_to_local.get(key)
            if lid is None:
                continue
            normalized = raw / max_score if max_score > 0 else raw / 255.0
            title_lower = self.lower_texts[lid]
            trimmed = title_lower.strip()
            words = self.words[lid]
            precedence = _compute_precedence(
                query_tokens, words, search_lower, trimmed, key in first_prefix
            )
            out.append((float(precedence) + normalized, key, 0, self.seg.seg_id, lid))
        return out

    def _key_to_local(self) -> dict[int, int]:
        m = getattr(self, "_k2l", None)
        if m is None:
            m = {int(k): i for i, k in enumerate(self.seg.doc_keys)}
            self._k2l = m
        return m

    # -- coverage gating (ShortQueryIndex.CountDocuments analogue) ---------
    def count_word_start_docs(self, prefix: str) -> int:
        return sum(
            1 for ws in self.words if any(w.startswith(prefix) for w in ws)
        )


def _compute_precedence(
    query_tokens: list[str],
    words: list[str],
    search_lower: str,
    trimmed_title: str,
    first_token_starts_with_prefix: bool,
) -> int:
    """ShortQueryProcessor.ComputePrecedence (:389-434)."""
    precedence = 0
    if len(query_tokens) >= 2:
        token_matches = sum(1 for qt in query_tokens if qt in words)
        all_present = bool(query_tokens) and token_matches == len(query_tokens)
        if all_present:
            precedence |= 8
            if len(words) <= len(query_tokens) + 1:
                precedence |= 2
        elif token_matches > 0:
            precedence |= 4
    else:
        first_token_exact = bool(words) and words[0] == search_lower
        any_token_exact = first_token_exact or search_lower in words
        title_equals = trimmed_title == search_lower
        if any_token_exact:
            precedence |= 1
        if first_token_starts_with_prefix:
            precedence |= 2
        if first_token_exact:
            precedence |= 4
        if title_equals:
            precedence |= 8
    return precedence


def run_short_query(
    shorts: list[SegmentShortQuery],
    search_lower: str,
    min_index_size: int,
    start_pad_size: int,
    delimiters: tuple[str, ...],
) -> list[tuple[float, int, int]]:
    """Driver-side orchestration over per-segment scanners (two small
    synchronization points: fuzzy-fallback gate and global max raw score)."""
    from ..analyzer import _word_splitter

    patterns = build_prefix_patterns(search_lower, min_index_size, start_pad_size)
    per_seg = [s.prefix_pass(patterns, search_lower) for s in shorts]
    total_matched = sum(len(ds) for ds, _ in per_seg)
    if total_matched < FUZZY_FALLBACK_DOC_LIMIT:
        for s, (ds, fp) in zip(shorts, per_seg):
            s.fuzzy_pass(patterns, search_lower, ds, fp)
    max_score = max((max(ds.values(), default=0) for ds, _ in per_seg), default=0)
    splitter = _word_splitter(delimiters)
    query_tokens = [w for w in splitter.split(search_lower) if w]
    entries: list[tuple[float, int, int]] = []
    for s, (ds, fp) in zip(shorts, per_seg):
        entries.extend(s.final_entries(ds, fp, max_score, search_lower, query_tokens))
    entries.sort(key=lambda e: (-e[0], -e[2], e[1]))
    return entries


def run_single_char(
    shorts: list[SegmentShortQuery], ch: str, max_results: int
) -> list[tuple[float, int, int]]:
    use_champions = max_results <= SegmentShortQuery.CHAMPION_SIZE
    entries: list[tuple[float, int, int]] = []
    for s in shorts:
        entries.extend(s.champions(ch) if use_champions else s.single_char_entries(ch))
    entries.sort(key=lambda e: (-e[0], -e[2], e[1]))
    return entries[:max_results]
