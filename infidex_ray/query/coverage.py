"""Coverage stage (Stage 2): lexical matcher cascade + coverage scoring.

Faithful re-implementation of the reference's coverage engine — these loops
are order-dependent (greedy token consumption) and are ported literally:

* tokenization/dedup   — src/Infidex/Coverage/CoverageTokenizer.cs:7-108
* whole-word matcher   — src/Infidex/Coverage/WholeWordMatcher.cs:5-68
* joined-word matcher  — src/Infidex/Coverage/JoinedWordMatcher.cs:5-135
* prefix/suffix        — src/Infidex/Coverage/PrefixSuffixMatcher.cs:8-215
* fuzzy matcher        — src/Infidex/Coverage/FuzzyWordMatcher.cs:14-145
* coverage scoring     — src/Infidex/Coverage/CoverageScorer.cs:5-198
* fusion signals       — src/Infidex/Coverage/FusionSignalComputer.cs:48-569
* per-term idf         — src/Infidex/Coverage/CoverageEngine.cs:388-427

Query text arrives normalized + lowercased (SearchEngine.Search); document
text arrives normalized but NOT lowercased (SegmentProcessor.GetBestSegmentText)
— all comparisons are case-insensitive (OrdinalIgnoreCase), implemented here by
comparing 1:1-lowercased shadow strings that preserve offsets/lengths.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .metrics import damerau, damerau1


@dataclass(frozen=True)
class CoverageParams:
    """CoverageSetup defaults (src/Infidex/Coverage/CoverageSetup.cs:6-134)."""

    min_word_size: int = 2
    levenshtein_max_word_size: int = 20
    num_typos: int = 2
    min_length_one_typo: int = 3
    min_length_two_typos: int = 7
    coverage_min_word_hits_abs: int = 1
    coverage_min_word_hits_relative: int = 0
    coverage_q_limit_for_error_tolerance: int = 5
    coverage_lcs_error_tolerance_relative_q: float = 0.2
    cover_whole_query: bool = True
    cover_whole_words: bool = True
    cover_fuzzy_words: bool = True
    cover_joined_words: bool = True
    cover_prefix_suffix: bool = True
    truncate: bool = True
    truncation_score: int = 254
    # CoverageSetup.cs:92 — off by default; drops stage-1 candidates whose
    # doc contains none of the query's full words (conservative: skipped
    # when any query word is absent from the index → possible typo)
    enable_lexical_prescreen: bool = False


def lower_1to1(s: str) -> str:
    """Per-char lowercase that preserves string length (mirrors .NET
    ToLowerInvariant's 1:1 UTF-16 mapping; Python str.lower() may expand
    e.g. 'İ' — take the first produced char in that case)."""
    low = s.lower()
    if len(low) == len(s):
        return low
    return "".join((c.lower() or c)[0] for c in s)


def tokenize_slices(
    text: str, min_word_size: int, delimiters: frozenset[str]
) -> list[tuple[int, int]]:
    """(offset, length) slices of tokens with len >= min_word_size
    (CoverageTokenizer.TokenizeToSpan; position == offset)."""
    out: list[tuple[int, int]] = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in delimiters:
            i += 1
        if i >= n:
            break
        start = i
        while i < n and text[i] not in delimiters:
            i += 1
        if i - start >= min_word_size:
            out.append((start, i - start))
    return out


def dedupe_slices(slices: list[tuple[int, int]], low_text: str) -> list[tuple[int, int]]:
    """Case-insensitive dedup preserving first occurrence
    (CoverageTokenizer.DeduplicateQueryTokens/DeduplicateDocTokens)."""
    seen: set[str] = set()
    out: list[tuple[int, int]] = []
    for off, ln in slices:
        key = low_text[off : off + ln]
        if key not in seen:
            seen.add(key)
            out.append((off, ln))
    return out


class MatchState:
    """Mutable state threaded through the matcher cascade (MatchState.cs)."""

    __slots__ = (
        "d_texts", "q_texts",
        "q_slices", "d_slices", "q_low", "d_low", "q_active", "d_active",
        "term_matched_chars", "term_max_chars", "term_has_whole",
        "term_has_joined", "term_has_prefix", "term_first_pos", "term_idf",
        "q_count", "d_count", "doc_token_count",
        "word_hits", "num_whole", "num_joined", "num_fuzzy",
        "num_prefix_suffix", "penalty",
    )

    def __init__(self, q_slices, d_slices, q_low, d_low, term_max_chars, term_idf, doc_token_count, d_texts=None):
        self.q_slices = q_slices
        self.d_slices = d_slices
        self.q_low = q_low
        self.d_low = d_low
        self.d_texts = (
            d_texts
            if d_texts is not None
            else [d_low[o : o + l] for o, l in d_slices]
        )
        self.q_texts = [q_low[o : o + l] for o, l in q_slices]
        self.q_count = len(q_slices)
        self.d_count = len(d_slices)
        self.doc_token_count = doc_token_count
        self.q_active = [True] * self.q_count
        self.d_active = [True] * self.d_count
        self.term_matched_chars = [0.0] * self.q_count
        self.term_max_chars = term_max_chars
        self.term_has_whole = [False] * self.q_count
        self.term_has_joined = [False] * self.q_count
        self.term_has_prefix = [False] * self.q_count
        self.term_first_pos = [-1] * self.q_count
        self.term_idf = term_idf
        self.word_hits = 0
        self.num_whole = 0.0
        self.num_joined = 0.0
        self.num_fuzzy = 0.0
        self.num_prefix_suffix = 0.0
        self.penalty = 0

    def q_text(self, i: int) -> str:
        return self.q_texts[i]

    def d_text(self, j: int) -> str:
        return self.d_texts[j]


# --- matchers (ported loops; order-dependence is part of the contract) -------


def match_whole_words(st: MatchState) -> None:
    """WholeWordMatcher.Match (WholeWordMatcher.cs:5-68)."""
    p_increment = 1 if st.q_count > 1 else 0
    for i in range(st.q_count):
        q_off, q_len = st.q_slices[i]
        qt = st.q_text(i)
        match_index = -1
        for j in range(st.d_count):
            if st.d_active[j] and st.d_slices[j][1] == q_len and st.d_text(j) == qt:
                match_index = j
                break
        if match_index == -1:
            continue
        st.word_hits += 1
        st.num_whole += q_len
        st.term_matched_chars[i] += q_len
        st.term_has_whole[i] = True
        st.term_has_prefix[i] = True
        pos = st.d_slices[match_index][0]
        if st.term_first_pos[i] == -1 or pos < st.term_first_pos[i]:
            st.term_first_pos[i] = pos
        # penalty: doc token at position i differs from query token i
        if st.d_count > i:
            if st.d_slices[i][1] != q_len or st.d_text(i) != qt:
                st.penalty += 1
        else:
            st.penalty += 1
        if i < st.q_count - 1:
            st.num_whole += p_increment
        st.q_active[i] = False
        st.d_active[match_index] = False


def match_joined_words(st: MatchState) -> None:
    """JoinedWordMatcher.Match (JoinedWordMatcher.cs:5-135)."""
    # query pair → single doc token
    for i in range(st.q_count - 1):
        if not st.q_active[i] or not st.q_active[i + 1]:
            continue
        next_idx = -1
        for k in range(i + 1, st.q_count):
            if st.q_active[k]:
                next_idx = k
                break
        if next_idx == -1:
            break
        q1_len = st.q_slices[i][1]
        q2_len = st.q_slices[next_idx][1]
        joined_len = q1_len + q2_len
        q1t = st.q_text(i)
        q2t = st.q_text(next_idx)
        match_index = -1
        for j in range(st.d_count):
            if st.d_active[j] and st.d_slices[j][1] == joined_len:
                dt = st.d_text(j)
                if dt.startswith(q1t) and dt.endswith(q2t):
                    match_index = j
                    break
        if match_index == -1:
            continue
        st.num_joined += joined_len
        st.word_hits += 2
        st.term_matched_chars[i] += q1_len
        st.term_has_joined[i] = True
        st.term_has_prefix[i] = True
        pos = st.d_slices[match_index][0]
        if st.term_first_pos[i] == -1 or pos < st.term_first_pos[i]:
            st.term_first_pos[i] = pos
        st.term_matched_chars[next_idx] += q2_len
        st.term_has_joined[next_idx] = True
        if st.term_first_pos[next_idx] == -1 or pos < st.term_first_pos[next_idx]:
            st.term_first_pos[next_idx] = pos
        st.q_active[i] = False
        st.q_active[next_idx] = False
        st.d_active[match_index] = False

    # doc pair → single query token
    for i in range(st.d_count - 1):
        if not st.d_active[i]:
            continue
        next_idx = -1
        for k in range(i + 1, st.d_count):
            if st.d_active[k]:
                next_idx = k
                break
        if next_idx == -1:
            break
        d1_len = st.d_slices[i][1]
        d2_len = st.d_slices[next_idx][1]
        joined_len = d1_len + d2_len
        d1t = st.d_text(i)
        d2t = st.d_text(next_idx)
        match_index = -1
        for j in range(st.q_count):
            if st.q_active[j] and st.q_slices[j][1] == joined_len:
                qt = st.q_text(j)
                if qt.startswith(d1t) and qt.endswith(d2t):
                    match_index = j
                    break
        if match_index == -1:
            continue
        st.num_joined += joined_len
        st.word_hits += 1
        st.term_matched_chars[match_index] += joined_len
        st.term_has_joined[match_index] = True
        st.term_has_prefix[match_index] = True
        pos = st.d_slices[i][0]
        if st.term_first_pos[match_index] == -1 or pos < st.term_first_pos[match_index]:
            st.term_first_pos[match_index] = pos
        st.q_active[match_index] = False
        st.d_active[i] = False
        st.d_active[next_idx] = False


def match_prefix_suffix(st: MatchState) -> None:
    """PrefixSuffixMatcher.Match (PrefixSuffixMatcher.cs:8-214): exact pass
    then fuzzy-prefix pass, both over length-descending active tokens
    (stable sort = reference's insertion sort)."""
    q_indices = sorted(
        (i for i in range(st.q_count) if st.q_active[i]),
        key=lambda i: -st.q_slices[i][1],
    )
    d_indices = sorted(
        (j for j in range(st.d_count) if st.d_active[j]),
        key=lambda j: -st.d_slices[j][1],
    )

    # pass 1: exact prefix / suffix / contains
    for i in q_indices:
        if not st.q_active[i]:
            continue
        q_len = st.q_slices[i][1]
        qt = st.q_text(i)
        for j in d_indices:
            if not st.d_active[j]:
                continue
            d_len = st.d_slices[j][1]
            if q_len == d_len:
                continue
            dt = st.d_text(j)
            is_match = False
            is_prefix = False
            match_score = 0.0
            if q_len < d_len:
                if dt.startswith(qt):
                    match_score = q_len
                    is_match = True
                    is_prefix = True
                elif dt.endswith(qt):
                    match_score = max(1, q_len // 2)
                    is_match = True
                elif q_len >= 4 and qt in dt:
                    match_score = q_len * 0.6
                    is_match = True
            else:
                if qt.endswith(dt):
                    match_score = d_len
                    is_match = True
            if is_match:
                st.num_prefix_suffix += match_score
                st.word_hits += 1
                st.term_matched_chars[i] += match_score
                if is_prefix:
                    st.term_has_prefix[i] = True
                pos = st.d_slices[j][0]
                if st.term_first_pos[i] == -1 or pos < st.term_first_pos[i]:
                    st.term_first_pos[i] = pos
                st.q_active[i] = False
                st.d_active[j] = False
                break

    # pass 2: fuzzy prefix (Damerau ≤1 on length-window prefixes of doc token)
    for i in q_indices:
        if not st.q_active[i]:
            continue
        q_len = st.q_slices[i][1]
        qt = st.q_text(i)
        if not (q_len >= 4 or (i == st.q_count - 1 and q_len >= 2)):
            continue
        for j in d_indices:
            if not st.d_active[j]:
                continue
            d_len = st.d_slices[j][1]
            if q_len >= d_len:
                continue
            dt = st.d_text(j)
            is_match = False
            match_score = 0.0
            dist = damerau1(qt, dt[:q_len])
            if dist <= 1:
                match_score = max(q_len - dist, 0.1)
                is_match = True
            elif d_len > q_len:
                dist = damerau1(qt, dt[: q_len + 1])
                if dist <= 1:
                    match_score = max(q_len - dist, 0.1)
                    is_match = True
                elif q_len > 1:
                    dist = damerau1(qt, dt[: q_len - 1])
                    if dist <= 1:
                        match_score = max(q_len - 1 - dist, 0.1)
                        is_match = True
            if is_match:
                st.num_prefix_suffix += match_score
                st.word_hits += 1
                st.term_matched_chars[i] += match_score
                pos = st.d_slices[j][0]
                if st.term_first_pos[i] == -1 or pos < st.term_first_pos[i]:
                    st.term_first_pos[i] = pos
                st.q_active[i] = False
                st.d_active[j] = False
                break


def all_terms_fully_matched(st: MatchState) -> bool:
    for i in range(st.q_count):
        if st.term_max_chars[i] > 0 and st.term_matched_chars[i] < st.term_max_chars[i]:
            return False
    return True


def match_fuzzy_words(st: MatchState, setup: CoverageParams) -> None:
    """FuzzyWordMatcher.Match (FuzzyWordMatcher.cs:14-133)."""
    max_query_length = 0
    for i in range(st.q_count):
        if st.q_active[i] and st.q_slices[i][1] > max_query_length:
            max_query_length = st.q_slices[i][1]
    if max_query_length == 0:
        return

    if max_query_length >= setup.min_length_two_typos:
        max_edit_dist = 2
    elif max_query_length >= setup.min_length_one_typo:
        max_edit_dist = 1
    else:
        max_edit_dist = 0
    if max_query_length == 2 and max_edit_dist == 0 and setup.num_typos >= 1:
        max_edit_dist = 1
    if max_edit_dist > setup.num_typos:
        max_edit_dist = setup.num_typos
    if max_edit_dist == 0:
        return

    for edit_dist in range(1, max_edit_dist + 1):
        if not any(st.q_active[: st.q_count]):
            break
        for i in range(st.q_count):
            if not st.q_active[i]:
                continue
            q_len = st.q_slices[i][1]
            if q_len < setup.min_word_size:
                continue
            if q_len >= setup.min_length_two_typos:
                token_max_edits = 2
            elif q_len >= setup.min_length_one_typo:
                token_max_edits = 1
            else:
                token_max_edits = 0
            is_special_short = False
            if q_len == 2 and token_max_edits == 0 and setup.num_typos >= 1:
                token_max_edits = 1
                is_special_short = True
            if token_max_edits > setup.num_typos:
                token_max_edits = setup.num_typos
            if edit_dist > token_max_edits:
                continue
            if is_special_short and edit_dist != 1:
                continue
            min_len = max(setup.min_word_size, q_len - edit_dist)
            max_len = min(setup.levenshtein_max_word_size, q_len + edit_dist, 63)
            qt = st.q_text(i)
            for j in range(st.d_count):
                if not st.d_active[j]:
                    continue
                d_len = st.d_slices[j][1]
                if d_len > max_len or d_len < min_len:
                    continue
                dt = st.d_text(j)
                if is_special_short and (not dt or dt[0] != qt[0]):
                    continue
                dist = damerau1(qt, dt) if edit_dist == 1 else damerau(qt, dt, edit_dist)
                if dist <= edit_dist:
                    st.word_hits += 1
                    st.num_fuzzy += q_len - dist
                    st.term_matched_chars[i] += q_len - dist
                    pos = st.d_slices[j][0]
                    if st.term_first_pos[i] == -1 or pos < st.term_first_pos[i]:
                        st.term_first_pos[i] = pos
                    st.q_active[i] = False
                    st.d_active[j] = False
                    break


# --- coverage scoring --------------------------------------------------------


@dataclass
class FusionSignals:
    """Precomputed lexical signals (FusionSignalComputer.cs:9-42)."""

    unfiltered_query_token_count: int = 0
    lexical_prefix_last: bool = False
    all_preceding_exact: bool = False
    is_perfect_doc_lexical: bool = False
    has_stem_evidence: bool = False
    has_anchor_stem: bool = False
    trailing_match_density: int = 0  # byte 0-255
    single_term_lexical_sim: int = 0  # byte 0-255
    single_char_last_token_boost: int = 0


@dataclass
class CoverageFeatures:
    """CoverageFeatures (CoverageFeatures.cs:3-89)."""

    coverage_score: int = 0
    terms_count: int = 0
    terms_with_any_match: int = 0
    terms_fully_matched: int = 0
    terms_strict_matched: int = 0
    terms_prefix_matched: int = 0
    first_match_index: int = -1
    sum_ci: float = 0.0
    word_hits: int = 0
    doc_token_count: int = 0
    longest_prefix_run: int = 0
    suffix_prefix_run: int = 0
    phrase_span: int = 0
    preceding_strict_count: int = 0
    last_token_has_prefix: bool = False
    last_term_ci: float = 0.0
    weighted_coverage: float = 0.0
    last_term_is_type_ahead: bool = False
    idf_coverage: float = 0.0
    total_idf: float = 0.0
    missing_idf: float = 0.0
    term_idf: list[float] | None = None  # word-level idf per token
    term_ci: list[float] | None = None
    fusion: FusionSignals = field(default_factory=FusionSignals)


def score_coverage(
    st: MatchState,
    query_len: int,
    lcs_sum: float,
    cover_whole_query: bool,
    word_level_term_idf: list[float] | None,
    features: CoverageFeatures,
) -> None:
    """CoverageScorer.CalculateFinalScore (CoverageScorer.cs:5-198); fills
    ``features`` in place."""
    q_count = st.q_count
    if not cover_whole_query:
        lcs_sum = 0.0
    num11 = st.num_joined + st.num_whole + st.num_fuzzy + st.num_prefix_suffix - st.penalty
    if num11 == 0.0 and lcs_sum > 2.0:
        num11 = lcs_sum - 2.0
    features.coverage_score = int(min(num11 / query_len * 255.0, 255.0)) & 0xFF

    sum_ci = 0.0
    weighted_coverage_sum = 0.0
    total_weight = 0.0
    idf_weighted_sum = 0.0
    total_idf = 0.0
    missing_idf = 0.0
    last_term_ci = 0.0
    last_term_idf = 0.0
    first_match_index = -1
    min_pos = None
    max_pos = -1
    term_ci_array = [0.0] * q_count if (word_level_term_idf is not None and q_count > 0) else None

    for i in range(q_count):
        if st.term_max_chars[i] <= 0:
            continue
        ci = min(1.0, st.term_matched_chars[i] / st.term_max_chars[i])
        sum_ci += ci
        if term_ci_array is not None:
            term_ci_array[i] = ci
        if ci > 0:
            features.terms_with_any_match += 1
        term_len = st.term_max_chars[i]
        total_weight += term_len
        weighted_coverage_sum += ci * term_len
        idf = st.term_idf[i]
        total_idf += idf
        idf_weighted_sum += ci * idf
        if ci < 1.0:
            missing_idf += (1.0 - ci) * idf
        if i == q_count - 1:
            last_term_ci = ci
            last_term_idf = idf
        is_fully = st.term_matched_chars[i] >= (st.term_max_chars[i] - 0.01)
        if is_fully:
            features.terms_fully_matched += 1
        if (st.term_has_whole[i] or st.term_has_joined[i]) and is_fully:
            features.terms_strict_matched += 1
        if st.term_has_prefix[i]:
            features.terms_prefix_matched += 1
        if st.term_first_pos[i] >= 0:
            if first_match_index == -1 or st.term_first_pos[i] < first_match_index:
                first_match_index = st.term_first_pos[i]
            if min_pos is None or st.term_first_pos[i] < min_pos:
                min_pos = st.term_first_pos[i]
            if st.term_first_pos[i] > max_pos:
                max_pos = st.term_first_pos[i]

    features.weighted_coverage = (
        weighted_coverage_sum / total_weight if total_weight > 0 else 0.0
    )
    features.idf_coverage = idf_weighted_sum / total_idf if total_idf > 0 else 0.0

    features.last_term_is_type_ahead = False
    if q_count > 0 and total_idf > 0:
        idf_share = last_term_idf / total_idf
        features.last_term_is_type_ahead = idf_share <= 1.0 / (q_count + 1)

    # single-term LCS boost
    if q_count == 1 and query_len > 0 and lcs_sum > 0.0:
        ci_lcs = min(1.0, lcs_sum / query_len)
        if ci_lcs > sum_ci:
            sum_ci = ci_lcs

    # longest consecutive prefix run
    current_run = 0
    for i in range(q_count):
        prefix_hit = (
            st.term_has_prefix[i] and st.term_max_chars[i] > 0 and st.term_matched_chars[i] > 0
        )
        if prefix_hit:
            current_run += 1
            if current_run > features.longest_prefix_run:
                features.longest_prefix_run = current_run
        else:
            current_run = 0

    # suffix run
    suffix_run = 0
    for i in range(q_count - 1, -1, -1):
        if st.term_has_prefix[i] and st.term_max_chars[i] > 0 and st.term_matched_chars[i] > 0:
            suffix_run += 1
        else:
            break
    features.suffix_prefix_run = suffix_run

    if min_pos is not None and max_pos >= min_pos and features.terms_with_any_match >= 2:
        features.phrase_span = (max_pos - min_pos) + 1

    if q_count >= 1:
        last_idx = q_count - 1
        features.last_token_has_prefix = (
            st.term_has_prefix[last_idx] and st.term_matched_chars[last_idx] > 0
        )
        if q_count >= 2:
            for i in range(q_count - 1):
                if (st.term_has_whole[i] or st.term_has_joined[i]) and st.term_matched_chars[
                    i
                ] >= (st.term_max_chars[i] - 0.01):
                    features.preceding_strict_count += 1

    features.terms_count = q_count
    features.first_match_index = first_match_index
    features.sum_ci = sum_ci
    features.last_term_ci = last_term_ci
    features.total_idf = total_idf
    features.missing_idf = missing_idf
    features.term_idf = word_level_term_idf
    features.term_ci = term_ci_array


# --- fusion signals ----------------------------------------------------------

_ANCHOR_STEM_LENGTH = 3
_MAX_TRAILING_TERM_LENGTH = 2


def compute_fusion_signals(
    q_low: str,
    d_low: str,
    q_tokens: list[tuple[int, int]],
    d_tokens: list[tuple[int, int]],
    min_stem_length: int,
    doc_first_token: str | None,
    doc_has_tokens: bool,
    d_texts: list[str] | None = None,
    q_texts: list[str] | None = None,
) -> FusionSignals:
    """FusionSignalComputer.ComputeSignals (FusionSignalComputer.cs:53-178).
    ``q_tokens``/``d_tokens`` are unfiltered (minWordSize=0) slices over the
    lowered shadow strings."""
    sig = FusionSignals(unfiltered_query_token_count=len(q_tokens))
    q_count, d_count = len(q_tokens), len(d_tokens)
    if q_count == 0 or d_count == 0:
        return sig

    if q_texts is None:
        q_texts = [q_low[o : o + l] for o, l in q_tokens]
    if d_texts is None:
        d_texts = [d_low[o : o + l] for o, l in d_tokens]

    def qt(i):
        return q_texts[i]

    def dt(j):
        return d_texts[j]

    # 1. prefix-last match
    if q_count == 1:
        q = qt(0)
        for j in range(d_count):
            if dt(j).startswith(q):
                sig.lexical_prefix_last = True
                sig.all_preceding_exact = dt(j) == q
                break
    else:
        all_preceding_exact = True
        for i in range(q_count - 1):
            q = qt(i)
            if not q:
                continue
            if not any(dt(j) == q for j in range(d_count)):
                all_preceding_exact = False
                break
        if all_preceding_exact:
            last = qt(q_count - 1)
            if not last:
                sig.lexical_prefix_last = True
                sig.all_preceding_exact = True
            else:
                for j in range(d_count):
                    if dt(j).startswith(last):
                        sig.lexical_prefix_last = True
                        sig.all_preceding_exact = True
                        break

    # 2. perfect doc: every doc token explained by some query token
    perfect = True
    for j in range(d_count):
        d = dt(j)
        if not any(d.startswith(qt(i)) or qt(i).startswith(d) for i in range(q_count)):
            perfect = False
            break
    sig.is_perfect_doc_lexical = perfect

    # 3. stem evidence (qCount >= 2)
    if q_count >= 2:
        unmatched = evidence = 0
        for i in range(q_count):
            q = qt(i)
            if len(q) < min_stem_length:
                continue
            if any(dt(j) == q or dt(j).startswith(q) for j in range(d_count)):
                continue
            unmatched += 1
            for j in range(d_count):
                d = dt(j)
                if len(d) < min_stem_length:
                    continue
                if q.startswith(d):
                    evidence += 1
                    break
                max_check = min(len(q), len(d))
                if max_check >= min_stem_length:
                    plen = 0
                    for a, b in zip(q, d):
                        if a != b:
                            break
                        plen += 1
                    if plen >= min_stem_length:
                        evidence += 1
                        break
        sig.has_stem_evidence = unmatched > 0 and evidence == unmatched

    # 4. anchor stem (uses precomputed doc metadata fast path,
    #    FusionSignalComputer.cs:91-132 — including its first-token-too-short
    #    edge where no fallback scan happens)
    if q_count > 0 and q_tokens[0][1] >= _ANCHOR_STEM_LENGTH:
        stem = qt(0)[:_ANCHOR_STEM_LENGTH]
        first = lower_1to1(doc_first_token) if doc_first_token else ""
        if doc_has_tokens and len(first) >= len(stem):
            if first.startswith(stem):
                sig.has_anchor_stem = True
            else:
                for j in range(1, d_count):
                    d = dt(j)
                    if len(d) >= len(stem) and d.startswith(stem):
                        sig.has_anchor_stem = True
                        break
        elif not doc_has_tokens:
            for j in range(d_count):
                d = dt(j)
                if len(d) >= len(stem) and d.startswith(stem):
                    sig.has_anchor_stem = True
                    break

    # 5. trailing match density
    if q_count >= 2:
        last_len = q_tokens[-1][1]
        if 1 <= last_len <= _MAX_TRAILING_TERM_LENGTH:
            last = qt(q_count - 1)
            matchable = 0
            for j in range(d_count):
                d = dt(j)
                if d.startswith(last) or (len(d) > len(last) and last in d):
                    matchable += 1
            if matchable > 0:
                density = matchable / d_count
                sig.trailing_match_density = int(min(max(density * 255.0, 0.0), 255.0))

    # 6. single-term lexical similarity
    if q_count == 1:
        sim = _single_term_lexical_similarity(qt(0), d_low, d_tokens)
        sig.single_term_lexical_sim = int(min(max(sim * 255.0, 0.0), 255.0))

    # 7. single-char last token boost
    if q_count >= 2:
        sig.single_char_last_token_boost = _single_char_last_token_match(
            q_low, d_low, q_tokens, d_tokens
        )
    return sig


def _single_char_last_token_match(q_low, d_low, q_tokens, d_tokens) -> int:
    """FusionSignalComputer.ComputeSingleCharLastTokenMatch (:180-262)."""
    q_count, d_count = len(q_tokens), len(d_tokens)
    last_off, last_len = q_tokens[-1]
    if last_len != 1:
        return 0
    target = q_low[last_off]
    if not target.isalpha():
        return 0
    d_index = 0
    first_match_index = -1
    for i in range(q_count - 1):
        off, ln = q_tokens[i]
        q_term = q_low[off : off + ln]
        found = False
        while d_index < d_count:
            doff, dln = d_tokens[d_index]
            if q_term in d_low[doff : doff + dln]:
                found = True
                if first_match_index == -1:
                    first_match_index = d_index
                break
            d_index += 1
        if not found:
            return 0
    if d_index + 1 < d_count:
        noff, nln = d_tokens[d_index + 1]
        next_term = d_low[noff : noff + nln]
        if next_term and next_term[0] == target:
            end_of_last = d_tokens[d_index][0] + d_tokens[d_index][1]
            between = d_low[end_of_last:noff]
            if all(c.isspace() for c in between):
                boost = 8 + max(0, 16 - first_match_index)
                if nln == 1:
                    boost += 4
                return boost
    return 0


def _single_term_lexical_similarity(q: str, d_low: str, d_tokens) -> float:
    """FusionSignalComputer.ComputeSingleTermLexicalSimilarity (:445-568).
    ``q`` is already lowered."""
    q_len = len(q)
    if q_len < 3:
        return 0.0
    best = 0.0
    for off, ln in d_tokens:
        if ln < 2:
            continue
        t = d_low[off : off + ln]
        idx = q.find(t)
        if idx >= 0:
            score = (len(t) / q_len) * (1.0 - idx / q_len)
            if score > best:
                best = score
            continue
        max_k = min(q_len, len(t))
        best_k = 0
        for length in range(max_k, 1, -1):
            if q[q_len - length :] == t[:length]:
                best_k = length
                break
        prefix_suffix_score = best_k / q_len if best_k > 0 else 0.0
        fuzzy_score = 0.0
        if len(t) <= 32:
            dist = damerau(q, t, 2)
            if dist <= 2:
                fuzzy_score = (q_len - dist) / q_len
        combined = max(prefix_suffix_score, fuzzy_score)
        if combined > best:
            best = combined

    # two-segment heuristic
    MIN_SEG = 3
    if q_len >= 2 * MIN_SEG:
        seg_len = min(2 * MIN_SEG, q_len // 2)
        prefix_frag = q[:seg_len]
        suffix_frag = q[q_len - seg_len :]
        prefix_index = suffix_index = -1
        for i, (off, ln) in enumerate(d_tokens):
            if ln < 3:
                continue
            t = d_low[off : off + ln]
            if prefix_index == -1 and (
                t.startswith(prefix_frag) or prefix_frag.startswith(t)
            ):
                prefix_index = i
            if suffix_index == -1 and (t.endswith(suffix_frag) or suffix_frag.endswith(t)):
                suffix_index = i
            if prefix_index != -1 and suffix_index != -1:
                break
        if prefix_index != -1 and suffix_index != -1 and prefix_index != suffix_index:
            two_seg = min(1.0, (len(prefix_frag) + len(suffix_frag)) / q_len)
            if two_seg > best:
                best = two_seg
    return best


# --- query context + feature calculation -------------------------------------


@dataclass
class CoverageContext:
    """Prepared per-query state (CoverageEngine.PrepareQuery,
    CoverageEngine.cs:61-126): deduped tokens, gram-averaged idf, word idf."""

    query: str  # normalized + lowered
    tokens: list[tuple[int, int]]
    term_idf: list[float]
    term_max_chars: list[int]
    word_level_idf: list[float] | None
    fusion_slices: list[tuple[int, int]] | None = None  # memoized per query
    fusion_texts: list[str] | None = None


def gram_avg_idf(term: str, index_sizes, df_lookup, total_docs: int, stop_term_limit: int) -> float:
    """CoverageEngine.ComputeTermIdf (CoverageEngine.cs:388-427): mean BM25
    idf over the term's n-grams (no padding), fallback log2(len+1)."""
    idf_sum = 0.0
    count = 0
    for size in index_sizes:
        if len(term) < size:
            continue
        for i in range(len(term) - size + 1):
            df = int(df_lookup(term[i : i + size]) or 0)
            if 0 < df <= stop_term_limit:
                n = float(total_docs)
                ratio = (n - df + 0.5) / (df + 0.5)
                if ratio > 0:
                    idf_sum += math.log(ratio + 1.0)
                    count += 1
    if count > 0:
        return idf_sum / count
    return math.log2(len(term) + 1)


def prepare_query(
    query: str,
    min_word_size: int,
    delimiters: frozenset[str],
    index_sizes,
    df_lookup,
    word_df_lookup,
    total_docs: int,
    stop_term_limit: int,
) -> CoverageContext:
    raw = tokenize_slices(query, min_word_size, delimiters)
    tokens = dedupe_slices(raw, query)  # query already lowered
    term_idf = [
        gram_avg_idf(query[o : o + l], index_sizes, df_lookup, total_docs, stop_term_limit)
        for o, l in tokens
    ]
    term_max_chars = [l for _, l in tokens]
    word_level_idf: list[float] | None = None
    if word_df_lookup is not None and tokens:
        word_level_idf = []
        for o, l in tokens:
            df = int(word_df_lookup(query[o : o + l]) or 0)
            if 0 < df <= total_docs:
                n = float(total_docs)
                word_level_idf.append(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
            else:
                word_level_idf.append(0.0)
    return CoverageContext(query, tokens, term_idf, term_max_chars, word_level_idf)


def prepare_doc(
    doc_text: str, min_word_size: int, delimiters: frozenset[str]
) -> tuple[str, int, list[tuple[int, int]], list[tuple[int, int]]]:
    """Query-independent per-document prep (lowered shadow, token slices) —
    computed once per doc chunk and cached by the query actor."""
    d_low = lower_1to1(doc_text)
    d_raw = tokenize_slices(doc_text, min_word_size, delimiters)
    d_unique = dedupe_slices(d_raw, d_low)
    fusion_slices = tokenize_slices(doc_text, 0, delimiters)
    d_unique_texts = [d_low[o : o + l] for o, l in d_unique]
    fusion_texts = [d_low[o : o + l] for o, l in fusion_slices]
    return (d_low, len(d_raw), d_unique, fusion_slices, d_unique_texts, fusion_texts)


def calculate_features(
    ctx: CoverageContext,
    doc_text: str,
    lcs_sum: float,
    setup: CoverageParams,
    delimiters: frozenset[str],
    min_stem_length: int,
    doc_first_token: str | None = None,
    doc_has_tokens: bool = False,
    doc_prep: tuple | None = None,
) -> CoverageFeatures:
    """CoverageEngine.CalculateCoverageInternal + signal computation
    (CoverageEngine.cs:222-382)."""
    features = CoverageFeatures()
    if not ctx.tokens:
        return features

    if doc_prep is None:
        doc_prep = prepare_doc(doc_text, setup.min_word_size, delimiters)
    d_low, d_raw_count, d_unique, fusion_d_slices, d_unique_texts, fusion_texts = doc_prep
    features.doc_token_count = d_raw_count

    st = MatchState(
        ctx.tokens, d_unique, ctx.query, d_low, ctx.term_max_chars, ctx.term_idf,
        d_raw_count, d_texts=d_unique_texts,
    )

    if setup.cover_whole_words:
        match_whole_words(st)
    if setup.cover_joined_words and st.q_count > 0:
        match_joined_words(st)
    if setup.cover_prefix_suffix and st.q_count > 0:
        match_prefix_suffix(st)
    if setup.cover_fuzzy_words and st.q_count > 0 and not all_terms_fully_matched(st):
        match_fuzzy_words(st, setup)

    features.word_hits = st.word_hits
    score_coverage(
        st, len(ctx.query), lcs_sum, setup.cover_whole_query, ctx.word_level_idf, features
    )

    # fusion signals over UNFILTERED tokens (minWordSize=0)
    fq = ctx.fusion_slices
    if fq is None:
        fq = tokenize_slices(ctx.query, 0, delimiters)
        ctx.fusion_slices = fq
    fq_texts = ctx.fusion_texts
    if fq_texts is None:
        fq_texts = ctx.fusion_texts = [ctx.query[o : o + l] for o, l in fq]
    features.fusion = compute_fusion_signals(
        ctx.query, d_low, fq, fusion_d_slices, min_stem_length,
        doc_first_token, doc_has_tokens, d_texts=fusion_texts, q_texts=fq_texts,
    )
    return features
