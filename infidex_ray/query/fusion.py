"""Stage 3: fusion scoring — precedence bit-vector + semantic fraction.

Faithful port of FusionScorer.Calculate
(reference: src/Infidex/Scoring/FusionScorer.cs:19-396). This float is the
final ranking value; the bit logic is the rank-identity contract.
"""

from __future__ import annotations

from .coverage import CoverageFeatures

_INTENT_BONUS_PER_SIGNAL = 0.15


def _single_term_tier(is_exact, is_clean, starts_at_beginning, is_complete) -> int:
    if not is_complete:
        return 0
    if starts_at_beginning:
        if is_exact:
            return 4
        if is_clean:
            return 3
    else:
        if is_exact:
            return 2
        if is_clean:
            return 1
    return 0


def _multi_term_tier(is_prefix_last_strong, lexical_prefix_last, is_perfect_doc, has_anchor_with_run) -> int:
    if is_prefix_last_strong:
        return 3
    if lexical_prefix_last:
        return 2
    if is_perfect_doc or has_anchor_with_run:
        return 1
    return 0


def fusion_finish(
    precedence: int,
    semantic_pre: float,
    coverage_ratio: float,
    has_partial: bool,
    bm25_score: float,
) -> float:
    """The ONLY bm25-dependent step of fusion scoring, split out so shard
    actors can compute every other component without knowing the GLOBAL
    max stage-1 score (norm_bm25 = score / global_max): the final semantic
    blend (`_semantic_score`'s tail), the [0, 0.999] clamp, and the
    precedence add — operation-for-operation identical to
    :func:`fusion_calculate` (parity test in tests/test_coverage.py)."""
    semantic = semantic_pre
    coverage_gap = 1.0 - coverage_ratio
    if has_partial and bm25_score >= coverage_gap:
        semantic = coverage_ratio * semantic + coverage_gap * bm25_score
    semantic = min(max(semantic, 0.0), 0.999)
    return float(precedence) + semantic


def _semantic_score(
    f: CoverageFeatures, is_single_term: bool, bm25_score: float, coverage_ratio: float
) -> float:
    """FusionScorer.ComputeSemanticScore (:313-361) — the pre-blend value
    (:func:`_semantic_pre`) plus the bm25 blend tail (the same two steps
    :func:`fusion_finish` applies, minus the clamp that lives in
    fusion_calculate/finish)."""
    semantic = _semantic_pre(f, is_single_term, coverage_ratio)
    has_partial = 0.0 < coverage_ratio < 1.0
    coverage_gap = 1.0 - coverage_ratio
    if has_partial and bm25_score >= coverage_gap:
        semantic = coverage_ratio * semantic + coverage_gap * bm25_score
    return semantic


def _semantic_pre(
    f: CoverageFeatures, is_single_term: bool, coverage_ratio: float
) -> float:
    """Everything of ComputeSemanticScore BEFORE the bm25 blend — depends
    only on coverage features, never on the (global) stage-1 score."""
    avg_ci = f.sum_ci / f.terms_count if f.terms_count > 0 else 0.0
    has_partial = 0.0 < coverage_ratio < 1.0

    if is_single_term:
        lexical_sim = f.fusion.single_term_lexical_sim / 255.0
        semantic = (avg_ci + lexical_sim) / 2.0
    elif f.doc_token_count == 0:
        semantic = avg_ci
    else:
        unmatched = f.terms_count - f.terms_with_any_match
        last_term_matched = f.last_token_has_prefix or (
            f.terms_count > 0 and f.terms_with_any_match == f.terms_count
        )
        can_use_idf = (last_term_matched or not f.last_term_is_type_ahead) and f.total_idf > 0.0
        use_idf_coverage = (
            has_partial and unmatched == 1 and can_use_idf and f.idf_coverage > coverage_ratio
        )
        base_coverage = f.idf_coverage if use_idf_coverage else avg_ci
        density = f.word_hits / f.doc_token_count
        semantic = base_coverage * density
        # intent bonus (:363-381)
        if f.terms_count >= 3:
            signals = (1 if f.fusion.has_anchor_stem else 0) + (
                1 if f.suffix_prefix_run >= 2 else 0
            )
            if signals > 0:
                semantic = min(1.0, semantic + _INTENT_BONUS_PER_SIGNAL * signals)
        # trailing term bonus (:383-396)
        if f.terms_count >= 2:
            match_density = f.fusion.trailing_match_density / 255.0
            if match_density > 0.0:
                semantic += (1.0 - semantic) * match_density

    return semantic


def fusion_calculate(
    query_text: str,
    document_text: str,
    f: CoverageFeatures,
    bm25_score: float,
) -> tuple[float, int]:
    """Returns (score, tiebreaker). Score = precedence integer + semantic
    fraction clamped to [0, 0.999] (FusionScorer.Calculate, :19-236).
    Implemented as components + finish so the single-round executor can
    ship bm25-independent components and blend the global norm on the
    driver (bit-identical split, parity-tested)."""
    p, sp, cr, hp, tb = fusion_components(query_text, document_text, f)
    return fusion_finish(p, sp, cr, hp, bm25_score), tb


def fusion_components(
    query_text: str,
    document_text: str,
    f: CoverageFeatures,
) -> tuple[int, float, float, bool, int]:
    """All bm25-INDEPENDENT parts of FusionScorer.Calculate: returns
    (precedence, semantic_pre, coverage_ratio, has_partial, tiebreaker)."""
    n = (
        f.fusion.unfiltered_query_token_count
        if f.fusion.unfiltered_query_token_count > 0
        else f.terms_count
    )
    is_single_term = n <= 1

    is_complete = f.terms_count > 0 and f.terms_with_any_match == f.terms_count
    is_clean = f.terms_count > 0 and f.terms_prefix_matched == f.terms_count
    is_exact = f.terms_count > 0 and f.terms_strict_matched == f.terms_count
    starts_at_beginning = f.first_match_index == 0
    lexical_prefix_last = f.fusion.lexical_prefix_last
    preceding_terms = max(0, f.terms_count - 1)
    coverage_prefix_last = (
        f.terms_count >= 1
        and f.preceding_strict_count == preceding_terms
        and f.last_token_has_prefix
    )
    is_prefix_last_strong = lexical_prefix_last and coverage_prefix_last
    is_perfect_doc = f.fusion.is_perfect_doc_lexical

    precedence = 0

    coverage_tier = 0
    if not is_single_term and f.terms_count > 0:
        matched, total = f.terms_with_any_match, f.terms_count
        if matched >= total:
            coverage_tier = 3
        elif matched == total - 1:
            coverage_tier = 2
        elif matched * 2 >= total:
            coverage_tier = 1
    if not is_single_term and coverage_tier > 0:
        precedence |= (coverage_tier & 0b11) << 16

    is_exact_prefix = (
        not is_single_term and is_clean and starts_at_beginning and lexical_prefix_last and is_complete
    )
    is_subset_match = (
        not is_single_term and f.doc_token_count > 0 and f.word_hits == f.doc_token_count
    )
    if is_exact_prefix:
        precedence |= 1 << 15
    if is_subset_match:
        precedence |= 1 << 14

    # high-info term dominance (:88-146)
    if not is_single_term and f.terms_count >= 2:
        has_dominant_term = False
        avg_idf_for_query = 0.0
        if (
            f.term_idf is not None
            and f.term_ci is not None
            and len(f.term_idf) == f.terms_count
            and len(f.term_ci) == f.terms_count
        ):
            avg_idf_for_query = (
                f.total_idf / f.terms_count if (f.total_idf > 0.0 and f.terms_count > 0) else 0.0
            )
            for cand in range(f.terms_count):
                candidate_power = f.term_idf[cand] * f.term_ci[cand]
                if (
                    f.term_ci[cand] <= 0.1
                    or f.term_idf[cand] <= 0.0
                    or f.term_idf[cand] < avg_idf_for_query
                ):
                    continue
                other_power = sum(
                    f.term_idf[i] * f.term_ci[i] for i in range(f.terms_count) if i != cand
                )
                if candidate_power >= other_power:
                    has_dominant_term = True
                    break
        has_strong_anchor = (
            f.fusion.has_anchor_stem
            and f.term_idf is not None
            and len(f.term_idf) >= 1
            and f.term_idf[0] >= avg_idf_for_query
        )
        if has_dominant_term or has_strong_anchor:
            precedence |= 1 << 13
        unmatched = f.terms_count - f.terms_with_any_match
        if has_dominant_term and unmatched == 1:
            precedence |= 8

    if is_single_term:
        if is_complete:
            precedence |= 1 << 17
        if is_clean and f.terms_count > 0:
            precedence |= 1 << 16
        precedence |= _single_term_tier(is_exact, is_clean, starts_at_beginning, is_complete) << 3
    else:
        has_anchor_with_run = f.fusion.has_anchor_stem and f.longest_prefix_run >= 2
        multi = _multi_term_tier(
            is_prefix_last_strong, lexical_prefix_last, is_perfect_doc, has_anchor_with_run
        )
        if f.fusion.unfiltered_query_token_count > f.terms_count:
            multi += f.fusion.single_char_last_token_boost
        precedence |= multi

    coverage_ratio = f.terms_with_any_match / f.terms_count if f.terms_count > 0 else 0.0
    has_partial = 0.0 < coverage_ratio < 1.0

    if has_partial and n >= 2:
        if f.fusion.has_stem_evidence:
            precedence |= 8
        else:
            unmatched = f.terms_count - f.terms_with_any_match
            last_term_matched = f.last_token_has_prefix or (
                f.terms_count > 0 and f.terms_with_any_match == f.terms_count
            )
            can_boost = (last_term_matched or not f.last_term_is_type_ahead) and f.total_idf > 0.0
            if unmatched == 1 and can_boost:
                missing_info_ratio = f.missing_idf / f.total_idf
                term_gap = 1.0 - coverage_ratio
                if missing_info_ratio < term_gap:
                    precedence |= 8

    semantic_pre = _semantic_pre(f, is_single_term, coverage_ratio)

    tiebreaker = 0
    if n >= 2 and len(document_text) > 0:
        focus = min(1.0, len(query_text) / len(document_text))
        tiebreaker = int(focus * 255.0)

    return precedence, semantic_pre, coverage_ratio, has_partial, tiebreaker
