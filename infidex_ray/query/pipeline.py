"""Coverage + fusion orchestration (Stage 2/3).

Port of SearchPipeline.ExecuteCoverageStage (reference:
src/Infidex/Scoring/SearchPipeline.cs:298-522):

1. top stage-1 candidates (≤ coverageDepth) + WordMatcher candidates
   (exact ∪ LD1 ∪ affix per query word, capped so wm-only docs fill at most
   coverageDepth − overlap slots, in internal-id order);
2. per candidate: LCS memo → coverage matcher cascade → fusion score;
3. bounded heap (coverageDepth) → consolidation → truncation.

Distribution model: every candidate doc lives in exactly one doc-range
segment, so steps here are grouped per segment (the state a query actor
holds); only candidate id lists and small per-doc results cross segments.
Internal-id order = (segment_index, local_id) — deterministic because segment
ordering comes from the manifest.
"""

from __future__ import annotations

import numpy as np

from . import coverage as cov
from .fusion import fusion_calculate
from .metrics import lcs_containment


def _word_matcher_for(engine, si: int):
    """Build (once) the segment's word-matcher tables — actor-init-style
    lazy state (WordMatcher.FinalizeIndex analogue)."""
    if engine._wordmatchers is None:
        engine._wordmatchers = [None] * len(engine.segments)
    wm = engine._wordmatchers[si]
    if wm is None:
        from ..analyzer import _word_splitter
        from .wordmatch import SegmentWordMatcher

        seg = engine.segments[si]
        wmc = engine.cfg.word_matcher
        wm = SegmentWordMatcher(
            [cov.lower_1to1(t) for t in seg.norm_texts],
            _word_splitter(engine.cfg.delimiters),
            min_exact=wmc.min_word_size_exact,
            max_exact=wmc.max_word_size_exact,
            min_ld1=wmc.min_word_size_ld1,
            max_ld1=wmc.max_word_size_ld1,
            support_ld1=wmc.support_ld1,
            support_affix=wmc.support_affix,
        )
        engine._wordmatchers[si] = wm
    return wm


def _prep_for(engine, si: int, lid: int, setup, delimiters):
    """Per-doc-chunk tokenization prep, cached on the engine/actor — the
    dominant per-candidate cost, query-independent so computed once."""
    cache = getattr(engine, "_doc_prep_cache", None)
    if cache is None:
        cache = engine._doc_prep_cache = {}
    key = (si, lid)
    prep = cache.get(key)
    if prep is None:
        prep = cov.prepare_doc(
            engine.segments[si].norm_texts[lid], setup.min_word_size, delimiters
        )
        cache[key] = prep
    return prep


def _key_index_for(engine):
    """doc_key → (segment_idx, local_id), built once per engine."""
    idx = getattr(engine, "_key_index", None)
    if idx is None:
        idx = {}
        for si, seg in enumerate(engine.segments):
            for lid, key in enumerate(seg.doc_keys.tolist()):
                idx[key] = (si, lid)
        engine._key_index = idx
    return idx


def coverage_stage(engine, norm_query, stage1_results, coverage_depth, top_k):
    """Returns final entries [(score, doc_key, tiebreaker)] or None to fall
    back to the stage-1 backbone (empty-coverage safety net,
    SearchPipeline.cs:184-197)."""
    cfg = engine.cfg
    setup = cfg.coverage
    delimiters = frozenset(cfg.delimiters)
    top = stage1_results[:coverage_depth]

    # --- word-matcher candidates, ordered by (segment, local id) ----------
    wm_ids: list[tuple[int, int]] = []
    if cfg.enable_word_matcher:
        from ..analyzer import _word_splitter

        splitter = _word_splitter(cfg.delimiters)
        query_words = [w for w in splitter.split(norm_query) if w]
        for si in range(len(engine.segments)):
            wm = _word_matcher_for(engine, si)
            ids = wm.candidates_for_query(query_words, setup.cover_prefix_suffix)
            wm_ids.extend((si, int(l)) for l in ids)

    key_index = _key_index_for(engine)

    def entry_loc(e):
        if len(e) >= 5 and e[3] >= 0 and e[4] >= 0:
            return (e[3], e[4])
        return key_index.get(e[1])

    # best-scoring chunk per doc key (bestSegmentsMap analogue): stage-1
    # entries are consolidated best-per-key already, so first win = best
    best_chunk: dict[int, tuple[int, int]] = {}
    tfidf_ids = set()
    for e in top:
        loc = entry_loc(e)
        if loc is not None:
            tfidf_ids.add(loc)
            best_chunk.setdefault(e[1], loc)
    overlapping = [loc for loc in wm_ids if loc in tfidf_ids]
    unique = [loc for loc in wm_ids if loc not in tfidf_ids]
    wm_limit = max(0, coverage_depth - len(overlapping))

    # --- prepared query context ------------------------------------------
    ctx = cov.prepare_query(
        norm_query,
        setup.min_word_size,
        delimiters,
        cfg.index_sizes,
        engine.df_lookup,
        engine.word_df,
        engine.total_docs,
        cfg.stop_term_limit,
    )
    min_stem_length = cfg.min_index_size

    # --- candidate doc-key index (uniqueDocKeys insertion order:
    #     stage-1 candidates first, then word-matcher ids;
    #     SearchPipeline.BuildDocumentKeyIndex, :524-545) -------------------
    doc_index: dict[int, int] = {}
    for e in top:
        if e[1] not in doc_index:
            doc_index[e[1]] = len(doc_index)
    for si, lid in wm_ids:
        key = int(engine.segments[si].doc_keys[lid])
        if key not in doc_index:
            doc_index[key] = len(doc_index)

    # --- per-candidate scoring -------------------------------------------
    # The reference's LCS/wordHits memo is a Span2D(2, N) guarded by
    # ``docIndex < Height`` (SearchPipeline.cs:492,517) — Height is 2, so
    # ONLY the first two candidate docs ever receive LCS credit and a
    # wordHits memo byte. Load-bearing for its truncation goldens (e.g.
    # "speeding" → exactly one result); ported verbatim.
    MEMO_HEIGHT = 2
    memo = [[0, 0] for _ in range(MEMO_HEIGHT)]  # [lcs_byte, word_hits_byte]
    entries: list[tuple[float, int, int]] = []
    max_word_hits = 0

    def process(si: int, lid: int, base_score: float) -> None:
        nonlocal max_word_hits
        seg = engine.segments[si]
        key = int(seg.doc_keys[lid])
        # coverage text = best-scoring chunk for this key when stage 1 found
        # one (SegmentProcessor.GetBestSegmentText, :42-75); metadata stays
        # the candidate chunk's (CalculateFeatures(..., internalId))
        tsi, tlid = best_chunk.get(key, (si, lid))
        doc_text = engine.segments[tsi].norm_texts[tlid]
        di = doc_index.get(key)
        if di is None:
            return
        prep = _prep_for(engine, tsi, tlid, setup, delimiters)
        lcs = 0
        if di < MEMO_HEIGHT:
            lcs = memo[di][0]
            if lcs == 0:
                tol = 0
                if len(ctx.query) >= setup.coverage_q_limit_for_error_tolerance:
                    tol = int(
                        len(ctx.query) * setup.coverage_lcs_error_tolerance_relative_q
                    )
                lcs = lcs_containment(ctx.query, prep[0], tol)
                memo[di][0] = min(lcs, 255)
        features = cov.calculate_features(
            ctx, doc_text, lcs, setup, delimiters, min_stem_length,
            doc_first_token=seg.first_tokens[lid],
            doc_has_tokens=int(seg.token_counts[lid]) > 0,
            doc_prep=prep,
        )
        score, tiebreaker = fusion_calculate(ctx.query, doc_text, features, base_score)
        if di < MEMO_HEIGHT and memo[di][1] == 0:
            memo[di][1] = min(features.word_hits, 255)
        if features.word_hits > max_word_hits:
            max_word_hits = features.word_hits
        entries.append((score, key, tiebreaker))

    for si, lid in overlapping:
        process(si, lid, 0.0)
    for si, lid in unique[:wm_limit]:
        process(si, lid, 0.0)

    max_tfidf = top[0][0] if top else 1.0
    for e in top:
        loc = entry_loc(e)
        if loc is None:
            continue
        norm_bm25 = e[0] / max_tfidf if max_tfidf > 0 else 0.0
        process(loc[0], loc[1], norm_bm25)

    if max_word_hits == 0 and not wm_ids:
        return None  # → stage-1 fallback

    # --- heap(coverageDepth) → consolidate → truncate ---------------------
    entries.sort(key=lambda e: (-e[0], -e[2], e[1]))
    entries = entries[:coverage_depth]
    best: dict[int, tuple[float, int, int]] = {}
    for e in entries:
        cur = best.get(e[1])
        if cur is None or (e[0], e[2], -e[1]) > (cur[0], cur[2], -cur[1]):
            best[e[1]] = e
    final = sorted(best.values(), key=lambda e: (-e[0], -e[2], e[1]))
    if not final:
        return None

    truncation_index = -1
    if setup.truncate:
        # ResultProcessor.CalculateTruncationIndex (:146-178): docs beyond the
        # 2-slot memo read zeros and survive only on score >= TruncationScore.
        min_word_hits = max(
            setup.coverage_min_word_hits_abs,
            max_word_hits - setup.coverage_min_word_hits_relative,
        )
        for i in range(len(final) - 1, -1, -1):
            di = doc_index.get(final[i][1])
            if di is None:
                continue
            lcs_b, wh_b = memo[di] if di < MEMO_HEIGHT else (0, 0)
            if wh_b >= min_word_hits or lcs_b > 0 or final[i][0] >= setup.truncation_score:
                truncation_index = i
                break

    if truncation_index == -1 or not setup.truncate:
        result_count = top_k
    else:
        result_count = min(truncation_index + 1, top_k)
    return final[:result_count]
