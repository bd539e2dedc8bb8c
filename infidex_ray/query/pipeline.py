"""Coverage + fusion orchestration (Stage 2/3).

Port of SearchPipeline.ExecuteCoverageStage (reference:
src/Infidex/Scoring/SearchPipeline.cs:298-522):

1. top stage-1 candidates (≤ coverageDepth) + WordMatcher candidates
   (exact ∪ LD1 ∪ affix per query word, capped so wm-only docs fill at most
   coverageDepth − overlap slots, in internal-id order);
2. per candidate: LCS memo → coverage matcher cascade → fusion score;
3. bounded heap (coverageDepth) → consolidation → truncation.

Distribution model: every candidate doc lives in exactly one doc-range
segment (all chunks of a source doc stay in one segment), so per-candidate
work is shard-local. The driver-side decisions (wm-candidate cap, candidate
index order, truncation) are factored into ``coverage_driver`` which both the
in-process engine and the actor-pool executor call; shards run
``process_candidates`` over their job slices. Internal-id order =
(global segment_index, local_id), deterministic from the manifest.
"""

from __future__ import annotations

from . import coverage as cov
from .fusion import fusion_calculate, fusion_components
from .metrics import lcs_containment

# The reference's LCS/wordHits memo is a Span2D(2, N) guarded by
# ``docIndex < Height`` (SearchPipeline.cs:492,517) — Height is 2, so ONLY
# the first two candidate docs ever receive LCS credit and a wordHits memo
# byte. Load-bearing for its truncation goldens (e.g. "speeding" → exactly
# one result); ported verbatim.
MEMO_HEIGHT = 2


class DeadlineExceeded(Exception):
    """Per-query time budget expired mid-coverage (the engine catches this
    and falls back to the stage-1 backbone with Result.did_timeout set —
    ProcessMonitor.ShouldAbort pattern, src/Infidex/Api/ProcessMonitor.cs:196)."""


# deadline polled every this many candidate jobs (time.monotonic is ~20 ns,
# but the check still shouldn't sit in the innermost matcher loops)
_DEADLINE_STRIDE = 16


def _word_matcher_for(engine, si: int):
    """Build (once) a segment's word-matcher tables — actor-init-style lazy
    state (WordMatcher.FinalizeIndex analogue). ``si`` is the global segment
    id; the cache lives on the engine/shard that owns the segment."""
    if engine._wordmatchers is None:
        engine._wordmatchers = {}
    wm = engine._wordmatchers.get(si)
    if wm is None:
        from ..analyzer import _word_splitter
        from .wordmatch import SegmentWordMatcher

        seg = engine.seg_by_id(si)
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


_PREP_CACHE_MAX = 100_000  # ~tens of MB of slices at typical chunk sizes


def _prep_for(engine, si: int, lid: int, setup, delimiters):
    """Per-doc-chunk tokenization prep, cached on the engine/shard — the
    dominant per-candidate cost, query-independent so computed once."""
    cache = getattr(engine, "_doc_prep_cache", None)
    if cache is None:
        cache = engine._doc_prep_cache = {}
    key = (si, lid)
    prep = cache.get(key)
    if prep is None:
        text = _cov_doc_text(engine, si, lid, delimiters)
        prep = cov.prepare_doc(text, setup.min_word_size, delimiters)
        # bounded LRU-ish cache: hot candidates recur across queries, but a
        # long-lived serving shard must not accumulate prep state without
        # limit (dict preserves insertion order → popping the oldest entry
        # approximates LRU well enough for a recurrence cache)
        if len(cache) >= _PREP_CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[key] = prep
    return prep


def _cov_doc_text(engine, si: int, lid: int, delimiters) -> str:
    """Coverage document text: normalized chunk text, synonym-canonicalized
    when a map is configured (SearchPipeline.ProcessCandidate, :482-489)."""
    text = engine.seg_by_id(si).norm_texts[lid]
    smap = getattr(engine, "synonym_map", None)
    if smap is not None:
        text = smap.canonicalize_text(text, delimiters)
    return text


def _key_index_for(engine):
    """doc_key → (global segment id, local_id), built once per engine."""
    idx = getattr(engine, "_key_index", None)
    if idx is None:
        idx = {}
        for seg in engine.segments:
            for lid, key in enumerate(seg.doc_keys.tolist()):
                idx[key] = (seg.seg_id, lid)
        engine._key_index = idx
    return idx


def wm_candidates(engine, norm_query: str) -> dict[int, "np.ndarray"]:
    """The EXPENSIVE half of the WordMatcher lookup: per-segment candidate
    ids for the query words (exact ∪ LD1 ∪ affix probes). Independent of
    the stage-1 result, so the executor fires it CONCURRENTLY with the
    stage-1 fan-out and only the cheap split waits for stage 1."""
    import numpy as np

    cfg = engine.cfg
    from ..analyzer import _word_splitter

    splitter = _word_splitter(cfg.delimiters)
    query_words = [w for w in splitter.split(norm_query) if w]
    out: dict[int, np.ndarray] = {}
    for seg in engine.segments:
        wm = _word_matcher_for(engine, seg.seg_id)
        ids = wm.candidates_for_query(query_words, cfg.coverage.cover_prefix_suffix)
        if getattr(engine, "deleted", None) and len(ids):
            keep = ~np.isin(
                seg.doc_keys[ids], np.fromiter(engine.deleted, dtype=np.int64)
            )
            ids = ids[keep]
        out[seg.seg_id] = ids
    return out


def wm_scan(
    engine,
    norm_query: str,
    tfidf_lids_by_seg: dict[int, "np.ndarray"],
    cap: int,
    precomputed: dict[int, "np.ndarray"] | None = None,
) -> tuple[int, list[tuple[int, int, int]], list[tuple[int, int, int]]]:
    """WordMatcherLookup over this engine/shard's segments, split against the
    stage-1 candidate set. Returns (total candidate count,
    overlapping [(si, lid, key)], first ``cap`` unique [(si, lid, key)]).

    Only the first ``coverageDepth − overlap`` unique wm candidates are ever
    processed (SearchPipeline.cs:371-397), so everything beyond ``cap`` per
    shard is dropped HERE — candidate unions for common words cover most of
    the corpus and must never leave the shard."""
    import numpy as np

    per_seg = (
        precomputed if precomputed is not None else wm_candidates(engine, norm_query)
    )
    n_total = 0
    overlapping: list[tuple[int, int, int]] = []
    unique: list[tuple[int, int, int]] = []
    for seg in engine.segments:
        ids = per_seg.get(seg.seg_id)
        if ids is None:
            ids = np.empty(0, dtype=np.int64)
        n_total += len(ids)
        if not len(ids):
            continue
        tf = tfidf_lids_by_seg.get(seg.seg_id)
        if tf is not None and len(tf):
            mask = np.isin(ids, tf)
        else:
            mask = np.zeros(len(ids), dtype=bool)
        ov = ids[mask]
        if len(ov):
            keys = seg.doc_keys[ov]
            overlapping.extend(
                (seg.seg_id, int(l), int(k)) for l, k in zip(ov.tolist(), keys.tolist())
            )
        room = cap - len(unique)
        if room > 0:
            un = ids[~mask][:room]
            if len(un):
                keys = seg.doc_keys[un]
                unique.extend(
                    (seg.seg_id, int(l), int(k))
                    for l, k in zip(un.tolist(), keys.tolist())
                )
    return n_total, overlapping, unique


def process_candidates(
    engine,
    ctx: cov.CoverageContext,
    jobs: list[tuple[int, int, float, int]],
    best_chunk: dict[int, tuple[int, int]],
    deadline: float | None = None,
    components: bool = False,
) -> tuple[list, dict[int, list[int]]]:
    """Shard-local candidate scoring (SearchPipeline.ProcessCandidate,
    :449-522). ``jobs`` = (si, lid, base_score, doc_index) in processing
    order; all jobs for one doc key arrive at the shard owning its segment,
    so the 2-slot LCS/wordHits memo semantics hold locally.

    Returns ([(score, key, tiebreaker, word_hits)], {doc_index<2: [lcs, wh]}).
    With ``components=True`` the rows are instead the bm25-INDEPENDENT
    fusion components ``(precedence, semantic_pre, coverage_ratio,
    has_partial, tiebreaker, key, word_hits)`` and base_score is ignored —
    the single-round executor finishes the blend driver-side with the
    GLOBAL norm (fusion.fusion_finish; bit-identical by construction).
    """
    setup = engine.cfg.coverage
    delimiters = frozenset(engine.cfg.delimiters)
    min_stem_length = engine.cfg.min_index_size
    memo: dict[int, list[int]] = {}
    results: list[tuple[float, int, int, int]] = []
    # overlapping wm jobs and stage-1 jobs for the same candidate carry the
    # SAME (si, lid, best-chunk, lcs) → identical features; only base_score
    # differs. Caching halves the matcher-cascade work for the common
    # full-overlap case. Keyed on the lcs actually used, so the raw-vs-
    # clamped >255 edge recomputes and stays exact.
    feat_cache: dict[tuple, object] = {}

    import time as _time

    for n_done, (si, lid, base_score, di) in enumerate(jobs):
        if (
            deadline is not None
            and n_done % _DEADLINE_STRIDE == 0
            and _time.monotonic() >= deadline
        ):
            raise DeadlineExceeded
        seg = engine.seg_by_id(si)
        key = int(seg.doc_keys[lid])
        # coverage text = best-scoring chunk for this key when stage 1 found
        # one (SegmentProcessor.GetBestSegmentText, :42-75); metadata stays
        # the candidate chunk's (CalculateFeatures(..., internalId))
        tsi, tlid = best_chunk.get(key, (si, lid))
        doc_text = _cov_doc_text(engine, tsi, tlid, delimiters)
        prep = _prep_for(engine, tsi, tlid, setup, delimiters)
        lcs = 0
        if 0 <= di < MEMO_HEIGHT:
            m = memo.setdefault(di, [0, 0])
            lcs = m[0]
            if lcs == 0:
                tol = 0
                if len(ctx.query) >= setup.coverage_q_limit_for_error_tolerance:
                    tol = int(
                        len(ctx.query) * setup.coverage_lcs_error_tolerance_relative_q
                    )
                lcs = lcs_containment(ctx.query, prep[0], tol)
                m[0] = min(lcs, 255)
        feat_key = (si, lid, tsi, tlid, lcs)
        features = feat_cache.get(feat_key)
        if features is None:
            features = cov.calculate_features(
                ctx, doc_text, lcs, setup, delimiters, min_stem_length,
                doc_first_token=seg.first_tokens[lid],
                doc_has_tokens=int(seg.token_counts[lid]) > 0,
                doc_prep=prep,
            )
            feat_cache[feat_key] = features
        if components:
            p, sp, cr, hp, tb = fusion_components(ctx.query, doc_text, features)
            row = (p, sp, cr, hp, tb, key, features.word_hits)
        else:
            score, tiebreaker = fusion_calculate(
                ctx.query, doc_text, features, base_score
            )
            row = (score, key, tiebreaker, features.word_hits)
        if 0 <= di < MEMO_HEIGHT:
            m = memo.setdefault(di, [0, 0])
            if m[1] == 0:
                m[1] = min(features.word_hits, 255)
        results.append(row)
    return results, memo


def tfidf_lids_by_seg(top: list[tuple], key_of_loc=None):
    """Stage-1 candidate local ids grouped by segment id (the set actors
    intersect wm candidates against)."""
    import numpy as np

    by_seg: dict[int, list[int]] = {}
    for e in top:
        if len(e) >= 5 and e[3] >= 0 and e[4] >= 0:
            by_seg.setdefault(e[3], []).append(e[4])
        elif key_of_loc:
            loc = key_of_loc(e[1])
            if loc is not None:
                by_seg.setdefault(loc[0], []).append(loc[1])
    return {si: np.asarray(v, dtype=np.int64) for si, v in by_seg.items()}


def coverage_driver(
    cfg,
    ctx: cov.CoverageContext,
    stage1_results: list[tuple],
    wm_result: tuple[int, list, list],
    coverage_depth: int,
    top_k: int,
    run_jobs,
    key_of_loc=None,
):
    """Driver-side coverage orchestration shared by the in-process engine and
    the actor-pool executor. ``wm_result`` = (total wm candidates,
    overlapping, capped unique) from ``wm_scan``; ``run_jobs(jobs,
    best_chunk)`` executes ``process_candidates`` job lists (locally or
    fanned out to shards) and returns (results, memo). Returns final entries
    or None (stage-1 fallback)."""
    setup = cfg.coverage
    top = stage1_results[:coverage_depth]
    n_wm_total, overlapping, unique = wm_result

    def entry_loc(e):
        if len(e) >= 5 and e[3] >= 0 and e[4] >= 0:
            return (e[3], e[4])
        return key_of_loc(e[1]) if key_of_loc else None

    best_chunk: dict[int, tuple[int, int]] = {}
    for e in top:
        loc = entry_loc(e)
        if loc is not None:
            best_chunk.setdefault(e[1], loc)
    wm_limit = max(0, coverage_depth - len(overlapping))
    unique = unique[:wm_limit]

    # candidate doc-key index: stage-1 candidates first, then wm ids in
    # ascending (si, lid) order (SearchPipeline.BuildDocumentKeyIndex,
    # :524-545; truncation beyond the cap cannot touch the 2 memo slots)
    doc_index: dict[int, int] = {}
    for e in top:
        if e[1] not in doc_index:
            doc_index[e[1]] = len(doc_index)
    wm_ids = sorted(overlapping + unique, key=lambda t: (t[0], t[1]))
    for _si, _lid, key in wm_ids:
        if key not in doc_index:
            doc_index[key] = len(doc_index)

    jobs: list[tuple[int, int, float, int]] = []
    for si, lid, key in overlapping:
        jobs.append((si, lid, 0.0, doc_index.get(key, -1)))
    for si, lid, key in unique:
        jobs.append((si, lid, 0.0, doc_index.get(key, -1)))
    max_tfidf = top[0][0] if top else 1.0
    for e in top:
        loc = entry_loc(e)
        if loc is None:
            continue
        norm_bm25 = e[0] / max_tfidf if max_tfidf > 0 else 0.0
        jobs.append((loc[0], loc[1], norm_bm25, doc_index.get(e[1], -1)))

    results, memo = run_jobs(jobs, best_chunk)
    return finalize_coverage(
        setup, results, memo, doc_index, n_wm_total, coverage_depth, top_k
    )


def finalize_coverage(
    setup,
    results: list[tuple[float, int, int, int]],
    memo: dict[int, list[int]],
    doc_index: dict[int, int],
    n_wm_total: int,
    coverage_depth: int,
    top_k: int,
):
    """Driver-side coverage epilogue shared by ``coverage_driver`` and the
    executor's fused round: dedupe/sort scored candidates, then apply the
    reference's truncation rule (ResultProcessor.CalculateTruncationIndex,
    src/Infidex/Scoring/ResultProcessor.cs:146-178). Returns final entries or
    None (stage-1 fallback)."""
    max_word_hits = max((r[3] for r in results), default=0)
    if max_word_hits == 0 and n_wm_total == 0:
        return None  # → stage-1 fallback

    entries = [(r[0], r[1], r[2]) for r in results]
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
            lcs_b, wh_b = memo.get(di, (0, 0)) if di < MEMO_HEIGHT else (0, 0)
            if wh_b >= min_word_hits or lcs_b > 0 or final[i][0] >= setup.truncation_score:
                truncation_index = i
                break

    if truncation_index == -1 or not setup.truncate:
        result_count = top_k
    else:
        result_count = min(truncation_index + 1, top_k)
    return final[:result_count]


def prescreen_words(cfg, norm_query: str) -> set[str]:
    """Query word set for the lexical prescreen (Tokenizer.
    GetWordTokensForCoverage, src/Infidex/Tokenization/Tokenizer.cs:331-341)."""
    from ..analyzer import _word_splitter

    splitter = _word_splitter(cfg.delimiters)
    return {
        w for w in splitter.split(norm_query) if len(w) >= cfg.coverage.min_word_size
    }


def segment_prescreen_keys(segments, words: set[str], candidate_keys) -> set[int]:
    """Doc keys among ``candidate_keys`` whose doc contains ANY query word —
    the posting-union ∩ candidates step of LexicalPrescreen.Apply
    (src/Infidex/Scoring/LexicalPrescreen.cs:44-84), shard-local (a doc lives
    in exactly one segment)."""
    import numpy as np

    wanted = np.asarray(sorted(set(candidate_keys)), dtype=np.int64)
    hit: set[int] = set()
    if len(wanted) == 0:
        return hit
    for seg in segments:
        for w in words:
            i = seg.term_lookup(w)
            if i < 0:
                continue
            docs, _ = seg.term_postings(i)
            keys = seg.doc_keys[docs]
            hit.update(keys[np.isin(keys, wanted)].tolist())
    return hit


def lexical_prescreen(engine, norm_query: str, top: list):
    """LexicalPrescreen.Apply (src/Infidex/Scoring/LexicalPrescreen.cs:17-84):
    keep only candidates containing at least one full query word. Skipped
    when any query word has df == 0 (typo/fuzzy case) and falls back to the
    unfiltered list when it would filter everything."""
    words = prescreen_words(engine.cfg, norm_query)
    if not words:
        return top
    for w in words:
        if engine.df_lookup(w) == 0:
            return top
    keys = segment_prescreen_keys(engine.segments, words, [e[1] for e in top])
    if not keys:
        return top
    filtered = [e for e in top if e[1] in keys]
    return filtered if filtered else top


def coverage_stage(
    engine, norm_query, stage1_results, coverage_depth, top_k, deadline=None
):
    """In-process coverage: the engine is one 'shard' holding every segment."""
    cfg = engine.cfg
    key_of_loc = lambda key: _key_index_for(engine).get(key)  # noqa: E731
    top = stage1_results[:coverage_depth]
    if cfg.coverage.enable_lexical_prescreen and top:
        top = lexical_prescreen(engine, norm_query, top)
        stage1_results = top
    if cfg.enable_word_matcher:
        wm_result = wm_scan(
            engine, norm_query, tfidf_lids_by_seg(top, key_of_loc), coverage_depth
        )
    else:
        wm_result = (0, [], [])

    ctx = cov.prepare_query(
        norm_query,
        cfg.coverage.min_word_size,
        frozenset(cfg.delimiters),
        cfg.index_sizes,
        engine.df_lookup,
        engine.word_df,
        engine.total_docs,
        cfg.stop_term_limit,
    )

    def run_jobs(jobs, best_chunk):
        return process_candidates(engine, ctx, jobs, best_chunk, deadline=deadline)

    return coverage_driver(
        cfg, ctx, stage1_results, wm_result, coverage_depth, top_k, run_jobs,
        key_of_loc=key_of_loc,
    )
