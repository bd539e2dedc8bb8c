"""Corpus-scale autocomplete scoring (AutocompleteScoring parity).

The reference ships an LCS-based Jaro-like autocomplete scorer
(src/Infidex/Metrics/AutocompleteScoring.cs:26-70: bit-parallel Hyyrö
LCS, Winkler-style prefix bonus, [0,1] clamp) as a standalone public
surface. `query/metrics.py::jaro_like_score` is the per-string port; this
module is the DATA-PIPELINE form: score every document's candidate string
against a fixed query in one vectorized `map_batches` pass — the batch
job behind "rank this suggestion table offline".

Vectorization: candidates decode once to a (docs × width) codepoint
matrix; the Hyyrö automaton state S is a uint64 VECTOR updated in lock
step over character positions (chars mapping to an empty query mask leave
S unchanged, so short candidates need no masking — padding uses a
codepoint ≥ 256, which the reference's ASCII-optimized map sends to 0,
AutocompleteScoring.cs:108-118).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_jaro_like(
    texts: list, query: str, candidate_chars: int, prefix_bonus: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lcs, prefix, score_f64) per text for candidate =
    lower(text[:candidate_chars]). Query must be ≤ 64 chars (the
    bit-parallel domain; matches lcs_length's routing for short
    candidates)."""
    q = query.lower()
    m = len(q)
    if not (0 < m <= 64):
        raise ValueError("query must be 1..64 chars")
    if not (0 < candidate_chars <= 64):
        raise ValueError("candidate_chars must be 1..64")
    n_docs = len(texts)
    lcs = np.zeros(n_docs, dtype=np.int64)
    prefix = np.zeros(n_docs, dtype=np.int64)
    clen = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        return lcs, prefix, np.zeros(0, dtype=np.float64)

    cands = [(t or "")[:candidate_chars].lower() for t in texts]
    clen[:] = [len(c) for c in cands]
    # .lower() can EXPAND past candidate_chars (e.g. 'İ' → 'i̇') — widen
    # to the batch max so the reshape never desyncs; pad columns are
    # automaton no-ops. Pad codepoint 0xFFFF ≥ 256 ⇒ empty mask.
    width = max(candidate_chars, int(clen.max()))
    pad = chr(0xFFFF)
    big = "".join(c + pad * (width - len(c)) for c in cands)
    codes = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).reshape(
        n_docs, width
    )

    # query char → position bitmap (ASCII-optimized map: codepoints ≥ 256
    # never match, AutocompleteScoring.cs:108-118)
    lut = np.zeros(256, dtype=np.uint64)
    for i, ch in enumerate(q):
        if ord(ch) < 256:
            lut[ord(ch)] |= np.uint64(1) << np.uint64(i)
    mask = np.uint64((1 << m) - 1)

    s = np.full(n_docs, mask, dtype=np.uint64)
    small = np.where(codes < 256, codes, 0).astype(np.int64)
    has = (codes < 256).astype(np.uint64)
    for j in range(width):
        cm = lut[small[:, j]] * has[:, j]
        u = s & cm
        s = ((s + u) | (s - u)) & mask  # uint64 wraparound == C# ulong
    lcs_all = np.zeros(n_docs, dtype=np.int64)
    inv = (~s) & mask
    # vectorized popcount over uint64
    v = inv.copy()
    while v.any():
        lcs_all += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    lcs = np.where(clen > 0, lcs_all, 0)

    # common case-insensitive prefix length
    qcodes = np.frombuffer(q.encode("utf-32-le"), dtype=np.uint32)
    k = min(m, width)
    eq = codes[:, :k] == qcodes[None, :k]
    run = np.cumprod(eq, axis=1)
    pref = run.sum(axis=1)
    prefix = np.minimum(pref, clen)

    # float64 score mirror (the f32 API is jaro_like_score; the oracle
    # compares this float64 expression, same operation order)
    with np.errstate(divide="ignore", invalid="ignore"):
        cl = clen.astype(np.float64)
        coverage = lcs / float(m) + np.where(cl > 0, lcs / cl, 0.0)
        base = 0.5 * lcs * coverage
        mn = np.minimum(float(m), cl)
        max_score = mn + prefix_bonus * np.minimum(4.0, mn)
        score = np.clip(
            (base + prefix_bonus * prefix) / np.maximum(max_score, 1.0),
            0.0,
            1.0,
        )
    score = np.where((lcs > 0) & (clen > 0), score, 0.0)
    return lcs, prefix, score


def autocomplete_score(
    ds,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidate_chars: int = 32,
    prefix_bonus: float = 0.1,
):
    """Score every doc's candidate prefix (``lower(text[:candidate_chars])``)
    against ``query`` with the reference's LCS Jaro-like autocomplete
    formula. Returns ``(id_col, lcs, prefix, score)`` — score is the
    float64 mirror of ``jaro_like_score`` (round to 4 for display).

    Scale: stateless row-local map_batches — no shuffle, no driver state;
    the per-batch kernel is one (docs × width) automaton sweep."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        lcs, prefix, score = _batch_jaro_like(
            texts, query, candidate_chars, prefix_bonus
        )
        # half-away-from-zero like DuckDB ROUND (repo oracle convention)
        from .dedup import round_half_up4_arr

        r4 = round_half_up4_arr(score)
        return pa.table(
            {
                id_col: batch[id_col],
                "lcs": pa.array(lcs, pa.int64()),
                "prefix": pa.array(prefix, pa.int64()),
                "score": pa.array(r4, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _pack_words(words: list[str]) -> tuple[np.ndarray, list[int], list[int], int, int, int]:
    """charMap LUT, per-word offsets/lengths, zm boundary mask, full mask,
    total packed length (PackedBitParallelLcs.ComputePackedLcs setup,
    src/Infidex/Metrics/PackedBitParallelLcs.cs:95-141). All positions
    derive from the LOWERED word (C# per-char ToLowerInvariant is 1:1;
    Python .lower() may expand rare codepoints — offsets/lengths must
    stay in sync with the bitmap positions, so everything uses lower)."""
    lut = np.zeros(256, dtype=np.uint64)
    offsets: list[int] = []
    lengths: list[int] = []
    bit_pos = 0
    for w in words:
        lw = w.lower()
        offsets.append(bit_pos)
        lengths.append(len(lw))
        for ch in lw:
            if ord(ch) < 256:
                lut[ord(ch)] |= np.uint64(1) << np.uint64(bit_pos)
            bit_pos += 1
    zm = 0
    for off, ln in zip(offsets, lengths):
        if ln > 1:  # all bits of the word except its last (the boundary)
            zm |= ((1 << (ln - 1)) - 1) << off
    mask = (1 << bit_pos) - 1
    return lut, offsets, lengths, zm, mask, bit_pos


def _batch_packed_lcs(
    texts: list,
    words: list[str],
    candidate_chars: int,
    prefix_bonus: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lcs matrix [docs × words], total, matched, prefix, score_f64) for
    candidate = lower(text[:candidate_chars]). The packed automaton is
    the boundary-masked Hyyrö update ``S = ((S & ZM) + (U & ZM)) |
    (S − U)`` (PackedBitParallelLcs.cs:146-155 — the ZM-masked addition
    cannot carry across a word's final bit, so one uint64 register scores
    every word at once); score is the float64 mirror of
    ComputePackedJaroScore (:199-274)."""
    n_docs = len(texts)
    k = len(words)
    lut, offsets, lengths, zm_i, mask_i, bit_pos = _pack_words(words)
    if bit_pos == 0 or bit_pos > 60:
        raise ValueError("total packed word length must be 1..60")
    if not (0 < candidate_chars <= 64):
        raise ValueError("candidate_chars must be 1..64")
    lcs_m = np.zeros((n_docs, k), dtype=np.int64)
    if n_docs == 0:
        z = np.zeros(0, dtype=np.int64)
        return lcs_m, z, z, z, np.zeros(0, dtype=np.float64)
    zm = np.uint64(zm_i)
    mask = np.uint64(mask_i)

    cands = [(t or "")[:candidate_chars].lower() for t in texts]
    clen = np.fromiter((len(c) for c in cands), dtype=np.int64, count=n_docs)
    # .lower() can EXPAND a candidate past candidate_chars (e.g. 'İ' →
    # 'i̇') — widen the matrix to the batch max so the reshape never
    # desyncs; pad columns are automaton no-ops
    width = max(candidate_chars, int(clen.max()) if n_docs else 0)
    pad = chr(0xFFFF)
    big = "".join(c + pad * (width - len(c)) for c in cands)
    codes = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).reshape(
        n_docs, width
    )

    s = np.full(n_docs, mask, dtype=np.uint64)
    small = np.where(codes < 256, codes, 0).astype(np.int64)
    has = (codes < 256).astype(np.uint64)
    for j in range(width):
        cm = lut[small[:, j]] * has[:, j]
        u = s & cm
        s = ((s & zm) + (u & zm)) | (s - u)

    inv = (~s) & mask
    bits = np.unpackbits(
        inv[:, None].view(np.uint8), axis=1, bitorder="little"
    )
    for wi, (off, ln) in enumerate(zip(offsets, lengths)):
        lcs_m[:, wi] = bits[:, off : off + ln].sum(axis=1)
    total = lcs_m.sum(axis=1)
    matched = (lcs_m > 0).sum(axis=1)

    # Winkler-style prefix: common prefix of the words' concatenated
    # lowercase chars vs the candidate (:237-261)
    qcat = "".join(w.lower() for w in words)
    qcodes = np.frombuffer(qcat.encode("utf-32-le"), dtype=np.uint32)
    kk = min(len(qcat), width)
    eq = codes[:, :kk] == qcodes[None, :kk]
    prefix = np.minimum(np.cumprod(eq, axis=1).sum(axis=1), clen)

    qlen = float(bit_pos)
    pb = float(prefix_bonus)
    pb4 = pb * 4.0
    with np.errstate(divide="ignore", invalid="ignore"):
        m = total.astype(np.float64)
        cl = clen.astype(np.float64)
        coverage = m / qlen + np.where(cl > 0, m / cl, 0.0)
        base = 0.5 * m * coverage
        max_score = np.minimum(qlen, cl) + pb4
        score = np.clip(
            (base + pb * np.minimum(prefix, 4)) / np.maximum(max_score, pb4),
            0.0,
            1.0,
        )
    score = np.where((total > 0) & (clen > 0), score, 0.0)
    return lcs_m, total, matched, prefix, score


def packed_lcs_score(
    ds,
    words: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    candidate_chars: int = 32,
    prefix_bonus: float = 0.1,
):
    """Score every doc's candidate prefix against multiple query words in
    ONE packed 64-bit LCS automaton sweep (PackedBitParallelLcs.cs:
    81-195: all words share a register, boundary masks stop carries, so
    runtime is O(candidate_chars) per doc regardless of word count).
    Returns ``(id_col, lcs_0..lcs_{k-1}, total_lcs, matched_words,
    prefix, score)`` — score is the float64 mirror of
    ComputePackedJaroScore (:199-274), rounded to 4.

    Scale: stateless row-local map_batches, no shuffle; the word pack
    (LUT + masks) is closure state built once."""
    if not words or any(not w for w in words):
        raise ValueError("words must be non-empty strings")
    # validate the pack bounds driver-side (a worker-side raise surfaces
    # as an opaque RayTaskError); lengths are LOWERED — the pack operates
    # on w.lower(), which can differ from len(w) for rare codepoints
    total_len = sum(len(w.lower()) for w in words)
    if not (0 < total_len <= 60):
        raise ValueError("total packed word length must be 1..60")
    if not (0 < candidate_chars <= 64):
        raise ValueError("candidate_chars must be 1..64")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        lcs_m, total, matched, prefix, score = _batch_packed_lcs(
            texts, words, candidate_chars, prefix_bonus
        )
        from .dedup import round_half_up4_arr

        r4 = round_half_up4_arr(score)
        cols = {id_col: batch[id_col]}
        for wi in range(len(words)):
            cols[f"lcs_{wi}"] = pa.array(lcs_m[:, wi], pa.int64())
        cols["total_lcs"] = pa.array(total, pa.int64())
        cols["matched_words"] = pa.array(matched, pa.int64())
        cols["prefix"] = pa.array(prefix, pa.int64())
        cols["score"] = pa.array(r4, pa.float64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
