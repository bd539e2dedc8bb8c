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
CHAMPION_SIZE = 64  # ShortQueryResolver.cs:23
MAX_PREFIX_LEN = 3  # word-start prefix counts cover the ≤3-char short path


def compute_short_tables(
    lower_texts: list[str],
    words: list[list[str]] | None,
    doc_keys,
    seg_id: int = 0,
    champion_size: int = CHAMPION_SIZE,
    max_prefix_len: int = MAX_PREFIX_LEN,
    flat_words: list[str] | None = None,
    wcounts: np.ndarray | None = None,
) -> dict:
    """Build-time short-query artifacts (the reference freezes these into its
    PositionalPrefixIndex at build, src/Infidex/Indexing/ShortQuery/
    PositionalPrefixIndex.cs:11-298 + ShortQueryResolver.cs:23; round 1
    recomputed them by scanning every doc text per cold query):

    * ``sq_champions.parquet`` — per single char, the segment's top-64
      entries (score = precedence + normalized base, exactly the
      SearchSingleCharacter formula), persisted in rank order;
    * ``sq_prefix.parquet``    — word-start prefix (len 1..3) → number of
      docs containing a word with that prefix (the short-query coverage
      gate's CountDocuments).

    Fully batched over the SEGMENT: one stable sort over all (doc, char)
    codepoint pairs and one over all (doc, word-start-char) pairs — no
    per-doc numpy calls, no Python char loops (the per-doc variant cost ~1 s
    per 7k-chunk segment; this is ~20×).
    """
    import pyarrow as pa

    n_docs = len(lower_texts)
    dkeys = np.asarray(doc_keys, dtype=np.int64)
    SHIFT = np.uint64(32)

    # --- (doc, char) unique pairs with first position + count -------------
    doc_lens = np.fromiter((len(t) for t in lower_texts), np.int64, count=n_docs)
    total = int(doc_lens.sum())
    prefix_counts: dict[str, int] = {}
    ch_col: list[str] = []
    sc_col: list[float] = []
    dk_col: list[int] = []
    lid_col: list[int] = []

    # shared word-derived arrays (ONE flattening pass; reused by both the
    # champion and the prefix-count blocks below). Callers that already hold
    # a flat token stream (the vectorized build path) pass flat_words +
    # wcounts directly and skip the per-doc list flattening.
    if flat_words is None:
        flat_words = [w for ws in words for w in ws]
        wcounts = np.fromiter((len(ws) for ws in words), np.int64, count=n_docs)
    total_w = len(flat_words)
    if total_w:
        wlens = np.fromiter(map(len, flat_words), np.int64, count=total_w)
        # first 3 codepoints per word, zero-padded: one utf-32 decode of the
        # unpadded concatenation + masked gathers (no per-word slicing/padding
        # genexpr — that cost ~0.08 s per 7k-chunk segment)
        cpw = np.frombuffer(
            "".join(flat_words).encode("utf-32-le"), dtype=np.uint32
        )
        woff_flat = np.zeros(total_w, dtype=np.int64)
        np.cumsum(wlens[:-1], out=woff_flat[1:])
        first3 = np.zeros((total_w, 3), dtype=np.uint32)
        for j in range(3):
            m = wlens > j
            first3[m, j] = cpw[woff_flat[m] + j]
        wdoc64 = np.repeat(np.arange(n_docs, dtype=np.uint64), wcounts)

    if total > 0:
        cp_all = np.frombuffer(
            "".join(lower_texts).encode("utf-32-le"), dtype=np.uint32
        )
        doc_of = np.repeat(np.arange(n_docs, dtype=np.uint64), doc_lens)
        offs = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(doc_lens[:-1], out=offs[1:])
        pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offs, doc_lens)
        key = (doc_of << SHIFT) | cp_all.astype(np.uint64)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        gstart = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        ucount = np.diff(np.concatenate((gstart, [len(ks)])))
        ufirst = pos_in_doc[order][gstart]  # stable → first occurrence
        upair = ks[gstart]
        udoc = (upair >> SHIFT).astype(np.int64)
        uchar = (upair & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        nu = len(upair)

        # --- (doc, word-start-char) pairs ---------------------------------
        precedence = np.zeros(nu, dtype=np.int64)
        pos_c = 200 - np.minimum(ufirst * 4, 180)
        dens_c = np.minimum(ucount * 4, 40)
        raw = np.clip(pos_c + dens_c, 0, 200)
        base = np.maximum(1, raw) / 255.0

        if total_w > 0:
            woffs = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(wcounts[:-1], out=woffs[1:])
            widx = np.arange(total_w, dtype=np.int64) - np.repeat(woffs, wcounts)
            wkey = (wdoc64 << SHIFT) | first3[:, 0].astype(np.uint64)
            worder = np.argsort(wkey, kind="stable")
            wks = wkey[worder]
            wg = np.flatnonzero(np.concatenate(([True], wks[1:] != wks[:-1])))
            w_cnt = np.diff(np.concatenate((wg, [len(wks)])))
            w_first = widx[worder][wg]
            wuk = wks[wg]

            p = np.searchsorted(wuk, upair)
            pc = np.minimum(p, len(wuk) - 1)
            has_ws = wuk[pc] == upair
            fw = w_first[pc]
            wc = w_cnt[pc]
            precedence[has_ws] |= 128
            precedence[has_ws & (fw == 0)] |= 64
            ws_raw = np.clip(
                255 - np.minimum(fw * 16, 240) + np.minimum(wc * 8, 32), 0, 255
            )
            base = np.where(has_ws, ws_raw / 255.0, base)

            # any len-1 word == char (bit 32)
            ex_mask = wlens == 1
            if ex_mask.any():
                ex_keys = np.unique(wkey[ex_mask])
                pe = np.minimum(np.searchsorted(ex_keys, upair), len(ex_keys) - 1)
                precedence[ex_keys[pe] == upair] |= 32
            # first token is that exact char (bit 16) — first word per doc is
            # flat index woffs[d] for docs with any word (vectorized; the
            # per-doc list probe needed the nested `words` representation)
            has_w = wcounts > 0
            fw_idx = woffs[has_w]
            m1 = wlens[fw_idx] == 1
            if m1.any():
                docs1 = np.flatnonzero(has_w)[m1].astype(np.uint64)
                ft_keys = np.unique(
                    (docs1 << SHIFT) | first3[fw_idx[m1], 0].astype(np.uint64)
                )
                pf = np.minimum(np.searchsorted(ft_keys, upair), len(ft_keys) - 1)
                precedence[ft_keys[pf] == upair] |= 16
        # title equals the char (bit 8)
        te_docs = np.flatnonzero(doc_lens == 1)
        if len(te_docs):
            te_keys = np.unique(
                np.asarray(
                    [(int(d) << 32) | ord(lower_texts[d]) for d in te_docs], np.uint64
                )
            )
            pt = np.minimum(np.searchsorted(te_keys, upair), len(te_keys) - 1)
            precedence[te_keys[pt] == upair] |= 8
        # small doc (≤3 words) — shares bit 32 with any_exact
        precedence[(wcounts <= 3)[udoc]] |= 32

        scores = precedence.astype(np.float64) + base
        keys_arr = dkeys[udoc]
        lids = udoc.astype(np.int32)

        # rank order within char: (-score, key asc) — same as the scan sort
        order2 = np.lexsort((keys_arr, -scores, uchar))
        chars_s = uchar[order2]
        scores_s = scores[order2]
        keys_s = keys_arr[order2]
        lids_s = lids[order2]
        group_start = np.zeros(len(chars_s), dtype=np.int64)
        new_group = np.flatnonzero(np.diff(chars_s)) + 1
        group_start[new_group] = new_group
        np.maximum.accumulate(group_start, out=group_start)
        keep = (np.arange(len(chars_s)) - group_start) < champion_size
        for c, s, k, l in zip(
            chars_s[keep].tolist(), scores_s[keep].tolist(),
            keys_s[keep].tolist(), lids_s[keep].tolist(),
        ):
            ch_col.append(chr(c))
            sc_col.append(s)
            dk_col.append(k)
            lid_col.append(l)

    # --- word-start prefix (len 1..3) doc counts, vectorized --------------
    # doc-distinct (doc, packed-prefix) pairs per length via one lexsort;
    # codepoints fit 21 bits so 3 chars pack into one uint64 key
    if total_w > 0:
        for L in range(1, min(max_prefix_len, 3) + 1):
            mask = wlens >= L
            if not mask.any():
                continue
            key = first3[mask, 0].astype(np.uint64)
            for j in range(1, L):
                key = (key << np.uint64(21)) | first3[mask, j].astype(np.uint64)
            doc = wdoc64[mask]
            order = np.lexsort((doc, key))
            k_s, d_s = key[order], doc[order]
            dm = np.ones(len(k_s), dtype=bool)
            dm[1:] = (k_s[1:] != k_s[:-1]) | (d_s[1:] != d_s[:-1])
            k_u = k_s[dm]
            starts = np.flatnonzero(np.concatenate(([True], k_u[1:] != k_u[:-1])))
            counts = np.diff(np.concatenate((starts, [len(k_u)])))
            for pk, c in zip(k_u[starts].tolist(), counts.tolist()):
                chs = []
                for j in range(L - 1, -1, -1):
                    chs.append(chr((pk >> (21 * j)) & 0x1FFFFF))
                prefix_counts["".join(chs)] = int(c)
    champs = pa.table(
        {
            "ch": pa.array(ch_col, pa.large_string()),
            "score": pa.array(sc_col, pa.float64()),
            "doc_key": pa.array(dk_col, pa.int64()),
            "lid": pa.array(lid_col, pa.int32()),
        }
    )
    pref_sorted = sorted(prefix_counts.items())
    prefixes = pa.table(
        {
            "prefix": pa.array([p for p, _ in pref_sorted], pa.large_string()),
            "n_docs": pa.array([n for _, n in pref_sorted], pa.int64()),
        }
    )
    return {"sq_champions.parquet": champs, "sq_prefix.parquet": prefixes}


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

    CHAMPION_SIZE = CHAMPION_SIZE

    @property
    def _champ_map(self) -> dict | None:
        """Frozen per-char champion lists from the build artifact
        (sq_champions.parquet; see compute_short_tables). None when the
        segment predates the artifact → scan fallback."""
        m = getattr(self, "_champ_map_cache", False)
        if m is False:
            tables = getattr(self.seg, "short_tables", None) or {}
            t = tables.get("sq_champions.parquet")
            if t is None:
                m = None
            else:
                m = {}
                sid = self.seg.seg_id
                for ch, sc, dk, lid in zip(
                    t["ch"].to_pylist(),
                    t["score"].to_pylist(),
                    t["doc_key"].to_pylist(),
                    t["lid"].to_pylist(),
                ):
                    m.setdefault(ch, []).append((sc, dk, 0, sid, lid))
            self._champ_map_cache = m
        return m

    def champions(self, ch: str) -> list[tuple]:
        """Top-64 single-char entries per segment — read from the build-time
        champion artifact when present (PositionalPrefixIndex semantics), else
        computed once per char by scan. Exact for any global top-k ≤ 64:
        per-doc scores are independent, so the global top-k is contained in
        the union of per-segment champions."""
        cm = self._champ_map
        if cm is not None:
            return cm.get(ch, [])
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
    def _char_term_maps(self):
        """char → sorted term indices containing it, and char → term indices
        containing ' '+char (word boundary). Built once per segment per actor
        — bounds the fuzzy fallback to the matching terms instead of the
        round-1 per-QUERY O(vocab) Python scan over the dictionary."""
        maps = getattr(self, "_ctm", None)
        if maps is None:
            char_map: dict[str, list[int]] = {}
            boundary_map: dict[str, list[int]] = {}
            for ti, term in enumerate(self.seg.terms):
                text = str(term)
                for c in set(text):
                    char_map.setdefault(c, []).append(ti)
                bset = {
                    text[j + 1] for j in range(len(text) - 1) if text[j] == " "
                }
                for c in bset:
                    boundary_map.setdefault(c, []).append(ti)
            maps = self._ctm = (
                {c: np.asarray(v, dtype=np.int64) for c, v in char_map.items()},
                {c: np.asarray(v, dtype=np.int64) for c, v in boundary_map.items()},
            )
        return maps

    def fuzzy_pass(
        self,
        patterns: list[str],
        search_lower: str,
        doc_scores: dict[int, int],
        first_prefix: set[int],
    ) -> None:
        seg = self.seg
        char_map, boundary_map = self._char_term_maps()
        qchars = set(search_lower)
        cand_parts = [char_map[c] for c in qchars if c in char_map]
        if not cand_parts:
            return
        cand = cand_parts[0] if len(cand_parts) == 1 else np.union1d(
            cand_parts[0], np.concatenate(cand_parts[1:])
        )
        # drop terms already accumulated by a prefix pattern (startswith(p)
        # is exactly the sorted-dictionary range of p)
        keep = np.ones(len(cand), dtype=bool)
        for p in patterns:
            lo, hi = seg.term_prefix_range(p)
            if hi > lo:
                keep &= ~((cand >= lo) & (cand < hi))
        bound_parts = [boundary_map[c] for c in qchars if c in boundary_map]
        bset = (
            set(np.concatenate(bound_parts).tolist()) if bound_parts else set()
        )
        checked_prefix: set[int] = set(doc_scores.keys())
        for ti in cand[keep].tolist():
            self._accumulate_term(
                ti,
                2 if ti in bset else 1,
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
    @property
    def _prefix_counts(self) -> dict | None:
        pc = getattr(self, "_prefix_counts_cache", False)
        if pc is False:
            tables = getattr(self.seg, "short_tables", None) or {}
            t = tables.get("sq_prefix.parquet")
            pc = (
                dict(zip(t["prefix"].to_pylist(), t["n_docs"].to_pylist()))
                if t is not None
                else None
            )
            self._prefix_counts_cache = pc
        return pc

    def count_word_start_docs(self, prefix: str) -> int:
        pc = self._prefix_counts
        if pc is not None and len(prefix) <= MAX_PREFIX_LEN:
            return pc.get(prefix, 0)
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
