"""Word-level fuzzy candidate index (exact / LD1 symmetric-delete / affix).

Re-implements the reference WordMatcher
(src/Infidex/WordMatcher/WordMatcher.cs:82-354) per doc-range segment:

* exact index   — word (len 2-8 by config 400) → sorted local doc ids
* LD1 index     — every 1-char deletion of words len 3-8 → doc ids; query-time
  symmetric-delete lookup covers deletion/substitution/insertion (FastSS)
* affix index   — sorted word array + sorted reversed-word array replace the
  reference's FST prefix/suffix enumeration (words len ≥ 3); lookup budget
  4096 terms per query word (WordMatcher.cs:41, MaxFstAffixTermsPerQuery)

One instance per segment, built once from the segment docmap inside the query
actor (__init__) — the Ray analogue of WordMatcher.FinalizeIndex. Doc ids are
segment-local; the driver merges candidates across segments.
"""

from __future__ import annotations

import numpy as np

MAX_AFFIX_TERMS_PER_QUERY = 4096


class SegmentWordMatcher:
    def __init__(
        self,
        lower_texts: list[str],
        splitter,
        min_exact: int = 2,
        max_exact: int = 8,
        min_ld1: int = 3,
        max_ld1: int = 8,
        support_ld1: bool = True,
        support_affix: bool = True,
    ):
        self.min_exact, self.max_exact = min_exact, max_exact
        self.min_ld1, self.max_ld1 = min_ld1, max_ld1
        self.support_ld1 = support_ld1
        self.support_affix = support_affix

        # distinct (word → sorted doc ids) first, then derive the three
        # indexes per DISTINCT word — LD1 deletion variants cost
        # O(vocab × word_len), not O(occurrences × word_len) as the naive
        # per-occurrence loop did (the dominant actor cold-start term)
        word_docs: dict[str, list[int]] = {}
        for doc_idx, text in enumerate(lower_texts):
            seen: set[str] = set()
            for word in splitter.split(text):
                if word and word not in seen:
                    seen.add(word)
                    word_docs.setdefault(word, []).append(doc_idx)
        wd = {w: np.asarray(v, dtype=np.int64) for w, v in word_docs.items()}

        self.exact = {
            w: a for w, a in wd.items() if min_exact <= len(w) <= max_exact
        }
        affix_docs = (
            {w: a for w, a in wd.items() if len(w) >= min_ld1}
            if support_affix
            else {}
        )
        self.affix_docs = affix_docs
        self.ld1 = {}
        if support_ld1:
            variant_parts: dict[str, list[np.ndarray]] = {}
            for w, a in wd.items():
                if min_ld1 <= len(w) <= max_ld1:
                    for i in range(len(w)):
                        variant_parts.setdefault(w[:i] + w[i + 1 :], []).append(a)
            self.ld1 = {
                v: (p[0] if len(p) == 1 else np.unique(np.concatenate(p)))
                for v, p in variant_parts.items()
            }
        if support_affix:
            self.affix_words = np.array(sorted(affix_docs.keys()), dtype=object)
            self.affix_rev = np.array(
                sorted(w[::-1] for w in affix_docs.keys()), dtype=object
            )
        else:
            self.affix_words = np.array([], dtype=object)
            self.affix_rev = np.array([], dtype=object)

    # -- lookups ----------------------------------------------------------
    def lookup(self, word: str) -> np.ndarray:
        """Exact ∪ LD1 doc ids for one (normalized, lowered) query word
        (WordMatcher.Lookup, WordMatcher.cs:201-246)."""
        parts: list[np.ndarray] = []
        hit = self.exact.get(word)
        if hit is not None:
            parts.append(hit)
        length = len(word)
        if self.support_ld1 and self.min_ld1 <= length <= self.max_ld1:
            hit = self.ld1.get(word)  # target has 1 extra char
            if hit is not None:
                parts.append(hit)
            for i in range(length):
                deletion = word[:i] + word[i + 1 :]
                hit = self.ld1.get(deletion)  # substitution
                if hit is not None:
                    parts.append(hit)
                hit = self.exact.get(deletion)  # insertion in query
                if hit is not None:
                    parts.append(hit)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def _range(self, arr: np.ndarray, prefix: str) -> tuple[int, int]:
        lo = int(np.searchsorted(arr, prefix))
        hi = int(np.searchsorted(arr, prefix + "\U0010ffff"))
        return lo, hi

    def lookup_affix(self, word: str) -> np.ndarray:
        """Prefix ∪ suffix doc ids with a 4096-term budget
        (WordMatcher.LookupAffix, WordMatcher.cs:277-354)."""
        if not self.support_affix or len(self.affix_words) == 0:
            return np.empty(0, dtype=np.int64)
        plo, phi = self._range(self.affix_words, word)
        slo, shi = self._range(self.affix_rev, word[::-1])
        budget = MAX_AFFIX_TERMS_PER_QUERY
        terms: list[str] = []
        take = min(phi - plo, budget)
        if take > 0:
            terms.extend(self.affix_words[plo : plo + take])
            budget -= take
        take = min(shi - slo, budget)
        if take > 0:
            terms.extend(w[::-1] for w in self.affix_rev[slo : slo + take])
        if not terms:
            return np.empty(0, dtype=np.int64)
        parts = [self.affix_docs[t] for t in terms if t in self.affix_docs]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def candidates_for_query(self, query_words: list[str], cover_prefix_suffix: bool) -> np.ndarray:
        """WordMatcherLookup.Execute (src/Infidex/Scoring/WordMatcherLookup.cs:
        11-68): union of exact/LD1 (+affix) matches over query words len ≥ 2.
        Per-word unions are LRU-cached — common words ("the") union huge doc
        sets; the reference's Roaring bitmaps make this cheap, here the cache
        does (stateful actor amortization)."""
        cache = getattr(self, "_word_cache", None)
        if cache is None:
            cache = self._word_cache = {}
        parts: list[np.ndarray] = []
        for word in query_words:
            if not word or word.isspace() or len(word) < 2:
                continue
            ck = (word, cover_prefix_suffix)
            ids = cache.get(ck)
            if ids is None:
                sub = [self.lookup(word)]
                if cover_prefix_suffix:
                    sub.append(self.lookup_affix(word))
                sub = [s for s in sub if len(s)]
                ids = (
                    np.unique(np.concatenate(sub)) if sub else np.empty(0, np.int64)
                )
                if len(cache) >= 512:  # bounded actor-side cache
                    cache.pop(next(iter(cache)))
                cache[ck] = ids
            if len(ids):
                parts.append(ids)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))
