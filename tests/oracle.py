"""Slow sequential oracle mirroring the reference control flow literally.

Used double-entry: the Ray/numpy engine must produce identical stage-1
results. Follows SearchEngine.IndexDocuments → VectorModel.IndexDocument →
Term.FirstCycleAdd → BuildInvertedLists → SearchWithMaxScore →
TieredCandidateSelector → Bm25Scorer step by step (single segment,
field weight 1.0)."""

from __future__ import annotations

import numpy as np

from infidex_ray.analyzer import normalize, tokenize_for_indexing, tokenize_for_search
from infidex_ray.config import EngineConfig

F = np.float32
K1, B, DELTA = F(1.2), F(0.75), F(1.0)


def _lev1(a: str, b: str) -> bool:
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


class OracleTerm:
    def __init__(self):
        self.df = 0
        self.doc_ids: list[int] = []
        self.weights: list[int] = []

    def count_usage(self, stop_limit):
        if self.df == -1:
            return
        self.df += 1
        if self.df > stop_limit:
            self.df = -1

    def first_cycle_add(self, doc, stop_limit, field_weight=1.0):
        if self.df < 0:
            return
        if len(self.weights) < stop_limit:
            if not self.doc_ids or self.doc_ids[-1] != doc:
                self.doc_ids.append(doc)
                self.weights.append(int(min(round(field_weight), 255)))
            else:
                new_w = self.weights[-1] + field_weight
                if new_w <= 255:
                    self.weights[-1] = int(round(new_w))
                    self.df -= 1
        else:
            self.df = -1
            self.doc_ids.clear()
            self.weights.clear()


class OracleEngine:
    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        self.terms: dict[str, OracleTerm] = {}
        self.doc_keys: list[int] = []
        self.texts: list[str] = []
        self.doc_len: np.ndarray | None = None
        self.avgdl = 0.0

    def index(self, docs: list[tuple[int, str]]):
        cfg = self.cfg
        for key, text in docs:
            doc_id = len(self.doc_keys)
            self.doc_keys.append(key)
            self.texts.append(text)
            itext = normalize(text).lower()
            for tok, _pos in tokenize_for_indexing(
                itext, cfg.index_sizes, cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters
            ):
                t = self.terms.setdefault(tok, OracleTerm())
                t.count_usage(cfg.stop_term_limit)
                t.first_cycle_add(doc_id, cfg.stop_term_limit)
        n = len(self.doc_keys)
        self.doc_len = np.zeros(n, dtype=np.float32)
        for t in self.terms.values():
            if t.df <= 0:
                continue
            for d, w in zip(t.doc_ids, t.weights):
                self.doc_len[d] += w
        self.avgdl = float(self.doc_len.sum() / n) if n else 0.0

    # --- query -----------------------------------------------------------
    def _idf(self, df: int) -> np.float32:
        if df <= 0:
            return F(0)
        n, d = F(len(self.doc_keys)), F(df)
        ratio = (n - d + F(0.5)) / (d + F(0.5))
        return F(np.log(ratio + F(1))) if ratio > 0 else F(0)

    def stage1(self, query: str, top_k: int):
        cfg = self.cfg
        q = normalize(query.strip()).lower()
        toks = sorted(
            tokenize_for_search(
                q, cfg.index_sizes, cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters
            )
        )
        uniq: list[str] = []
        for t in toks:
            if not uniq or uniq[-1] != t:
                uniq.append(t)
        avgdl = F(self.avgdl if self.avgdl > 0 else 1.0)
        infos = []  # (text, df, idf, max_score, docs, weights)
        for t in uniq:
            term = self.terms.get(t)
            df = term.df if term else 0
            docs, weights = (term.doc_ids, term.weights) if term else ([], [])
            if df == 0 and len(t) >= 4:
                # fuzzy LD1 union "virtual term" (VectorModel.ExpandMissingTerm)
                union = set()
                for text2, t2 in self.terms.items():
                    if t2.df > 0 and _lev1(t, text2) and text2 != t:
                        union |= set(t2.doc_ids)
                if union:
                    docs = sorted(union)
                    weights = [1] * len(docs)
                    df = len(docs)
            if df <= 0 or df > cfg.stop_term_limit:
                continue
            idf = self._idf(df)
            min_dl_norm = F(1) - B + B * (F(1) / avgdl)
            max_core = (F(255) * (K1 + F(1))) / (F(255) + K1 * min_dl_norm)
            infos.append((t, df, idf, idf * (max_core + DELTA), docs, weights))

        if not infos:
            return []
        # candidate selection
        cands = self._select(infos, top_k)
        scores: dict[int, np.float32] = {}
        for t, df, idf, ms, docs, weights in infos:
            if idf <= 0:
                continue
            wmap = dict(zip(docs, weights))
            for d in cands:
                if d in wmap:
                    tf = F(wmap[d])
                    dl = F(self.doc_len[d]) if self.doc_len[d] > 0 else F(1)
                    norm = K1 * (F(1) - B + B * (dl / avgdl))
                    core = (tf * (K1 + F(1))) / (tf + norm)
                    scores[d] = scores.get(d, F(0)) + idf * (core + DELTA)
        entries = [
            (float(s), self.doc_keys[d]) for d, s in scores.items() if s > 0
        ]
        entries.sort(key=lambda e: (-e[0], e[1]))
        return entries[:top_k]

    def _select(self, infos, top_k):
        live = [(i, set(docs)) for i, (t, df, idf, ms, docs, w) in enumerate(infos) if df > 0]
        if not live:
            return set()
        has_typo = any(infos[i][1] < 10 for i, _ in live)
        max_idf = max(float(infos[i][2]) for i, _ in live)
        if has_typo or len(infos) == 1:
            # disjunctive
            order = sorted(live, key=lambda x: -float(infos[x[0]][2]))
            union: set[int] = set()
            has_sel = False
            for i, docs in order:
                low_q = float(infos[i][2]) < max_idf * 0.2
                if len(live) > 1 and low_q and has_sel:
                    continue
                union |= docs
                if not low_q and len(union) > 0:
                    has_sel = True
                if len(union) >= top_k * 100:
                    break
            return union
        order = sorted(live, key=lambda x: -float(infos[x[0]][2]))
        out: set[int] = set()
        if len(order) >= 2:
            tier0 = set.intersection(*[d for _, d in order])
            out |= tier0
            if len(out) >= top_k * 2:
                return out
        if len(order) >= 3 and len(out) < top_k * 3:
            out |= set.intersection(*[d for _, d in order[:-1]])
        if len(out) < top_k * 5:
            cutoff = max_idf * 0.3
            sel = [x for x in order if float(infos[x[0]][2]) > 0 and float(infos[x[0]][2]) >= cutoff][:2]
            for i, docs in sel:
                out |= docs
                if len(out) >= top_k * 10:
                    break
        return out
