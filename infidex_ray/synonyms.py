"""Synonym canonicalization (union-find equivalence classes).

Port of the reference SynonymMap (src/Infidex/Synonyms/SynonymMap.cs:1-200):
bidirectional synonym pairs/groups collapse to a canonical representative via
disjoint-set union; ``canonicalize_text`` replaces every word token that has
a mapping with its class representative, preserving delimiters exactly.
Applied to the analyzed text at index time (VectorModel.cs:90-93), to the
query in Search, and to the coverage document text per candidate
(SearchPipeline.ProcessCandidate, :482-489). Off by default (CreateDefault
passes no map)."""

from __future__ import annotations


class SynonymMap:
    def __init__(self, groups=()):
        self._parent: dict[str, str] = {}
        self._rank: dict[str, int] = {}
        for group in groups:
            self.add_group(group)

    # -- construction ------------------------------------------------------
    def add_synonym(self, term1: str, term2: str) -> None:
        if not term1 or not term2 or term1.isspace() or term2.isspace():
            return
        term1 = term1.strip().lower()
        term2 = term2.strip().lower()
        if term1 == term2:
            return
        self._union(term1, term2)

    def add_group(self, terms) -> None:
        terms = [t for t in terms if t and not t.isspace()]
        for other in terms[1:]:
            self.add_synonym(terms[0], other)

    # -- union-find --------------------------------------------------------
    def _ensure(self, term: str) -> None:
        if term not in self._parent:
            self._parent[term] = term
            self._rank[term] = 0

    def _find(self, term: str) -> str:
        root = term
        while self._parent[root] != root:
            root = self._parent[root]
        while self._parent[term] != root:  # path compression
            self._parent[term], term = root, self._parent[term]
        return root

    def _union(self, a: str, b: str) -> None:
        self._ensure(a)
        self._ensure(b)
        ra, rb = self._find(a), self._find(b)
        if ra == rb:
            return
        if self._rank[ra] < self._rank[rb]:
            ra, rb = rb, ra
        self._parent[rb] = ra
        if self._rank[ra] == self._rank[rb]:
            self._rank[ra] += 1

    # -- lookup / canonicalization ----------------------------------------
    @property
    def has_mappings(self) -> bool:
        return bool(self._parent)

    def canonical(self, term: str) -> str:
        low = term.lower()
        if low not in self._parent:
            return term
        return self._find(low)

    def canonicalize_text(self, text: str, delimiters: frozenset[str]) -> str:
        """SynonymMap.CanonicalizeText (:153-186): replace word tokens with
        their canonical form, delimiters preserved exactly."""
        if not text or not self._parent:
            return text
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            c = text[i]
            if c in delimiters:
                out.append(c)
                i += 1
                continue
            start = i
            while i < n and text[i] not in delimiters:
                i += 1
            out.append(self.canonical(text[start:i]))
        return "".join(out)
