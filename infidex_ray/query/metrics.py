"""String metrics on the scoring path.

Re-implements the reference's banded Levenshtein / restricted Damerau
(reference: src/Infidex/Metrics/LevenshteinDistance.cs:181-341) and the
"LCS" containment/prefix metric (src/Infidex/Metrics/StringMetrics.cs:12-36).
These are part of the rank contract: coverage matchers consume them and any
deviation changes fuzzy-match credit.
"""

from __future__ import annotations


def levenshtein(pattern: str, text: str, max_errors: int = 1 << 30, ignore_case: bool = False) -> int:
    """Plain Levenshtein with row-min early exit
    (LevenshteinDistance.Calculate, LevenshteinDistance.cs:181-257). Returns
    ``max_errors + 1`` when the distance provably exceeds ``max_errors``."""
    if not pattern:
        return len(text)
    if not text:
        return len(pattern)
    if ignore_case:
        pattern = pattern.lower()
        text = text.lower()
    if len(pattern) > len(text):
        pattern, text = text, pattern
    m = len(pattern)
    costs = list(range(m + 1))
    for j, tc in enumerate(text):
        diagonal = costs[0]
        costs[0] = j + 1
        min_cost = costs[0]
        for i in range(m):
            left = costs[i + 1]
            up = costs[i]
            if tc == pattern[i]:
                cost = diagonal
            else:
                cost = min(up + 1, left + 1, diagonal + 1)
            diagonal = left
            costs[i + 1] = cost
            if cost < min_cost:
                min_cost = cost
        if min_cost > max_errors:
            return max_errors + 1
    return costs[m]


def damerau(source: str, target: str, max_distance: int, ignore_case: bool = False) -> int:
    """Restricted Damerau-Levenshtein: plain Levenshtein, plus a single
    adjacent transposition that can save one edit
    (LevenshteinDistance.CalculateDamerau, LevenshteinDistance.cs:281-341)."""
    if abs(len(source) - len(target)) > max_distance:
        return max_distance + 1
    dist = levenshtein(source, target, max_distance + 1, ignore_case)
    if dist <= max_distance:
        return dist
    if dist <= max_distance + 1:
        s = source.lower() if ignore_case else source
        t = target.lower() if ignore_case else target
        for i in range(len(s) - 1):
            if i >= len(t):
                break
            if s[i] != t[i]:
                if i + 1 >= len(t):
                    break
                if s[i] == t[i + 1] and s[i + 1] == t[i]:
                    remaining = max_distance - 1
                    if remaining < 0:
                        return max_distance + 1
                    rest = levenshtein(s[i + 2 :], t[i + 2 :], remaining, False)
                    if rest <= remaining:
                        return 1 + rest
                break  # only the first mismatch is checked
    return dist


def damerau1(a: str, b: str) -> int:
    """``damerau(a, b, 1)`` specialised to O(n) single passes. Returns 0, 1,
    or 2 (= "more than one edit"), exactly matching the restricted
    CalculateDamerau at budget 1: one substitution, one indel, or one
    adjacent transposition with identical remainder."""
    la, lb = len(a), len(b)
    if a == b:
        return 0
    if la == lb:
        # find first mismatch
        i = 0
        while a[i] == b[i]:
            i += 1
        if a[i + 1 :] == b[i + 1 :]:
            return 1  # single substitution
        # adjacent transposition: swap fixes it iff rest identical
        if (
            i + 1 < la
            and a[i] == b[i + 1]
            and a[i + 1] == b[i]
            and a[i + 2 :] == b[i + 2 :]
        ):
            return 1
        return 2
    if abs(la - lb) != 1:
        return 2
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else 2


def lcs_containment(q: str, r: str, error_tolerance: int) -> int:
    """The reference's "LCS": containment length, else common prefix +
    tolerance, clamped to min(len(q), len(r))
    (StringMetrics.Lcs, StringMetrics.cs:12-36). Inputs must already be
    lowercased by the caller (SegmentProcessor.CalculateLcs lowers both)."""
    if not q or not r:
        return 0
    if q == r:
        return len(q)
    if q in r:
        return len(q)
    prefix_len = 0
    for a, b in zip(q, r):
        if a != b:
            break
        prefix_len += 1
    if prefix_len == 0:
        return 0
    return min(prefix_len + error_tolerance, min(len(q), len(r)))


def jaccard_of_all_chars(query: str, document: str) -> float:
    """Frequency-based character Jaccard
    (JaccardMetric.JaccardOfAllChars, src/Infidex/Metrics/JaccardMetric.cs:
    69-107): intersection = Σ min(freq_q[c], freq_d[c]);
    result = intersection / (len(q) + len(d) − intersection)."""
    if not query or not document:
        return 0.0
    from collections import Counter

    fq, fd = Counter(query), Counter(document)
    inter = sum(min(n, fd.get(c, 0)) for c, n in fq.items())
    return inter / (len(query) + len(document) - inter)


def jaccard_of_char_set(query: str, document: str) -> float:
    """Set-based character Jaccard (JaccardMetric.JaccardOfCharSet,
    :110-139)."""
    if not query or not document:
        return 0.0
    sq, sd = set(query), set(document)
    inter = len(sq & sd)
    return inter / (len(sq) + len(sd) - inter)


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity (StringMetrics.JaroSimilarity, StringMetrics.cs:
    74-135)."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    window = max(max(len1, len2) // 2 - 1, 1)
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i in range(len1):
        for j in range(max(0, i - window), min(i + window + 1, len2)):
            if m2[j] or s1[i] != s2[j]:
                continue
            m1[i] = m2[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not m1[i]:
            continue
        while not m2[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    return (
        matches / len1 + matches / len2 + (matches - transpositions / 2) / matches
    ) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler with ≤4-char prefix bonus (StringMetrics.cs:140-157)."""
    jaro = jaro_similarity(s1, s2)
    prefix_len = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix_len += 1
    return jaro + prefix_len * prefix_scale * (1.0 - jaro)


def max_edits_for_length(length: int, p: float = 0.04, alpha: float = 0.01) -> int:
    """Binomial typo model (EditDistanceModel.GetMaxEditsForLength,
    src/Infidex/Metrics/EditDistanceModel.cs:49-88): smallest d with
    Pr[Binomial(L, p) ≤ d] ≥ 1 − α."""
    if length <= 0:
        return 0
    if p <= 0.0:
        return 0
    if p >= 1.0:
        return length
    alpha = min(max(alpha, 1e-9), 0.999999999)
    target = 1.0 - alpha
    q = 1.0 - p
    prob_k = q**length
    cdf = prob_k
    k = 0
    while k < length and cdf < target:
        prob_k *= (length - k) / (k + 1) * (p / q)
        cdf += prob_k
        k += 1
    return k
