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


# --- autocomplete scoring (LCS-based) ----------------------------------------


def lcs_bitparallel(a: str, b: str) -> int:
    """Bit-parallel LCS length, Hyyrö 2004 (public algorithm; reference:
    src/Infidex/Metrics/AutocompleteScoring.cs:95-131 /
    PackedBitParallelLcs.cs). Valid for len(a) ≤ 64; case-insensitive with
    the reference's ASCII-optimized map (codepoints ≥ 256 never match)."""
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return 0
    amap: dict[str, int] = {}
    for i, c in enumerate(a.lower()):
        if ord(c) < 256:
            amap[c] = amap.get(c, 0) | (1 << i)
    mask = (1 << m) - 1
    s = mask
    for c in b.lower():
        cm = amap.get(c, 0) if ord(c) < 256 else 0
        u = s & cm
        s = ((s + u) | (s - u)) & mask
    return bin(~s & mask).count("1")


def lcs_dp(a: str, b: str) -> int:
    """Two-row DP LCS (AutocompleteScoring.ComputeLcsDP, :137-185);
    case-insensitive."""
    a, b = a.lower(), b.lower()
    if len(a) > len(b):
        a, b = b, a
    m = len(a)
    prev = [0] * (m + 1)
    for cb in b:
        curr = [0] * (m + 1)
        for i in range(1, m + 1):
            if a[i - 1] == cb:
                curr[i] = prev[i - 1] + 1
            else:
                curr[i] = max(prev[i], curr[i - 1])
        prev = curr
    return prev[m]


def lcs_length(a: str, b: str) -> int:
    """AutocompleteScoring.ComputeLcsLength (:76-92): bit-parallel for
    strings ≤ 64 chars, DP fallback beyond."""
    if not a or not b:
        return 0
    if len(a) <= 64 and len(b) <= 64:
        return lcs_bitparallel(a, b)
    return lcs_dp(a, b)


def jaro_like_score(query: str, candidate: str, prefix_bonus: float = 0.1) -> float:
    """AutocompleteScoring.ComputeJaroLikeScore (:37-70): LCS-based
    autocomplete similarity in [0, 1] with a Winkler-style prefix bonus —
    score = clamp((0.5·m·(m/|a| + m/|b|) + bonus·prefix) / max_score).
    Float32 arithmetic like the reference."""
    import numpy as np

    if not query or not candidate:
        return 0.0
    ql, cl = len(query), len(candidate)
    qlow, clow = query.lower(), candidate.lower()
    prefix = 0
    for x, y in zip(qlow, clow):
        if x != y:
            break
        prefix += 1
    m = lcs_length(query, candidate)
    if m == 0:
        return 0.0
    f = np.float32
    coverage = f(m) / f(ql) + f(m) / f(cl)
    base = f(0.5) * f(m) * coverage
    prefix_score = f(prefix_bonus) * f(prefix)
    max_score = f(min(ql, cl)) + f(prefix_bonus) * f(min(4, min(ql, cl)))
    return float(np.clip((base + prefix_score) / max(max_score, f(1.0)), 0.0, 1.0))
