"""Auto-segmentation of long documents into overlapping chunks.

Port of the reference's AutoSegmenter utility
(src/Infidex/Core/AutoSegmenter.cs:39-230; config 400 ships
AutoSegmentationSetup(targetSegmentSize=200, overlapRatio=0.2),
ConfigurationParameters.cs:114). Each chunk becomes its own internal
document sharing the source DocumentKey (SegmentNumber machinery,
Document.cs:31); consolidation keeps the best-scoring chunk per key.

Opt-in at build time (`EngineConfig.auto_segment`): the reference engine also
leaves invocation to the caller. Essential for web-page corpora — it bounds
coverage/fusion work per candidate to ~target_size chars.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AutoSegmentSetup:
    target_segment_size: int = 200
    overlap_ratio: float = 0.2


_RANGE_RE_CACHE: dict = {}


def _word_ranges(text: str, delimiters: frozenset[str]) -> list[tuple[int, int]]:
    """Spans of non-delimiter runs (compiled regex — the per-char Python
    loop was a per-chunk hotspot in the build profile)."""
    import re

    if not delimiters:
        return [(0, len(text))] if text else []
    pat = _RANGE_RE_CACHE.get(delimiters)
    if pat is None:
        cls = "".join(re.escape(c) for c in sorted(delimiters))
        pat = _RANGE_RE_CACHE[delimiters] = re.compile(f"[^{cls}]+")
    return [m.span() for m in pat.finditer(text)]


def segment_text(
    text: str, setup: AutoSegmentSetup, delimiters: frozenset[str]
) -> list[str]:
    """AutoSegmenter.SegmentSingleDocument (:55-179): returns the chunk texts
    (index = SegmentNumber). Short texts pass through unchanged."""
    if not text:
        return [text]
    target = setup.target_segment_size
    overlap = setup.overlap_ratio
    length = len(text)
    num_segments = round((length + overlap * target) / (target - target * overlap))
    if num_segments < 2.0:
        return [text]

    ranges = _word_ranges(text, delimiters)
    word_count = len(ranges)
    if word_count <= 1:
        return [text]

    target_size = length / num_segments * (1.0 + overlap)

    chunks: list[str] = []
    current_word = 0
    segment_num = 0
    while current_word < word_count:
        end_word = _find_segment_end(
            current_word, ranges, word_count, round(target_size),
            segment_num == int(num_segments) - 1,
        )
        start_pos = ranges[current_word][1] if current_word > 0 else ranges[0][0]
        end_pos = ranges[end_word][1] if end_word < word_count else 0
        if end_pos == 0:
            end_pos = ranges[word_count - 1][1]
        if end_pos < start_pos:
            break
        segment = text[start_pos:end_pos]
        if not segment:
            break
        chunks.append(segment)
        if end_word >= word_count:
            break
        overlap_chars = int((end_pos - start_pos) * overlap)
        backtrack = _find_backtrack(end_word, ranges, overlap_chars)
        segment_num += 1
        current_word = backtrack + 1
        if backtrack <= 0:
            current_word = 1
    return chunks or [text]


def _find_segment_end(start_word, ranges, word_count, target_size, is_last) -> int:
    if is_last:
        return word_count
    current = previous = 0
    start_pos = ranges[start_word][1] if start_word > 0 else ranges[0][0]
    i = start_word
    for i in range(start_word, word_count):
        previous = current
        current = ranges[i][1] - start_pos
        if current >= target_size:
            break
    overshot = current - target_size
    undershot = target_size - previous
    return max(i - 1, 0) if undershot < overshot else min(i, word_count)


def _find_backtrack(end_word, ranges, overlap_chars) -> int:
    current = previous = 0
    i = end_word - 1
    for i in range(end_word - 1, 0, -1):
        previous = current
        current = ranges[end_word][1] - ranges[i][1]
        if current >= overlap_chars:
            break
    overshot = current - overlap_chars
    undershot = overlap_chars - previous
    return i - 1 if undershot < overshot else i
