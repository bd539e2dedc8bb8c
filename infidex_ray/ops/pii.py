"""PII redaction: scrub emails / IPv4 addresses / phone numbers from text.

A standard compliance pass before web text enters a training corpus (public
recipe — e.g. the C4 / RefinedWeb cleanup steps). Patterns are applied in
order (email → ip → phone) on the progressively redacted text, so counts are
"matches at that stage" and a redacted placeholder can never re-match.

Scale design: a single stateless ``map_batches`` built ONLY from Arrow
compute kernels (``replace_substring_regex`` / ``count_substring_regex``) —
fully vectorized, zero Python per row, and the regex engine is RE2, i.e.
byte-identical semantics to the DuckDB oracle's ``regexp_replace(..., 'g')``
/ ``regexp_extract_all`` (also RE2). Patterns therefore avoid constructs RE2
lacks (backrefs, lookaround).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["PII_PATTERNS", "pii_redact"]

# (name, RE2 pattern, replacement) — applied in order. ASCII digit classes
# (not \d) so RE2 and any Python cross-check agree on unicode text.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+?[0-9][0-9() \-]{7,}[0-9]",
        "<PHONE>",
    ),
)


def pii_redact_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple = PII_PATTERNS,
) -> pa.Table:
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    text = pc.coalesce(col, pa.scalar("", pa.string()))
    cols: dict = {id_col: batch[id_col]}
    counts = {}
    for name, pattern, repl in patterns:
        counts[f"n_{name}s"] = pc.count_substring_regex(text, pattern)
        text = pc.replace_substring_regex(text, pattern, repl)
    cols[text_col] = text
    for k, v in counts.items():
        cols[k] = v.cast(pa.int64())
    return pa.table(cols)


def pii_redact(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple = PII_PATTERNS,
):
    """Dataset wrapper: ``(id_col, text redacted, n_emails, n_ips,
    n_phones)`` — one row per input row, no shuffle."""
    import functools

    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(
            pii_redact_batch, id_col=id_col, text_col=text_col, patterns=patterns
        ),
        batch_format="pyarrow",
    )
