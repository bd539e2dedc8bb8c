"""ASCII-whitespace tokenization shared by ops whose DuckDB oracles split
with RE2 ``\\s`` / ``\\S``.

RE2 (DuckDB's regex engine) defines ``\\s`` as the ASCII class
``[\\t\\n\\x0b\\x0c\\r ]`` — Python's ``str.split()`` and un-flagged
``re`` ``\\s`` additionally treat NBSP/NEL/U+2028/etc. as whitespace, which
silently diverges from the SQL oracle on corpora containing exotic
whitespace (the round-3 driver ``repetition_signals`` hash FAIL).  Every op
that mirrors a ``string_split_regex(text, '\\s+')`` or
``regexp_extract_all(text, '\\S+')`` oracle must tokenize through this
module, never through bare ``str.split()``.
"""

from __future__ import annotations

import re

# Exactly RE2's \s (== Python re.ASCII \s).
ASCII_WS_RE = re.compile(r"[\t\n\x0b\x0c\r ]+")


def split_ascii_ws(text: str) -> list[str]:
    """Tokens of ``text`` split on runs of ASCII whitespace, empties dropped
    — elementwise identical to DuckDB
    ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')`` and to
    ``regexp_extract_all(text, '\\S+')``."""
    return [w for w in ASCII_WS_RE.split(text) if w]
