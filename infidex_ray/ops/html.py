"""HTML → text extraction stage for Common-Crawl-style corpora.

The BASELINE input carries both ``html:binary`` and ``text:string``; when only
html is present, this stage derives the text column. Deterministic,
dependency-free extraction (no parser libraries in this environment):
drop script/style/head subtrees, strip tags, unescape entities, collapse
whitespace. Runs as a plain ``map_batches`` stage ahead of the index build;
the per-url byte-identical invariant then applies to ITS output.
"""

from __future__ import annotations

import html as _htmllib
import re

import pyarrow as pa

_DROP_SUBTREES = re.compile(
    r"<(script|style|head|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAGS = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    r"footer|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def html_to_text(html_bytes: bytes | None) -> str:
    """Extract readable text from one HTML payload (deterministic)."""
    if not html_bytes:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _COMMENTS.sub(" ", raw)
    raw = _DROP_SUBTREES.sub(" ", raw)
    raw = _BLOCK_TAGS.sub(" ", raw)  # block boundaries become whitespace
    raw = _ANY_TAG.sub("", raw)
    raw = _htmllib.unescape(raw)
    return _WS.sub(" ", raw).strip()


def extract_text_batch(
    batch: pa.Table, html_col: str = "html", out_col: str = "text"
) -> pa.Table:
    """map_batches stage: html binary column → extracted text column
    (replaces ``out_col`` if present)."""
    texts = [html_to_text(b) for b in batch[html_col].to_pylist()]
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(texts, pa.string()))


def extract_text(ds, html_col: str = "html", out_col: str = "text"):
    """Dataset-level wrapper; drops the heavy html column afterwards so only
    the extracted text flows into the index build."""

    def fn(batch: pa.Table) -> pa.Table:
        out = extract_text_batch(batch, html_col, out_col)
        return out.drop_columns([html_col])

    return ds.map_batches(fn, batch_format="pyarrow")
