"""Training-sample chunking: split documents into fixed word-count windows.

The standard prep step between cleaned web text and a tokenizer/packer:
every document becomes ⌈L / stride⌉ overlapping (or disjoint, when stride ==
chunk_words) windows of whitespace tokens. The reference engine chunks
internally for indexing (Indexing/DocumentChunker semantics); this op is the
standalone corpus-level version a training pipeline needs.

Scale design: a single stateless ``map_batches`` — each input block expands
to ~L/stride output rows locally, no shuffle; output block size is bounded
by the input block size × (1 + chunk/stride overlap factor), so streaming
backpressure holds. Tokens are raw ``str.split()`` whitespace words and
chunks re-join with a single space — byte-bijective with the DuckDB oracle's
``array_to_string(w[p:p+chunk-1], ' ')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .asciiws import split_ascii_ws

__all__ = ["chunk_text", "split_sentences"]


def chunk_text(
    ds,
    chunk_words: int = 64,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Split each doc's whitespace tokens into windows of ``chunk_words``
    starting every ``stride`` tokens (default: disjoint, stride =
    chunk_words). Emits ``(id_col, chunk_id, n_tokens, chunk)`` — one row per
    window whose start lies inside the doc; empty docs emit nothing.
    """
    if stride is None:
        stride = chunk_words
    if chunk_words < 1 or stride < 1:
        raise ValueError("chunk_words and stride must be >= 1")

    def split(batch: pa.Table) -> pa.Table:
        ids_in = batch[id_col].to_pylist()
        out_ids: list = []
        chunk_ids: list[int] = []
        n_tok: list[int] = []
        chunks: list[str] = []
        for did, t in zip(ids_in, batch[text_col].to_pylist()):
            ws = split_ascii_ws(t or "")
            L = len(ws)
            for k, p in enumerate(range(0, L, stride)):
                w = ws[p : p + chunk_words]
                out_ids.append(did)
                chunk_ids.append(k)
                n_tok.append(len(w))
                chunks.append(" ".join(w))
        return pa.table(
            {
                id_col: pa.array(out_ids, batch[id_col].type),
                "chunk_id": pa.array(np.asarray(chunk_ids, dtype=np.int64)),
                "n_tokens": pa.array(np.asarray(n_tok, dtype=np.int64)),
                "chunk": pa.array(chunks, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        split, batch_format="pyarrow"
    )


SENTENCE_SPLIT_RE = r"[.!?]+[\t\n\x0b\x0c\r ]+"


def split_sentences(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = SENTENCE_SPLIT_RE,
):
    """Explode documents into sentences: one row per non-empty sentence with
    a per-doc index — the unit-of-text step ahead of sentence-level dedup /
    embedding. Split runs RE2 (Arrow ``split_pattern_regex``), so a DuckDB
    ``string_split_regex`` oracle is engine-identical; the boundary
    punctuation is consumed by the split on BOTH sides (RE2 has no
    lookbehind, so keep-the-delimiter is not expressible — the contract is
    'terminator consumed').

    Vectorized: one split kernel per batch, flat child values + offsets, no
    per-row Python."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        parts = pc.split_pattern_regex(texts, pattern=pattern).combine_chunks()
        counts = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
        flat = parts.flatten()
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = doc_of[keep]
        flat = flat.filter(pa.array(keep))
        # per-doc sentence index after the empty filter: doc_of stays grouped
        # contiguous, so idx = position - first position of the doc's run
        if len(doc_of):
            starts = np.flatnonzero(np.diff(doc_of, prepend=doc_of[0] - 1))
            run_lens = np.diff(np.append(starts, len(doc_of)))
            idx = np.arange(len(doc_of), dtype=np.int64) - np.repeat(
                starts, run_lens
            )
        else:
            idx = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of]),
                "sent_idx": pa.array(idx),
                "sentence": flat,
                "n_chars": pc.cast(pc.utf8_length(flat), pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
