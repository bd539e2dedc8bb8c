"""Phrase-blocklist scanning — the safety/compliance filter of a
training-data pipeline (drop or flag documents containing any of a curated
phrase list: slurs, PII markers, boilerplate legal text, eval-set canaries).

Scale shape: the phrase list is the small side (curated lists are 10²–10⁵
entries) and is broadcast ONCE via ``ray.put``; the corpus streams through a
stateless ``map_batches`` where each phrase is one vectorized Arrow
``match_substring`` pass over the batch (C++ memmem, no Python loop over
rows). Cost is O(|phrases| × batch bytes) — fine for curated lists; for
dictionary-sized lists (>10⁵) tokenize and hash-join against the corpus
token stream instead (see ``ops.decontam`` for that shape).

Matching is literal byte substring (case-sensitive), bijective with the
DuckDB oracle's ``contains(text, phrase)`` — callers wanting
case-insensitive matching normalize both sides first.

No reference-engine analogue (pure beyond-reference training-data op).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["phrase_scan", "phrase_filter"]


def phrase_scan(ds, phrases, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document phrase-hit report: ``(id, n_phrases_hit, flagged)``.

    ``n_phrases_hit`` counts how many DISTINCT phrases occur in the doc
    (not occurrence counts); ``flagged`` is ``n_phrases_hit > 0``.
    """
    import ray

    plist = [p for p in phrases if p]
    phrases_ref = ray.put(tuple(plist))

    def scan(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ps = ray.get(phrases_ref)
        col = batch[text_col]
        n = len(batch)
        hits = np.zeros(n, dtype=np.int64)
        if n and not pa.types.is_null(col.type):
            for p in ps:
                m = pc.match_substring(col, p)
                hits += (
                    m.fill_null(False).to_numpy(zero_copy_only=False).astype(np.int64)
                )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_phrases_hit": pa.array(hits),
                "flagged": pa.array(hits > 0),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow"
    )


def phrase_filter(
    ds, phrases, id_col: str = "doc_id", text_col: str = "text", keep_flagged: bool = False
):
    """Drop (default) or keep-only documents containing any listed phrase —
    same broadcast + vectorized-substring scan, but filtering the full rows
    in place so the surviving corpus streams on with all its columns."""
    import ray

    plist = [p for p in phrases if p]
    phrases_ref = ray.put(tuple(plist))

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ps = ray.get(phrases_ref)
        col = batch[text_col]
        if len(batch) == 0 or pa.types.is_null(col.type):
            return batch if not keep_flagged else batch.slice(0, 0)
        flagged = np.zeros(len(batch), dtype=bool)
        for p in ps:
            m = pc.match_substring(col, p)
            flagged |= m.fill_null(False).to_numpy(zero_copy_only=False)
        keep = flagged if keep_flagged else ~flagged
        return batch.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")
