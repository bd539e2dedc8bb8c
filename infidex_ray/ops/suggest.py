"""Type-ahead completion backend: top corpus-vocabulary completions per
prefix — the data-pipeline job behind "suggest as you type" (the serving
engine's short-query path ranks DOCUMENTS for a prefix; this op ranks
WORDS, the offline table an autocomplete service loads).

Rank rule (deterministic, SQL-mirrorable): candidates are lowered
ASCII-whitespace corpus tokens starting with the (lowered) prefix,
ordered by document frequency desc, then lexicographic. df = number of
documents containing the token.

Scale: the corpus streams once — per batch, distinct (doc, token) pairs
fold into df partials for PREFIX-MATCHING tokens only (one vectorized
``starts_with`` pass per prefix over the batch dictionary); the driver
reduce sums O(matching vocab × blocks) rows, bounded by the prefixes'
namespace, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .asciiws import flat_tokens_arrow


def prefix_suggest(
    ds,
    prefixes: list[str],
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-``top_k`` completions per prefix. Output: ``(prefix, rank,
    suggestion, df)`` with rank 1-based; prefixes yielding no candidate
    emit nothing."""
    import pyarrow.compute as pc
    import ray

    plist = sorted({(p or "").lower() for p in prefixes if (p or "").strip()})
    if not plist:
        raise ValueError("prefixes must contain at least one non-empty string")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_of = flat_tokens_arrow(batch[text_col], lower_text=True)
        enc = flat.dictionary_encode()
        words = enc.dictionary
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        match = np.zeros(len(words), dtype=bool)
        for p in plist:
            match |= pc.starts_with(words, pattern=p).to_numpy(
                zero_copy_only=False
            )
        wanted = np.flatnonzero(match)
        if len(wanted) == 0 or len(idx) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.large_string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # distinct (doc, word) for matching words → per-word df partial
        sel = match[idx]
        pairs = np.unique(
            np.stack([doc_of[sel], idx[sel]], axis=1), axis=0
        )
        dfp = np.bincount(pairs[:, 1], minlength=len(words))
        return pa.table(
            {
                "word": words.take(pa.array(wanted)).cast(pa.large_string()),
                "n": pa.array(dfp[wanted], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, int] = {}
    for r in rows:
        agg[r["word"]] = agg.get(r["word"], 0) + int(r["n"])
    out = {"prefix": [], "rank": [], "suggestion": [], "df": []}
    for p in plist:
        cands = sorted(
            ((w, df) for w, df in agg.items() if w.startswith(p)),
            key=lambda e: (-e[1], e[0]),
        )[:top_k]
        for r, (w, df) in enumerate(cands):
            out["prefix"].append(p)
            out["rank"].append(r + 1)
            out["suggestion"].append(w)
            out["df"].append(df)
    return ray.data.from_arrow(
        pa.table(
            {
                "prefix": pa.array(out["prefix"], pa.string()),
                "rank": pa.array(out["rank"], pa.int64()),
                "suggestion": pa.array(out["suggestion"], pa.string()),
                "df": pa.array(out["df"], pa.int64()),
            }
        )
    )
