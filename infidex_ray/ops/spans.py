"""Exact duplicate-span (substring) statistics across a corpus.

Per document: how many of its word n-gram POSITIONS are exact duplicates of
an n-gram that also appears in other documents — the bounded n-gram-window
form of suffix-array substring dedup (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", public paper). Unlike
document-level MinHash/SimHash dedup (``ops/dedup.py``), this catches
*partial* overlap: boilerplate headers, quoted passages, licence blocks
embedded in otherwise-unique pages. The reference engine has no analogue;
beyond-reference LLM-corpus op.

Scale shape (100 TB honest):

* one emission row per DISTINCT (doc, gram-hash) carrying the in-doc
  multiplicity — token-scale, the same order of magnitude as an index
  build's term stream, pre-deduplicated per doc inside ``map_batches``;
* the duplicated-gram set is a gram-keyed ``groupby().count()`` (one row per
  doc per gram, so ``count`` IS the distinct-doc count) — no skew beyond
  what real boilerplate produces, and those hot grams are exactly the
  signal;
* one gram-keyed inner join back plus a doc-keyed left join for totals —
  both distributed ``Dataset.join``s via ``_join_partitions`` (Ray 2.49
  chained-join deadlock gating as in ``ops/dedup._attach_sketches``); no
  driver-side state at any point.

Tokenization is the oracle-parity ASCII-whitespace split
(``ops/asciiws.split_ascii_ws``); grams are compared by the uint64
polynomial hash of the word-hash window (bijective with the space-joined
gram string modulo negligible collisions — same contract as
``ops/decontam``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .asciiws import split_ascii_ws
from .dedup import (
    _MIX1,
    _MIX2,
    _join_partitions,
    _word_hashes,
    round_half_up4_arr,
)

__all__ = ["duplicate_spans"]


def _gram_hashes_positional(wh: np.ndarray, n: int) -> np.ndarray:
    """Positional word-n-gram hashes (one per window start, duplicates kept
    — unlike ``dedup._shingle_hashes`` which de-duplicates). Caller
    guarantees ``len(wh) >= n``."""
    L = len(wh)
    with np.errstate(over="ignore"):
        powers = _MIX1 ** np.arange(n, dtype=np.uint64)
        acc = np.zeros(L - n + 1, dtype=np.uint64)
        for k in range(n):
            acc += wh[k : L - n + 1 + k] * powers[k]
        acc *= _MIX2
    return acc


_EMIT_SCHEMA = pa.schema(
    [("gram", pa.int64()), ("doc_id", pa.int64()), ("m", pa.int64())]
)


def duplicate_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    min_docs: int = 2,
    num_partitions: int | None = None,
):
    """Per-doc duplicated-span statistics: ``(doc_id, total_ngrams,
    dup_ngrams, dup_frac)`` where ``dup_ngrams`` counts word-n-gram positions
    whose gram occurs in ≥ ``min_docs`` distinct documents. Docs shorter
    than ``n`` words have ``total_ngrams = 0`` and ``dup_frac = 0.0``.

    Real pipelines use ``n`` around 50 tokens (the Lee et al. setting);
    the synthetic test corpus needs small ``n`` for overlap signal."""

    def emit(batch: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        ids_out, grams, mult = [], [], []
        texts = batch[text_col].to_pylist()
        for i, t in zip(batch[id_col].to_pylist(), texts):
            ws = split_ascii_ws(t or "")
            if len(ws) < n:
                continue
            gh = _gram_hashes_positional(_word_hashes(ws, cache), n)
            u, c = np.unique(gh, return_counts=True)
            grams.append(u)
            mult.append(c)
            ids_out.append(np.full(len(u), i, dtype=np.int64))
        if not grams:
            return _EMIT_SCHEMA.empty_table()
        return pa.table(
            {
                "gram": pa.array(np.concatenate(grams).view(np.int64)),
                "doc_id": pa.array(np.concatenate(ids_out)),
                "m": pa.array(np.concatenate(mult).astype(np.int64)),
            },
            schema=_EMIT_SCHEMA,
        )

    def totals(batch: pa.Table) -> pa.Table:
        tot = np.asarray(
            [
                max(len(split_ascii_ws(t or "")) - n + 1, 0)
                for t in batch[text_col].to_pylist()
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "total_ngrams": pa.array(tot),
            }
        )

    emissions = ds.map_batches(emit, batch_format="pyarrow")
    tot_ds = ds.map_batches(totals, batch_format="pyarrow")

    # duplicated-gram set: one emission row per (doc, gram) ⇒ count == the
    # distinct-doc count
    counts = emissions.groupby("gram").count()

    def dup_only(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch["count()"], min_docs))
        return keep.select(["gram"])

    dup_grams = counts.map_batches(dup_only, batch_format="pyarrow").materialize()
    parts = _join_partitions(num_partitions, chained=True)

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["total_ngrams"].to_numpy(zero_copy_only=False)
        dup = batch["dup_ngrams"].to_numpy(zero_copy_only=False)
        dup = np.where(np.isnan(dup.astype(np.float64)), 0, dup).astype(np.int64)
        frac = np.where(tot > 0, dup / np.maximum(tot, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "total_ngrams": pa.array(tot.astype(np.int64)),
                "dup_ngrams": pa.array(dup),
                "dup_frac": pa.array(round_half_up4_arr(frac)),
            }
        )

    if dup_grams.count() == 0:
        # no duplicated grams anywhere (and an inner join against a
        # schema-less empty side crashes on Ray 2.49 — see ops/dedup)
        def zeros(batch: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(len(batch), dtype=np.int64))
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "total_ngrams": batch["total_ngrams"],
                    "dup_ngrams": z,
                    "dup_frac": pa.array(np.zeros(len(batch), dtype=np.float64)),
                }
            )

        return tot_ds.map_batches(zeros, batch_format="pyarrow")

    # per-doc duplicated-position count: join emissions to the dup-gram set,
    # then sum the in-doc multiplicities
    hits = emissions.join(
        dup_grams, "inner", parts, on=("gram",), right_on=("gram",)
    )
    per_doc = hits.groupby("doc_id").sum("m")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "dup_ngrams"])

    per_doc = (
        per_doc.map_batches(rename, batch_format="pyarrow")
        # normalize blocks between chained joins (Ray 2.49 schema-less
        # empty-partition bug — same treatment as dedup._attach_sketches)
        .repartition(parts)
        .materialize()
    )
    joined = tot_ds.join(
        per_doc, "left_outer", parts, on=("doc_id",), right_on=("doc_id",)
    )
    return joined.map_batches(finish, batch_format="pyarrow")
