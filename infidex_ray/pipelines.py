"""Composed end-to-end pipelines — the recipes a training-data team actually
runs, chaining the `ops/` suite into one streaming Dataset program.

Everything stays lazy Ray Data end-to-end: each stage is a map_batches /
broadcast / bounded-shuffle operator from `ops/`, so the composition
inherits their 100-TB properties (the only all-to-alls are the dedup
band-key groupby, the pair joins, and the pack bucket groupby; every
filter/score step streams). Consume the result with ``write_parquet`` /
``sources.write_results`` — do not materialize it.
"""

from __future__ import annotations

__all__ = ["curate_webtext"]


def curate_webtext(
    docs,
    bench=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple = ("en",),
    min_quality: float = 0.3,
    minhash_threshold: float = 0.8,
    chunk_words: int = 64,
    pack_capacity: int = 256,
    decontam_n: int = 8,
):
    """The standard webtext curation recipe (CCNet/Gopher/RefinedWeb shape):

    1. language filter (stopword-profile heuristic, stateless)
    2. quality-score floor + Gopher document rules (stateless)
    3. exact dedup (hash groupby of (hash, id) rows; min-id survivor)
    4. MinHash near-dedup (band-key shuffle; exact-Jaccard-verified pairs →
       label-propagation clusters → anti-join)
    5. optional decontamination against a benchmark set (broadcast
       ``decontam_n``-gram hash set — 8 by default, the GPT-3/PaLM range;
       drops contaminated docs)
    6. chunk into ``chunk_words``-word training samples and greedily pack
       into ``pack_capacity``-token sequences (bucket, bin)

    Returns the packed-chunk Dataset. Each stage is individually
    oracle-verified in the driver contract; the composition adds no new
    semantics, only plumbing. Filter stages are row-local, so they fuse:
    one map_batches computes the score and filters in place — no label
    join, no second pass over the text.
    """
    import pyarrow as pa

    from .ops.chunking import chunk_text
    from .ops.decontam import decontaminate
    from .ops.dedup import dedup_corpus_ds, exact_dup_pairs, minhash_lsh_pairs
    from .ops.packing import pack_sequences
    from .ops.textstats import gopher_rules_batch, langid_batch, quality_batch

    lang_set = set(langs)

    def keep_good(batch: pa.Table) -> pa.Table:
        """Fused row-local gate: language ∈ langs, quality ≥ floor, Gopher
        rules pass — scores computed per batch, rows filtered in place."""
        import numpy as np

        if len(batch) == 0:
            return batch
        lang = langid_batch(batch, id_col, text_col)["pred_lang"].to_pylist()
        q = quality_batch(batch, id_col, text_col)["quality"].to_numpy(
            zero_copy_only=False
        )
        g = gopher_rules_batch(batch, id_col, text_col)["passes"].to_numpy(
            zero_copy_only=False
        )
        keep = (
            np.asarray([l in lang_set for l in lang], dtype=bool)
            & (q >= min_quality)
            & g.astype(bool)
        )
        return batch.filter(pa.array(keep))

    docs = docs.map_batches(keep_good, batch_format="pyarrow").materialize()

    # --- exact then near dedup (the two all-to-alls) ----------------------
    docs = dedup_corpus_ds(docs, exact_dup_pairs(docs, id_col, text_col), id_col)
    pairs = minhash_lsh_pairs(
        docs, threshold=minhash_threshold, id_col=id_col, text_col=text_col
    )
    docs = dedup_corpus_ds(docs, pairs, id_col).materialize()

    # --- decontamination ----------------------------------------------------
    if bench is not None:
        rep = decontaminate(docs, bench, n=decontam_n, id_col=id_col, text_col=text_col)
        import numpy as np
        import ray

        bad_parts = [
            b[id_col].to_numpy(zero_copy_only=False)[
                b["contaminated"].to_numpy(zero_copy_only=False)
            ]
            for b in rep.iter_batches(batch_format="pyarrow")
        ]
        bad = (
            np.sort(np.concatenate(bad_parts))
            if bad_parts
            else np.empty(0, np.int64)
        )
        bad_ref = ray.put(bad)

        def drop_bad(batch: pa.Table) -> pa.Table:
            drop = ray.get(bad_ref)
            if len(drop) == 0 or len(batch) == 0:
                return batch
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(drop, ids)
            idx[idx == len(drop)] = 0
            return batch.filter(pa.array(drop[idx] != ids))

        docs = docs.map_batches(drop_bad, batch_format="pyarrow")

    # --- chunk + pack --------------------------------------------------------
    chunks = chunk_text(
        docs, chunk_words=chunk_words, id_col=id_col, text_col=text_col
    )
    return pack_sequences(
        chunks, token_col="n_tokens", id_col=id_col, capacity=pack_capacity
    )
