"""Unigram language-model quality scoring (CCNet-style LM filter).

The public CCNet / RedPajama recipe scores every document with a language
model trained on a trusted corpus and keeps the low-perplexity tail; the
honest in-sandbox stand-in is a *unigram* LM trained on a (trusted) corpus
with the same two-pass shape a KenLM pass would have:

1. **Train** — token counts over the training side via the heavy-hitters
   combiner pattern (per-batch Arrow ``value_counts`` partials → one
   vocabulary-sized ``groupby(token).sum``; the hot token costs one row per
   block, not one per occurrence). The model is then pruned to the top
   ``vocab_size`` tokens by ``(count DESC, token ASC)`` — exactly what
   shipping a pruned LM means — and the out-of-vocabulary probability floor
   is ``1/total_tokens``.
2. **Score** — the (possibly different, 100-TB) corpus streams through a
   stateless ``map_batches``: the pruned model (sorted token array + float64
   log-probs) is ``ray.put`` ONCE and every task probes it with a vectorized
   ``searchsorted`` — a broadcast join, no shuffle of the big side.

Output per document: ``n_tokens`` and ``nll`` = −mean(ln p(token)) (the
average negative log-likelihood; exp(nll) is the perplexity). Tokenization
is lowercase + whitespace split — bijective with the DuckDB oracle's
``regexp_split_to_array(lower(text), '[ \\t\\n\\r]+')``.

No reference-engine analogue (pure beyond-reference training-data op).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import round_half_up4_arr

__all__ = ["unigram_model", "unigram_logprob"]

_SPLIT = "[ \t\n\r]+"


def _token_count_partials(ds, text_col: str):
    """(token, n) partial counts per batch — vocabulary-sized rows leave each
    task, never one row per token occurrence."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=_SPLIT)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
    )


def unigram_model(
    train_ds, text_col: str = "text", vocab_size: int | None = 2_000_000
):
    """Train the pruned unigram LM: returns ``(tokens_sorted, logp, total,
    oov_logp)`` where ``tokens_sorted`` is a lexicographically sorted numpy
    string array and ``logp[i] = ln(count(tokens_sorted[i]) / total)``.

    ``total`` counts EVERY token occurrence (pre-pruning), so pruning only
    reassigns tail tokens to the OOV floor — it never inflates in-vocab
    probabilities. The returned arrays are vocabulary-sized (the small side
    by construction; CCNet ships its pruned LM to every worker the same way).

    ``vocab_size`` defaults to 2M tokens so the driver-side collect stays
    bounded on crawl-scale vocabularies; pass ``vocab_size=None`` to opt in
    to the unbounded exact vocabulary.
    """
    agg = _token_count_partials(train_ds, text_col)

    def rename(t: pa.Table) -> pa.Table:
        c = "sum(n)" if "sum(n)" in t.column_names else "n"
        return pa.table({"token": t["token"], "n": t[c].cast(pa.int64())})

    counts = agg.map_batches(rename, batch_format="pyarrow")
    if vocab_size is not None:
        counts = counts.sort(["n", "token"], descending=[True, False])
        # total must be computed BEFORE the limit — over the full vocabulary
        total = counts.sum("n")
        kept = counts.limit(vocab_size).to_pandas()
    else:
        total = counts.sum("n")
        kept = counts.to_pandas()
    total = int(total or 0)
    if "token" not in kept.columns:  # empty corpus: groupby loses the schema
        return (
            np.empty(0, dtype=object),
            np.zeros(0),
            0,
            0.0,
        )
    order = np.argsort(kept["token"].to_numpy(), kind="stable")
    tokens = kept["token"].to_numpy()[order]
    n = kept["n"].to_numpy()[order].astype(np.float64)
    logp = np.log(n / float(total)) if total else np.zeros(0)
    oov_logp = float(np.log(1.0 / float(total))) if total else 0.0
    return tokens, logp, total, oov_logp


def unigram_logprob(
    ds,
    train_ds=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int | None = 2_000_000,
):
    """Per-document average negative log-likelihood under a unigram LM
    trained on ``train_ds`` (default: the corpus itself).

    Returns ``(id_col, n_tokens, nll)`` with ``nll`` rounded half-away-
    from-zero to 4 decimals (DuckDB ``ROUND`` parity); ``nll = 0.0`` for
    token-less documents. OOV tokens (pruned tail / unseen in training)
    score ``ln(1/total)``.
    """
    import ray

    tokens, logp, total, oov_logp = unigram_model(
        train_ds if train_ds is not None else ds, text_col, vocab_size
    )
    model_ref = ray.put((tokens, logp))

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tok_arr, lp = ray.get(model_ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=_SPLIT)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(batch)), lens)
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        if len(flat) and len(tok_arr):
            idx = np.searchsorted(tok_arr, flat)
            idx[idx == len(tok_arr)] = 0
            hit = tok_arr[idx] == flat
            tok_lp = np.where(hit, lp[np.minimum(idx, len(lp) - 1)], oov_logp)
        else:
            tok_lp = np.full(len(flat), oov_logp)
        n_tokens = np.bincount(doc_of, minlength=len(batch)).astype(np.int64)
        sums = np.bincount(doc_of, weights=tok_lp, minlength=len(batch))
        with np.errstate(invalid="ignore", divide="ignore"):
            nll = np.where(n_tokens > 0, -sums / np.maximum(n_tokens, 1), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens),
                "nll": pa.array(round_half_up4_arr(nll), pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
