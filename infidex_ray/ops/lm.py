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

__all__ = ["unigram_model", "unigram_logprob", "bigram_logprob", "vocab_coverage"]

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


def _bigram_count_partials(ds, text_col: str):
    """(prev, tok, n) partial bigram counts per batch — adjacent same-doc
    token pairs, collapsed to distinct-pair rows inside the task (Arrow hash
    group-by), so the shuffle moves the bigram VOCABULARY per block, not one
    row per occurrence."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=_SPLIT)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        doc_of = doc_of[keep]
        n = len(flat)
        empty = pa.table(
            {
                "prev": pa.array([], pa.string()),
                "tok": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        same = doc_of[1:] == doc_of[:-1]
        if not same.any():
            return empty
        t = pa.table(
            {
                "prev": flat.slice(0, n - 1).filter(pa.array(same)).cast(pa.string()),
                "tok": flat.slice(1, n - 1).filter(pa.array(same)).cast(pa.string()),
            }
        )
        g = t.group_by(["prev", "tok"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev": g["prev"],
                "tok": g["tok"],
                "n": g["count_all"].cast(pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["prev", "tok"])
        .sum("n")
    )


def bigram_logprob(
    ds,
    train_ds=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    vocab_size: int | None = 2_000_000,
    bigram_size: int | None = 4_000_000,
):
    """Per-document average negative log-likelihood under a Jelinek-Mercer
    interpolated bigram LM (public recipe — the classic smoothing between
    KenLM-style n-gram filters and the unigram floor):

        p(w_i | w_{i-1}) = lam · cnt(w_{i-1}, w_i)/cnt(w_{i-1})
                         + (1 − lam) · p_uni(w_i)

    with the first token of each document scored by the unigram alone, a
    pruned bigram table (top ``bigram_size`` by count desc, pair asc — a
    pruned miss contributes 0 to the bigram term, never an error), and the
    unigram side inheriting :func:`unigram_model`'s pruning + OOV floor.

    Returns ``(id_col, n_tokens, nll)`` — same shape/rounding as
    :func:`unigram_logprob`. Both count passes are combiner-partial
    groupbys; the two pruned tables broadcast once via ``ray.put``."""
    import ray

    src = train_ds if train_ds is not None else ds
    tokens, logp, total, oov_logp = unigram_model(src, text_col, vocab_size)
    # exact integer counts back from logp (= ln(n/total)): rint kills the
    # exp∘ln round-trip ulp so p_uni below is n/total BIT-identically to
    # the oracle's integer division
    uni_n = np.rint(np.exp(logp) * float(total)) if total else np.zeros(0)

    agg = _bigram_count_partials(src, text_col)

    def rename(t: pa.Table) -> pa.Table:
        c = "sum(n)" if "sum(n)" in t.column_names else "n"
        return pa.table({"prev": t["prev"], "tok": t["tok"], "n": t[c].cast(pa.int64())})

    bcounts = agg.map_batches(rename, batch_format="pyarrow")
    if bigram_size is not None:
        bcounts = bcounts.sort(
            ["n", "prev", "tok"], descending=[True, False, False]
        ).limit(bigram_size)
    bdf = bcounts.to_pandas()
    if len(bdf):
        pair = (bdf["prev"] + "\x00" + bdf["tok"]).to_numpy()
        order = np.argsort(pair, kind="stable")
        pair_sorted = pair[order]
        pair_n = bdf["n"].to_numpy()[order].astype(np.float64)
    else:
        pair_sorted = np.empty(0, dtype=object)
        pair_n = np.zeros(0)
    model_ref = ray.put((tokens, uni_n, pair_sorted, pair_n))

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tok_arr, un, pairs, pn = ray.get(model_ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=_SPLIT)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        nf = len(flat)
        # unigram term per token
        tot = float(total) if total else 1.0
        if nf and len(tok_arr):
            idx = np.searchsorted(tok_arr, flat)
            idx[idx == len(tok_arr)] = 0
            hit = tok_arr[idx] == flat
            cnt_self = np.where(hit, un[np.minimum(idx, len(un) - 1)], 1.0)
            p_uni = cnt_self / tot  # = n/total exactly (OOV floor: 1/total)
            cnt_prev = np.where(hit, un[np.minimum(idx, len(un) - 1)], 0.0)
        else:
            p_uni = np.full(nf, 1.0 / tot)
            cnt_prev = np.zeros(nf)
        p = p_uni.copy()
        if nf > 1:
            same = doc_of[1:] == doc_of[:-1]
            pos = np.flatnonzero(same) + 1  # token positions with a prev
            if len(pos) and len(pairs):
                keys = np.char.add(
                    np.char.add(flat[pos - 1].astype(str), "\x00"),
                    flat[pos].astype(str),
                )
                bi = np.searchsorted(pairs, keys)
                bi[bi == len(pairs)] = 0
                bhit = pairs[bi] == keys
                cb = np.where(bhit, pn[np.minimum(bi, len(pn) - 1)], 0.0)
            else:
                cb = np.zeros(len(pos))
            denom = cnt_prev[pos - 1]
            with np.errstate(invalid="ignore", divide="ignore"):
                p_bi = np.where(denom > 0, cb / np.maximum(denom, 1e-300), 0.0)
            p[pos] = lam * p_bi + (1.0 - lam) * p_uni[pos]
        tok_lp = np.log(p)
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


def vocab_coverage(
    ds,
    ref_ds=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    vocab_size: int | None = 1_000_000,
):
    """Per-document out-of-vocabulary rate against a reference vocabulary —
    the tokenizer-fit / language-match signal ("what fraction of this doc's
    tokens does my vocab cover?") used to gate crawl shards before training.

    Vocabulary = tokens appearing ≥ ``min_count`` times in ``ref_ds``
    (default: the corpus itself), pruned to the top ``vocab_size`` by
    (count DESC, token ASC) like :func:`unigram_model`; built with the
    heavy-hitters combiner (per-batch ``value_counts`` partials → one
    vocabulary-sized groupby), broadcast ONCE via ``ray.put``, probed per
    batch with a vectorized ``searchsorted`` — no shuffle of the big side.

    Returns ``(id_col, n_tokens, n_oov, oov_rate)`` with ``oov_rate`` the
    exact integer ratio n_oov/n_tokens (0.0 for token-less docs) — bitwise
    identical to the SQL oracle. Tokenization: lowercase + ASCII-whitespace
    split, bijective with ``regexp_split_to_array(lower(text),
    '[ \\t\\n\\r]+')``.
    """
    import ray

    agg = _token_count_partials(ref_ds if ref_ds is not None else ds, text_col)

    def kept_tokens(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = "sum(n)" if "sum(n)" in t.column_names else "n"
        n = t[c].cast(pa.int64())
        keep = pc.greater_equal(n, min_count)
        return pa.table({"token": t["token"].filter(keep), "n": n.filter(keep)})

    counts = agg.map_batches(kept_tokens, batch_format="pyarrow")
    if vocab_size is not None:
        counts = counts.sort(["n", "token"], descending=[True, False]).limit(
            vocab_size
        )
    kept = counts.to_pandas()
    vocab = (
        np.sort(kept["token"].to_numpy())
        if "token" in kept.columns and len(kept)
        else np.empty(0, dtype=object)
    )
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        voc = ray.get(vocab_ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=_SPLIT)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(batch)), lens)
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        if len(flat) and len(voc):
            idx = np.searchsorted(voc, flat)
            idx[idx == len(voc)] = 0
            oov = voc[idx] != flat
        else:
            oov = np.ones(len(flat), dtype=bool)
        n_tokens = np.bincount(doc_of, minlength=len(batch)).astype(np.int64)
        n_oov = np.bincount(
            doc_of[oov], minlength=len(batch)
        ).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rate = np.where(
                n_tokens > 0, n_oov / np.maximum(n_tokens, 1), 0.0
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens),
                "n_oov": pa.array(n_oov),
                "oov_rate": pa.array(rate, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
