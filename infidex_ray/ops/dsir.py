"""DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169 — public method).

Given a RAW web corpus and a small TARGET corpus (the distribution you want
more of — e.g. curated books/wiki), every raw document gets a log importance
weight under bag-of-hashed-n-grams unigram models:

    logweight(doc) = Σ_feature [ ln p_target(bucket) − ln p_raw(bucket) ]

where features are the doc's unigrams AND adjacent-word bigrams, each hashed
into ``n_buckets`` buckets, and both bucket distributions are add-1
(Laplace) smoothed. Resampling raw docs ∝ exp(logweight) shifts the corpus
toward the target distribution — the published recipe behind DSIR-filtered
pretraining mixes.

Ray shape (the 100-TB-honest layout):

1. **Count** — one streaming pass per corpus: per-batch dense ``bincount``
   over the bucket space emits ≤ ``n_buckets`` partial rows per block into a
   tiny ``groupby(bucket).sum`` (key space = n_buckets, not vocabulary).
2. **Broadcast** — the (n_buckets,) float64 log-ratio vector is ``ray.put``
   once (32 KB at the default 4096 buckets) — a model broadcast, same tier
   as the unigram-LM vocab.
3. **Score** — the raw corpus streams through a stateless ``map_batches``;
   per doc the weight is the token-order sum of log-ratios, matching the
   oracle's per-feature-row SUM.

Cross-engine hash contract: bucket = ``md5_number_lower(feature) %
n_buckets`` (dedup._md5_u64 ↔ DuckDB ``md5_number_lower``); tokenization is
lowercase + ``[ \\t\\n\\r]+`` split (bijective with the oracle's
``string_split_regex``), bigram feature = ``w_i || ' ' || w_{i+1}``.

No reference-engine analogue (pure beyond-reference training-data op).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _md5_u64, round_half_up4_arr

__all__ = ["dsir_logweights", "dsir_logratio", "hashed_ngram_counts"]

_SPLIT = "[ \t\n\r]+"


def _bucket_features(texts: list, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, doc_of) int64 arrays for every unigram + adjacent bigram of
    every text, in token order. md5 runs once per DISTINCT feature string
    per batch (features repeat heavily across a web batch)."""
    import pyarrow.compute as pc

    arr = pa.array([(t or "") for t in texts], pa.large_string())
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=_SPLIT)
    lens = (
        pc.list_value_length(toks)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)[keep]
    flat = flat.filter(pa.array(keep))
    # bigrams: adjacent same-doc tokens joined with one space
    n_tok = len(flat)
    if n_tok > 1:
        same_doc = doc_of[1:] == doc_of[:-1]
        lead = flat.slice(0, n_tok - 1)
        trail = flat.slice(1, n_tok - 1)
        bi = pc.binary_join_element_wise(
            lead, trail, pa.scalar(" ", pa.large_string())
        )
        bi = bi.filter(pa.array(same_doc))
        bi_doc = doc_of[:-1][same_doc]
    else:
        bi = pa.array([], pa.large_string())
        bi_doc = np.empty(0, dtype=np.int64)
    buckets_parts, docs_parts = [], []
    for feats, fdocs in ((flat, doc_of), (bi, bi_doc)):
        if len(feats) == 0:
            continue
        enc = feats.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):  # pragma: no cover
            enc = enc.combine_chunks()
        words = enc.dictionary.to_pylist()
        dh = np.fromiter(
            (_md5_u64(w) % n_buckets for w in words),
            dtype=np.int64,
            count=len(words),
        )
        idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        buckets_parts.append(dh[idx])
        docs_parts.append(fdocs)
    if not buckets_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(buckets_parts), np.concatenate(docs_parts)


def hashed_ngram_counts(ds, text_col: str = "text", n_buckets: int = 4096):
    """(n_buckets,) int64 bucket-count vector plus the grand total for a
    corpus — per-batch dense bincount partials into a bucket-keyed groupby
    (≤ n_buckets rows leave each block; the groupby key space is the fixed
    bucket count, never the vocabulary)."""

    def partial(batch: pa.Table) -> pa.Table:
        b, _ = _bucket_features(batch[text_col].to_pylist(), n_buckets)
        c = np.bincount(b, minlength=n_buckets)
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(c[nz], pa.int64()),
            }
        )

    rows = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .take_all()
    )
    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        counts[r["bucket"]] = r.get("sum(n)", r.get("n"))
    return counts, int(counts.sum())


def dsir_logratio(
    raw_ds, target_ds, text_col: str = "text", n_buckets: int = 4096
) -> np.ndarray:
    """The (n_buckets,) float64 per-bucket log importance ratio
    ``ln p_target − ln p_raw`` (add-1 smoothed) — the whole DSIR model;
    broadcast it once and score/filter anywhere (see
    :func:`dsir_logweights` and ``pipelines.curate_webtext``'s fused
    filter stage)."""
    t_counts, t_total = hashed_ngram_counts(target_ds, text_col, n_buckets)
    r_counts, r_total = hashed_ngram_counts(raw_ds, text_col, n_buckets)
    return np.log((t_counts + 1) / np.float64(t_total + n_buckets)) - np.log(
        (r_counts + 1) / np.float64(r_total + n_buckets)
    )


def dsir_logweights(
    raw_ds,
    target_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
):
    """Per-raw-document DSIR log importance weight (see module docstring).
    Returns a streaming Dataset of ``(id_col, n_features, logweight)`` with
    ``logweight`` rounded half-away-from-zero to 4 decimals (DuckDB ROUND
    parity); docs with no features weigh 0.0."""
    import ray

    ref = ray.put(dsir_logratio(raw_ds, target_ds, text_col, n_buckets))

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        b, doc_of = _bucket_features(batch[text_col].to_pylist(), n_buckets)
        n_docs = len(batch)
        order = np.argsort(doc_of, kind="stable")  # unigrams+bigrams per doc
        b, doc_of = b[order], doc_of[order]
        nfeat = np.bincount(doc_of, minlength=n_docs)
        # direct per-doc segment sums in token order (== the oracle's
        # per-feature-row SUM; a prefix-sum difference would carry cross-doc
        # rounding into each doc's value)
        w = np.zeros(n_docs, dtype=np.float64)
        if len(b):
            ends = np.cumsum(nfeat)
            nz = np.flatnonzero(nfeat)
            w[nz] = np.add.reduceat(lr[b], (ends - nfeat)[nz])
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "n_features": pa.array(nfeat.astype(np.int64), pa.int64()),
                "logweight": pa.array(round_half_up4_arr(w), pa.float64()),
            }
        )

    return raw_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def corpus_drift(
    ds,
    source_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 4096,
):
    """Pairwise KL divergence between per-source hashed-feature
    distributions — the mixture-drift monitor for multi-source corpora
    (is src A's token distribution moving away from src B's between
    crawls?). Features and smoothing are exactly DSIR's: unigram+bigram
    md5 buckets (``_bucket_features``), add-1-smoothed ``p = (c+1)/(N+B)``.

    Scale design: per-batch per-source dense bincount partials (≤ |sources
    in batch| × n_buckets rows leave each block, keyed into the FIXED
    bucket space — never the vocabulary), one bucket-keyed groupby, then a
    sources × n_buckets driver matrix (the O(sources²)-output tier, same
    as corpus_overlap). Returns a pyarrow Table ``(source_a, source_b,
    kl)`` for every ordered pair a ≠ b, KL rounded half-up to 4 (the
    4096-term sum differs from a serial engine by ulps).

    Source-universe semantics match the SQL oracle exactly: every distinct
    NON-NULL source in the dataset appears — a source whose documents have
    no tokens still pairs with everyone via the uniform smoothed
    distribution; NULL sources are dropped (SQL ``a.source <> b.source``
    never matches NULL)."""

    def partial(batch: pa.Table) -> pa.Table:
        raw = batch[source_col].to_pylist()
        srcs = pa.array(
            ["" if s is None else str(s) for s in raw], pa.large_string()
        )
        enc = srcs.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        names = enc.dictionary.to_pylist()
        b, doc_of = _bucket_features(batch[text_col].to_pylist(), n_buckets)
        # NULL sources are excluded end-to-end (oracle semantics)
        null_mask = np.asarray([s is None for s in raw], bool)
        if null_mask.any():
            keep = ~null_mask[doc_of]
            b, doc_of = b[keep], doc_of[keep]
        out_s, out_b, out_n = [], [], []
        for ci, name in enumerate(names):
            mask = codes[doc_of] == ci
            c = np.bincount(b[mask], minlength=n_buckets)
            nz = np.flatnonzero(c)
            out_s.append(np.full(len(nz), ci, dtype=np.int64))
            out_b.append(nz.astype(np.int64))
            out_n.append(c[nz])
        if not out_s:
            return pa.table(
                {
                    "source": pa.array([], pa.large_string()),
                    "bucket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        cat = np.concatenate(out_s)
        return pa.table(
            {
                "source": pa.array([names[i] for i in cat], pa.large_string()),
                "bucket": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n).astype(np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        agg = group.group_by(["source", "bucket"]).aggregate([("n", "sum")])
        return agg.rename_columns(
            ["n" if c == "n_sum" else c for c in agg.column_names]
        )

    rows = (
        ds.select_columns([source_col, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "slice",
                pa.array(
                    (t["bucket"].to_numpy(zero_copy_only=False) % 64).astype(
                        np.int32
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("slice")
        .map_groups(
            lambda g: merge(g.drop_columns(["slice"])), batch_format="pyarrow"
        )
        .take_all()  # sources × n_buckets rows — the driver-aggregate tier
    )
    # universe from the DATASET, not the feature rows: an all-empty source
    # still participates (uniform smoothed distribution), NULLs drop
    sources = sorted(
        str(s)
        for s in ds.select_columns([source_col]).unique(source_col)
        if s is not None
    )
    sidx = {s: i for i, s in enumerate(sources)}
    counts = np.zeros((len(sources), n_buckets), dtype=np.int64)
    for r in rows:
        i = sidx.get(r["source"])
        if i is not None:  # defensively skip rows outside the universe
            counts[i, r["bucket"]] = r["n"]
    totals = counts.sum(axis=1).astype(np.float64)
    p = (counts.astype(np.float64) + 1.0) / (totals[:, None] + float(n_buckets))
    out_a, out_b, out_kl = [], [], []
    for i, sa in enumerate(sources):
        for j, sb in enumerate(sources):
            if i == j:
                continue
            out_a.append(sa)
            out_b.append(sb)
            out_kl.append(float(np.sum(p[i] * np.log(p[i] / p[j]))))
    return pa.table(
        {
            "source_a": pa.array(out_a, pa.string()),
            "source_b": pa.array(out_b, pa.string()),
            "kl": pa.array(round_half_up4_arr(np.asarray(out_kl)), pa.float64()),
        }
    )
