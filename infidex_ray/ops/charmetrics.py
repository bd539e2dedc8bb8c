"""Corpus-scale character-metric ops (JaccardMetric / EditDistanceModel
parity).

Two reference metric utilities get their data-pipeline form here:

* ``char_jaccard`` — src/Infidex/Metrics/JaccardMetric.cs:66-134:
  frequency-based Jaccard (``Σ min(freq_q[c], freq_d[c]) / (|q| + |d| −
  inter)``) and unique-char-set Jaccard (``|Q∩D| / |Q∪D|``) of every
  document against a fixed query string, raw chars (the reference does
  NOT case-fold here). Per-string port: ``query/metrics.py::
  jaccard_of_all_chars`` / ``jaccard_of_char_set``.
* ``typo_budget`` — src/Infidex/Metrics/EditDistanceModel.cs:49-88: the
  binomial typo model's principled max edit distance ``d_max(L)`` =
  smallest d with ``Pr[Binomial(L, p) ≤ d] ≥ 1 − α``, reported for every
  token length present in the corpus together with how many tokens have
  that length — the table a fuzzy-matching config would be tuned from.
  Per-string port: ``query/metrics.py::max_edits_for_length``.

Char semantics: positions are Unicode CODEPOINTS (the C# original counts
UTF-16 code units — identical for all BMP text; documented divergence for
astral-plane chars). The binomial recurrence here computes ``q^L`` by
sequential multiplication so the DuckDB oracle (a rank-stepping recursive
CTE, the repo's proven sequential-float mirror) reproduces every IEEE
operation in order; a pytest asserts the result table equals the
``Math.Pow``-shaped per-string port for L = 0..200.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# RE2 \s — keep in lockstep with ops/asciiws.py and the oracles.
_WS_PAT = "[\t\n\x0b\x0c\r ]+"


def _batch_char_jaccard(
    texts: list, qcodes: np.ndarray, qcounts: np.ndarray, qlen: int
) -> tuple[np.ndarray, np.ndarray]:
    """(jaccard_all, jaccard_set) float64 per text. qcodes/qcounts =
    distinct query codepoints and their frequencies."""
    n = len(texts)
    out_all = np.zeros(n, dtype=np.float64)
    out_set = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out_all, out_set
    clean = [(t or "") for t in texts]
    lens = np.fromiter((len(t) for t in clean), dtype=np.int64, count=n)
    joined = "".join(clean)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    doc_idx = np.repeat(np.arange(n), lens)

    # distinct-char count per doc: first element of each (doc, code) run
    if len(codes):
        order = np.lexsort((codes, doc_idx))
        ds_, cs_ = doc_idx[order], codes[order]
        new = np.empty(len(codes), dtype=bool)
        new[0] = True
        new[1:] = (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])
        dset = np.bincount(ds_[new], minlength=n)
    else:
        dset = np.zeros(n, dtype=np.int64)

    inter_all = np.zeros(n, dtype=np.int64)
    inter_set = np.zeros(n, dtype=np.int64)
    for c, qn in zip(qcodes, qcounts):
        cnt = np.bincount(doc_idx[codes == c], minlength=n)
        inter_all += np.minimum(cnt, qn)
        inter_set += cnt > 0

    qset = len(qcodes)
    # exact-int operands → the float64 quotient matches the SQL mirror
    # bit for bit (JaccardMetric.cs:103-107 / :127-131 formulas)
    out_all = inter_all / (qlen + lens - inter_all)
    out_set = np.where(
        (qset + dset - inter_set) > 0,
        inter_set / np.maximum(qset + dset - inter_set, 1),
        0.0,
    )
    return out_all, out_set


def char_jaccard(
    ds,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Frequency- and set-based character Jaccard of every document
    against ``query`` (JaccardMetric.cs:66-134). Returns ``(id_col,
    jaccard_all, jaccard_set)`` rounded to 4 (DuckDB ROUND convention).

    Scale: stateless row-local map_batches — the query's distinct-char
    histogram is tiny constant state baked into the UDF closure; per
    batch one codepoint decode + one lexsort, nothing leaves the block.
    """
    if not query:
        raise ValueError("query must be non-empty")
    qarr = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    qcodes, qcounts = np.unique(qarr, return_counts=True)
    qlen = len(query)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ja, js = _batch_char_jaccard(texts, qcodes, qcounts, qlen)
        from .dedup import round_half_up4_arr as r4
        return pa.table(
            {
                id_col: batch[id_col],
                "jaccard_all": pa.array(r4(ja), pa.float64()),
                "jaccard_set": pa.array(r4(js), pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def binom_max_edits(length: int, p: float, q: float, target: float) -> int:
    """EditDistanceModel.GetMaxEditsForLength recurrence (:69-87) with
    ``q^L`` as a sequential product (see module docstring); every float
    op mirrors the oracle CTE in order."""
    if length <= 0:
        return 0
    prob_k = 1.0
    for _ in range(length):
        prob_k = prob_k * q
    cdf = prob_k
    k = 0
    while k < length and cdf < target:
        prob_k = prob_k * ((length - k) / (k + 1) * (p / q))
        cdf = cdf + prob_k
        k += 1
    return k


def typo_budget(
    ds,
    text_col: str = "text",
    p: float = 0.04,
    alpha: float = 0.01,
):
    """Per token-length typo budget over the corpus: for every distinct
    ASCII-whitespace token length L present, the token count and the
    binomial-model max edit distance ``d_max(L)`` (EditDistanceModel.cs:
    49-88, p = per-char error rate, α = tail mass). Returns ``(length,
    n_tokens, max_edits)``.

    Scale: per-batch length bincount partials (≤ max-token-length rows
    per block) → one tiny groupby on the bounded length key; d_max is a
    pure function of L computed on the grouped rows."""
    import pyarrow.compute as pc

    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    q = 1.0 - p
    target = 1.0 - alpha

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch[text_col], pa.large_string())
        col = pc.fill_null(col, "")
        toks = pc.list_flatten(pc.split_pattern_regex(col, pattern=_WS_PAT))
        lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
        lens = lens[lens > 0]
        if len(lens) == 0:
            return pa.table(
                {
                    "length": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        bc = np.bincount(lens)
        nz = np.flatnonzero(bc)
        return pa.table(
            {
                "length": pa.array(nz, pa.int64()),
                "n": pa.array(bc[nz], pa.int64()),
            }
        )

    grouped = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("length")
        .sum("n")
    )

    def finish(batch: pa.Table) -> pa.Table:
        lengths = batch["length"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "length": batch["length"],
                "n_tokens": batch["sum(n)"],
                "max_edits": pa.array(
                    [binom_max_edits(int(L), p, q, target) for L in lengths],
                    pa.int64(),
                ),
            }
        )

    return grouped.map_batches(finish, batch_format="pyarrow")
