"""Deterministic sampling operators.

Web-scale pipelines sample with a *content-derived* hash, not an RNG: the
same row is kept on every rerun (resumable jobs, reproducible ablations) and
no coordination or seed distribution is needed across a 256-node cluster.
Both operators here are pure row-local ``map_batches`` filters — zero
shuffle, zero driver state, trivially linear at 100 TB.

The hash is :func:`infidex_ray.ops.dedup._md5_u64` (lower 8 md5 bytes,
little-endian), bit-identical to DuckDB's ``md5_number_lower`` — so the SQL
oracle recomputes the exact keep/drop decision per row rather than checking
a distribution.
"""

from __future__ import annotations

import pyarrow as pa

from .dedup import _md5_u64

# Modulus for the hash-bucket decision; 1e6 gives ppm-granular rates.
SAMPLE_MOD = 1_000_000


def _keep_mask(keys: list, lo_ppm: int, hi_ppm: int, salt: str) -> list[bool]:
    """Hash-bucket window test [lo_ppm, hi_ppm) — the one place the keying
    scheme lives (sample_hash is the [0, rate) special case)."""
    return [
        lo_ppm <= _md5_u64(f"{salt}:{k}") % SAMPLE_MOD < hi_ppm for k in keys
    ]


def sample_hash(ds, rate: float, key_col: str = "doc_id", salt: str = "s0"):
    """Keep each row iff ``md5(salt:key) mod 1e6 < rate*1e6``.

    Deterministic Bernoulli(rate) sample keyed on ``key_col``; changing
    ``salt`` draws an independent sample (disjoint-ish splits for train /
    eval ablations come from disjoint rate windows — see
    :func:`sample_split`).
    """
    return sample_split(ds, 0.0, rate, key_col=key_col, salt=salt)


def sample_split(ds, lo: float, hi: float, key_col: str = "doc_id", salt: str = "s0"):
    """Keep rows whose hash bucket falls in [lo, hi) — non-overlapping
    windows give exactly disjoint train/val/test splits of one corpus."""
    lo_ppm, hi_ppm = int(round(lo * SAMPLE_MOD)), int(round(hi * SAMPLE_MOD))

    def flt(batch: pa.Table) -> pa.Table:
        mask = _keep_mask(batch[key_col].to_pylist(), lo_ppm, hi_ppm, salt)
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")


def _group_topk_table(
    tbl: "pa.Table", group_col: str, score_col: str, id_col: str, k: int
) -> "pa.Table":
    """Vectorized per-group top-k of one table under the total order
    (score desc, id asc): lexsort, detect group changes, rank by cumulative
    position within group, filter rank < k."""
    import numpy as np

    if len(tbl) == 0:
        return tbl
    g = tbl[group_col].combine_chunks()
    # dictionary-encode group values so lexsort works for string groups
    # (combine_chunks on a ChunkedArray yields a plain DictionaryArray)
    enc = g.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    score = tbl[score_col].combine_chunks().to_numpy(zero_copy_only=False)
    ids = tbl[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -score, codes))
    codes_s = codes[order]
    new_grp = np.empty(len(order), dtype=bool)
    new_grp[0] = True
    np.not_equal(codes_s[1:], codes_s[:-1], out=new_grp[1:])
    # rank within group = position since last group start
    pos = np.arange(len(order))
    start = np.maximum.accumulate(np.where(new_grp, pos, 0))
    rank = pos - start
    keep = order[rank < k]
    out = tbl.take(pa.array(np.sort(keep)))
    return out


def top_k_per_group(
    ds, group_col: str, score_col: str, id_col: str, k: int
):
    """Keep the top-``k`` rows per group by ``score_col`` (descending,
    ties broken by ``id_col`` ascending) and emit each row's 1-based
    ``rank`` — the per-domain quality-selection pattern of crawl pipelines
    ("best N pages per site").

    Two-phase: every input block first reduces to its own per-group top-k
    (the union of per-block top-k under a total order contains the global
    top-k), so the ``groupby`` shuffle carries at most k rows per group per
    block instead of the whole corpus; the final in-group step re-ranks the
    partials. A group's k rows must fit in one worker — true by
    construction since k is small.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _group_topk_table(batch, group_col, score_col, id_col, k)

    def final(group: pa.Table) -> pa.Table:
        import numpy as np

        top = _group_topk_table(group, group_col, score_col, id_col, k)
        score = top[score_col].combine_chunks().to_numpy(zero_copy_only=False)
        ids = top[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -score))
        top = top.take(pa.array(order))
        return top.append_column(
            "rank", pa.array(np.arange(1, len(top) + 1, dtype=np.int64))
        )

    return (
        ds.select_columns(list(dict.fromkeys([group_col, score_col, id_col])))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def stratified_sample(
    ds,
    rates: dict,
    strata_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "s0",
):
    """Per-stratum deterministic Bernoulli sample: keep a row iff its
    md5 bucket < rates[stratum] (``default_rate`` for unlisted strata).

    The language-rebalancing primitive (downsample English, keep all of the
    tail): still a pure row-local filter — the ``rates`` dict is tiny and
    ships inside the task closure, so there is no shuffle and no driver
    state, same as :func:`sample_hash`."""
    ppm = {k: int(round(v * SAMPLE_MOD)) for k, v in rates.items()}
    dflt = int(round(default_rate * SAMPLE_MOD))

    def flt(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        strata = batch[strata_col].to_pylist()
        mask = [
            _md5_u64(f"{salt}:{k}") % SAMPLE_MOD < ppm.get(s, dflt)
            for k, s in zip(keys, strata)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")


def mix_corpora(sources, key_col: str = "doc_id", salt: str = "mix"):
    """Assemble a deterministic training mixture from several corpora:
    ``sources`` is a list of ``(name, ds, rate)`` — each corpus contributes a
    hash-keyed Bernoulli(rate) sample tagged with a ``mix_source`` column,
    and the tagged streams are unioned (schemas must already agree).

    This is the data-mixing step of a pretraining pipeline (N× web, 1×
    books, 2× code …) made rerun-stable: the keep decision is
    ``md5(salt:name:key)``, so re-running the job — or running it shard by
    shard on a 256-node cluster — reproduces the same mixture with zero
    coordination, and upweighting one source never reshuffles another
    (per-source salts are independent). Pure map_batches + union: no
    shuffle, no driver state.
    """

    tagged = []
    for name, ds, rate in sources:
        part = sample_hash(ds, rate, key_col=key_col, salt=f"{salt}:{name}")

        def tag(batch: pa.Table, _n=name) -> pa.Table:
            return batch.append_column(
                "mix_source", pa.array([_n] * len(batch), pa.string())
            )

        tagged.append(part.map_batches(tag, batch_format="pyarrow"))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out
