"""Generic grouped aggregation with combiner partials.

Ray Data's native ``groupby().aggregate()`` hash-partitions EVERY input row
to the aggregator actors. For the usual analytical shape (few output groups,
many rows) the scale-right plan is the classic combiner: each block first
collapses to ≤|groups| partial rows with Arrow's own hash group-by (zero
Python loops), and only those partials shuffle — by a coarse slice of the
key hash, never one Ray group per output key. The same pattern the index
build uses for df stats (build.py) and tumbling_window uses for events,
exposed as a reusable operator.

Supported aggregates: sum / count / min / max / mean (mean decomposes into
sum+count partials and divides at the end). Count semantics = SQL
``count(col)`` (non-null); use ``count(key)`` on a key column for
``count(*)`` over non-null keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _default_num_slices, _md5_u64

_MIX = np.uint64(0xBF58476D1CE4E5B9)

# how a partial kernel's outputs merge across blocks
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_agg(ds, keys, aggs: dict, num_slices: int | None = None):
    """``aggs``: ``{out_col: (func, in_col)}`` with func ∈ sum / count /
    min / max / mean. Returns one row per distinct key combination with the
    key columns plus every requested aggregate.

    Float-sum caveat (same as any distributed sum): addition order differs
    from a single-threaded engine, so float64 sums/means carry ~ulp-scale
    nondeterminism; integer-valued columns are exact. min/max/count are
    always exact.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_slices is None:
        num_slices = _default_num_slices()

    # canonical partials, deduped per (col, kernel): two aggs over the same
    # column (e.g. sum + mean) share one partial column
    partials: dict[tuple, str] = {}  # (col, kernel) -> canonical name
    finals = []  # (out_col, kind, canonical partial names)
    for out, (fn, col) in aggs.items():
        if fn == "mean":
            needed = (("sum", col), ("count", col))
            finals.append((out, "mean", needed))
        elif fn in _MERGE:
            needed = ((fn, col),)
            finals.append((out, "direct", needed))
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")
        for kfn, kcol in needed:
            partials.setdefault((kcol, kfn), f"__p_{kcol}_{kfn}")

    pairs = list(partials.items())  # [((col, kernel), pname)]
    in_cols = list(dict.fromkeys([c for (c, _f), _n in pairs]))

    def _rename(res: pa.Table, mapping: dict) -> pa.Table:
        return res.rename_columns([mapping.get(n, n) for n in res.column_names])

    def partial(batch: pa.Table) -> pa.Table:
        proj = batch.select(list(dict.fromkeys(keys + in_cols)))
        res = proj.group_by(keys).aggregate([(c, f) for (c, f), _n in pairs])
        res = _rename(res, {f"{c}_{f}": n for (c, f), n in pairs})
        h = np.zeros(len(res), dtype=np.uint64)
        for kcol in keys:
            enc = res[kcol].combine_chunks().dictionary_encode()
            idx = enc.indices
            codes = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            # per-batch dictionary codes are NOT globally stable — hash the
            # VALUE bytes so the same key lands in the same slice everywhere;
            # null is a valid SQL group → it gets its own reserved hash
            vals = enc.dictionary.cast(pa.string()).to_pylist()
            vh = np.asarray(
                [_md5_u64(str(v)) for v in vals] + [_md5_u64("\x00<NULL>")],
                dtype=np.uint64,
            )
            h = (h * _MIX) ^ vh[codes]  # codes==-1 (null) → last slot
        sl = (h % np.uint64(num_slices)).astype(np.int32)
        return res.append_column("slice", pa.array(sl))

    def final(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["slice"])
        merge_pairs = [(n, _MERGE[f]) for (_c, f), n in pairs]
        res = group.group_by(keys).aggregate(merge_pairs)
        res = _rename(res, {f"{n}_{m}": n for n, m in merge_pairs})
        cols = {k: res[k] for k in keys}
        for out, kind, needed in finals:
            if kind == "mean":
                s = res[partials[(needed[0][1], needed[0][0])]]
                c = res[partials[(needed[1][1], needed[1][0])]]
                sv = s.to_numpy(zero_copy_only=False).astype(np.float64)
                cv = c.to_numpy(zero_copy_only=False).astype(np.float64)
                # count==0 (all-null group) → NaN ≡ SQL avg(...)=NULL
                cols[out] = pa.array(
                    np.where(cv > 0, sv / np.maximum(cv, 1.0), np.nan)
                )
            else:
                cols[out] = res[partials[(needed[0][1], needed[0][0])]]
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slice")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_corr(
    ds, keys, x_col: str, y_col: str, num_slices: int | None = None
):
    """Per-group Pearson correlation via sufficient-statistic partials.

    Each block collapses to ≤|groups| rows of ``(n, Σx, Σy, Σx², Σy², Σxy)``
    over rows where BOTH columns are non-null (SQL ``corr`` semantics), so
    the exchange moves group-count partials, not data rows. The final
    closed form is evaluated with ONE fixed float64 expression::

        corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ᵗᵒᵗ) · (n·Σy² − Σy²ᵗᵒᵗ))

    so a SQL oracle spelling the same expression over ``sum()`` columns is
    bit-identical whenever the inputs are integer-valued (partial sums of
    integers < 2⁵³ are exact in float64 regardless of addition order);
    non-integer inputs carry the usual ulp-scale distributed-sum caveat.
    Groups with n = 0 or zero variance yield NaN (≡ SQL NULL).

    Returns one row per key combination: keys + ``n`` + ``corr``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_slices is None:
        num_slices = _default_num_slices()
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[x_col], pa.float64())
        y = pc.cast(batch[y_col], pa.float64())
        # pairwise masking, not row filtering: a group whose every row lacks
        # a valid (x, y) pair still APPEARS (n=0, corr NaN) — matching SQL
        # corr(), where the group survives with a NULL aggregate
        valid = pc.and_(pc.is_valid(x), pc.is_valid(y))
        null = pa.scalar(None, pa.float64())
        x = pc.if_else(valid, x, null)
        y = pc.if_else(valid, y, null)
        proj = pa.table(
            {
                **{k: batch[k] for k in keys},
                "__x": x,
                "__y": y,
                "__xx": pc.multiply(x, x),
                "__yy": pc.multiply(y, y),
                "__xy": pc.multiply(x, y),
            }
        )
        res = proj.group_by(keys).aggregate(
            [("__x", "count"), ("__x", "sum"), ("__y", "sum"),
             ("__xx", "sum"), ("__yy", "sum"), ("__xy", "sum")]
        )
        ren = {"__x_count": "n", "__x_sum": "sx", "__y_sum": "sy",
               "__xx_sum": "sxx", "__yy_sum": "syy", "__xy_sum": "sxy"}
        res = res.rename_columns([ren.get(c, c) for c in res.column_names])
        h = np.zeros(len(res), dtype=np.uint64)
        for kcol in keys:
            enc = res[kcol].combine_chunks().dictionary_encode()
            codes = (
                enc.indices.fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            vals = enc.dictionary.cast(pa.string()).to_pylist()
            vh = np.asarray(
                [_md5_u64(str(v)) for v in vals] + [_md5_u64("\x00<NULL>")],
                dtype=np.uint64,
            )
            h = (h * _MIX) ^ vh[codes]
        sl = (h % np.uint64(num_slices)).astype(np.int32)
        return res.append_column("slice", pa.array(sl))

    def final(group: pa.Table) -> pa.Table:
        res = group.drop_columns(["slice"]).group_by(keys).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )
        ren = {f"{c}_sum": c for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        res = res.rename_columns([ren.get(c, c) for c in res.column_names])
        n = res["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = res["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = res["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = res["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = res["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = res["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            corr = np.where(denom > 0, (n * sxy - sx * sy) / denom, np.nan)
        cols = {k: res[k] for k in keys}
        cols["n"] = res["n"].cast(pa.int64())
        cols["corr"] = pa.array(corr, pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slice")
        .map_groups(final, batch_format="pyarrow")
    )
