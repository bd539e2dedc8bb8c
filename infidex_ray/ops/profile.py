"""Column profiling — the data-quality report a pipeline runs before
training on a new corpus drop: per column, row count, null count, and exact
distinct count.

Scale shape, per column: nulls/rows collapse to ONE partial row per block
(map_batches combiner → single-key groupby), and the exact distinct count
shuffles per-block-unique values only (the value-skew answer: a constant
column contributes one row per block, not one per row). Each column is an
independent small pipeline; the result is a |columns|-row table — a driver-
sized aggregate like facet counts, not a per-row output.

No reference-engine analogue (pure beyond-reference training-data op).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["profile_columns", "group_checksum"]


def profile_columns(ds, columns) -> pa.Table:
    """Exact ``(column, n_rows, n_nulls, n_distinct)`` per listed column,
    ordered by column name. ``n_distinct`` excludes nulls (SQL
    ``count(DISTINCT col)`` semantics)."""
    rows = []
    for col in sorted(columns):
        one = ds.select_columns([col])

        def counts(batch: pa.Table, _c=col) -> pa.Table:
            return pa.table(
                {
                    "k": pa.array([0], pa.int64()),
                    "n": pa.array([len(batch)], pa.int64()),
                    "n_null": pa.array([batch[_c].null_count], pa.int64()),
                }
            )

        agg = one.map_batches(counts, batch_format="pyarrow").groupby("k").sum(
            ["n", "n_null"]
        )
        row = agg.take_all()
        n = int(row[0]["sum(n)"]) if row else 0
        n_null = int(row[0]["sum(n_null)"]) if row else 0

        def uniq(batch: pa.Table, _c=col) -> pa.Table:
            v = batch[_c].drop_null().combine_chunks().unique()
            return pa.table({"v": v})

        n_distinct = (
            one.map_batches(uniq, batch_format="pyarrow").groupby("v").count().count()
        )
        rows.append((col, n, n_null, int(n_distinct)))

    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "n_nulls": pa.array([r[2] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def group_checksum(
    ds,
    key_col: str,
    cols,
    num_slices: int | None = None,
):
    """Order-free per-group content checksum — the snapshot-integrity
    primitive for 100-TB replication/migration checks: two corpora agree
    per group iff their (n_rows, checksum) tables agree, regardless of row
    order, partitioning, or cluster shape.

    Each row hashes to ``md5_number_lower(concat(vals, '|'-joined, NULL →
    '∅')) % 2**62`` (the repo-wide cross-engine hash,
    ``ops.dedup._md5_u64``), and the group digest is the WRAPPING uint64
    SUM of the row hashes, reduced mod 2**62 at the end — addition is
    associative + commutative, so per-block partials merge exactly in any
    order, and unlike an XOR fold it is MULTIPLICITY-sensitive (x ⊕ x = 0
    would make {A, A, B} and {C, C, B} collide at equal n_rows — exactly
    the duplicated-row corpora this check exists for; 2**62 divides 2**64,
    so the final mod commutes with uint64 wraparound). Scale shape: one
    partial row per (block, key) from a vectorized reduceat pass, then a
    single coarse md5 key-slice shuffle merges partials (never one Ray
    group per key).

    DuckDB parity: ``CAST(sum(md5_number_lower(concat(...)) % 2**62) AS
    HUGEINT) % 2**62`` (sum(BIGINT) is HUGEINT — exact up to 2⁶⁵ rows) —
    string rendering is Python ``str()`` vs SQL ``CAST(... AS VARCHAR)``,
    identical for ints and strings (callers with float/timestamp columns
    must pre-render them).

    Output: (key, n_rows BIGINT, checksum BIGINT) one row per group.
    """
    import numpy as np

    from .dedup import _md5_u64
    from .windows import _add_key_slice, _sorted_key_ranks

    cols = list(cols)
    mod = 1 << 62

    def _sum_partials(t: pa.Table, n_col) -> pa.Table:
        """Collapse (key, h[, n]) rows to one (key, n, checksum) per key."""
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: t[key_col],
                    "n_rows": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        ranks = _sorted_key_ranks(t[key_col])
        order = np.argsort(ranks, kind="stable")
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
        n = (
            t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            if n_col
            else np.ones(len(order), dtype=np.int64)
        )
        rs = ranks[order]
        starts = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
        # wrapping uint64 sums: order-free AND multiplicity-sensitive
        summed = np.add.reduceat(h, starts) if len(h) else h
        counts = np.add.reduceat(n, starts) if len(n) else n
        keys = t[key_col].take(pa.array(order[starts], pa.int64()))
        return pa.table(
            {
                key_col: keys,
                "n_rows": pa.array(counts, pa.int64()),
                "h": pa.array(summed.view(np.int64), pa.int64()),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "n_rows": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        rendered = []
        for c in cols:
            vals = batch[c].to_pylist()
            rendered.append(["∅" if v is None else str(v) for v in vals])
        hs = np.asarray(
            [
                _md5_u64("|".join(parts)) % mod
                for parts in zip(*rendered)
            ],
            dtype=np.uint64,
        )
        t = pa.table({key_col: batch[key_col], "h": pa.array(hs.astype(np.int64))})
        return _sum_partials(t, None)

    def final(group: pa.Table) -> pa.Table:
        out = _sum_partials(group.drop_columns(["slice"]), "n_rows")
        # final mod 2^62: commutes with the uint64 wraparound partial sums
        ck = (out["h"].to_numpy(zero_copy_only=False).view(np.uint64) % mod)
        out = out.set_column(
            out.schema.get_field_index("h"),
            "h",
            pa.array(ck.astype(np.int64), pa.int64()),
        )
        return out.rename_columns([key_col, "n_rows", "checksum"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_add_key_slice(key_col, num_slices), batch_format="pyarrow")
        .groupby("slice")
        .map_groups(final, batch_format="pyarrow")
    )
