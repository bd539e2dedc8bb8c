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

__all__ = ["profile_columns"]


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
