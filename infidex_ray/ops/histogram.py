"""Fixed-width numeric histogram over a Dataset column.

The workhorse of distribution profiling at corpus scale (token-count
histograms for packing capacity, quality-score histograms for threshold
picking, event-value monitoring). Not in the reference (its facets count
string values only — Api/SearchEngine facets); this generalizes the same
count-per-bucket idea to numeric ranges.

Scale design: per-batch ``np.bincount`` partials (≤ n_bins rows leave each
block regardless of block size) → one tiny groupby-sum over n_bins keys.
Never moves row-level data; the exchange is O(n_bins × n_blocks).

Bin rule (shared bit-for-bit with the SQL oracle): for value x in
[lo, hi), bin = floor((x − lo) / width) with width = (hi − lo) / n_bins,
computed in float64 exactly as DuckDB evaluates the same expression;
values outside [lo, hi) are dropped (callers profile the clipped range
explicitly — silent clamping misreads outliers as edge mass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["numeric_histogram"]


def numeric_histogram(ds, col: str, lo: float, hi: float, n_bins: int = 20):
    """(bin, lo_edge, hi_edge, n) — fixed-width histogram of ``col`` over
    [lo, hi). Empty bins are omitted (SQL-friendly: GROUP BY emits only
    non-empty groups)."""
    if not (hi > lo) or n_bins <= 0:
        raise ValueError("need hi > lo and n_bins >= 1")
    width = (hi - lo) / n_bins

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        bins = np.floor((x - lo) / width)
        bins = bins[(x >= lo) & (x < hi)].astype(np.int64)
        counts = np.bincount(bins, minlength=0)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": nz.astype(np.int64),
                "n": counts[nz].astype(np.int64),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("bin").sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(["bin", "n"])
        b = batch["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            "lo_edge", pa.array(lo + b * width, pa.float64())
        ).append_column("hi_edge", pa.array(lo + (b + 1.0) * width, pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")
