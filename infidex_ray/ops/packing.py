"""Sequence packing: greedy fixed-capacity binning of training samples.

The step between chunking and the trainer: concatenate consecutive samples
into bins of at most ``capacity`` tokens (public recipe — T5 / GPT packing)
so batches waste no padding. Greedy sequential packing is inherently
order-dependent, so a distributed version must pick its sequential unit
explicitly:

Partitioning assumption (documented per the custom-operator contract):
rows are hash-bucketed by ``id_col % num_buckets``; packing is greedy and
deterministic WITHIN a bucket (rows ordered by ``order_cols``), and bins
never cross buckets. Buckets pack in parallel via ``groupby(bucket).
map_groups`` — one shuffle of (bucket, order, n_tokens, id) rows only. At
100 TB, ``num_buckets`` ≈ total_tokens / (10⁶ × capacity) keeps every
bucket's rows in one worker while preserving parallelism; the ~half-empty
final bin per bucket is the only packing-efficiency cost vs a global
sequential pass.

Oracle: the same greedy recurrence is SQL-expressible as a recursive CTE
stepping over each bucket's row-number sequence (all buckets advance in
lock-step), so bin assignments are exactly checkable in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pack_sequences"]


def _pack_group(
    group: pa.Table,
    bucket_col: str,
    token_col: str,
    order_cols: list[str],
    capacity: int,
) -> pa.Table:
    idx = pa.compute.sort_indices(
        group, sort_keys=[(c, "ascending") for c in order_cols]
    )
    group = group.take(idx)
    toks = group[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # greedy first-fit-in-order: new bin when the running total would
    # overflow; items larger than capacity get a bin of their own
    bins = np.zeros(len(toks), dtype=np.int64)
    acc = 0
    b = 0
    for i, t in enumerate(toks):
        t = int(t)
        if acc > 0 and acc + t > capacity:
            b += 1
            acc = 0
        bins[i] = b
        acc += t
    return group.append_column("bin", pa.array(bins, pa.int64()))


def pack_sequences(
    ds,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    order_cols: list[str] | None = None,
    capacity: int = 512,
    num_buckets: int = 16,
):
    """Assign every row a ``(bucket, bin)`` pair such that the sum of
    ``token_col`` within each (bucket, bin) is ≤ ``capacity`` (single
    oversized rows get their own bin). Deterministic: bucket =
    ``id_col % num_buckets``; greedy first-fit in ``order_cols`` order
    (default ``[id_col]``) within the bucket.
    """
    if order_cols is None:
        order_cols = [id_col]

    import functools
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        r = pc.subtract(
            ids, pc.multiply(pc.divide(ids, num_buckets), num_buckets)
        )
        return batch.append_column("bucket", r.cast(pa.int64()))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            functools.partial(
                _pack_group,
                bucket_col="bucket",
                token_col=token_col,
                order_cols=order_cols,
                capacity=capacity,
            ),
            batch_format="pyarrow",
        )
    )
