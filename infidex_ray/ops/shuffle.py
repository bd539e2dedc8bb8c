"""Deterministic (reproducible) global corpus shuffle.

Training runs need a shuffle that is REPRODUCIBLE — re-running the
pipeline (or resuming a failed run) must produce the identical example
order, which ``Dataset.random_shuffle`` cannot promise across cluster
shapes. The standard trick: key every row by a seeded hash of its id and
globally sort by that key — the order is a pure function of (seed, ids),
independent of partitioning, executor scheduling, or cluster size.

Scale design: one ``map_batches`` appends the key (md5 of ``"seed:id"``,
lower 8 digest bytes little-endian == DuckDB ``md5_number_lower`` — the
repo-wide cross-engine hash), then ``Dataset.sort`` runs Ray's
sample-partitioned range sort — the one all-to-all this op fundamentally
requires (a shuffle IS a global reorder), with no driver materialization.
The key column stays in the output so downstream stages (and the SQL
oracle) can re-establish the order after any order-losing step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _md5_u64

__all__ = ["deterministic_shuffle", "zorder_key", "zorder_sort"]

# fit the key in signed int64 for clean Arrow/SQL BIGINT parity
_KEY_MOD = 1 << 62


def deterministic_shuffle(ds, id_col: str = "doc_id", seed: int = 0, key_col: str = "shuffle_key"):
    """Reorder ``ds`` by ``md5(f"{seed}:{id}")`` (ties broken by id).

    Same (seed, ids) → same order, on any cluster. Returns the input
    columns plus ``key_col`` (BIGINT, ``md5_number_lower % 2**62``)."""

    def key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        k = np.asarray(
            [_md5_u64(f"{seed}:{v}") % _KEY_MOD for v in ids], dtype=np.int64
        )
        return batch.append_column(key_col, pa.array(k))

    return ds.map_batches(key, batch_format="pyarrow").sort([key_col, id_col])


def zorder_key(
    ds,
    cols,
    bounds: dict | None = None,
    out_col: str = "zkey",
):
    """Append a Morton (Z-order) interleave key of two integer columns —
    the data-layout primitive behind multi-dimensional clustering: sorting
    (or range-partitioning) by ``zkey`` co-locates rows that are close in
    BOTH dimensions, so per-file min/max stats prune scans on either
    column (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` trick, here as a
    plain Dataset stage feeding ``Dataset.sort``/``write_parquet``).

    Each column is first quantized to 16 bits with pure integer
    arithmetic — ``q = clip((v - lo) * 65536 // (hi - lo + 1), 0, 65535)``
    over the caller-supplied ``bounds[col] = (lo, hi)`` (defaults to the
    identity range ``(0, 65535)``) — then bit-spread with the classic
    mask-shift ladder and interleaved (first column = even bits). Every
    intermediate stays below 2³², so a DuckDB oracle writing the same
    shifts over BIGINT reproduces the key bit-for-bit; the whole op is a
    stateless ``map_batches`` (zero shuffle — the one all-to-all is the
    ``sort`` the caller chains on).
    """
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")
    bounds = bounds or {}
    for c in cols:
        lo_c, hi_c = bounds.get(c, (0, 65535))
        if hi_c - lo_c + 1 > (1 << 47):
            # ((v-lo) * 65536) would overflow int64 past a 2^47 span (and
            # the BIGINT oracle would error rather than wrap) — fail
            # loudly at call time instead of degrading the layout to noise
            raise ValueError(
                f"zorder_key: bounds span for {c!r} exceeds 2^47; rescale "
                "the column (e.g. epoch-us // 1000) or tighten bounds"
            )

    def quantize(v: np.ndarray, lo: int, hi: int) -> np.ndarray:
        span = hi - lo + 1
        # clip BEFORE the diff: out-of-bounds values could overflow the
        # int64 subtraction; clip-then-quantize lands on the same 0/65535
        vc = np.clip(v.astype(np.int64), lo, hi)
        q = ((vc - lo) * 65536) // span
        return np.clip(q, 0, 65535).astype(np.uint64)

    def spread16(x: np.ndarray) -> np.ndarray:
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
        return x

    c0, c1 = cols
    lo0, hi0 = bounds.get(c0, (0, 65535))
    lo1, hi1 = bounds.get(c1, (0, 65535))

    def key(batch: pa.Table) -> pa.Table:
        x = batch[c0].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = batch[c1].cast(pa.int64()).to_numpy(zero_copy_only=False)
        z = spread16(quantize(x, lo0, hi0)) | (
            spread16(quantize(y, lo1, hi1)) << np.uint64(1)
        )
        return batch.append_column(out_col, pa.array(z.astype(np.int64), pa.int64()))

    return ds.map_batches(key, batch_format="pyarrow")


def zorder_sort(ds, cols, bounds: dict | None = None, out_col: str = "zkey"):
    """:func:`zorder_key` + the global range sort on the key — the actual
    layout-rewrite pipeline stage (chain ``.write_parquet`` on the result
    for a clustered table)."""
    return zorder_key(ds, cols, bounds, out_col).sort(out_col)


def consistent_shard(
    ds,
    key_col: str = "doc_id",
    n_shards: int = 8,
    replicas: int = 64,
    salt: str = "ring",
):
    """Consistent-hash ring shard assignment — the placement rule that
    keeps resharding cheap: growing ``n_shards`` by one moves only
    ~1/n of the keys (plain ``hash % n`` moves almost all of them), so a
    100-TB corpus can rebalance incrementally. ``replicas`` virtual nodes
    per shard smooth the load (64 gives ~±13 % spread).

    Deterministic and cross-engine exact: ring points are
    ``md5_number_lower(salt:shard:replica)``, a key routes to the shard
    owning the first ring point ≥ ``md5_number_lower(key)`` (wrapping to
    the ring's minimum). The ring (n_shards × replicas rows) lives in the
    closure — broadcast once with the task, probed per batch with one
    vectorized ``searchsorted``; no shuffle, no per-row Python.

    Output: all input columns + ``shard`` (int32).
    """
    from .dedup import _md5_u64

    pts = []
    for s in range(n_shards):
        for r in range(replicas):
            pts.append((_md5_u64(f"{salt}:{s}:{r}"), s))
    pts.sort()
    ring = np.asarray([p for p, _s in pts], dtype=np.uint64)
    ring_shard = np.asarray([s for _p, s in pts], dtype=np.int32)

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        h = np.asarray(
            [_md5_u64(str(k)) for k in keys], dtype=np.uint64
        )
        idx = np.searchsorted(ring, h, side="left")
        idx[idx == len(ring)] = 0  # wrap
        return batch.append_column(
            "shard", pa.array(ring_shard[idx], pa.int32())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def shard_balance(
    ds,
    key_col: str = "doc_id",
    n_shards: int = 8,
    replicas: int = 64,
    salt: str = "ring",
):
    """Placement-quality report for :func:`consistent_shard`: per-shard
    row counts plus the load factor ``count / (total / n_shards)`` — the
    pre-flight check before committing a ring layout ("is 64 vnodes
    enough smoothing for this key population?").

    One assignment pass + a shard-keyed combiner count (≤ n_shards rows
    cross); the load factor is one exact division of exact integers ⇒
    bitwise vs the SQL replay. Shards that received zero keys still
    appear (load 0.0). Returns a pa.Table ``(shard, n_keys, load)``
    ordered by shard."""
    from .agg import grouped_agg

    assigned = consistent_shard(ds, key_col, n_shards, replicas, salt)
    counts = grouped_agg(
        assigned.select_columns(["shard"]),
        ["shard"],
        {"n_keys": ("count", "shard")},
    ).to_pandas()  # ≤ n_shards rows
    by_shard = dict(zip(counts["shard"], counts["n_keys"]))
    total = int(counts["n_keys"].sum()) if len(counts) else 0
    shards = list(range(n_shards))
    n_keys = [int(by_shard.get(s, 0)) for s in shards]
    mean = float(total) / float(n_shards)
    load = [
        (float(n) / mean) if mean > 0 else None for n in n_keys
    ]
    return pa.table(
        {
            "shard": pa.array(shards, pa.int32()),
            "n_keys": pa.array(n_keys, pa.int64()),
            "load": pa.array(load, pa.float64()),
        }
    )
