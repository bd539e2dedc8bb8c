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

__all__ = ["deterministic_shuffle"]

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
