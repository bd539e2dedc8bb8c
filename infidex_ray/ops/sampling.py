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


def _keep_mask(keys: list, rate_ppm: int, salt: str) -> list[bool]:
    return [_md5_u64(f"{salt}:{k}") % SAMPLE_MOD < rate_ppm for k in keys]


def sample_hash(ds, rate: float, key_col: str = "doc_id", salt: str = "s0"):
    """Keep each row iff ``md5(salt:key) mod 1e6 < rate*1e6``.

    Deterministic Bernoulli(rate) sample keyed on ``key_col``; changing
    ``salt`` draws an independent sample (disjoint-ish splits for train /
    eval ablations come from disjoint rate windows — see
    :func:`sample_split`).
    """
    rate_ppm = int(round(rate * SAMPLE_MOD))

    def flt(batch: pa.Table) -> pa.Table:
        mask = _keep_mask(batch[key_col].to_pylist(), rate_ppm, salt)
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")


def sample_split(ds, lo: float, hi: float, key_col: str = "doc_id", salt: str = "s0"):
    """Keep rows whose hash bucket falls in [lo, hi) — non-overlapping
    windows give exactly disjoint train/val/test splits of one corpus."""
    lo_ppm, hi_ppm = int(round(lo * SAMPLE_MOD)), int(round(hi * SAMPLE_MOD))

    def flt(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        mask = [
            lo_ppm <= _md5_u64(f"{salt}:{k}") % SAMPLE_MOD < hi_ppm for k in keys
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(flt, batch_format="pyarrow")
