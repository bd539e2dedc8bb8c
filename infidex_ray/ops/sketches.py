"""Distributed sketch primitives: KMV distinct-count, Bloom membership,
count-min point counts, and priority sampling.

At 100 TB the exact answers behind these (count DISTINCT, anti-join
membership, full token counts, weighted reservoir) each cost an all-to-all
shuffle of the raw key stream; the sketches below bound the shuffle to
O(sketch size × blocks) partial rows while staying *deterministic*: every
hash is the cross-engine ``md5_number_lower`` parity hash
(:func:`infidex_ray.ops.dedup._md5_u64`) and every float rule is a single
IEEE-exact multiply/divide, so a DuckDB oracle recomputes the sketch —
including its approximation error — bit-for-bit. (The reference engine has
no sketch layer; these are beyond-reference ops for the curation suite,
same charter as ``ops/dedup.py``.)

Scale shapes:

- ``kmv_distinct``: per-block per-group bottom-k distinct hashes → one
  group-slice shuffle of ≤ groups × k × blocks rows. Estimate
  ``(k-1) * 2^64 / h_(k)`` (Bar-Yossef et al. 2002), exact below k.
- ``bloom_against``: the filter side collapses to ≤ m distinct bit
  positions per block; the probe side streams. The merged position set
  (≤ m ints) is broadcast once via ``ray.put`` — shard the filter for
  m beyond object-store comfort.
- ``cm_counts``: Cormode-Muthukrishnan point queries; only the
  depth × |keys| buckets of interest survive the partial stage, so the
  shuffle is O(depth × keys × blocks), not O(vocab).
- ``priority_sample``: Duffield-Lund-Thorup priority sampling. The
  priority ``w / u`` uses one IEEE division over integer-derived doubles —
  bit-identical in numpy and DuckDB — so the selected set is reproducible
  across engines, reruns, and cluster sizes (same property the
  deterministic_shuffle / sample_hash family relies on).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_num_slices, _md5_u64

_TWO64 = 18446744073709551616.0  # 2^64, exact in float64


def _md5_arr(values, salt: str) -> np.ndarray:
    """u64 parity hashes of ``f"{salt}:{v}"`` for a Python value list."""
    return np.asarray(
        [_md5_u64(f"{salt}:{v}") for v in values], dtype=np.uint64
    )


# --- KMV distinct ------------------------------------------------------------


def kmv_distinct(ds, keys, col: str, k: int = 1024, salt: str = "kmv"):
    """Per-group approximate count-distinct of ``col`` via the k-minimum-
    values sketch. Output: (*keys, est_distinct DOUBLE rounded 4dp,
    n_hashes BIGINT = min(k, true distinct)). Exact when a group has
    fewer than k distinct values; otherwise ``(k-1) * 2^64 / h_(k)``.
    """
    from .dedup import round_half_up4

    keys = list(keys)
    num_slices = _default_num_slices()

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + [col])
        t = t.filter(t[col].is_valid())
        if t.num_rows == 0:
            return pa.table(
                {
                    **{kc: batch[kc].slice(0, 0) for kc in keys},
                    "h": pa.array([], pa.int64()),
                    "slice": pa.array([], pa.int32()),
                }
            )
        t = t.group_by(keys + [col]).aggregate([])
        h = _md5_arr(t[col].to_pylist(), salt)
        # bottom-k per group: lexsort by (group code, hash), cut each run
        codes = _group_codes(t.select(keys))
        order = np.lexsort((h, codes))
        codes_s = codes[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        lens = np.diff(np.r_[starts, len(codes_s)])
        pos = np.arange(len(codes_s)) - np.repeat(starts, lens)
        keep = order[pos < k]
        kept = t.take(pa.array(keep, pa.int64()))
        hk = h[keep]
        # route by GROUP, not hash: all of a group's partials must meet
        gsl = np.asarray(
            [
                _md5_u64("gs:" + "\x1f".join(map(str, row))) % num_slices
                for row in zip(*(kept[kc].to_pylist() for kc in keys))
            ],
            dtype=np.int32,
        ) if keys else np.zeros(len(keep), dtype=np.int32)
        out = {kc: kept[kc] for kc in keys}
        out["h"] = pa.array(hk.view(np.int64))
        out["slice"] = pa.array(gsl)
        return pa.table(out)

    def finish(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["slice"])
        t = t.group_by(keys + ["h"]).aggregate([])  # re-distinct across blocks
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        codes = _group_codes(t.select(keys))
        order = np.lexsort((h, codes))
        codes_s, h_s = codes[order], h[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        lens = np.diff(np.r_[starts, len(codes_s)])
        reps = t.take(pa.array(order[starts], pa.int64()))
        n_hashes = np.minimum(lens, k)
        est = np.empty(len(starts), dtype=np.float64)
        small = lens < k
        est[small] = lens[small].astype(np.float64)
        if (~small).any():
            kth = h_s[starts[~small] + (k - 1)].astype(np.float64)
            est[~small] = (float(k - 1) * _TWO64) / kth
        out = {kc: reps[kc] for kc in keys}
        out["est_distinct"] = pa.array([round_half_up4(x) for x in est])
        out["n_hashes"] = pa.array(n_hashes.astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slice")
        .map_groups(finish, batch_format="pyarrow")
    )


def _group_codes(gt: pa.Table) -> np.ndarray:
    """Dense int codes for the row tuples of a (small) key table."""
    n = gt.num_rows
    if gt.num_columns == 0:
        return np.zeros(n, dtype=np.int64)
    combo = np.asarray(
        [
            "\x1f".join(map(str, row))
            for row in zip(*(gt[c].to_pylist() for c in gt.column_names))
        ],
        dtype=object,
    )
    _, codes = np.unique(combo.astype(str), return_inverse=True)
    return codes.astype(np.int64)


# --- Bloom membership --------------------------------------------------------


def bloom_against(
    corpus,
    bench,
    col: str,
    m_bits: int = 4096,
    n_hashes: int = 3,
    salt: str = "bloom",
    id_col: str | None = None,
):
    """Probe every corpus row against a Bloom filter built from the bench
    side's ``col`` values. Output: (id?, col, bloom_hit BOOL). Hits include
    the filter's deterministic false positives — the point of the op is
    that the oracle reproduces exactly those.

    Filter build: each block emits its distinct bit positions (≤ m_bits
    rows), the union (≤ m_bits ints) is broadcast once via ``ray.put``;
    the probe side streams. For m beyond object-store comfort, shard by
    ``position // shard_bits`` and run one pass per shard.
    """
    import ray

    def bench_positions(batch: pa.Table) -> pa.Table:
        vals = pc.drop_null(batch[col]).unique().to_pylist()
        pos = set()
        for v in vals:
            for i in range(n_hashes):
                pos.add(_md5_u64(f"{salt}:{i}:{v}") % m_bits)
        return pa.table({"p": pa.array(sorted(pos), pa.int64())})

    parts = bench.map_batches(bench_positions, batch_format="pyarrow")
    positions = np.unique(
        np.asarray(
            [r["p"] for r in parts.take_all()],  # ≤ m_bits × blocks tiny rows
            dtype=np.int64,
        )
    )
    bits = np.zeros(m_bits, dtype=bool)
    if len(positions):
        bits[positions] = True
    bits_ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        vals = batch[col].to_pylist()
        hit = np.zeros(len(vals), dtype=bool)
        for r, v in enumerate(vals):
            if v is None:
                continue
            hit[r] = all(
                b[_md5_u64(f"{salt}:{i}:{v}") % m_bits] for i in range(n_hashes)
            )
        out = {}
        if id_col is not None:
            out[id_col] = batch[id_col]
        out[col] = batch[col]
        out["bloom_hit"] = pa.array(hit)
        return pa.table(out)

    return corpus.map_batches(probe, batch_format="pyarrow")


# --- Count-min point counts --------------------------------------------------


def cm_counts(
    ds,
    keys: list[str],
    text_col: str = "text",
    width: int = 64,
    depth: int = 4,
    salt: str = "cm",
):
    """Count-min estimates for the given tokens over the lowercased
    RE2-``\\s``-split token stream. Output: (token, cm_count BIGINT),
    cm_count = min over depth rows of the (token-colliding) bucket sums —
    ≥ the exact count by construction, deterministic given (width, depth).

    Only the depth × |keys| buckets of interest leave the partial stage:
    each block contributes ≤ depth × width rows, summed under a coarse
    bucket-slice groupby, and the final min-over-rows runs on the driver
    over depth × |keys| scalars.
    """
    num_slices = _default_num_slices()
    key_buckets = {
        (d, _md5_u64(f"{salt}:{d}:{t}") % width) for d in range(depth) for t in keys
    }

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.cast(batch[text_col], pa.string())), pattern=r"\s+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        tokens = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        dd, bb, cc = [], [], []
        for d in range(depth):
            bk = np.asarray(
                [_md5_u64(f"{salt}:{d}:{t}") % width for t in tokens],
                dtype=np.int64,
            )
            # keep only buckets some queried key maps to
            keep = np.asarray(
                [(d, int(b)) in key_buckets for b in bk], dtype=bool
            )
            if not keep.any():
                continue
            bu, inv = np.unique(bk[keep], return_inverse=True)
            cs = np.bincount(inv, weights=counts[keep]).astype(np.int64)
            dd.append(np.full(len(bu), d, dtype=np.int64))
            bb.append(bu)
            cc.append(cs)
        if not dd:
            return pa.table(
                {
                    "d": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "slice": pa.array([], pa.int32()),
                }
            )
        d_arr = np.concatenate(dd)
        b_arr = np.concatenate(bb)
        c_arr = np.concatenate(cc)
        sl = ((d_arr * width + b_arr) % num_slices).astype(np.int32)
        return pa.table(
            {
                "d": pa.array(d_arr),
                "b": pa.array(b_arr),
                "c": pa.array(c_arr),
                "slice": pa.array(sl),
            }
        )

    def slice_sum(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["slice"]).group_by(["d", "b"]).aggregate(
            [("c", "sum")]
        )
        return t.rename_columns(
            ["c" if c == "c_sum" else c for c in t.column_names]
        )

    sketch = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slice")
        .map_groups(slice_sum, batch_format="pyarrow")
    )
    # depth × |keys| scalars — driver-side min is the point-query step
    rows = sketch.take_all()
    table = {(r["d"], r["b"]): r["c"] for r in rows}
    out_t, out_c = [], []
    for t in keys:
        est = min(
            table.get((d, _md5_u64(f"{salt}:{d}:{t}") % width), 0)
            for d in range(depth)
        )
        out_t.append(t)
        out_c.append(est)
    order = np.argsort(np.asarray(out_t, dtype=object).astype(str), kind="stable")
    return pa.table(
        {
            "token": pa.array([out_t[i] for i in order], pa.string()),
            "cm_count": pa.array([int(out_c[i]) for i in order], pa.int64()),
        }
    )


# --- Priority sampling -------------------------------------------------------


def priority_sample(
    ds, k: int, weight_col: str, key_col: str, salt: str = "ps"
):
    """Duffield-Lund-Thorup priority sample of k rows: priority
    ``q = w / u`` with ``u = (CAST(h AS DOUBLE) + 1) / 2^64`` from the md5
    parity hash of ``salt:key`` — one IEEE-exact divide, so DuckDB's
    ``ORDER BY q DESC LIMIT k`` selects the identical set. Per-block
    partial top-k, then a global sort over ≤ k × blocks rows. Output:
    (key, weight, q) — order the caller's concern (the contract sorts by
    key).
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        w = (
            pc.cast(batch[weight_col], pa.float64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        h = _md5_arr(keys, salt).astype(np.float64)
        u = (h + 1.0) / _TWO64
        q = w / u
        top = np.argsort(-q, kind="stable")[:k]
        t = batch.take(pa.array(top, pa.int64()))
        return pa.table(
            {
                key_col: t[key_col],
                weight_col: t[weight_col],
                "q": pa.array(q[top]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["q", key_col], descending=[True, False])
        .limit(k)
    )
