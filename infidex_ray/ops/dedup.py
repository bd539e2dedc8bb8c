"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (100 TB):

* exact: hash inside ``map_batches`` (tiny rows leave the task), then one
  ``groupby(hash)`` shuffle of (hash, doc_id) pairs — never the text.
* MinHash/LSH: signatures computed vectorized per batch; the shuffle key is
  the (band, bucket-hash) pair, so each band groupby moves 8-byte keys.
* n-gram Jaccard: inverted-index join — ``flat_map`` distinct shingles →
  groupby(shingle) → per-group pair emission with a hot-shingle cap (a
  shingle shared by k docs emits k² pairs; shingles with df > cap are
  dropped like the engine's stop terms, documented below).
* embedding: brute-force blocked matmul against a ``ray.put`` broadcast of
  the (id, vector) matrix for small sides; LSH-bucketed for large.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analyzer import normalize

# --- exact dedup -------------------------------------------------------------


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Groups of byte-identical ``text``; keeps min(doc_id) per group.
    Returns (keep_id, n_dupes) — one row per distinct text."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({"h": pa.array(hashes, pa.string()), "doc_id": batch[id_col]})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("h").aggregate(
        __import__("ray").data.aggregate.Min("doc_id"),
        __import__("ray").data.aggregate.Count(),
    )

    def rename(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in batch.column_names}
        return pa.table(
            {
                "keep_id": cols.get("min(doc_id)"),
                "n_dupes": cols.get("count()"),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def exact_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id_a, id_b) pairs linking each duplicate doc to its group's min-id
    representative (id_a = min of the byte-identical-text group). Feeds
    ``dedup_corpus`` for the exact-dedup pipeline; the shuffle moves only
    (hash, doc_id) rows, never the text."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({"h": pa.array(hashes, pa.string()), "doc_id": batch[id_col]})

    def pairs_group(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        return pa.table(
            {
                "id_a": pa.array([ids[0]] * (len(ids) - 1), pa.int64()),
                "id_b": pa.array(ids[1:], pa.int64()),
            }
        )

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .map_groups(pairs_group, batch_format="pyarrow")
    )


# --- shingles ----------------------------------------------------------------


def round_half_up4(x: float) -> float:
    """Round to 4 decimals half-away-from-zero — matches DuckDB/SQL ROUND
    (Python's round is banker's; values like 0.56785 would diverge from the
    SQL oracles by one ulp at the 4th decimal)."""
    import math

    return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)


def char_shingles(text: str, n: int = 3) -> set:
    """Distinct character n-grams of the normalized+lowered text."""
    t = normalize(text or "").lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


# --- n-gram Jaccard (exact, inverted-index join) ----------------------------


def ngram_jaccard_pairs(
    ds,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_shingle_cap: int = 20,
):
    """Near-dup pairs by exact Jaccard on distinct char n-grams.

    Candidate generation: inverted-index join restricted to RARE shingles
    (df ≤ rare_shingle_cap) — the standard trick that bounds the quadratic
    per-shingle pair blowup (a shingle shared by k docs emits k² pairs).
    Pairs that share only ubiquitous shingles are below any useful threshold
    anyway. The Jaccard reported per candidate pair is EXACT (full shingle
    sets). Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    import ray

    # shingle sets — small side, broadcast once (at 100 TB: replace with a
    # broadcast-join of candidate pair ids back to the shingle table)
    shingle_sets: dict[int, frozenset] = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            shingle_sets[i] = frozenset(char_shingles(t, n))
    sets_ref = ray.put(shingle_sets)

    def emit_shingles(batch: pa.Table) -> pa.Table:
        ids, sh = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for g in char_shingles(t, n):
                ids.append(i)
                sh.append(g)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingle": pa.array(sh, pa.large_string()),
            }
        )

    shingle_rows = ds.map_batches(emit_shingles, batch_format="pyarrow")

    def pairs_per_shingle(group: pa.Table) -> pa.Table:
        docs = sorted(set(group["doc_id"].to_pylist()))
        if len(docs) < 2 or len(docs) > rare_shingle_cap:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        a, b = [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a.append(docs[i])
                b.append(docs[j])
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    cand = shingle_rows.groupby("shingle").map_groups(
        pairs_per_shingle, batch_format="pyarrow"
    )
    uniq = cand.groupby(["id_a", "id_b"]).count()

    def score(batch: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):
            sa, sb = ss.get(x, frozenset()), ss.get(y, frozenset())
            union = len(sa | sb)
            jac = len(sa & sb) / union if union else 0.0
            if jac >= threshold:
                out_a.append(x)
                out_b.append(y)
                out_j.append(round_half_up4(jac))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return uniq.map_batches(score, batch_format="pyarrow")


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a·x + b) mod p over the shingle hash set."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None]
    # (a*x + b) mod p with uint64 wrap-around is fine for minima comparisons
    # as long as it is applied consistently; use object-free modmul via float?
    # → do exact mod-p arithmetic in python ints is slow; use (a*x+b) % p on
    # uint64 with np.mod after casting through uint64 multiplication modulo
    # 2^64 — consistent, uniform, deterministic.
    vals = (x * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def word_shingles(text: str, n: int = 3) -> set:
    """Distinct word n-gram shingles of normalized+lowered text (the standard
    web-dedup shingling unit — char grams have too high a baseline overlap)."""
    from ..analyzer import _word_splitter
    from ..config import DEFAULT_DELIMITERS

    t = normalize(text or "").lower()
    ws = [w for w in _word_splitter(DEFAULT_DELIMITERS).split(t) if w]
    if len(ws) < n:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def minhash_lsh_pairs(
    ds,
    num_perm: int = 128,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    threshold: float = 0.5,
):
    """MinHash+LSH near-dup pairs over word n-gram shingles: docs sharing any
    band bucket become candidates; candidates are verified by signature
    agreement and only pairs with est_jaccard ≥ threshold are returned.
    (id_a, id_b, est_jaccard), id_a < id_b. Deterministic (seeded)."""
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm, seed)

    def compute_sigs(batch: pa.Table) -> pa.Table:
        out_ids, out_sig = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sh = np.fromiter(
                (_hash64(g) for g in word_shingles(t, n)), dtype=np.uint64
            )
            out_ids.append(i)
            out_sig.append(minhash_signature(sh, a, b).tobytes())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    # signatures computed ONCE and materialized; both the band emission and
    # the verification stage read the cached blocks
    sigs = ds.map_batches(compute_sigs, batch_format="pyarrow").materialize()

    def emit_bands(batch: pa.Table) -> pa.Table:
        ids, band_ids, bucket = [], [], []
        for i, s in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
            sig = np.frombuffer(s, dtype=np.uint64)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                ids.append(i)
                band_ids.append(bi)
                bucket.append(int.from_bytes(h, "little", signed=True))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    band_rows = sigs.map_batches(emit_bands, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        docs = sorted(set(group["doc_id"].to_pylist()))
        pa_, pb_ = [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pa_.append(docs[i])
                pb_.append(docs[j])
        return pa.table({"id_a": pa.array(pa_, pa.int64()), "id_b": pa.array(pb_, pa.int64())})

    cand = band_rows.groupby(["band", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
    # distinct pairs
    uniq = cand.groupby(["id_a", "id_b"]).count()

    # verify with true signature agreement; the materialized sig blocks are
    # broadcast once (at 100 TB: hash-join candidate pairs against the sig
    # table instead of a driver-side dict)
    import ray

    sig_map: dict[int, np.ndarray] = {}
    for bt in sigs.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i, s in zip(bt["doc_id"].to_pylist(), bt["sig"].to_pylist()):
            sig_map[i] = np.frombuffer(s, dtype=np.uint64)
    sig_ref = ray.put(sig_map)

    def estimate(batch: pa.Table) -> pa.Table:
        sm = ray.get(sig_ref)
        oa, ob, oe = [], [], []
        for x, y in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            est = float((sm[x] == sm[y]).mean()) if x in sm and y in sm else 0.0
            if est >= threshold:
                oa.append(x)
                ob.append(y)
                oe.append(round_half_up4(est))
        return pa.table(
            {
                "id_a": pa.array(oa, pa.int64()),
                "id_b": pa.array(ob, pa.int64()),
                "est_jaccard": pa.array(oe, pa.float64()),
            }
        )

    return uniq.map_batches(estimate, batch_format="pyarrow")


# --- SimHash -----------------------------------------------------------------


def simhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> pa.Table:
    """64-bit SimHash over char n-gram features (weight = 1 per distinct)."""
    out = np.zeros(len(batch), dtype=np.int64)
    texts = batch[text_col].to_pylist()
    for i, t in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for g in char_shingles(t, n):
            h = _hash64(g)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        out[i] = np.int64(np.uint64(v).astype(np.int64))
    return pa.table({"doc_id": batch[id_col], "simhash": out})


def simhash_dup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming, found by
    4-block bucketing (a pair within distance 3 shares at least one of 4
    16-bit blocks — pigeonhole)."""
    hashed = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pyarrow"
    )

    def emit_blocks(batch: pa.Table) -> pa.Table:
        ids, blk, key, full = [], [], [], []
        for i, h in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            uh = np.uint64(h)
            for bi in range(4):
                ids.append(i)
                blk.append(bi)
                key.append(int((int(uh) >> (16 * bi)) & 0xFFFF))
                full.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "block": pa.array(blk, pa.int32()),
                "key": pa.array(key, pa.int32()),
                "simhash": pa.array(full, pa.int64()),
            }
        )

    blocks = hashed.map_batches(emit_blocks, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist())))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                x = np.uint64(rows[i][1]) ^ np.uint64(rows[j][1])
                ham = bin(int(x)).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "hamming": pa.array(d, pa.int32()),
            }
        )

    cand = blocks.groupby(["block", "key"]).map_groups(pairs, batch_format="pyarrow")
    return cand.groupby(["id_a", "id_b"]).min("hamming").map_batches(
        lambda t: pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "hamming": t["min(hamming)" if "min(hamming)" in t.column_names else "hamming"],
            }
        ),
        batch_format="pyarrow",
    )


# --- embedding cosine near-dup ----------------------------------------------


def embedding_dup_pairs(
    ds, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Pairs with cosine similarity ≥ threshold. Small-side broadcast design:
    the normalized (id, matrix) pair is ``ray.put`` once and every batch does
    one blocked matmul against it (at 100 TB replace the broadcast with
    LSH/IVF bucketing — see similarity.py)."""
    import ray

    ids_all: list[int] = []
    vecs: list[np.ndarray] = []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        ids_all.extend(b[id_col].to_pylist())
        for v in b[vec_col].to_pylist():
            vecs.append(np.asarray(v, dtype=np.float64))
    mat = np.vstack(vecs)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat_n = mat / norms[:, None]
    ids_arr = np.asarray(ids_all, dtype=np.int64)
    ref = ray.put((ids_arr, mat_n))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        bm = np.vstack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        bm = bm / bn[:, None]
        sims = bm @ all_mat.T
        rows, cols = np.nonzero(sims >= threshold)
        a = bids[rows]
        b2 = all_ids[cols]
        keep = a < b2
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b2[keep], pa.int64()),
                "cosine": pa.array([round_half_up4(v) for v in sims[rows, cols][keep]], pa.float64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        batch_pairs, batch_format="pyarrow"
    )


# --- cluster + filter --------------------------------------------------------


def dedup_clusters(pairs: pa.Table) -> dict[int, int]:
    """Union-find over near-dup pairs → {doc_id: cluster_representative}
    (representative = min doc_id in the cluster). Pairs are tiny relative to
    the corpus (only near-dups), so this runs on the driver; at extreme scale
    use iterative label propagation over the pairs Dataset."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def dedup_corpus(ds, pairs: pa.Table, id_col: str = "doc_id"):
    """Drop every near-duplicate except the min-id representative of its
    cluster: broadcast the (small) drop set, filter inside map_batches —
    the corpus itself streams, never materializes."""
    import ray

    clusters = dedup_clusters(pairs)
    drop = {doc for doc, rep in clusters.items() if doc != rep}
    drop_ref = ray.put(np.fromiter(drop, dtype=np.int64) if drop else np.empty(0, np.int64))

    def keep_batch(batch: pa.Table) -> pa.Table:
        drop_ids = ray.get(drop_ref)
        if len(drop_ids) == 0:
            return batch
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        return batch.filter(pa.array(~np.isin(ids, drop_ids)))

    return ds.map_batches(keep_batch, batch_format="pyarrow")
