"""Distributed Lloyd's k-means over an embedding column (``list<float>``).

The training-data use case: topic-bucketing / domain-mixing a web corpus by
embedding cluster before sampling (e.g. the DSIR / cluster-balanced
pretraining mixtures). Complements ``ops/similarity.ivf_build``, which
trains centroids on a driver-side SAMPLE — this op runs true Lloyd
iterations over the WHOLE corpus, so it is the 100-TB-honest variant:

* each iteration is ONE streaming ``map_batches`` pass emitting at most
  ``k`` partial rows per block — ``(cluster, member_count, sum_vector)`` —
  combined on the driver into new centroids. The driver only ever holds
  ``O(k × dim × blocks)`` partials, never vectors or assignments;
* centroids are broadcast once per iteration via ``ray.put`` (read in every
  task, never re-shipped per batch);
* the final labeling pass streams, so assignments can go straight to
  ``write_parquet(partition_cols=["cluster"])`` for pruned downstream reads.

Determinism contract (what the DuckDB oracle checks, ``sqlgen.kmeans_sql``):
centroids initialize to the embeddings of the ``k`` smallest ids (computed
with per-block partial min-k, no global sort); distances are squared
euclidean in float64; argmin ties break to the lowest cluster id; empty
clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import round_half_up4_arr
from .similarity import _to_matrix

__all__ = ["kmeans", "semantic_dedup", "embedding_outliers"]


def _sq_dists(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) squared euclidean distances, computed as the direct
    elementwise (e-c)² sum — NOT the |m|²-2mc+|c|² expansion, which differs
    numerically and would drift from the oracle's per-dim sum."""
    diff = m[:, None, :] - cents[None, :, :]
    return np.einsum("nkd,nkd->nk", diff, diff)


def _init_centroids(ds, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Embeddings of the k smallest ids: per-block partial min-k, then a
    tiny (k × blocks rows) driver merge — no global sort."""

    def mink(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(batch, vec_col)
        order = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                "vid": pa.array(ids[order]),
                "vec": pa.array([m[i].tolist() for i in order]),
            }
        )

    rows = ds.map_batches(mink, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vid"])
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return np.asarray([r["vec"] for r in rows[:k]], dtype=np.float64)


def kmeans(
    ds,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Returns ``(centroids, labeled_ds)`` — final float64 ``(k, dim)``
    centroids and a streaming Dataset of ``(id_col, cluster, dist2)`` rows
    (``dist2`` = squared distance to the winning centroid, rounded to 4
    for oracle comparison)."""
    import ray

    centroids = _init_centroids(ds, k, id_col, vec_col)

    for _ in range(iters):
        ref = ray.put(centroids)

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            cents = ray.get(_ref)
            m = _to_matrix(batch, vec_col)
            a = np.argmin(_sq_dists(m, cents), axis=1)
            uniq = np.unique(a)
            return pa.table(
                {
                    "cluster": pa.array(uniq.astype(np.int64)),
                    "n": pa.array(
                        [int((a == j).sum()) for j in uniq], pa.int64()
                    ),
                    "s": pa.array([m[a == j].sum(axis=0).tolist() for j in uniq]),
                }
            )

        # ≤ k rows per block — the ONLY thing the driver collects
        parts = ds.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.float64)
            counts[r["cluster"]] += r["n"]
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    ref = ray.put(centroids)

    def label(batch: pa.Table, _ref=ref) -> pa.Table:
        cents = ray.get(_ref)
        m = _to_matrix(batch, vec_col)
        d2 = _sq_dists(m, cents)
        a = np.argmin(d2, axis=1)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                "dist2": pa.array(
                    round_half_up4_arr(d2[np.arange(len(a)), a])
                ),
            }
        )

    return centroids, ds.map_batches(label, batch_format="pyarrow")


def embedding_outliers(
    ds,
    k: int = 8,
    iters: int = 3,
    top_n: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Per-cluster embedding outliers: the ``top_n`` vectors FARTHEST from
    their assigned k-means centroid (squared euclidean, rank ties → lowest
    id) — the standard curation probe for mislabeled / off-distribution /
    garbage embeddings (prune the tail of each semantic bucket before
    training). Returns ``(cluster, dist2, id, rank)`` rows.

    Pure composition of two already-scale-safe stages: :func:`kmeans`
    (streaming Lloyd's, ≤k partial rows per block per iteration) and
    ``ops.sampling.top_k_per_group`` (per-block partial top-k, so the
    cluster-keyed shuffle carries at most ``top_n`` rows per cluster per
    block). Ranking uses the 4-decimal-rounded distance the label pass
    emits, which is also what the unrolled-CTE oracle ranks on — no
    float-ordering divergence at the cut line."""
    from .sampling import top_k_per_group

    _, labeled = kmeans(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return top_k_per_group(labeled, "cluster", "dist2", id_col, top_n)


# --- SemDeDup-style semantic dedup --------------------------------------------


def semantic_dedup(
    ds,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_block: int = 4096,
    num_partitions: int | None = None,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    k-means-cluster the embedding space, mine near-duplicate pairs ONLY
    within each cluster (pairwise cosine ≥ threshold), connected-components
    the pair graph, keep the min-id representative per component. Returns
    the kept ``(id_col,)`` Dataset.

    The clustering is what makes semantic dedup tractable at corpus scale:
    pair mining is O(Σ cluster_size²) instead of the exact graph's O(N²),
    at the cost of missing duplicates that straddle a cluster boundary (the
    paper's accepted recall trade; the oracle mirrors it exactly).

    Partitioning assumption: ``k`` must scale with the corpus so one
    cluster fits a single group task (SemDeDup used 50k clusters for
    LAION-440M); in-group mining is blocked at ``pair_block`` rows per
    matmul so task memory stays O(cluster·dim + pair_block²). Components +
    anti-join reuse the label-propagation machinery
    (``dedup.dedup_corpus_ds`` — Dataset-resident labels, O(log diameter)
    rounds)."""
    import ray

    from .dedup import dedup_corpus_ds

    centroids, _ = kmeans(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(centroids)

    def assign_with_vecs(batch: pa.Table, _ref=ref) -> pa.Table:
        cents = ray.get(_ref)
        m = _to_matrix(batch, vec_col)
        a = np.argmin(_sq_dists(m, cents), axis=1)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                vec_col: batch[vec_col],
            }
        )

    assigned = ds.map_batches(assign_with_vecs, batch_format="pyarrow")
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def pairs_in_cluster(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        if len(ids) < 2:
            return empty
        m = _to_matrix(group, vec_col)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]  # ascending ids ⇒ rect blocks emit a<b
        oa, ob = [], []
        for s in range(0, len(ids), pair_block):
            mi = m[s : s + pair_block]
            for t in range(s, len(ids), pair_block):
                sims = mi @ m[t : t + pair_block].T
                if t == s:
                    sims = np.triu(sims, k=1)
                r, c = np.nonzero(sims >= threshold)
                if len(r):
                    oa.append(ids[s + r])
                    ob.append(ids[t + c])
        if not oa:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(oa), pa.int64()),
                "id_b": pa.array(np.concatenate(ob), pa.int64()),
            }
        )

    pairs = assigned.groupby("cluster").map_groups(
        pairs_in_cluster, batch_format="pyarrow"
    )
    return dedup_corpus_ds(
        ds.select_columns([id_col]), pairs, id_col=id_col,
        num_partitions=num_partitions,
    )
