"""Embedding covariance + PCA projection (whitening / dim-reduction).

Large embedding corpora need second-moment hygiene before ANN indexing or
clustering: the covariance matrix drives whitening, OPQ-style rotation and
PCA dimensionality reduction (Jégou et al.; standard practice ahead of IVF
indexes). Both ops here follow the repo's combiner discipline:

* :func:`embedding_covariance` — each block collapses to ONE partial
  ``XᵀX`` / ``Σx`` / ``n`` (a d²+d+1-value row emitted long-form), so the
  shuffle carries ``(d²+d+1)·|blocks|`` rows — never a vector. The final
  reduce is a d²-sized driver aggregate (same tier as profile stats /
  label-prop counters). Population covariance, one fixed float64
  expression ``sxy/n − (sx_i/n)·(sx_j/n)`` rounded half-up to 4 decimals
  (distributed partial-sum order differs from a single-threaded engine by
  ulps; rounding makes both engines agree — the kmeans oracle precedent).
* :func:`pca_basis` — driver-side ``eigh`` of that d×d matrix (64×64 is
  microscopic next to the corpus); sign-fixed so the basis is
  deterministic.
* :func:`pca_project` — broadcasts (mean, basis) once via the task
  closure and projects every block with one matmul — stateless
  ``map_batches``, no shuffle; the scale path for reducing 100 TB of
  embeddings to k dims.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import round_half_up4_arr
from .similarity import _to_matrix

__all__ = ["embedding_covariance", "pca_basis", "pca_project"]


def embedding_covariance(ds, vec_col: str = "embedding"):
    """Long-form population covariance of the embedding coordinates:
    one row per ``(i, j)`` (0-indexed, full d×d) with ``cov`` rounded
    half-up to 4 decimals. Returns a pyarrow Table (d² rows; typed empty
    on an empty corpus)."""
    _n, mean, cov = _moments(ds, vec_col)
    d = len(mean)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return pa.table(
        {
            "i": pa.array(ii.ravel().astype(np.int64)),
            "j": pa.array(jj.ravel().astype(np.int64)),
            "cov": pa.array(round_half_up4_arr(cov.ravel()), pa.float64()),
        }
    )


def _moments(ds, vec_col: str):
    """(n, mean, cov) with UNROUNDED float64 covariance (basis input).
    Fixed expression ``sxy/n − outer(sx/n, sx/n)`` — the SQL oracle spells
    the same one."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _to_matrix(batch, vec_col)
        if x.size == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}
            )
        sxy = (x.T @ x).ravel()
        sx = x.sum(axis=0)
        vals = np.concatenate([sxy, sx, [float(len(x))]])
        return pa.table(
            {
                "k": pa.array(np.arange(len(vals), dtype=np.int64)),
                "v": pa.array(vals, pa.float64()),
            }
        )

    sums = (
        ds.select_columns([vec_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("v")
        .to_pandas()
    )
    # Ray 2.49: to_pandas() on a 0-row dataset drops even typed columns —
    # guard before touching them (empty corpus → 0-dim moments)
    if len(sums) == 0 or "k" not in sums.columns:
        return 0.0, np.empty(0, np.float64), np.empty((0, 0), np.float64)
    sums = sums.sort_values("k")
    vcol = "sum(v)" if "sum(v)" in sums.columns else "v"
    vals = sums[vcol].to_numpy()
    d = int(round((np.sqrt(4 * len(vals) - 3) - 1) / 2))
    sxy = vals[: d * d].reshape(d, d)
    sx = vals[d * d : d * d + d]
    n = float(vals[-1])
    mean = sx / n
    cov = sxy / n - np.outer(mean, mean)
    return n, mean, cov


def pca_basis(ds, vec_col: str = "embedding", k: int = 8):
    """Top-``k`` principal axes of the embedding corpus.

    Returns ``(mean, basis)`` — mean shape (d,), basis shape (d, k),
    eigenvalue-descending columns. Deterministic: ``eigh`` on the exact
    symmetric covariance, each column sign-fixed so its
    largest-magnitude coordinate is positive."""
    _n, mean, cov = _moments(ds, vec_col)
    if cov.size == 0:
        raise ValueError("pca_basis: empty embedding corpus")
    w, v = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    basis = v[:, order]
    for c in range(basis.shape[1]):
        m = np.argmax(np.abs(basis[:, c]))
        if basis[m, c] < 0:
            basis[:, c] = -basis[:, c]
    return mean, basis


def pca_project(
    ds,
    mean: np.ndarray,
    basis: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Project every vector onto the PCA axes: long-form
    ``(id_col, comp, value)`` rows (value rounded half-up to 4 decimals —
    the distributed dot product differs from a serial engine by ulps).
    ``mean``/``basis`` ship once in the task closure (small: d·k floats)."""
    mean = np.asarray(mean, dtype=np.float64)
    basis = np.asarray(basis, dtype=np.float64)
    k = basis.shape[1]

    def project(batch: pa.Table) -> pa.Table:
        x = _to_matrix(batch, vec_col)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        if x.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "comp": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        proj = (x - mean) @ basis  # (rows, k)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, k)),
                "comp": pa.array(np.tile(np.arange(k, dtype=np.int64), len(ids))),
                "value": pa.array(
                    round_half_up4_arr(proj.ravel()), pa.float64()
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")
