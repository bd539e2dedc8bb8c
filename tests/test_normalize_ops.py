"""Edge-case coverage for ops/normalize.py + ops/lm.vocab_coverage
(the contract entries cover DuckDB parity at sf scale; these lock the
degenerate shapes the synthetic tables never hit)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from infidex_ray.ops.lm import vocab_coverage
from infidex_ray.ops.normalize import ntile_bucket, winsorize, zscore_cols


def _ds(ids, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "v": pa.array(vals, pa.float64()),
            }
        )
    )


def test_ntile_fewer_rows_than_buckets(ray_session):
    out = (
        ntile_bucket(_ds([3, 1, 2], [30.0, 10.0, 20.0]), "v", "doc_id", n=10)
        .to_pandas()
        .sort_values("v")
    )
    # N < n: NTILE assigns one row per bucket, 1..N
    assert out["bucket"].tolist() == [1, 2, 3]


def test_ntile_uneven_buckets(ray_session):
    # N=10, n=3 -> sizes 4,3,3 (first N%n buckets get ceil(N/n))
    out = (
        ntile_bucket(_ds(list(range(10)), [float(i) for i in range(10)]), "v", "doc_id", n=3)
        .to_pandas()
        .sort_values("v")
    )
    assert out["bucket"].tolist() == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_ntile_empty(ray_session):
    out = ntile_bucket(_ds([], []), "v", "doc_id", n=4)
    # Ray 2.49 to_pandas() drops typed-empty columns — check the schema
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "v", "bucket"]


def test_winsorize_clamps_tails(ray_session):
    vals = [float(i) for i in range(1, 101)]  # 1..100
    out = (
        winsorize(_ds(list(range(100)), vals), "v", "doc_id", lo=0.10, hi=0.90)
        .to_pandas()
        .sort_values("doc_id")
    )
    # exact linear quantiles of 1..100: q10 = 10.9, q90 = 90.1
    w = out["winsorized"].to_numpy()
    assert w.min() == pytest.approx(10.9) and w.max() == pytest.approx(90.1)
    # interior values pass through untouched
    assert w[49] == 50.0


def test_winsorize_empty(ray_session):
    out = winsorize(_ds([], []), "v", "doc_id")
    assert out.count() == 0
    assert "winsorized" in out.schema().names


def test_zscore_constant_column_is_nan(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "a": pa.array([5, 5, 5], pa.int64()),
                "b": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    out = zscore_cols(ds, ["a", "b"], id_col="doc_id").to_pandas().sort_values("doc_id")
    assert np.isnan(out["a_z"]).all()  # zero stddev -> NaN (SQL NULL)
    assert out["b_z"].tolist() == [-1.2247, 0.0, 1.2247]


def test_vocab_coverage_oov_and_empty_docs(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["cat cat dog", "cat zebra", "   "], pa.string()),
            }
        )
    )
    # vocab (min_count=2, trained on the corpus itself) = {cat}
    out = vocab_coverage(docs, min_count=2, vocab_size=100).to_pandas()
    out = out.sort_values("doc_id")
    assert out["n_tokens"].tolist() == [3, 2, 0]
    assert out["n_oov"].tolist() == [1, 1, 0]
    assert out["oov_rate"].tolist() == [pytest.approx(1 / 3), 0.5, 0.0]
