"""Replicates the driver's correctness gate locally: run each queries()
entry and its oracle_sql() on the same parquet tables; compare row count,
schema (sorted column names), and order-insensitive value multisets."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e


def _oracle_names():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(contract, con, name):
    q = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    exp = _canon(con.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    # order-insensitive value compare (float columns already rounded by both)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_rows_only_queries_run(contract):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    for name, fn in qs.items():
        if name in oracles:
            continue
        df = _to_pandas(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(contract):
    df = _to_pandas(contract.entry())
    assert len(df) >= 0 and "doc_id" in df.columns
