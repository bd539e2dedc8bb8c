"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count, schema (column names sorted), and an ORDER-SENSITIVE value hash —
mirroring the driver. Usage::

    python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    h = hashlib.blake2b(digest_size=16)
    for _, row in df.iterrows():
        h.update(repr(tuple(row.tolist())).encode())
    return h.hexdigest()


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        except Exception:
            pass

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            rdf = to_pandas(fn(sf))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERR ray: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows={len(rdf)} (no_oracle)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERR oracle: {e}")
            n_fail += 1
            continue
        rows_ok = len(rdf) == len(odf)
        schema_ok = sorted(rdf.columns) == sorted(odf.columns)
        hash_ok = rows_ok and schema_ok and value_hash(rdf) == value_hash(odf)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{name:28s} {status} rows={len(rdf)}/{len(odf)} "
            f"schema={schema_ok} hash={hash_ok}"
        )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
