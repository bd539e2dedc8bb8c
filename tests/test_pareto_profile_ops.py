"""Pareto frontier / group checksum / grouped skewness — brute-force and
DuckDB double-entry plus the edge cases the contract corpus can't plant
(NULL coordinates, duplicate skyline points, constant groups, all-null
groups, order/partitioning independence)."""

import numpy as np
import pyarrow as pa
import pytest


def _duck():
    import duckdb

    return duckdb.connect()


@pytest.fixture(scope="module")
def points(ray_session):
    """Deterministic 2-group point cloud with planted skyline structure:
    duplicate (x, y) pairs, dominated rows, and NULL/NaN coordinates."""
    import ray.data

    rows = []
    rid = 0
    for g in ("a", "b"):
        for i in range(200):
            x = float((i * 7) % 25)
            y = float((i * 13) % 40)
            rows.append((rid, g, x, y))
            rid += 1
        # exact duplicates on a frontier candidate: both must survive
        rows.append((rid, g, 24.0, 39.0))
        rid += 1
        rows.append((rid, g, 24.0, 39.0))
        rid += 1
        # NULL / NaN coordinates: dropped on both engines
        rows.append((rid, g, None, 50.0))
        rid += 1
        rows.append((rid, g, float("nan"), 50.0))
        rid += 1
    t = pa.table(
        {
            "rid": pa.array([r[0] for r in rows], pa.int64()),
            "g": pa.array([r[1] for r in rows], pa.string()),
            "x": pa.array([r[2] for r in rows], pa.float64()),
            "y": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(7), t


def _brute_skyline(t: pa.Table):
    """O(n²) reference: keep a row iff nothing in its group dominates it."""
    df = t.to_pandas().dropna(subset=["x", "y"])
    keep = []
    for _, r in df.iterrows():
        grp = df[df["g"] == r["g"]]
        dom = (
            (grp["x"] >= r["x"])
            & (grp["y"] >= r["y"])
            & ((grp["x"] > r["x"]) | (grp["y"] > r["y"]))
        )
        if not dom.any():
            keep.append(r["rid"])
    return sorted(keep)


def test_pareto_matches_bruteforce(points):
    from infidex_ray.ops.pareto import pareto_frontier

    ds, t = points
    got = pareto_frontier(ds, "g", "x", "y").to_pandas()
    assert sorted(got["rid"].tolist()) == _brute_skyline(t)
    # all original columns survive untouched
    assert sorted(got.columns) == ["g", "rid", "x", "y"]
    # planted duplicate frontier point: both copies kept per group
    dup = got[(got["x"] == 24.0) & (got["y"] == 39.0)]
    assert len(dup) == 4  # 2 copies × 2 groups


def test_pareto_partitioning_invariant(points):
    """Partial-skyline combiner property: 1 block and 23 blocks agree."""
    from infidex_ray.ops.pareto import pareto_frontier

    _, t = points
    import ray.data

    a = pareto_frontier(
        ray.data.from_arrow(t).repartition(1), "g", "x", "y"
    ).to_pandas()
    b = pareto_frontier(
        ray.data.from_arrow(t).repartition(23), "g", "x", "y", num_slices=5
    ).to_pandas()
    assert sorted(a["rid"].tolist()) == sorted(b["rid"].tolist())


def test_group_checksum_order_free_and_duckdb(ray_session):
    import ray.data

    from infidex_ray.ops.profile import group_checksum

    n = 500
    t = pa.table(
        {
            "id": pa.array(list(range(n)), pa.int64()),
            "k": pa.array([f"g{i % 4}" for i in range(n)], pa.string()),
            "v": pa.array(
                [None if i % 17 == 0 else f"val{i * 31 % 97}" for i in range(n)],
                pa.string(),
            ),
        }
    )
    got = (
        group_checksum(ray.data.from_arrow(t).repartition(9), "k", ["id", "v"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # row order / partitioning independence: shuffled rows, different blocks
    perm = np.random.RandomState(7).permutation(n)
    t2 = t.take(pa.array(perm, pa.int64()))
    got2 = (
        group_checksum(ray.data.from_arrow(t2).repartition(3), "k", ["id", "v"],
                       num_slices=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.equals(got2)

    con = _duck()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, count(*)::BIGINT AS n_rows, "
        "CAST(sum(CAST(md5_number_lower(concat("
        "coalesce(CAST(id AS VARCHAR), '∅'), '|', coalesce(v, '∅'))) "
        "% 4611686018427387904 AS BIGINT)) % "
        "CAST('4611686018427387904' AS HUGEINT) AS BIGINT) AS checksum "
        "FROM t GROUP BY k ORDER BY k"
    ).df()
    assert got["checksum"].tolist() == want["checksum"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()

    # a single changed cell flips exactly that group's checksum
    t3 = t.set_column(2, "v", pa.array(
        ["CHANGED" if i == 42 else (None if i % 17 == 0 else f"val{i * 31 % 97}")
         for i in range(n)], pa.string()))
    got3 = (
        group_checksum(ray.data.from_arrow(t3), "k", ["id", "v"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    diff = got["checksum"].values != got3["checksum"].values
    assert diff.tolist() == [False, False, True, False]  # 42 % 4 == 2

    # multiplicity sensitivity: {A, A, B} vs {C, C, B} must NOT collide
    # (an XOR fold cancels even-count rows; the wrapping sum does not)
    ta = pa.table({"k": pa.array(["g"] * 3), "v": pa.array(["A", "A", "B"])})
    tb = pa.table({"k": pa.array(["g"] * 3), "v": pa.array(["C", "C", "B"])})
    ca = group_checksum(ray.data.from_arrow(ta), "k", ["v"]).to_pandas()
    cb = group_checksum(ray.data.from_arrow(tb), "k", ["v"]).to_pandas()
    assert ca.iloc[0]["n_rows"] == cb.iloc[0]["n_rows"] == 3
    assert ca.iloc[0]["checksum"] != cb.iloc[0]["checksum"]


def test_row_number_global(ray_session):
    import ray.data

    from infidex_ray.ops.ranking import row_number_global

    t = pa.table(
        {
            "id": pa.array([5, 3, 9, 1, 7, 2, 8, 4, 6, 0], pa.int64()),
            "v": pa.array([1.0, 1.0, 2.0, 1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 1.0]),
        }
    )
    got = (
        row_number_global(ray.data.from_arrow(t).repartition(4), ["v", "id"])
        .to_pandas()
        .sort_values("row_number")
        .reset_index(drop=True)
    )
    # ties on v broken by id: exact SQL row_number() OVER (ORDER BY v, id)
    want_ids = [0, 1, 3, 5, 8, 4, 7, 9, 2, 6]
    assert got["id"].tolist() == want_ids
    assert got["row_number"].tolist() == list(range(1, 11))
    # all original columns preserved
    assert sorted(got.columns) == ["id", "row_number", "v"]
    # empty input: typed empty with the row_number column
    empty = row_number_global(ray.data.from_arrow(t.slice(0, 0)), ["v", "id"])
    # Ray 2.49 to_pandas() drops typed-empty columns — assert on the schema
    assert empty.count() == 0 and "row_number" in empty.schema().names


def test_grouped_percentile_rank(ray_session):
    import pandas as pd
    import ray.data

    from infidex_ray.ops.ranking import grouped_percentile_rank

    n = 400
    t = pa.table(
        {
            "id": pa.array(list(range(n)), pa.int64()),
            "g": pa.array([f"g{i % 3}" for i in range(n)], pa.string()),
            "v": pa.array(
                [None if i % 29 == 0 else float((i * 17) % 50) for i in range(n)],
                pa.float64(),
            ),
        }
    )
    got = (
        grouped_percentile_rank(
            ray.data.from_arrow(t).repartition(6), "g", "v", "id", num_slices=2
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = _duck()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT id, g, v, cume_dist() OVER (PARTITION BY g ORDER BY v) AS "
        "cume_dist FROM t WHERE v IS NOT NULL ORDER BY id"
    ).df()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_skewness_edges(ray_session):
    import ray.data

    from infidex_ray.ops.agg import grouped_skewness

    t = pa.table(
        {
            "k": pa.array(
                ["sym"] * 5 + ["skewed"] * 4 + ["const"] * 3 + ["nulls"] * 2,
                pa.string(),
            ),
            "x": pa.array(
                [1.0, 2.0, 3.0, 4.0, 5.0]  # symmetric: skew 0
                + [0.0, 0.0, 0.0, 10.0]  # right-skewed
                + [7.0, 7.0, 7.0]  # constant: m2=0 -> NULL
                + [None, None],  # all-null group: n=0, NULL stats
                pa.float64(),
            ),
        }
    )
    got = (
        grouped_skewness(ray.data.from_arrow(t).repartition(4), "k", "x")
        .to_pandas()
        .set_index("k")
    )
    assert got.loc["sym", "skew_pop"] == 0.0
    # hand-check: x = [0,0,0,10], mean 2.5, m2 18.75, m3 93.75, m4 820.3125
    assert got.loc["skewed", "skew_pop"] == pytest.approx(
        93.75 / (18.75 * np.sqrt(18.75)), abs=1e-6
    )
    assert got.loc["skewed", "kurt_excess"] == pytest.approx(
        820.3125 / (18.75 * 18.75) - 3.0, abs=1e-6
    )
    assert np.isnan(got.loc["const", "skew_pop"])
    assert got.loc["const", "n"] == 3
    assert got.loc["nulls", "n"] == 0
    assert np.isnan(got.loc["nulls", "kurt_excess"])
