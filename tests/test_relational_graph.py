"""Relational report compositions, triangle counting, OLS, streaks."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _pdf(ds, *cols):
    df = ds.to_pandas()
    return df.sort_values(list(cols)).reset_index(drop=True)


def test_triangle_count_known_graph(ray_session):
    import ray.data

    from infidex_ray.ops.graph import triangle_count

    # K4 on {0,1,2,3} (every node in C(3,2)=3 triangles), plus a pendant
    # edge 3-4 and a disconnected 2-path 5-6-7 (no triangles), duplicate
    # and reversed edges, and a self-loop — all must be ignored.
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (1, 0), (2, 0),              # reversed duplicates
        (3, 4),                      # pendant
        (5, 6), (6, 7),              # path, no triangle
        (7, 7),                      # self-loop
    ]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    out = _pdf(triangle_count(ray.data.from_arrow(tbl).repartition(3)), "node")
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["triangles"].tolist() == [3, 3, 3, 3]


def test_triangle_count_vs_duckdb_random(ray_session):
    import duckdb
    import ray.data

    from infidex_ray.ops.graph import triangle_count

    rng = np.random.RandomState(11)
    tbl = pa.table(
        {
            "src": pa.array(rng.randint(0, 120, 1500), pa.int64()),
            "dst": pa.array(rng.randint(0, 120, 1500), pa.int64()),
        }
    )
    out = _pdf(triangle_count(ray.data.from_arrow(tbl).repartition(5)), "node")
    con = duckdb.connect()
    con.register("raw", tbl)
    exp = con.execute(
        """
        WITH e AS (SELECT DISTINCT least(src,dst) a, greatest(src,dst) b
                   FROM raw WHERE src<>dst),
        t AS (SELECT e1.a x, e1.b y, e2.b z FROM e e1
              JOIN e e2 ON e2.a=e1.a AND e2.b>e1.b
              JOIN e e3 ON e3.a=e1.b AND e3.b=e2.b),
        nodes AS (SELECT x node FROM t UNION ALL SELECT y FROM t
                  UNION ALL SELECT z FROM t)
        SELECT node, count(*)::BIGINT triangles FROM nodes
        GROUP BY node ORDER BY node
        """
    ).df()
    assert out["node"].tolist() == exp["node"].tolist()
    assert out["triangles"].tolist() == exp["triangles"].tolist()


def test_grouped_ols_exact_line(ray_session):
    import ray.data

    from infidex_ray.ops.agg import grouped_ols

    # group 'a': exact line y = 2x + 3; group 'b': zero x-variance -> NULL
    tbl = pa.table(
        {
            "g": pa.array(["a"] * 4 + ["b"] * 3),
            "x": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0]),
            "y": pa.array([5.0, 7.0, 9.0, 11.0, 1.0, 2.0, 3.0]),
        }
    )
    out = _pdf(
        grouped_ols(ray.data.from_arrow(tbl).repartition(3), "g", "x", "y"),
        "g",
    )
    a = out[out.g == "a"].iloc[0]
    assert a["n"] == 4 and a["slope"] == 2.0 and a["intercept"] == 3.0
    b = out[out.g == "b"].iloc[0]
    assert b["n"] == 3 and np.isnan(b["slope"]) and np.isnan(b["intercept"])


def test_grouped_ols_null_rows_excluded(ray_session):
    import ray.data

    from infidex_ray.ops.agg import grouped_ols

    tbl = pa.table(
        {
            "g": pa.array(["a"] * 4),
            "x": pa.array([1.0, 2.0, None, 3.0], pa.float64()),
            "y": pa.array([2.0, 4.0, 9.0, None], pa.float64()),
        }
    )
    out = _pdf(grouped_ols(ray.data.from_arrow(tbl), "g", "x", "y"), "g")
    assert out.iloc[0]["n"] == 2 and out.iloc[0]["slope"] == 2.0


def test_activity_streaks_runs(ray_session):
    import ray.data

    from infidex_ray.ops.windows import activity_streaks

    day = 86_400_000_000
    # user 1: days 0,1,2, 5,6, 9  -> runs 3,2,1; user 2: day 4 twice -> 1 run
    us = [0, day + 5, 2 * day, 5 * day, 6 * day, 9 * day, 4 * day, 4 * day + 7]
    uid = [1, 1, 1, 1, 1, 1, 2, 2]
    tbl = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
        }
    )
    out = _pdf(
        activity_streaks(ray.data.from_arrow(tbl).repartition(3)), "user_id"
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["active_days"].tolist() == [6, 1]
    assert out["longest_streak"].tolist() == [3, 1]
    assert out["n_streaks"].tolist() == [3, 1]


@pytest.fixture(scope="module")
def tpch(ray_session):
    import ray.data

    return {
        t: ray.data.read_parquet(f"{SF}/{t}.parquet")
        for t in ("lineitem", "orders", "customer", "nation")
    }


def _duck():
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_revenue_by_nation_matches_sql(tpch):
    from infidex_ray.ops.relational import revenue_by_nation

    out = _pdf(
        revenue_by_nation(
            tpch["lineitem"], tpch["orders"], tpch["customer"], tpch["nation"]
        ),
        "n_name",
    )
    exp = _duck().execute(
        """
        WITH f AS (SELECT l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)
         * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4 FROM lineitem)
        SELECT n_name, sum(rev_e4)::BIGINT / 10000.0 AS revenue,
               count(*)::BIGINT AS n_items
        FROM f JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    ).df()
    assert out["n_name"].tolist() == exp["n_name"].tolist()
    assert out["revenue"].tolist() == exp["revenue"].tolist()  # bitwise
    assert out["n_items"].tolist() == exp["n_items"].tolist()


def test_order_priority_counts_matches_sql(tpch):
    from infidex_ray.ops.relational import order_priority_counts

    out = _pdf(
        order_priority_counts(tpch["lineitem"], tpch["orders"]),
        "o_orderpriority",
    )
    exp = _duck().execute(
        """
        SELECT o_orderpriority, count(o_orderkey)::BIGINT AS n_orders
        FROM orders WHERE o_orderkey IN
        (SELECT l_orderkey FROM lineitem WHERE l_returnflag='R')
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert out["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert out["n_orders"].tolist() == exp["n_orders"].tolist()


def test_top_customer_revenue_matches_sql(tpch):
    from infidex_ray.ops.relational import top_customer_revenue

    out = _pdf(
        top_customer_revenue(
            tpch["lineitem"], tpch["orders"], tpch["customer"], k=7
        ),
        "c_custkey",
    )
    exp = _duck().execute(
        """
        WITH f AS (SELECT l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)
         * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4 FROM lineitem),
        s AS (SELECT o_custkey, sum(rev_e4)::BIGINT AS rev_e4 FROM f
         JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey),
        t AS (SELECT o_custkey, rev_e4 FROM s
         ORDER BY rev_e4 DESC, o_custkey LIMIT 7)
        SELECT t.o_custkey AS c_custkey, c_name,
               rev_e4::DOUBLE / 10000.0 AS revenue
        FROM t JOIN customer ON t.o_custkey = c_custkey ORDER BY c_custkey
        """
    ).df()
    assert len(out) == 7
    assert out["c_custkey"].tolist() == exp["c_custkey"].tolist()
    assert out["c_name"].tolist() == exp["c_name"].tolist()
    assert out["revenue"].tolist() == exp["revenue"].tolist()


def test_grouped_mad_exact(ray_session):
    import ray.data

    from infidex_ray.ops.textstats import grouped_mad

    tbl = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 2),
            "v": pa.array([1, 2, 3, 4, 100, 10, 20], pa.int64()),
        }
    )
    out = (
        grouped_mad(ray.data.from_arrow(tbl).repartition(2), "g", "v")
        .to_pandas()
        .set_index("g")
    )
    # group a: median 3, deviations [2,1,0,1,97] -> MAD 1; the 100 outlier
    # moves the mean wildly but not the MAD
    assert out.loc["a", "median"] == 3.0 and out.loc["a", "mad"] == 1.0
    assert out.loc["b", "median"] == 15.0 and out.loc["b", "mad"] == 5.0


def test_star_join_chains_dimensions(tpch):
    from infidex_ray.ops.joins import star_join

    fact = tpch["orders"]
    out = star_join(
        fact,
        [
            (tpch["customer"], "o_custkey", "c_custkey"),
            (tpch["nation"], "c_nationkey", "n_nationkey"),
        ],
    )
    df = out.to_pandas()
    assert len(df) == tpch["orders"].count()
    assert {"o_orderkey", "c_name", "n_name"} <= set(df.columns)
    assert df["n_name"].notna().all()


def test_second_review_batch_fixes(ray_session):
    """Regressions for the round-4 close-out review findings."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from infidex_ray.ops.graph import hits_scores
    from infidex_ray.ops.relational import order_priority_counts
    from infidex_ray.ops.shuffle import zorder_key
    from infidex_ray.ops.windows import event_transitions

    # event_transitions: NULL event_type no longer crashes the bincount
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(["a", None, "b", "a"], pa.string()),
        }
    )
    got = event_transitions(ray.data.from_arrow(ev)).to_pandas()
    # NULL-typed event dropped: transitions a->b and b->a remain
    assert sorted(zip(got["prev_type"], got["next_type"])) == [
        ("a", "b"), ("b", "a"),
    ]

    # hits_scores rejects num_iters < 1 instead of crashing on a None join
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([1], pa.int64()),
                  "dst": pa.array([2], pa.int64())})
    )
    with pytest.raises(ValueError):
        hits_scores(edges, num_iters=0)

    # order_priority_counts: flag matching nothing -> typed empty result
    li = ray.data.from_arrow(
        pa.table({"l_orderkey": pa.array([1], pa.int64()),
                  "l_returnflag": pa.array(["A"], pa.string())})
    )
    orders = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array([1], pa.int64()),
                  "o_orderpriority": pa.array(["1-URGENT"], pa.string())})
    )
    out = order_priority_counts(li, orders, flag="Z")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) == 0

    # zorder_key: spans past 2^47 fail loudly instead of wrapping int64
    t = ray.data.from_arrow(
        pa.table({"x": pa.array([0, 10], pa.int64()),
                  "y": pa.array([0, 10], pa.int64())})
    )
    with pytest.raises(ValueError):
        zorder_key(t, ["x", "y"], bounds={"x": (0, 2**50), "y": (0, 10)})


def test_scc_tarjan_and_distributed_parity(ray_session):
    """scc: driver Tarjan vs the distributed min-color peeling path on a
    planted digraph with cycles, chains, cross edges, and a stranded
    singleton — labels (min node per SCC) must match exactly."""
    import numpy as np
    import ray.data

    from infidex_ray.ops.graph import scc

    edges = []
    # two 4-cycles
    for base in (0, 10):
        for i in range(4):
            edges.append((base + i, base + (i + 1) % 4))
    edges.append((3, 10))      # cycle A -> cycle B (one way: separate SCCs)
    edges.append((20, 21))     # chain of singletons
    edges.append((21, 22))
    edges.append((22, 20))     # ...closed into a 3-cycle
    edges.append((30, 0))      # singleton feeding cycle A
    edges.append((13, 40))     # cycle B feeding a sink singleton

    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])

    import pyarrow as pa
    import ray as _ray

    def labels(out_ds):
        t = pa.concat_tables(
            [b for b in _ray.get(out_ds.materialize().to_arrow_refs())
             if b.num_rows]
        )
        return dict(zip(t["node"].to_pylist(), t["scc_id"].to_pylist()))

    small = labels(scc(ds))
    big = labels(scc(ds, num_partitions=4))
    assert small == big
    assert small[0] == small[1] == small[2] == small[3] == 0
    assert small[10] == small[13] == 10
    assert small[20] == small[21] == small[22] == 20
    assert small[30] == 30 and small[40] == 40
