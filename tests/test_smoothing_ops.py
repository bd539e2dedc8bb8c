"""EWMA / rolling active users / trimmed mean — DuckDB double-entry on an
adversarial fixture (nulls, singleton keys, day gaps, tie-heavy groups)."""

import numpy as np
import pyarrow as pa
import pytest


def _duck():
    import duckdb

    return duckdb.connect()


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data

    n = 600
    us_day = 86_400_000_000
    t = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "user_id": pa.array([i % 37 for i in range(n)], pa.int64()),
            # deliberate ts ties within a user (event_id tie-break matters)
            "ts": pa.array(
                [((i * 977) % 23) * us_day + (i % 5) * 3_600_000_000 for i in range(n)],
                pa.timestamp("us"),
            ),
            "value": pa.array(
                [None if i % 41 == 0 else float((i * 31) % 97) / 4 for i in range(n)],
                pa.float64(),
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(5), t


def test_ewma_matches_recursive_sql(events):
    import pandas as pd

    from infidex_ray.ops.windows import ewma

    ds, t = events
    got = (
        ewma(ds, "user_id", "ts", "value", "event_id", alpha=0.5, num_slices=3)
        .to_pandas()
        .sort_values(["user_id", "i"])
        .reset_index(drop=True)
    )
    con = _duck()
    con.register("events", t.to_pandas())
    want = con.execute(
        "WITH RECURSIVE base AS (SELECT user_id, event_id, value AS x, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i "
        "FROM events WHERE value IS NOT NULL), "
        "rec AS (SELECT user_id, event_id, i, x AS ewma FROM base WHERE i = 1 "
        "UNION ALL SELECT b.user_id, b.event_id, b.i, "
        "(CAST(0.5 AS DOUBLE) * b.x) + ((CAST(1.0 AS DOUBLE) - "
        "CAST(0.5 AS DOUBLE)) * r.ewma) FROM rec r JOIN base b "
        "ON b.user_id = r.user_id AND b.i = r.i + 1) "
        "SELECT user_id, event_id, i, ewma FROM rec ORDER BY user_id, i"
    ).df()
    # bitwise: identical IEEE op sequence on both engines
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_rolling_active_users(events):
    from infidex_ray.ops.windows import rolling_active_users

    ds, t = events
    got = (
        rolling_active_users(ds, "user_id", "ts", window_days=3, num_slices=4)
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    con = _duck()
    con.register("events", t.to_pandas())
    want = con.execute(
        "WITH p AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d "
        "FROM events), "
        "e AS (SELECT DISTINCT user_id, d + x AS wd FROM p CROSS JOIN "
        "(SELECT unnest(generate_series(0, 2)) AS x)), "
        "days AS (SELECT DISTINCT d FROM p) "
        "SELECT wd AS day, count(*)::BIGINT AS active_users FROM e "
        "JOIN days ON days.d = e.wd GROUP BY wd ORDER BY day"
    ).df()
    assert got["day"].tolist() == want["day"].tolist()
    assert got["active_users"].tolist() == want["active_users"].tolist()
    # trailing window only counts observed days (no phantom future days)
    observed = set((t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000).tolist())
    assert set(got["day"].tolist()) <= observed


def test_grouped_trimmed_mean_edges(ray_session):
    import ray.data

    from infidex_ray.ops.agg import grouped_trimmed_mean

    t = pa.table(
        {
            "g": pa.array(
                ["a"] * 10 + ["tiny"] * 3 + ["ties"] * 10 + ["nulls"],
                pa.string(),
            ),
            "x": pa.array(
                [float(v) for v in [100, 1, 2, 3, 4, 5, 6, 7, 8, 9]]
                + [5.0, 6.0, 7.0]  # n=3: 10% trim drops nothing
                + [1.0] * 5 + [9.0] * 5  # tie-heavy: value multiset decides
                + [None],
                pa.float64(),
            ),
        }
    )
    got = (
        grouped_trimmed_mean(
            ray.data.from_arrow(t).repartition(4), "g", "x", trim_ppm=100_000
        )
        .to_pandas()
        .set_index("g")
    )
    # a: drop min(1) and max(100) -> mean of 2..9 = 44/8
    assert got.loc["a", "trimmed_mean"] == 44.0 / 8.0
    assert got.loc["a", "n_used"] == 8
    # tiny: 3 * 100000 // 1000000 == 0 -> plain mean
    assert got.loc["tiny", "trimmed_mean"] == 6.0
    # ties: drop one 1 and one 9 -> (4*1 + 4*9)/8 = 5
    assert got.loc["ties", "trimmed_mean"] == 5.0
    # all-null group: excluded entirely (no non-null rows reach the slice)
    assert "nulls" not in got.index


def test_time_weighted_avg(events):
    import pandas as pd

    from infidex_ray.ops.windows import time_weighted_avg

    ds, t = events
    got = (
        time_weighted_avg(ds, "user_id", "ts", "value", "event_id",
                          num_slices=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = _duck()
    con.register("events", t.to_pandas())
    want = con.execute(
        "WITH f AS (SELECT user_id, event_id, epoch_us(ts) AS tu, "
        "CAST(round(value * 100) AS BIGINT) AS v FROM events "
        "WHERE value IS NOT NULL), "
        "w AS (SELECT user_id, v, tu, lead(tu) OVER (PARTITION BY user_id "
        "ORDER BY tu, event_id) AS nxt FROM f), "
        "s AS (SELECT user_id, count(*)::BIGINT AS n_readings, "
        "CAST(sum(v * (coalesce(nxt, tu) - tu)) AS BIGINT) AS s, "
        "max(tu) - min(tu) AS span FROM w GROUP BY user_id) "
        "SELECT user_id, n_readings, CASE WHEN span > 0 THEN "
        "(s::DOUBLE / span::DOUBLE) / CAST(100 AS DOUBLE) END AS twa "
        "FROM s ORDER BY user_id"
    ).df()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_time_weighted_avg_step_semantics(ray_session):
    import ray.data

    from infidex_ray.ops.windows import time_weighted_avg

    # v=2 holds for 3us, v=10 holds for 1us, last reading holds nothing
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([0, 3, 4], pa.timestamp("us")),
            "value": pa.array([2.0, 10.0, 99.0], pa.float64()),
        }
    )
    got = time_weighted_avg(
        ray.data.from_arrow(t), "user_id", "ts", "value", "event_id"
    ).to_pandas()
    assert got["twa"].tolist() == [(2.0 * 3 + 10.0 * 1) / 4.0]
    # singleton key: zero span -> NULL
    t1 = t.slice(0, 1)
    got1 = time_weighted_avg(
        ray.data.from_arrow(t1), "user_id", "ts", "value", "event_id"
    ).to_pandas()
    assert got1["n_readings"].tolist() == [1] and got1["twa"].isna().all()


def test_grouped_rate_bounds(ray_session):
    import ray.data

    from infidex_ray.ops.agg import grouped_rate_bounds

    t = pa.table(
        {
            "g": pa.array(["small"] * 2 + ["big"] * 500, pa.string()),
            "flag": pa.array([True, True] + [True] * 480 + [False] * 20),
        }
    )
    got = (
        grouped_rate_bounds(ray.data.from_arrow(t).repartition(5), "g", "flag")
        .to_pandas()
        .set_index("g")
    )
    # 2/2 has rate 1.0 but its Wilson lower bound must rank BELOW 480/500
    assert got.loc["small", "rate"] == 1.0
    assert got.loc["small", "wilson_lo"] < got.loc["big", "wilson_lo"]
    assert 0.0 <= got.loc["small", "wilson_lo"] <= 1.0
    assert got.loc["big", "n"] == 500 and got.loc["big", "k"] == 480
    # interval actually contains the point estimate
    assert (
        got.loc["big", "wilson_lo"]
        < got.loc["big", "rate"]
        < got.loc["big", "wilson_hi"]
    )


def test_ewma_singleton_and_alpha(ray_session):
    import ray.data

    from infidex_ray.ops.windows import ewma

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "ts": pa.array([10, 20, 30], pa.timestamp("us")),
            "value": pa.array([4.0, 8.0, 5.0], pa.float64()),
        }
    )
    got = (
        ewma(ray.data.from_arrow(t), "user_id", "ts", "value", "event_id",
             alpha=0.25)
        .to_pandas()
        .sort_values(["user_id", "i"])
        .reset_index(drop=True)
    )
    # user 7: s1=4, s2=0.25*8 + 0.75*4 = 5; user 8 singleton: s1=5
    assert got["ewma"].tolist() == [4.0, 5.0, 5.0]
    assert got["i"].tolist() == [1, 2, 1]


def test_kmv_set_ops(ray_session):
    import ray.data

    from infidex_ray.ops.sketches import kmv_set_ops

    # sources A/B share users 0..199; B/C disjoint
    rows_src, rows_val = [], []
    for u in range(300):
        rows_src.append("A")
        rows_val.append(u)
    for u in range(100, 400):
        rows_src.append("B")
        rows_val.append(u)
    for u in range(1000, 1100):
        rows_src.append("C")
        rows_val.append(u)
    t = pa.table(
        {
            "src": pa.array(rows_src, pa.string()),
            "val": pa.array(rows_val, pa.int64()),
        }
    )
    got = (
        kmv_set_ops(ray.data.from_arrow(t).repartition(7), "src", "val", k=128)
        .to_pandas()
        .set_index(["src_a", "src_b"])
    )
    # A∪B = 400, A∩B = 200; k=128 < distinct -> estimates within ~25%
    assert abs(got.loc[("A", "B"), "union_est"] - 400) < 100
    assert abs(got.loc[("A", "B"), "inter_est"] - 200) < 60
    # B∩C disjoint -> intersection estimate exactly 0 hashes in both
    assert got.loc[("B", "C"), "inter_est"] == 0.0
    # A vs C: exact path NOT hit (each has >=128 distinct) but union must
    # exceed either side's sketch size
    assert got.loc[("A", "C"), "union_est"] > 128

    # exact path: tiny sources -> exact counts
    t2 = pa.table(
        {
            "src": pa.array(["X"] * 10 + ["Y"] * 8, pa.string()),
            "val": pa.array(list(range(10)) + list(range(5, 13)), pa.int64()),
        }
    )
    got2 = kmv_set_ops(
        ray.data.from_arrow(t2), "src", "val", k=128
    ).to_pandas()
    assert got2["union_est"].tolist() == [13.0]
    assert got2["inter_est"].tolist() == [5.0]


def test_median_streaming_multi_pass(ray_session):
    import pandas as pd
    import ray.data

    from infidex_ray.ops.agg import median_streaming

    rng = np.random.RandomState(1)
    n = 3000
    g = np.array([f"g{i % 5}" for i in range(n)], dtype=object)
    # wide value range: forces multiple bucket-narrowing passes
    x = rng.randint(-(10**12), 10**12, n).astype(np.float64)
    x[rng.rand(n) < 0.03] = np.nan  # valid-NaN rows must drop like NULLs
    t = pa.table({"k": pa.array(g), "v": pa.array(x)})
    got = (
        median_streaming(ray.data.from_arrow(t).repartition(6), "k", "v")
        .to_pandas()
        .set_index("k")
    )
    df = pd.DataFrame({"k": g, "v": x}).dropna()
    for key, grp in df.groupby("k"):
        vals = np.sort(
            np.copysign(
                np.floor(np.abs(grp["v"].values) + 0.5), grp["v"].values
            ).astype(np.int64)
        )
        m = len(vals)
        a, b = float(vals[(m + 1) // 2 - 1]), float(vals[m // 2])
        med = a + (b - a) * 0.5
        want = float(np.copysign(np.floor(abs(med) * 1e4 + 0.5) / 1e4, med))
        assert got.loc[key, "median"] == want
        assert got.loc[key, "n"] == m


def test_quantiles_streaming_matches_numpy(ray_session):
    import pandas as pd
    import ray.data

    from infidex_ray.ops.agg import quantiles_streaming

    rng = np.random.RandomState(9)
    n = 2500
    g = np.array([f"g{i % 3}" for i in range(n)], dtype=object)
    x = rng.randint(-(10**10), 10**10, n).astype(np.float64)
    t = pa.table({"k": pa.array(g), "v": pa.array(x)})
    got = (
        quantiles_streaming(ray.data.from_arrow(t).repartition(4), "k", "v")
        .to_pandas()
        .set_index("k")
    )
    for key, grp in pd.DataFrame({"k": g, "v": x}).groupby("k"):
        vals = np.copysign(
            np.floor(np.abs(grp["v"].values) + 0.5), grp["v"].values
        ).astype(np.int64)
        for q, qn in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.9, "q90")]:
            w = np.quantile(vals.astype(np.float64), q, method="linear")
            want = float(np.copysign(np.floor(abs(w) * 1e4 + 0.5) / 1e4, w))
            assert got.loc[key, qn] == want, (key, qn)


def test_weighted_median_streaming(ray_session):
    import pandas as pd
    import ray.data

    from infidex_ray.ops.agg import weighted_median_streaming

    rng = np.random.RandomState(6)
    n = 2000
    g = np.array([f"g{i % 4}" for i in range(n)], dtype=object)
    x = rng.randint(-(10**9), 10**9, n).astype(np.float64)
    w = rng.randint(0, 9, n).astype(np.int64)  # zero weights must drop
    t = pa.table({"k": pa.array(g), "v": pa.array(x), "w": pa.array(w)})
    got = (
        weighted_median_streaming(
            ray.data.from_arrow(t).repartition(5), "k", "v", "w"
        )
        .to_pandas()
        .set_index("k")
    )
    df = pd.DataFrame({"k": g, "v": x, "w": w})
    df = df[df["w"] > 0]
    for key, grp in df.groupby("k"):
        vals = np.copysign(
            np.floor(np.abs(grp["v"].values) + 0.5), grp["v"].values
        ).astype(np.int64)
        o = np.argsort(vals, kind="stable")
        vs, ws = vals[o], grp["w"].values[o]
        tw = int(ws.sum())
        cum = np.cumsum(ws)
        want = float(vs[np.searchsorted(cum, (tw + 1) // 2)])
        assert got.loc[key, "weighted_median"] == want
        assert got.loc[key, "total_w"] == tw
