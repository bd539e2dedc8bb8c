"""As-of and range (interval) join operators."""

import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


@pytest.fixture(scope="module")
def sides(ray_session):
    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "ts": pa.array([100, 205, 50, 100, 100], pa.timestamp("us")),
            "lid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([1, 1, 1, 2], pa.int64()),
            "rts": pa.array([100, 100, 200, 150], pa.timestamp("us")),
            "rid": pa.array([7, 9, 8, 5], pa.int64()),
            "payload": pa.array([0.5, 0.75, 1.5, 2.5], pa.float64()),
        }
    )
    return _ds(left), _ds(right)


def test_asof_join_semantics(sides):
    from infidex_ray.ops.joins import asof_join

    left, right = sides
    out = (
        asof_join(
            left,
            right,
            on="k",
            right_on="rk",
            left_ts="ts",
            right_ts="rts",
            right_tie="rid",
            left_cols=["lid"],
            right_cols=["rid", "payload"],
        )
        .sort("lid")
        .to_pandas()
    )
    by_lid = {r.lid: r for r in out.itertuples()}
    # lid=10 (k=1, ts=100): two right rows at rts=100 -> tie-break max rid=9
    assert by_lid[10].rid == 9 and by_lid[10].payload == 0.75
    # lid=11 (k=1, ts=205): latest rts<=205 is 200 -> rid=8
    assert by_lid[11].rid == 8 and by_lid[11].right_ts_us == 200
    # lid=12 (k=1, ts=50): no right row at or before -> dropped
    assert 12 not in by_lid
    # lid=13 (k=2, ts=100): right row is at 150 (future) -> dropped
    assert 13 not in by_lid
    # lid=14 (k=3): key absent on right -> dropped
    assert 14 not in by_lid
    assert len(out) == 2


def test_range_join_boundaries_and_bucket_span(ray_session):
    from infidex_ray.ops.joins import range_join

    left = _ds(
        pa.table(
            {
                "v": pa.array([5.0, 10.0, 15.0, 25.0, 35.0], pa.float64()),
                "lid": pa.array([0, 1, 2, 3, 4], pa.int64()),
            }
        )
    )
    # interval [10, 30] spans buckets 1..3 at width 10; [5, 5] is degenerate
    right = _ds(
        pa.table(
            {
                "lo": pa.array([10.0, 5.0], pa.float64()),
                "hi": pa.array([30.0, 5.0], pa.float64()),
                "rid": pa.array([100, 200], pa.int64()),
            }
        )
    )
    out = (
        range_join(
            left,
            right,
            value_col="v",
            lo_col="lo",
            hi_col="hi",
            bucket_width=10.0,
            left_cols=["lid"],
            right_cols=["rid"],
        )
        .sort(["lid", "rid"])
        .to_pandas()
    )
    pairs = set(zip(out.lid, out.rid))
    # inclusive boundaries: v=10 and v=30 would match; v=25 inside; each
    # (left,right) pair appears exactly once even though [10,30] covers the
    # left row's bucket plus two more
    assert pairs == {(0, 200), (1, 100), (2, 100), (3, 100)}
    assert len(out) == 4  # no duplicate from multi-bucket replication


def _brute_asof(ldf, rdf):
    """Reference: per left row, latest right (ts, tie) at or before."""
    out = []
    for lr in ldf.itertuples():
        cand = rdf[(rdf.rk == lr.k) & (rdf.rts_us <= lr.ts_us)]
        if len(cand):
            best = cand.sort_values(["rts_us", "rid"]).iloc[-1]
            out.append((lr.lid, int(best.rid)))
    return sorted(out)


def test_asof_join_random_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    from infidex_ray.ops.joins import asof_join

    rng = np.random.default_rng(7)
    for trial in range(4):
        nl, nr = rng.integers(5, 60, 2)
        ldf = pd.DataFrame(
            {
                "k": rng.integers(0, 6, nl),
                "ts_us": rng.integers(0, 50, nl),
                "lid": np.arange(nl),
            }
        )
        rdf = pd.DataFrame(
            {
                "rk": rng.integers(0, 6, nr),
                # few distinct ts values force plenty of tie-break cases
                "rts_us": rng.integers(0, 50, nr),
                "rid": np.arange(nr),
            }
        )
        left = _ds(
            pa.table(
                {
                    "k": pa.array(ldf.k, pa.int64()),
                    "ts": pa.array(ldf.ts_us, pa.timestamp("us")),
                    "lid": pa.array(ldf.lid, pa.int64()),
                }
            )
        )
        right = _ds(
            pa.table(
                {
                    "rk": pa.array(rdf.rk, pa.int64()),
                    "rts": pa.array(rdf.rts_us, pa.timestamp("us")),
                    "rid": pa.array(rdf.rid, pa.int64()),
                }
            )
        )
        got = (
            asof_join(
                left, right, on="k", right_on="rk", left_ts="ts",
                right_ts="rts", right_tie="rid",
                left_cols=["lid"], right_cols=["rid"],
            )
            .to_pandas()
        )
        assert sorted(zip(got.lid, got.rid)) == _brute_asof(ldf, rdf), trial


def test_range_join_random_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    from infidex_ray.ops.joins import range_join

    rng = np.random.default_rng(11)
    for trial in range(4):
        nl, nr = rng.integers(5, 50, 2)
        v = rng.uniform(-20, 20, nl).round(2)
        lo = rng.uniform(-25, 15, nr).round(2)
        hi = (lo + rng.uniform(0, 30, nr)).round(2)
        left = _ds(
            pa.table({"v": pa.array(v), "lid": pa.array(np.arange(nl), pa.int64())})
        )
        right = _ds(
            pa.table(
                {
                    "lo": pa.array(lo),
                    "hi": pa.array(hi),
                    "rid": pa.array(np.arange(nr), pa.int64()),
                }
            )
        )
        got = (
            range_join(
                left, right, value_col="v", lo_col="lo", hi_col="hi",
                bucket_width=7.0, left_cols=["lid"], right_cols=["rid"],
            )
            .to_pandas()
        )
        want = sorted(
            (li, ri)
            for li in range(nl)
            for ri in range(nr)
            if lo[ri] <= v[li] <= hi[ri]
        )
        assert sorted(zip(got.lid, got.rid)) == want, trial


def test_asof_and_sessionize_string_keys(ray_session):
    import numpy as np
    from infidex_ray.ops.joins import asof_join
    from infidex_ray.ops.windows import sessionize

    left = _ds(
        pa.table(
            {
                "domain": pa.array(["a.com", "b.org"], pa.string()),
                "ts": pa.array([100, 100], pa.timestamp("us")),
                "lid": pa.array([1, 2], pa.int64()),
            }
        )
    )
    right = _ds(
        pa.table(
            {
                "domain": pa.array(["a.com", "b.org"], pa.string()),
                "rts": pa.array([50, 150], pa.timestamp("us")),
                "rid": pa.array([10, 20], pa.int64()),
            }
        )
    )
    out = (
        asof_join(
            left, right, on="domain", left_ts="ts", right_ts="rts",
            right_tie="rid", left_cols=["lid"], right_cols=["rid"],
        )
        .to_pandas()
    )
    assert len(out) == 1 and out.iloc[0].domain == "a.com" and out.iloc[0].rid == 10

    ev = _ds(
        pa.table(
            {
                "sess_key": pa.array(["x", "x", "y"], pa.string()),
                "ts": pa.array([0, 10, 5], pa.timestamp("us")),
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
    )
    s = sessionize(ev, gap_s=1.0, user_col="sess_key").to_pandas()
    assert sorted(s.sess_key) == ["x", "y"]
    assert s[s.sess_key == "x"].iloc[0].n_events == 2


def test_broadcast_join_variants(ray_session):
    """inner / left outer / semi / anti against a python-dict oracle;
    oversize small side raises; empty small side raises."""
    import pytest
    import ray.data

    from infidex_ray.ops.joins import broadcast_join

    big = ray.data.from_items(
        [{"k": i % 5, "v": i} for i in range(40)]
    ).repartition(4)
    small = ray.data.from_items(
        [{"k": 0, "tag": "a"}, {"k": 1, "tag": "b"}, {"k": 7, "tag": "z"}]
    )
    inner = broadcast_join(big, small, on="k").to_pandas()
    assert set(inner.k) == {0, 1} and len(inner) == 16
    assert set(inner.columns) == {"k", "v", "tag"}
    left = broadcast_join(big, small, on="k", how="left").to_pandas()
    assert len(left) == 40 and left[left.k == 2].tag.isna().all()
    semi = broadcast_join(big, small, on="k", how="semi").to_pandas()
    assert set(semi.columns) == {"k", "v"} and len(semi) == 16
    anti = broadcast_join(big, small, on="k", how="anti").to_pandas()
    assert set(anti.k) == {2, 3, 4} and len(anti) == 24
    with pytest.raises(ValueError, match="max_small_rows"):
        broadcast_join(big, small, on="k", max_small_rows=2)
    with pytest.raises(ValueError, match="empty small side"):
        broadcast_join(big, small.filter(lambda r: False), on="k")


def test_hash_join_all_types_vs_arrow(ray_session):
    """hash_join must equal a single-node pa.Table.join for every how,
    including NULL-key rows (never match; survive under outer types)."""
    from infidex_ray.ops.joins import hash_join

    left = pa.table(
        {
            "k": pa.array([1, 2, None, 4, 2], pa.int64()),
            "lv": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([2, None, 5, 2], pa.int64()),
            "rv": pa.array([20, 30, 50, 21], pa.int64()),
        }
    )
    arrow_jt = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "full": "full outer",
    }
    for how, jt in arrow_jt.items():
        out = (
            hash_join(
                _ds(left),
                _ds(right),
                on="k",
                right_on="rk",
                left_cols=["lv"],
                right_cols=["rv"],
                how=how,
                num_slices=4,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        ref = (
            left.join(
                right.rename_columns(["k", "rv"]), keys=["k"], join_type=jt
            )
            .select(["k", "lv", "rv"])
            .to_pandas()
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_hash_join_rejects_bad_args(ray_session):
    from infidex_ray.ops.joins import hash_join

    l = _ds(pa.table({"k": pa.array([1], pa.int64()), "v": ["x"]}))
    r = _ds(pa.table({"k": pa.array([1], pa.int64()), "v": ["y"]}))
    with pytest.raises(ValueError, match="unsupported how"):
        hash_join(l, r, on="k", left_cols=["v"], right_cols=["v"], how="cross")
    with pytest.raises(ValueError, match="overlapping"):
        hash_join(l, r, on="k", left_cols=["v"], right_cols=["v"], how="inner")


def test_sorted_neighborhood_pairs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.joins import sorted_neighborhood_pairs

    rng = np.random.RandomState(2)
    n = 57
    ids = np.arange(n, dtype=np.int64)
    keys = rng.randint(0, 9, n)  # heavy ties: id tie-break matters
    t = pa.table({"id": pa.array(ids), "k": pa.array(keys)})
    for w in (1, 3):
        got = (
            sorted_neighborhood_pairs(
                ray.data.from_arrow(t).repartition(6), "k", "id", window=w
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        # brute force over the total order (k, id)
        order = np.lexsort((ids, keys))
        want = []
        for j in range(n):
            for d in range(1, w + 1):
                if j - d >= 0:
                    want.append(
                        (ids[order[j - d]], ids[order[j]], d)
                    )
        want.sort()
        assert (
            list(zip(got["id_a"], got["id_b"], got["dist"])) == want
        ), f"window={w}"
    # count sanity: N*w - w*(w+1)/2 pairs
    assert len(want) == n * 3 - 6
