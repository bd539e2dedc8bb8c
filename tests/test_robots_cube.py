"""robots.txt gating, CUBE aggregation, NFC + compression-ratio signals."""

import numpy as np
import pyarrow as pa


def test_parse_robots_groups_and_comments():
    from infidex_ray.ops.robots import parse_robots_txt

    txt = (
        "# global\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private  # trailing comment\n"
        "Allow: /private/ok\n"
        "Crawl-delay: 10\n"
        "User-agent: otherbot\n"
        "Disallow: /other\n"
    )
    assert parse_robots_txt(txt) == [
        (False, "/private"),
        (True, "/private/ok"),
    ]


def test_robots_longest_match_and_tie(ray_session):
    import ray.data

    from infidex_ray.ops.robots import robots_allowed

    rules = [
        (False, "/a"),
        (True, "/a/b"),
        (False, "/a/b/c"),
        (True, "/t"),   # exact tie:
        (False, "/t"),  # Allow must win regardless of order
        (False, "/z"),
        (True, "/z"),   # tie, reversed order
    ]
    paths = ["/a/x", "/a/b/x", "/a/b/c/x", "/t/x", "/z/x", "/none"]
    ds = ray.data.from_arrow(pa.table({"path": pa.array(paths)}))
    out = robots_allowed(ds, rules).to_pandas()
    expect = [False, True, False, True, True, True]
    assert out["allowed"].tolist() == expect


def test_grouped_cube_matches_rollup_prefixes(ray_session):
    import ray.data

    from infidex_ray.ops.agg import grouped_agg, grouped_cube

    tbl = pa.table(
        {
            "a": pa.array(["x", "x", "y", "y", "y"]),
            "b": pa.array(["p", "q", "p", "p", None]),
            "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = grouped_cube(ds, ["a", "b"], {"s": ("sum", "v")}).to_pandas()
    # level 0 == full detail, level 3 == grand total
    full = grouped_agg(ds, ["a", "b"], {"s": ("sum", "v")}).to_pandas()
    l0 = out[out.grouping_id == 0]
    assert len(l0) == len(full) and l0["s"].sum() == full["s"].sum() == 15
    assert out[out.grouping_id == 3]["s"].tolist() == [15]
    # the CUBE-only level (a rolled up, b kept) must exist: bitmask 2
    l2 = out[out.grouping_id == 2].set_index("b")
    assert l2.loc["p", "s"] == 8 and l2.loc["q", "s"] == 2


def test_unicode_normalize_and_compression_ratio(ray_session):
    import zlib

    import ray.data

    from infidex_ray.ops.textstats import compression_ratio, unicode_normalize_text

    decomposed = "cafe" + chr(769)  # e + combining acute
    tbl = pa.table({"text": pa.array([decomposed, "plain", None, ""])})
    ds = ray.data.from_arrow(tbl)
    out = unicode_normalize_text(ds).to_pandas()
    assert out["norm"].tolist()[0] == "café"
    assert out["changed"].tolist() == [True, False, None, False]

    rep = "abc" * 500
    out2 = compression_ratio(
        ray.data.from_arrow(pa.table({"text": pa.array([rep, ""])}))
    ).to_pandas()
    assert out2["n_bytes"].tolist() == [1500, 0]
    assert out2["n_compressed"].tolist()[0] == len(
        zlib.compress(rep.encode(), 6)
    )
    assert out2["ratio"].tolist()[0] < 0.05 and out2["ratio"].tolist()[1] == 1.0
