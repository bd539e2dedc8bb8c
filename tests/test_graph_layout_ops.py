"""HITS / BFS / event transitions / grouped variance / z-order / prefix-join
— double-entry vs DuckDB (same SQL shapes the contract oracles use) plus
hand-computed fixtures for the edge cases SQL can't plant easily."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_graph(ray_session):
    """Deterministic 40-node multigraph (same arithmetic family as the
    contract fixture, smaller modulus so hubs/authorities repeat)."""
    import pyarrow as pa
    import ray.data

    src, dst = [], []
    for d in range(60):
        for j in range(1, d % 4 + 1):
            src.append(d)
            dst.append((d * 7 + j * 13) % 40)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _duck():
    import duckdb

    return duckdb.connect()


def test_hits_matches_unrolled_sql(small_graph):
    import pandas as pd

    from infidex_ray.ops.graph import hits_scores

    got = (
        hits_scores(small_graph, num_iters=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    edges = small_graph.to_pandas()
    con = _duck()
    con.register("edges", edges)

    def half(prev, out, key, other):
        return (
            f"{out}r AS (SELECT e.{key} AS node, CAST(sum(p.v) AS BIGINT) AS v "
            f"FROM e JOIN {prev} p ON p.node = e.{other} GROUP BY e.{key}), "
            f"{out}m AS (SELECT max(v) AS m FROM {out}r), "
            f"{out} AS (SELECT nodes.node, CASE WHEN (SELECT m FROM {out}m) IS NULL "
            f"OR (SELECT m FROM {out}m) = 0 THEN 0 ELSE (coalesce(r.v, 0) * 1000000) "
            f"// (SELECT m FROM {out}m) END AS v FROM nodes LEFT JOIN {out}r r USING (node))"
        )

    sql = (
        "WITH e AS (SELECT src, dst FROM edges), "
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), "
        "h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS v FROM nodes), "
        + half("h0", "a1", "dst", "src")
        + ", "
        + half("a1", "h1", "src", "dst")
        + ", "
        + half("h1", "a2", "dst", "src")
        + ", "
        + half("a2", "h2", "src", "dst")
        + " SELECT h2.node, CAST(h2.v AS BIGINT) AS hub, CAST(a2.v AS BIGINT) "
        "AS authority FROM h2 JOIN a2 USING (node) ORDER BY node"
    )
    want = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # max-normalized fixed point: scores live in [0, scale], max hits scale
    assert got.hub.max() == 1_000_000 and got.authority.max() == 1_000_000


def test_bfs_levels_chain_and_depth_cap(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.graph import bfs_levels

    # 0→1→2→3→4→5 chain plus a 2-cycle and an unreachable island (8, 9)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3, 4, 6, 7, 8], pa.int64()),
                "dst": pa.array([1, 2, 3, 4, 5, 7, 6, 9], pa.int64()),
            }
        )
    )
    seeds = ray.data.from_arrow(pa.table({"node": pa.array([0, 6], pa.int64())}))
    got = (
        bfs_levels(edges, seeds, max_depth=3)
        .to_pandas()
        .set_index("node")["level"]
        .to_dict()
    )
    # depth cap 3: node 4 is at distance 4 → absent; cycle 6↔7 settles at 0/1
    assert got == {0: 0, 6: 0, 1: 1, 7: 1, 2: 2, 3: 3}


def test_event_transitions_ties_and_singletons(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.windows import event_transitions

    ts = pa.array(
        np.array([100, 200, 200, 300, 50, 50, 999], dtype="datetime64[us]")
    )
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 10, 11, 20], pa.int64()),
                "user_id": pa.array([7, 7, 7, 7, 8, 8, 9], pa.int64()),
                "ts": ts,
                "event_type": pa.array(
                    ["a", "b", "c", "a", "x", "y", "z"], pa.string()
                ),
            }
        )
    )
    got = (
        event_transitions(events)
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    con = _duck()
    con.register("events", events.to_pandas())
    want = con.execute(
        "WITH o AS (SELECT user_id, event_type, lead(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
        "SELECT event_type AS prev_type, nxt AS next_type, count(*)::BIGINT AS n "
        "FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the equal-ts pair (events 2, 3) must break ties by event_id: b→c
    assert ("b", "c") in set(zip(got.prev_type, got.next_type))
    # user 9 has one event → contributes nothing
    assert int(got.n.sum()) == 4


def test_grouped_variance_nulls_and_single_row(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.agg import grouped_variance

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "c", "c"], pa.string()),
            "x": pa.array([1.0, 2.0, 6.0, 5.0, None, None], pa.float64()),
        }
    )
    got = (
        grouped_variance(ray.data.from_arrow(tbl), "g", "x")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    a = got[got.g == "a"].iloc[0]
    assert a.n == 3 and a["mean"] == 3.0
    assert a.var_pop == pytest.approx(14 / 3, abs=1e-6)
    assert a.var_samp == 7.0
    b = got[got.g == "b"].iloc[0]
    assert b.n == 1 and b.var_pop == 0.0 and pd.isna(b.var_samp)
    c = got[got.g == "c"].iloc[0]  # all-null group survives with n = 0
    assert c.n == 0 and pd.isna(c.var_pop) and pd.isna(c["mean"])


def test_zorder_key_interleave_and_locality(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.shuffle import zorder_key, zorder_sort

    tbl = pa.table(
        {
            "id": pa.array(list(range(6)), pa.int64()),
            "x": pa.array([0, 3, 5, 70000, -4, 65535], pa.int64()),
            "y": pa.array([0, 0, 2, 1, 1, 65535], pa.int64()),
        }
    )
    got = (
        zorder_key(ray.data.from_arrow(tbl), ["x", "y"])
        .to_pandas()
        .set_index("id")["zkey"]
        .to_dict()
    )
    # spread(3)=0b101=5; spread(5)=0b10001=17, spread(2)=0b100 → <<1 = 0b1000
    assert got[0] == 0
    assert got[1] == 5
    assert got[2] == 17 + 8
    # out-of-range values clip to the 16-bit lattice corners
    assert got[3] == 0x55555555 | 2  # x 70000→65535, y=1 → spread(1)<<1
    assert got[4] == 2  # x −4 → 0, y=1
    assert got[5] == 0xFFFFFFFF  # both corners
    # z-sort keeps (x, y) neighbours adjacent: full 4×4 grid in z order
    grid = pa.table(
        {
            "x": pa.array([i % 4 for i in range(16)], pa.int64()),
            "y": pa.array([i // 4 for i in range(16)], pa.int64()),
        }
    )
    z = zorder_sort(ray.data.from_arrow(grid), ["x", "y"]).to_pandas()
    first4 = set(zip(z.x[:4], z.y[:4]))
    assert first4 == {(0, 0), (1, 0), (0, 1), (1, 1)}  # the z-curve quad


def test_jaccard_prefix_pairs_is_lossless(ray_session):
    import ray.data

    from infidex_ray.ops.dedup import (
        jaccard_prefix_pairs,
        round_half_up4,
        word_shingles,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while batman and robin "
        "fight crime in gotham city and superman flies faster than a bullet"
    )
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("quick", "qwick")},
        {"doc_id": 3, "text": base.replace("gotham", "metropolis")},
        {"doc_id": 4, "text": "totally different ray data arrow pipeline words"},
        {"doc_id": 5, "text": "short doc"},
        {"doc_id": 6, "text": "short doc"},
        {"doc_id": 7, "text": ""},
    ]
    t = 0.4
    got = jaccard_prefix_pairs(ray.data.from_items(rows), threshold=t).to_pandas()
    got_pairs = {
        (a, b): j for a, b, j in zip(got.id_a, got.id_b, got.jaccard)
    }
    # brute-force ground truth over ALL pairs — prefix filtering must be exact
    sh = {r["doc_id"]: word_shingles(r["text"]) for r in rows}
    want = {}
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i >= j or not sh[i] or not sh[j]:
                continue
            inter = len(sh[i] & sh[j])
            union = len(sh[i] | sh[j])
            jac = inter / union
            if jac >= t:
                want[(i, j)] = round_half_up4(jac)
    assert got_pairs == want
    assert (0, 1) in got_pairs and got_pairs[(0, 1)] == 1.0
    assert (5, 6) in got_pairs  # short-doc whole-text shingle contract


def test_coalesce_latest_per_column_survivorship(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.windows import coalesce_latest

    ts = pa.array(np.array([10, 20, 30, 5, 6], dtype="datetime64[us]"))
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 7, 8], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "ts": ts,
                # latest event_type is NULL → survivor = earlier 'b'
                "event_type": pa.array(["a", "b", None, None, None], pa.string()),
                # user 2 never has a value → NULL
                "value": pa.array([1.5, None, 9.0, None, None], pa.float64()),
            }
        )
    )
    got = (
        coalesce_latest(events)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got.loc[0, "latest_event_type"] == "b"
    assert got.loc[0, "latest_value"] == 9.0
    assert pd.isna(got.loc[1, "latest_event_type"])
    assert pd.isna(got.loc[1, "latest_value"])


def test_k_core_peels_tail(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.graph import k_core

    # triangle 1-2-3 (2-core) with a pendant chain 3-4-5
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3, 3, 4], pa.int64()),
                "dst": pa.array([2, 3, 1, 4, 5], pa.int64()),
            }
        )
    )
    got = (
        k_core(edges, k=2, max_rounds=3)
        .to_pandas()
        .set_index("node")["degree"]
        .to_dict()
    )
    assert got == {1: 2, 2: 2, 3: 2}  # chain peeled in two rounds


def test_ndcg_front_loaded_beats_buried(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.similarity import ndcg_label_eval

    # query 0 (label 0): nearest neighbors alternate labels so that the
    # match sits at rank 1; query 1 (label 1): its only match is buried.
    def vec(x):
        return [float(x), 1.0] + [0.0] * 6

    rows = [
        {"vec_id": 0, "embedding": vec(100), "label": 0},
        {"vec_id": 1, "embedding": vec(-100), "label": 1},
        # close to q0, label 0 (match at rank 1)
        {"vec_id": 2, "embedding": vec(99), "label": 0},
        {"vec_id": 3, "embedding": vec(98), "label": 1},
        # close to q1, wrong label first
        {"vec_id": 4, "embedding": vec(-99), "label": 0},
        {"vec_id": 5, "embedding": vec(-98), "label": 0},
        {"vec_id": 6, "embedding": vec(-97), "label": 1},
    ]
    got = (
        ndcg_label_eval(ray.data.from_items(rows), n_queries=2, k=3)
        .to_pandas()
        .set_index("query_id")
    )
    assert got.loc[0, "n_match"] == got.loc[1, "n_match"] == 1
    assert got.loc[0, "ndcg"] == 1.0  # match at rank 1
    assert got.loc[1, "ndcg"] < 1.0  # same precision, buried match


def test_grouped_hhi_bounds(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.agg import grouped_hhi

    tbl = pa.table(
        {
            "g": pa.array(["mono", "mono", "even", "even", "even", "even"]),
            "c": pa.array(["x", "x", "a", "b", "c", "d"]),
        }
    )
    got = (
        grouped_hhi(ray.data.from_arrow(tbl), "g", "c")
        .to_pandas()
        .set_index("g")
    )
    assert got.loc["mono", "hhi"] == 1.0 and got.loc["mono", "n_cats"] == 1
    assert got.loc["even", "hhi"] == 0.25 and got.loc["even", "n_cats"] == 4


def test_apply_changes_delete_wins_and_loses(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.windows import apply_changes

    ts = pa.array(np.array([1, 2, 3, 4, 9, 8], dtype="datetime64[us]"))
    stream = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
                "ts": ts,
                "op": pa.array(["U", "D", "D", "U", "D", "U"], pa.string()),
                "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
            }
        )
    )
    got = apply_changes(stream).to_pandas().set_index("user_id")
    # user 1: last change is a delete → gone; user 2: delete then upsert →
    # survives with v=40; user 3: delete is LATEST by ts → gone
    assert sorted(got.index) == [2]
    assert got.loc[2, "v"] == 40.0


def test_merge_intervals_touching_and_nested(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.windows import merge_intervals

    spans = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                # [0,10] ⊃ [2,5]; [10,15] touches; [20,25] separate
                "s": pa.array([0, 2, 10, 20, 7], pa.int64()),
                "e": pa.array([10, 5, 15, 25, 9], pa.int64()),
            }
        )
    )
    got = (
        merge_intervals(spans)
        .to_pandas()
        .sort_values(["user_id", "island"])
        .reset_index(drop=True)
    )
    rows = got.to_dict("records")
    assert rows[0] == {"user_id": 1, "island": 1, "start": 0, "end": 15, "n_spans": 3}
    assert rows[1] == {"user_id": 1, "island": 2, "start": 20, "end": 25, "n_spans": 1}
    assert rows[2] == {"user_id": 2, "island": 1, "start": 7, "end": 9, "n_spans": 1}


def test_grouped_string_agg_sorted_distinct_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.agg import grouped_string_agg

    tbl = pa.table(
        {
            "g": pa.array(["x", "x", "x", "x", "y"]),
            "v": pa.array(["b", "a", "b", None, None]),
        }
    )
    got = (
        grouped_string_agg(ray.data.from_arrow(tbl), "g", "v")
        .to_pandas()
        .set_index("g")
    )
    assert got.loc["x", "values"] == "a,b" and got.loc["x", "n_values"] == 2
    assert got.loc["y", "n_values"] == 0  # all-null group → empty list


def test_sitemap_urls_unclosed_and_nested(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.robots import sitemap_urls

    xml = [
        "<url><loc>http://a/1</loc></url><url><loc>http://a/2</loc></url>",
        "<url><loc>http://b/unclosed",  # no </loc> → dropped
        "<url><loc>bad<tag></loc></url>",  # '<' inside capture → dropped
        "",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
             "xml": pa.array(xml, pa.string())}
        )
    )
    got = sitemap_urls(ds).to_pandas().sort_values(["doc_id", "url"])
    assert list(got.url) == ["http://a/1", "http://a/2"]


def test_bpe_train_greedy_merge_semantics(ray_session):
    import ray.data

    from infidex_ray.ops.bpe import bpe_train

    # 'aaa' repeated: pair (a,a) dominates; greedy left-to-right merge of
    # [a,a,a] gives [aa, a] (not [a, aa]) — then round 2 merges (aa, a)
    rows = [{"text": "aaa aaa aaa bc bc"}] * 4
    got = bpe_train(ray.data.from_items(rows), num_merges=2).to_pandas()
    assert list(got["merged"]) == ["aa", "aaa"]
    assert got.loc[0, "pair_count"] == 24  # 2 adjacent (a,a) pairs × 12 words
    assert got.loc[1, "pair_count"] == 12  # (aa, a) once per word


def test_bpe_encode_counts_applies_merges(ray_session):
    import ray.data

    from infidex_ray.ops.bpe import bpe_encode_counts

    rows = [
        {"doc_id": 1, "text": "aaa bc"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "aaaa"},
    ]
    merges = [{"left": "a", "right": "a"}, {"left": "aa", "right": "a"}]
    got = (
        bpe_encode_counts(ray.data.from_items(rows), merges)
        .to_pandas()
        .set_index("doc_id")
    )
    # 'aaa' → [aa,a] → [aaa] = 1 token; 'bc' stays 2 chars = 2 tokens
    assert got.loc[1, "n_tokens"] == 3 and got.loc[1, "n_words"] == 2
    # 'aaaa' → [aa,aa] → merge2 (aa,a) doesn't match [aa,aa] = 2 tokens
    assert got.loc[3, "n_tokens"] == 2
    assert 2 not in got.index  # empty doc has no words


def test_spearman_perfect_and_inverse(ray_session):
    import pyarrow as pa
    import ray.data

    from infidex_ray.ops.agg import spearman_corr

    tbl = pa.table(
        {
            "g": pa.array(["up"] * 4 + ["down"] * 4),
            "x": pa.array([1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]),
            # monotone-increasing (nonlinear) vs strictly decreasing
            "y": pa.array([1.0, 10.0, 100.0, 1000.0, 9.0, 7.0, 5.0, 3.0]),
        }
    )
    got = (
        spearman_corr(ray.data.from_arrow(tbl), "g", "x", "y")
        .to_pandas()
        .set_index("g")
    )
    assert got.loc["up", "spearman"] == 1.0
    assert got.loc["down", "spearman"] == -1.0
