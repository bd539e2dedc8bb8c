"""Cross-corpus Jaccard join: cross-side pairs only, brute-force parity."""

import numpy as np
import pyarrow as pa


def _brute_cross_pairs(left_rows, right_rows, n=3, t=0.4):
    from infidex_ray.ops.dedup import _batch_doc_shingles

    def sets(rows):
        out = {}
        for i, txt in rows:
            idx, hashes = _batch_doc_shingles([txt], n)
            out[i] = set(hashes.tolist())
        return out

    ls, rs = sets(left_rows), sets(right_rows)
    pairs = []
    for a, sa in ls.items():
        for b, sb in rs.items():
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                pairs.append((a, b))
    return sorted(pairs)


def test_jaccard_join_cross_only(ray_session):
    import ray.data

    from infidex_ray.ops.dedup import jaccard_join

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tonight"
    far = "completely different words about distributed query engines"
    # left 10 and left 11 are near-dups of each other (same side: must NOT
    # pair); right 20 near-dups left 10 (must pair)
    left = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array([base, near, far], pa.string()),
        }
    )
    right = pa.table(
        {
            "doc_id": pa.array([20, 21], pa.int64()),
            "text": pa.array([base + " tomorrow", far + " at scale"],
                             pa.string()),
        }
    )
    got = (
        jaccard_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            threshold=0.4,
        )
        .to_pandas()
        .sort_values(["id_left", "id_right"])
        .reset_index(drop=True)
    )
    want = _brute_cross_pairs(
        list(zip(left["doc_id"].to_pylist(), left["text"].to_pylist())),
        list(zip(right["doc_id"].to_pylist(), right["text"].to_pylist())),
    )
    assert list(zip(got["id_left"], got["id_right"])) == want
    assert (10, 20) in want  # the planted cross near-dup survived
    # intra-side near-dup (10, 11) is invisible to the join: every output
    # pair is (left, right) — 11 never appears on the right side
    assert 11 not in set(got["id_right"])
    assert (10, 11) not in set(zip(got["id_left"], got["id_right"]))
    assert (got["jaccard"] >= 0.4).all()


def test_pair_eval(ray_session):
    import ray.data

    from infidex_ray.ops.similarity import pair_eval

    pred = pa.table(
        {
            # reversed orientation + duplicate: must normalize/dedup
            "id_a": pa.array([2, 1, 3, 9, 9], pa.int64()),
            "id_b": pa.array([1, 2, 4, 8, 8], pa.int64()),
        }
    )
    truth = pa.table(
        {
            "id_a": pa.array([1, 3, 5], pa.int64()),
            "id_b": pa.array([2, 4, 6], pa.int64()),
        }
    )
    got = pair_eval(
        ray.data.from_arrow(pred).repartition(2),
        ray.data.from_arrow(truth),
    ).to_pandas()
    row = got.iloc[0]
    # pred distinct = {(1,2),(3,4),(8,9)}; truth = {(1,2),(3,4),(5,6)}
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 1)
    assert row["precision"] == 2 / 3 and row["recall"] == 2 / 3
    assert row["f1"] == (2.0 * (2 / 3) * (2 / 3)) / (4 / 3)

    # empty prediction set: precision NULL, recall 0
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    got2 = pair_eval(
        ray.data.from_arrow(empty), ray.data.from_arrow(truth)
    ).to_pandas()
    assert got2.iloc[0]["n_pred"] == 0
    assert got2["precision"].isna().all()
    assert got2.iloc[0]["recall"] == 0.0


def test_retrieval_rank_eval(ray_session):
    import numpy as np
    import ray.data

    from infidex_ray.ops.similarity import retrieval_rank_eval

    # 2 labels; query 0 has label 0; plant neighbors so ranks are known
    rng = np.random.RandomState(4)
    n, dim = 40, 8
    vecs = rng.randn(n, dim)
    vecs[0] = np.r_[1.0, np.zeros(dim - 1)]
    vecs[7] = np.r_[0.99, 0.1, np.zeros(dim - 2)]  # closest to q0
    labels = (np.arange(n) % 2).astype(np.int64)
    labels[0] = 0
    labels[7] = 1  # closest neighbor is WRONG label
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs]),
            "label": pa.array(labels),
        }
    )
    got = retrieval_rank_eval(
        ray.data.from_arrow(t).repartition(4), n_queries=2, k=5
    ).to_pandas().set_index("query_id")
    r0 = got.loc[0]
    assert r0["k_eff"] == 5
    # rank-1 neighbor (7) has the wrong label -> first_rank > 1 (or none)
    assert r0["first_rank"] != 1
    if r0["n_match"] > 0:
        assert r0["mrr"] == 1.0 / r0["first_rank"]
    else:
        assert r0["mrr"] == 0.0
    assert r0["p_at_k"] == r0["n_match"] / 5
    # recall denominator = label population minus the query
    n_rel = int((labels == 0).sum()) - 1
    assert r0["recall_at_k"] == r0["n_match"] / n_rel
