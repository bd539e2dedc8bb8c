"""Distributed query serving (actor-pool) — rank identity vs in-process.

North-rule requirement: results must be identical regardless of partitioning
AND distribution (same two-phase protocol, same memo semantics).
"""

from __future__ import annotations

import pytest

from infidex_ray.build import build_index_local
from infidex_ray.engine import Engine

QUERIES = [
    "batman", "qick fux", "battamam", "new york", "speeding",
    "quick brown fox", "th", "x", "wonder woman",
]


@pytest.fixture(scope="module")
def dist_pair(ray_session, minicorpus, tmp_path_factory):
    from infidex_ray.query.executor import DistributedEngine

    out = tmp_path_factory.mktemp("dist_idx")
    build_index_local(minicorpus, str(out), n_segments=4)
    eng = Engine.load(str(out))
    deng = DistributedEngine.connect(str(out), num_shards=2)
    return eng, deng


def test_distributed_rank_identity(dist_pair):
    eng, deng = dist_pair
    for q in QUERIES:
        a = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in eng.search(q, top_k=10)]
        b = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in deng.search(q, top_k=10)]
        assert a == b, f"distributed mismatch for {q!r}: {a} vs {b}"


def test_distributed_golden_sets(dist_pair):
    _, deng = dist_pair
    assert [h.doc_key for h in deng.search("qick fux", top_k=10)] == [5, 1]
    assert [h.doc_key for h in deng.search("battamam", top_k=10)] == [6]
    assert [h.doc_key for h in deng.search("new york", top_k=10)] == [8]
    assert [h.doc_key for h in deng.search("speeding", top_k=10)] == [7]


def test_distributed_delete(dist_pair):
    """Tombstones broadcast to shards; deleted doc vanishes from results."""
    eng, deng = dist_pair
    assert [h.doc_key for h in deng.search("wonder woman", top_k=5)][0] == 9
    deng.delete_documents([9])
    try:
        keys = [h.doc_key for h in deng.search("wonder woman", top_k=5)]
        assert 9 not in keys
    finally:
        # undo for other tests sharing the fixture
        deng.deleted.clear()
        import os, json
        with open(os.path.join(deng.index_dir, "tombstones.json"), "w") as f:
            json.dump([], f)
        import ray
        ray.get([a.set_deleted.remote([]) for a in deng.actors])
