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
    yield eng, deng
    # release the 2 actor-CPUs: the 4-CPU test session deadlocks later
    # connects if pools leak (the full-suite hang this teardown fixes)
    deng.shutdown()


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


def test_distributed_repeat_queries_speculative_path(dist_pair):
    """Repeat queries exercise the fused speculative phase_ab round (the
    level memo only activates on the second submission of a plan): results
    must be bit-identical across three consecutive runs AND identical to the
    in-process engine, whether the level guess hits or misses."""
    eng, deng = dist_pair
    for q in QUERIES:
        runs = [
            [(h.doc_key, round(h.score, 6), h.tiebreaker)
             for h in deng.search(q, top_k=10)]
            for _ in range(3)
        ]
        assert runs[0] == runs[1] == runs[2], q
        ref = [(h.doc_key, round(h.score, 6), h.tiebreaker)
               for h in eng.search(q, top_k=10)]
        assert runs[0] == ref, q
    # a miss is forced by polluting the memo with a wrong guess
    import infidex_ray.query.stage1 as s1
    from infidex_ray.analyzer import normalize

    for q in QUERIES:
        nq = normalize(q).lower().strip()
        infos = s1.prepare_query_terms(
            nq, deng.cfg, deng.df_lookup, deng.total_docs, deng.avgdl,
            fuzzy_df_fn=deng._fuzzy_global_df,
            fuzzy_df_batch_fn=deng._fuzzy_global_df_batch,
        )
        plan = s1.build_plan(infos)
        if plan is None or plan.n_levels == 1:
            continue
        key = (s1.SegmentStage1._plan_key(plan), 10 * deng.cfg.coverage.depth_factor
               if hasattr(deng.cfg.coverage, "depth_factor") else None)
        # poison every memo entry for this engine with an off-by-one level
        for k, v in list(deng._level_memo.items()):
            deng._level_memo[k] = max(1, v - 1) if v > 1 else v + 1
        got = [(h.doc_key, round(h.score, 6), h.tiebreaker)
               for h in deng.search(q, top_k=10)]
        ref = [(h.doc_key, round(h.score, 6), h.tiebreaker)
               for h in eng.search(q, top_k=10)]
        assert got == ref, f"corrective round broke rank identity for {q!r}"


def test_short_query_no_fuzzy_branch_identity(ray_session, tmp_path_factory):
    """Short queries over a corpus with >= FUZZY_FALLBACK_DOC_LIMIT matches
    take the no-fuzzy branch of the fused sq_phase1 protocol — the driver
    must then use the PREFIX snapshot/max, identical to the in-process
    gate (ShortQuery fallback limit, reference :221)."""
    from infidex_ray.query.executor import DistributedEngine
    from infidex_ray.query.shortquery import FUZZY_FALLBACK_DOC_LIMIT

    n = FUZZY_FALLBACK_DOC_LIMIT + 40
    docs = [(k, f"theme park number {k} with thick thorny thistles") for k in range(n)]
    docs += [(n + 1, "zebra yard"), (n + 2, "xylophone quartz")]
    out = tmp_path_factory.mktemp("sq_nofuzzy")
    build_index_local(docs, str(out), n_segments=4)
    eng = Engine.load(str(out))
    deng = DistributedEngine.connect(str(out), num_shards=2)
    try:
        for q in ("th", "the", "zeb", "x", "qz"):
            a = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in eng.search(q, top_k=10)]
            b = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in deng.search(q, top_k=10)]
            assert a == b, q
    finally:
        deng.shutdown()


def test_fused_coverage_under_speculation_identity(dist_pair, monkeypatch):
    """Force the speculative unique budget to 0 and 1 so the fused path's
    corrective second round (missing allowed-unique jobs) runs — results
    must stay identical to the in-process engine."""
    eng, deng = dist_pair
    from infidex_ray.query.executor import DistributedEngine

    for budget in (0, 1):
        monkeypatch.setattr(DistributedEngine, "SPEC_UNIQUE_BUDGET", budget)
        for q in QUERIES:
            a = [(h.doc_key, round(h.score, 6), h.tiebreaker)
                 for h in eng.search(q, top_k=10)]
            b = [(h.doc_key, round(h.score, 6), h.tiebreaker)
                 for h in deng.search(q, top_k=10)]
            assert a == b, (budget, q)


def test_wm_prefetch_env_path_identity(dist_pair, monkeypatch):
    """INFIDEX_WM_PREFETCH=1 re-enables the pre-stage-1 WordMatcher fan-out
    (off by default since the fused protocol); results must be identical —
    the prefetch only precomputes what cov_fused would compute inline."""
    _, deng = dist_pair
    for q in QUERIES:
        monkeypatch.setenv("INFIDEX_WM_PREFETCH", "1")
        a = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in deng.search(q, top_k=10)]
        monkeypatch.setenv("INFIDEX_WM_PREFETCH", "0")
        b = [(h.doc_key, round(h.score, 6), h.tiebreaker) for h in deng.search(q, top_k=10)]
        assert a == b, f"prefetch toggle mismatch for {q!r}"


def test_shard_actor_restart_mid_serving(dist_pair):
    """A killed shard restarts (max_restarts=-1), reloads its slice from
    disk, and the driver's one-shot retry makes the next search identical."""
    import ray

    _, deng = dist_pair
    before = {
        q: [(h.doc_key, round(h.score, 6)) for h in deng.search(q, top_k=10)]
        for q in QUERIES
    }
    ray.kill(deng.actors[0], no_restart=False)
    after = {
        q: [(h.doc_key, round(h.score, 6)) for h in deng.search(q, top_k=10)]
        for q in QUERIES
    }
    assert after == before


def test_distributed_query_api_parity(ray_session, tmp_path_factory):
    """The Query API (filter/boosts/sort/facets) runs on the distributed
    engine via one batched field_rows fan-out and matches the in-process
    engine result-for-result."""
    import pytest

    from infidex_ray.engine import Query

    movies = [
        (1, "The Matrix", {"genre": "Sci-Fi", "year": 1999}),
        (2, "The Matrix Reloaded", {"genre": "Sci-Fi", "year": 2003}),
        (3, "The Matrix Revolutions", {"genre": "Sci-Fi", "year": 2003}),
        (4, "The Match", {"genre": "Drama", "year": 2021}),
        (5, "Matriarch Rising", {"genre": "Horror", "year": 2018}),
    ]
    out = tmp_path_factory.mktemp("dist_field_idx")
    build_index_local(
        [(k, t) for k, t, _ in movies], str(out), n_segments=2,
        fields=[f for _, _, f in movies],
    )
    from infidex_ray.query.executor import DistributedEngine

    eng = Engine.load(str(out))
    deng = DistributedEngine.connect(str(out), num_shards=2)
    panels = [
        Query("matrix", max_results=10, filter="year >= 2000"),
        Query("matrix", max_results=10, filter="genre = 'Sci-Fi'"),
        Query("matrix", max_results=10, boosts=(("year >= 2003 AND year <= 2003", 3),)),
        Query("matrix", max_results=10, sort_by="year"),
        Query("matrix", max_results=10, sort_by="year", sort_ascending=False),
        Query("matrix", max_results=10, enable_facets=True),
        Query("matrix", max_results=2, filter="year >= 2000", enable_facets=True),
    ]
    try:
        for q in panels:
            a, b = eng.query(q), deng.query(q)
            assert [(h.doc_key, round(h.score, 6)) for h in a.records] == [
                (h.doc_key, round(h.score, 6)) for h in b.records
            ], q
            assert a.facets == b.facets, q
            assert a.total_candidates == b.total_candidates, q

        # match-all facets are refused with a pointer at the offline path
        with pytest.raises(ValueError):
            deng.query(Query("", max_results=10, enable_facets=True))
    finally:
        deng.shutdown()


def test_minimal_profile_rank_identity_distributed(ray_session, tmp_path):
    """enable_coverage persists in the manifest: a CreateMinimal-profile
    index (coverage off) serves rank-identically from the actor pool."""
    import dataclasses

    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine
    from infidex_ray.query.executor import DistributedEngine

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = dataclasses.replace(
        EngineConfig.minimal(), target_docs_per_segment=200
    )
    idx = str(tmp_path / "minidx")
    eng = Engine.build(ds, idx, cfg, text_column="text", key_column="doc_id")
    deng = DistributedEngine.connect(idx, num_shards=2)
    try:
        for q in ("fast column table", "fsat colunm", "merge"):
            a = [(h.doc_key, h.score, h.tiebreaker) for h in eng.search(q, top_k=10)]
            b = [(h.doc_key, h.score, h.tiebreaker) for h in deng.search(q, top_k=10)]
            assert a == b
    finally:
        deng.shutdown()


def test_distributed_get_document_and_statistics(ray_session, tmp_path):
    """GetDocument/GetDocuments/GetStatistics work on the distributed engine
    (not just after a query's prefetch) and match the in-process engine."""
    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine
    from infidex_ray.query.executor import DistributedEngine

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "gdidx")
    eng = Engine.build(
        ds, idx, EngineConfig(target_docs_per_segment=100),
        text_column="text", key_column="doc_id", store_columns=("lang",),
    )
    # 0.5-CPU actors: 3 shards must fit the 4-CPU test session even while
    # the module-scoped dist_pair fixture holds its 2 actor-CPUs
    deng = DistributedEngine.connect(idx, num_shards=3, num_cpus_per_actor=0.5)
    try:
        assert deng.get_document(7) == eng.get_document(7)
        assert deng.get_document(10**9) is None
        assert len(deng.get_documents([1, 2, 10**9])) == 2
        a, b = eng.get_statistics(), deng.get_statistics()
        assert (a.document_count, a.vocabulary_size) == (
            b.document_count,
            b.vocabulary_size,
        )
        assert a.document_count == 500
    finally:
        deng.shutdown()


def test_one_rtt_rank_identity_full_page(ray_session, tmp_path, monkeypatch):
    """The opt-in single-round protocol (INFIDEX_1RTT=1, fused_ab +
    _coverage_from_stash) must be rank-identical to the two-round path on
    a corpus whose stage-1 page is FULL (the stash-eligible regime), for
    clean, typo, and repeated queries — and the stash must actually serve
    (not silently fall back)."""
    import ray.data

    from infidex_ray.build import build_index
    from infidex_ray.config import EngineConfig
    from infidex_ray.query.executor import DistributedEngine

    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    rows = []
    for k in range(700):
        body = " ".join(words[(k + j) % len(words)] for j in range(9))
        rows.append(
            {"doc_id": k, "text": f"shared corpus {body} tail{k % 13} u{k}"}
        )
    out = str(tmp_path / "idx1rtt")
    cfg = EngineConfig(target_docs_per_segment=200, coverage_depth=500)
    build_index(
        ray.data.from_items(rows), out, cfg,
        text_column="text", key_column="doc_id",
    )
    deng = DistributedEngine.connect(out, num_shards=2, warm=False)
    try:
        served = {"n": 0}
        orig = deng._coverage_from_stash

        def counting(q, s1, cd, tk):
            ok, res = orig(q, s1, cd, tk)
            served["n"] += ok
            return ok, res

        deng._coverage_from_stash = counting
        panel = [
            "shared corpus", "alpha beta gamma", "corpus omega",
            "shraed corpus",  # typo → fuzzy terms
            "alpha beta gamma",  # repeat (warm level memo)
        ]
        for q in panel:  # warm pass (level memo)
            monkeypatch.setenv("INFIDEX_1RTT", "0")
            deng.search(q, top_k=10)
        for q in panel:
            monkeypatch.setenv("INFIDEX_1RTT", "0")
            a = [(h.doc_key, h.score) for h in deng.search(q, top_k=10)]
            monkeypatch.setenv("INFIDEX_1RTT", "1")
            b = [(h.doc_key, h.score) for h in deng.search(q, top_k=10)]
            assert a == b, f"query {q!r}: {a[:4]} != {b[:4]}"
        assert served["n"] >= 3  # the single-round path actually ran
    finally:
        deng.shutdown()
