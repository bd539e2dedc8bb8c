"""Per-query timeout budget (src/Infidex/Api/Query.cs:73-75,
SearchEngine.cs:290, Api/Result.cs:34): default 1000 ms clamped [0, 10000];
on expiry the stage-1 backbone is returned with did_timeout set."""

import pytest

from infidex_ray.config import EngineConfig
from infidex_ray.engine import Engine, Query


@pytest.fixture(scope="module")
def eng(ray_session, minicorpus, tmp_path_factory):
    import ray.data

    rows = [{"doc_key": k, "text": t} for k, t in minicorpus]
    out = str(tmp_path_factory.mktemp("idx_timeout"))
    return Engine.build(
        ray.data.from_items(rows), out, EngineConfig(), text_column="text",
        key_column="doc_key",
    )


def test_zero_budget_returns_stage1_flagged(eng):
    hits, timed_out = eng.search_ex("quick brown fox", top_k=5, timeout_ms=0)
    assert timed_out
    assert hits  # stage-1 backbone still returned
    full, ok = eng.search_ex("quick brown fox", top_k=5, timeout_ms=10000)
    assert not ok
    # stage-1-only scores differ from coverage-fused, but doc 1 still leads
    assert hits[0].doc_key in {h.doc_key for h in full}


def test_default_budget_no_timeout(eng):
    hits, timed_out = eng.search_ex("quick brown fox", top_k=5)
    assert not timed_out and hits


def test_clamp_over_10s(eng):
    # >10000 is clamped, not an error (SearchEngine.cs:290)
    hits, timed_out = eng.search_ex("fox", top_k=5, timeout_ms=999999)
    assert not timed_out


def test_query_result_carries_flag(eng):
    res = eng.query(Query("quick brown fox", max_results=5, timeout_ms=0))
    assert res.did_timeout and res.records
    res2 = eng.query(Query("quick brown fox", max_results=5))
    assert not res2.did_timeout


def test_timeout_rank_identity_when_not_hit(eng):
    """A generous budget must not perturb ranking."""
    a = [(h.doc_key, h.score) for h in eng.search("quick brown fox", top_k=10)]
    b, _ = eng.search_ex("quick brown fox", top_k=10, timeout_ms=10000)
    assert a == [(h.doc_key, h.score) for h in b]


def test_distributed_timeout(ray_session, minicorpus, tmp_path_factory):
    import ray.data

    from infidex_ray.query.executor import DistributedEngine

    rows = [{"doc_key": k, "text": t} for k, t in minicorpus]
    out = str(tmp_path_factory.mktemp("idx_timeout_dist"))
    cfg = EngineConfig(target_docs_per_segment=3)
    Engine.build(ray.data.from_items(rows), out, cfg, text_column="text",
                 key_column="doc_key")
    deng = DistributedEngine.connect(out, num_shards=2, warm=False)
    try:
        hits, timed_out = deng.search_ex("quick brown fox", top_k=5, timeout_ms=0)
        assert timed_out and hits
        hits2, ok = deng.search_ex("quick brown fox", top_k=5, timeout_ms=10000)
        assert not ok and hits2
    finally:
        deng.shutdown()


# ---------------------------------------------------------------------------
# ProcessMonitor (build progress / cancellation)


def test_process_monitor_progress_and_success(ray_session, minicorpus, tmp_path):
    import ray.data

    from infidex_ray.build import build_index
    from infidex_ray.monitor import ProcessMonitor

    rows = [{"doc_key": k, "text": t} for k, t in minicorpus]
    mon = ProcessMonitor()
    seen: list[int] = []
    mon.progress_changed.append(seen.append)
    build_index(
        ray.data.from_items(rows), str(tmp_path / "mon_idx"),
        EngineConfig(target_docs_per_segment=3), text_column="text",
        key_column="doc_key", monitor=mon,
    )
    assert mon.succeeded and mon.is_completed and not mon.is_running
    assert mon.progress_percent == 100
    assert seen and seen[-1] == 100
    assert seen == sorted(seen)  # monotone non-decreasing


def test_process_monitor_cancel_mid_run():
    """mark_started RESETS cancellation (MarkStarted → Reset, new CTS,
    ProcessMonitor.cs:207-215) — cancel only takes effect DURING the run,
    where the ShouldAbort poll sees it."""
    from infidex_ray.monitor import ProcessMonitor

    mon = ProcessMonitor()
    mon.cancel()
    mon.mark_started()
    assert not mon.cancellation_requested  # reset cleared it
    mon.cancel()
    assert ProcessMonitor.should_abort(mon)
    assert mon.error_message == "Operation was cancelled."
    mon.mark_finished()
    assert mon.is_cancelled and not mon.succeeded


def test_should_abort_timeout():
    import time as _time

    from infidex_ray.monitor import ProcessMonitor

    mon = ProcessMonitor()
    mon.mark_started()
    mon.timeout_seconds = 1
    mon.start_time = _time.monotonic() - 5  # pretend it started long ago
    assert ProcessMonitor.should_abort(mon)
    assert mon.did_timeout and mon.error_message == "Operation timed out."


def test_monitor_cancel_interrupts_build(ray_session, tmp_path):
    """Cancelling mid-build aborts the streaming job (via the _CANCELLED
    sentinel workers poll) instead of letting it run to completion; the
    abort is resumable."""
    import os

    import pytest as _pytest
    import ray.data

    from infidex_ray.build import build_index
    from infidex_ray.monitor import BuildCancelled, ProcessMonitor

    rows = [
        {"doc_key": i, "text": "some words here " * 30 + f"doc{i}"}
        for i in range(400)
    ]
    out = str(tmp_path / "cancel_idx")
    mon = ProcessMonitor()
    # cancel as soon as the first progress event fires (first segments done)
    mon.progress_changed.append(lambda p: mon.cancel())
    with _pytest.raises(BuildCancelled):
        build_index(
            ray.data.from_items(rows).repartition(40), out,
            EngineConfig(target_docs_per_segment=10), text_column="text",
            key_column="doc_key", monitor=mon, repartition=False,
        )
    assert not mon.succeeded
    seg_root = os.path.join(out, "segments")
    import glob

    n_done = len(glob.glob(os.path.join(seg_root, "*", "_SUCCESS")))
    assert 0 < n_done < 40  # some partitions finished, not all

    # resume without the monitor: completes and skips finished segments
    m2 = build_index(
        ray.data.from_items(rows).repartition(40), out,
        EngineConfig(target_docs_per_segment=10), text_column="text",
        key_column="doc_key", repartition=False,
    )
    assert m2["stats"]["total_docs"] == 400


def test_result_execution_time_and_status(ray_session, tmp_path):
    """Result.execution_time_ms (Api/Result.cs:44) is populated and
    Engine.get_status mirrors Api/SystemStatus.cs."""
    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine, Query

    rows = [{"doc_id": i, "text": f"doc number {i} fast table"} for i in range(30)]
    eng = Engine.build(
        ray.data.from_items(rows), str(tmp_path / "idx"),
        EngineConfig(target_docs_per_segment=10),
        text_column="text", key_column="doc_id",
    )
    res = eng.query(Query("fast table", max_results=5))
    assert res.records and res.execution_time_ms >= 0
    st = eng.get_status()
    assert st.document_count == 30
    assert st.index_progress == 100
    assert not st.reindex_required


def test_matchall_facet_cap(ray_session, tmp_path):
    import pytest
    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine, Query

    rows = [{"doc_id": i, "text": f"doc {i}", "lang": "en"} for i in range(20)]
    eng = Engine.build(
        ray.data.from_items(rows), str(tmp_path / "idx"),
        EngineConfig(target_docs_per_segment=10),
        text_column="text", key_column="doc_id", store_columns=("lang",),
    )
    eng.matchall_facet_cap = 5  # force the guard
    with pytest.raises(ValueError, match="facet_counts_offline"):
        eng.query(Query("", max_results=1 << 30, enable_facets=True))
    # under the cap it still works (reference empty-query-with-facets path)
    eng.matchall_facet_cap = 1_000_000
    res = eng.query(Query("", max_results=1 << 30, enable_facets=True))
    assert res.facets and res.facets["lang"][0] == ("en", 20)


def test_get_document_and_statistics(ray_session, tmp_path):
    """GetDocument/GetDocuments/GetStatistics parity: stored fields by key,
    unknown keys skipped, tombstoned keys hidden, vocab = distinct words."""
    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine

    rows = [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en"},
        {"doc_id": 2, "text": "beta delta", "lang": "de"},
        {"doc_id": 3, "text": "gamma gamma", "lang": "en"},
    ]
    eng = Engine.build(
        ray.data.from_items(rows),
        str(tmp_path / "idx"),
        EngineConfig(target_docs_per_segment=2),
        text_column="text",
        key_column="doc_id",
        store_columns=("lang",),
    )
    d = eng.get_document(2)
    assert d is not None and d["lang"] == "de"
    assert eng.get_document(99) is None
    assert [r["lang"] for r in eng.get_documents([1, 99, 3])] == ["en", "en"]
    st = eng.get_statistics()
    assert st.document_count == 3
    assert st.vocabulary_size == 4  # alpha beta gamma delta
    eng.delete_documents([2])
    assert eng.get_document(2) is None
    assert len(eng.get_documents([1, 2, 3])) == 2
