"""Incremental adds, soft deletes (tombstones), synonyms, segment merge.

Reference semantics: DeltaIndex/IndexMerger (new docs land in a delta
partition; stats rebuilt), TombstoneTracker (deleted keys vanish from
results), SynonymMap (equivalent surface forms collapse at index+query time),
SegmentMerger (k-way term merge of doc-disjoint segments).
"""

from __future__ import annotations

import os

import pytest

from infidex_ray.build import build_index_local
from infidex_ray.config import EngineConfig
from infidex_ray.engine import Engine
from infidex_ray.synonyms import SynonymMap


@pytest.fixture()
def small_engine(minicorpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index_local(minicorpus, out, n_segments=2)
    return Engine.load(out)


def test_soft_delete(small_engine):
    eng = small_engine
    assert [h.doc_key for h in eng.search("batman", top_k=10)][0] == 6
    eng.delete_documents([6])
    keys = [h.doc_key for h in eng.search("batman", top_k=10)]
    assert 6 not in keys
    # tombstones survive reload
    eng2 = Engine.load(eng.index_dir)
    assert 6 not in [h.doc_key for h in eng2.search("batman", top_k=10)]


def test_incremental_add(small_engine):
    eng = small_engine
    n0 = eng.total_docs
    assert eng.search("zebra stampede", top_k=5) == [] or all(
        h.score < 100 for h in eng.search("zebra stampede", top_k=5)
    )
    eng.add_documents([(100, "A zebra stampede crossed the savanna")])
    assert eng.total_docs == n0 + 1
    hits = eng.search("zebra stampede", top_k=5)
    assert hits and hits[0].doc_key == 100
    # existing docs still searchable with updated global stats
    assert [h.doc_key for h in eng.search("new york", top_k=10)] == [8]
    # delta segment persisted: fresh load sees it
    eng2 = Engine.load(eng.index_dir)
    assert eng2.total_docs == n0 + 1
    assert eng2.search("zebra stampede", top_k=5)[0].doc_key == 100


def test_synonym_map_unit():
    m = SynonymMap([("car", "automobile", "auto")])
    assert m.canonical("automobile") == m.canonical("car") == m.canonical("auto")
    delims = frozenset(" ")
    out = m.canonicalize_text("my automobile is fast", delims)
    assert out == f"my {m.canonical('car')} is fast"
    assert m.canonicalize_text("no synonyms here", delims) == "no synonyms here"


def test_synonyms_end_to_end(tmp_path):
    docs = [
        (1, "a red automobile parked outside"),
        (2, "a blue bicycle leaning on the wall"),
        (3, "the fastest car on the track"),
    ]
    cfg = EngineConfig(synonyms=(("car", "automobile"),))
    out = str(tmp_path / "syn_idx")
    build_index_local(docs, out, cfg, n_segments=1)
    eng = Engine.load(out)
    assert eng.synonym_map is not None  # restored from manifest
    # "car" must find BOTH the automobile doc and the car doc
    keys = {h.doc_key for h in eng.search("car", top_k=10)}
    assert {1, 3} <= keys
    keys = {h.doc_key for h in eng.search("automobile", top_k=10)}
    assert {1, 3} <= keys


def test_segment_merge(minicorpus, tmp_path):
    from infidex_ray.segments import merge_segments, read_segment
    import os

    out = str(tmp_path / "m_idx")
    build_index_local(minicorpus, out, n_segments=3)
    seg_root = os.path.join(out, "segments")
    seg_dirs = sorted(
        os.path.join(seg_root, d) for d in os.listdir(seg_root)
    )
    merged_dir = str(tmp_path / "merged")
    merge_segments(seg_dirs, merged_dir)
    merged = read_segment(merged_dir)
    parts = [read_segment(d, i) for i, d in enumerate(seg_dirs)]
    assert merged.n_docs == sum(p.n_docs for p in parts)
    # df of every term = sum of per-part dfs; postings count preserved
    import numpy as np

    for term in ["bat", "the", "fox"]:
        exp_df = sum(int(p.df[p.term_lookup(term)]) for p in parts if p.term_lookup(term) >= 0)
        i = merged.term_lookup(term)
        got_df = int(merged.df[i]) if i >= 0 else 0
        assert got_df == exp_df, term
    # doc keys preserved across the merge
    assert sorted(merged.doc_keys.tolist()) == sorted(
        np.concatenate([p.doc_keys for p in parts]).tolist()
    )


def test_hierarchical_merge_index(ray_session, minicorpus, tmp_path):
    """merge_index: tree of Ray merge tasks → single-segment index with
    identical search results."""
    from infidex_ray.build import merge_index

    src = str(tmp_path / "multi_idx")
    build_index_local(minicorpus, src, n_segments=4)
    eng_multi = Engine.load(src)

    merged = str(tmp_path / "merged_idx")
    merge_index(src, merged, fan_in=2, use_ray=True)
    eng_one = Engine.load(merged)
    assert len(eng_one.segments) == 1
    assert eng_one.total_docs == eng_multi.total_docs
    for q in ["batman", "qick fux", "new york", "speeding", "quick brown fox"]:
        a = [(h.doc_key, round(h.score, 6)) for h in eng_multi.search(q, top_k=10)]
        b = [(h.doc_key, round(h.score, 6)) for h in eng_one.search(q, top_k=10)]
        assert a == b, q


def test_read_corpus_csv(ray_session, tmp_path):
    from infidex_ray.sources import read_corpus

    p = tmp_path / "movies.csv"
    p.write_text("title,year\nThe Matrix,1999\nInception,2010\n")
    ds = read_corpus(str(p))
    rows = ds.to_pandas()
    assert sorted(rows["title"]) == ["Inception", "The Matrix"]


def test_sharded_stats_layout_and_delta_append(ray_session, tmp_path):
    """Distributed builds write vocab stats as sorted parquet part dirs; a
    delta append adds an overlapping part and ShardedDfLookup sums them."""
    import os

    import ray.data

    from infidex_ray.config import EngineConfig
    from infidex_ray.engine import Engine, ShardedDfLookup, load_df_lookup

    rows = [{"doc_key": i, "text": f"alpha beta doc{i}"} for i in range(1, 21)]
    out = str(tmp_path / "sharded_idx")
    eng = Engine.build(
        ray.data.from_items(rows), out, EngineConfig(target_docs_per_segment=10),
        text_column="text", key_column="doc_key",
    )
    assert os.path.isdir(os.path.join(out, "stats", "vocab", "kind=term"))
    assert os.path.isdir(os.path.join(out, "stats", "vocab", "kind=word"))
    assert not os.path.exists(os.path.join(out, "stats", "df.parquet"))
    assert isinstance(eng.df_lookup, ShardedDfLookup)
    assert eng.word_df("alpha") == 20

    eng.add_documents([(100, "alpha gamma fresh")])
    lk = load_df_lookup(out, "word_df")
    assert lk("alpha") == 21  # base part + delta part summed
    assert lk("gamma") == 1
    assert lk("nonexistent") == 0
    hits = eng.search("alpha beta", top_k=5)
    assert hits


def test_rebuild_clears_stale_stats_layouts(ray_session, tmp_path):
    """An in-place rebuild must not leave older stats layouts behind —
    load_df_lookup prefers them and would serve stale dfs."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from infidex_ray.config import EngineConfig
    from infidex_ray.engine import Engine, load_df_lookup

    out = str(tmp_path / "stale_idx")
    os.makedirs(os.path.join(out, "stats", "df"), exist_ok=True)
    pq.write_table(
        pa.table({"term": ["alpha"], "df": [999]}),
        os.path.join(out, "stats", "df", "stale.parquet"),
    )
    rows = [{"doc_key": i, "text": f"alpha beta doc{i}"} for i in range(1, 11)]
    Engine.build(
        ray.data.from_items(rows), out, EngineConfig(target_docs_per_segment=5),
        text_column="text", key_column="doc_key",
    )
    assert not os.path.exists(os.path.join(out, "stats", "df"))
    lk = load_df_lookup(out, "word_df")
    assert lk("alpha") == 10  # fresh, not the stale 999


def test_merge_index_target_segments(ray_session, minicorpus, tmp_path):
    """merge_index(target_segments=2): compaction stops at the serving
    layout (build-fine/serve-coarse) with rank-identical search results."""
    from infidex_ray.build import merge_index

    src = str(tmp_path / "multi_idx2")
    build_index_local(minicorpus, src, n_segments=4)
    eng_multi = Engine.load(src)

    merged = str(tmp_path / "merged2_idx")
    man = merge_index(src, merged, fan_in=2, use_ray=True, target_segments=2)
    assert man["stats"]["n_segments"] == 2
    eng_two = Engine.load(merged)
    assert len(eng_two.segments) == 2
    assert eng_two.total_docs == eng_multi.total_docs
    for q in ["batman", "qick fux", "new york", "speeding", "quick brown fox"]:
        a = [(h.doc_key, round(h.score, 6)) for h in eng_multi.search(q, top_k=10)]
        b = [(h.doc_key, round(h.score, 6)) for h in eng_two.search(q, top_k=10)]
        assert a == b, q


def test_single_file_save_load_roundtrip(ray_session, tmp_path):
    """save_file → load_file rank identity vs the directory-loaded engine
    (reference Save/SaveToStream parity, SearchEngine.cs:385-442)."""
    import ray.data

    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    eng = Engine.build(
        ds, idx, EngineConfig(target_docs_per_segment=150),
        text_column="text", key_column="doc_id",
    )
    container = str(tmp_path / "index.infdx")
    eng.save_file(container)
    eng2 = Engine.load_file(container)
    for q in ("fast column table", "fsat colunm tble", "ab", "§", ""):
        a = [(h.doc_key, h.score) for h in eng.search(q, top_k=10)]
        b = [(h.doc_key, h.score) for h in eng2.search(q, top_k=10)]
        assert a == b, q
    # stream variants roundtrip too
    import io

    buf = io.BytesIO()
    eng.save_stream(buf)
    buf.seek(0)
    eng3 = Engine.load_stream(buf, str(tmp_path / "extract2"))
    a = [(h.doc_key, h.score) for h in eng.search("fast column", top_k=5)]
    c = [(h.doc_key, h.score) for h in eng3.search("fast column", top_k=5)]
    assert a == c


def test_rebuild_prunes_stale_layout_segments(ray_session, tmp_path):
    """A rebuild over an out_dir holding segments from a DIFFERENT batch
    layout must not union them into the manifest (silent corpus
    doubling): the __segment__ df rows carry this build's authoritative
    segment list and stale dirs are pruned."""
    import shutil

    import ray.data

    from infidex_ray.config import EngineConfig
    from infidex_ray.engine import Engine

    rows = [{"doc_id": i, "text": f"alpha beta doc{i} gamma"} for i in range(60)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "prune_idx")
    eng = Engine.build(
        ds, out, EngineConfig(target_docs_per_segment=30),
        text_column="text", key_column="doc_id",
    )
    assert eng.total_docs == 60
    seg_root = os.path.join(out, "segments")
    real = sorted(os.listdir(seg_root))
    # plant a stale segment from a "previous layout" (content-id differs)
    shutil.copytree(
        os.path.join(seg_root, real[0]), os.path.join(seg_root, "seg-deadbeefdeadbeef")
    )
    eng2 = Engine.build(
        ray.data.from_items(rows), out, EngineConfig(target_docs_per_segment=30),
        text_column="text", key_column="doc_id",
    )
    assert eng2.total_docs == 60, "stale segment leaked into the manifest"
    assert not os.path.isdir(os.path.join(seg_root, "seg-deadbeefdeadbeef"))
    hits = eng2.search("alpha beta", top_k=5)
    assert hits
