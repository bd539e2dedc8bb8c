"""Corpus source readers: format inference, column pruning, end-to-end
build-from-CSV (the reference's CsvHelper ingestion path,
src/Infidex.Benchmark/MovieData.cs:24-70)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    csv = d / "docs.csv"
    csv.write_text(
        "doc_id,text,lang\n"
        "1,hash join merge,en\n"
        "2,fast column scan,en\n"
        "3,langsam spalte,de\n"
    )
    jl = d / "docs.jsonl"
    with open(jl, "w") as f:
        for i, t in ((1, "hash join merge"), (2, "fast column scan")):
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    return str(csv), str(jl)


def test_read_csv_infers_format_and_prunes(ray_session, corpus_files):
    from infidex_ray.sources import read_corpus

    csv, _ = corpus_files
    df = read_corpus(csv, columns=["doc_id", "text"]).to_pandas()
    assert list(df.columns) == ["doc_id", "text"]
    assert len(df) == 3 and sorted(df.doc_id.tolist()) == [1, 2, 3]


def test_read_jsonl(ray_session, corpus_files):
    from infidex_ray.sources import read_corpus

    _, jl = corpus_files
    df = read_corpus(jl).to_pandas()
    assert len(df) == 2 and "text" in df.columns


def test_build_index_from_csv(ray_session, corpus_files, tmp_path):
    from infidex_ray import EngineConfig
    from infidex_ray.engine import Engine
    from infidex_ray.sources import read_corpus

    csv, _ = corpus_files
    eng = Engine.build(
        read_corpus(csv, columns=["doc_id", "text"]),
        str(tmp_path / "csv-idx"),
        EngineConfig(target_docs_per_segment=10),
        text_column="text",
        key_column="doc_id",
    )
    hits = eng.search("hash join", top_k=3)
    assert hits and hits[0].doc_key == 1


def test_write_results_partitioned(ray_session, corpus_files, tmp_path):
    import ray.data
    from infidex_ray.sources import read_corpus, write_results

    csv, _ = corpus_files
    out = str(tmp_path / "out")
    write_results(read_corpus(csv), out, partition_cols=["lang"])
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 3
    # hive layout: one directory per lang partition (resumable output)
    assert sorted(p for p in os.listdir(out) if p.startswith("lang=")) == [
        "lang=de",
        "lang=en",
    ]


def test_write_partitioned_resumable(ray_session, tmp_path):
    import os
    import shutil

    import ray.data

    from infidex_ray.sources import write_partitioned_resumable

    rows = [{"doc_id": i, "grp": i % 3, "text": f"t{i}"} for i in range(30)]
    out = str(tmp_path / "sink")
    n = write_partitioned_resumable(ray.data.from_items(rows), out, "grp")
    assert n == 3
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 30 and set(back.doc_id) == set(range(30))

    # simulate a crashed partition: drop one dir entirely
    shutil.rmtree(os.path.join(out, "grp=1"))
    done_file = os.path.join(out, "grp=0", "part-0.parquet")
    mtime_before = os.path.getmtime(done_file)
    n2 = write_partitioned_resumable(ray.data.from_items(rows), out, "grp")
    assert n2 == 1  # only the missing partition is rewritten
    assert os.path.getmtime(done_file) == mtime_before  # committed untouched
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 30 and set(back.doc_id) == set(range(30))
