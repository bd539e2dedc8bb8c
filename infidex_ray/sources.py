"""Corpus sources: uniform readers for the index-build input.

The reference ingests IEnumerable<Document> built by callers from CSV
(src/Infidex.Benchmark/MovieData.cs:24-70, CsvHelper) or JSON
(src/Infidex.Example/SchoolExample.cs). Here every source is a
``ray.data.Dataset`` so the build pipeline is source-agnostic; column
pruning happens at the read for parquet (only the key/text/stored columns
leave storage)."""

from __future__ import annotations

import os


def read_corpus(
    path: str,
    format: str | None = None,
    columns: list[str] | None = None,
    **kwargs,
):
    """Read a corpus directory/file into a Dataset. ``format`` inferred from
    the extension when omitted (parquet | csv | json | text)."""
    import ray.data

    if format is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        format = {
            "parquet": "parquet", "pq": "parquet", "csv": "csv",
            "json": "json", "jsonl": "json", "txt": "text",
        }.get(ext, "parquet")
    if format == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    if format == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    elif format == "json":
        ds = ray.data.read_json(path, **kwargs)
    elif format == "text":
        ds = ray.data.read_text(path, **kwargs)
    else:
        raise ValueError(f"unknown corpus format {format!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_results(ds, out_dir: str, partition_cols: list[str] | None = None, **kwargs):
    """Write a result Dataset as partitioned parquet (resumable output: one
    directory per partition, never one giant file)."""
    import ray.data  # noqa: F401

    ds.write_parquet(out_dir, partition_cols=partition_cols, **kwargs)
    return out_dir
