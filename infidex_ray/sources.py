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


def write_partitioned_resumable(ds, out_dir: str, partition_col: str):
    """Resumable partitioned parquet sink: one ``{partition_col}={value}/``
    directory per key value, each committed ATOMICALLY with a ``_SUCCESS``
    marker (write part file → fsync-rename semantics of the marker).

    Re-running the same job first lists the committed partitions, filters
    their rows out of the stream (cheap broadcast membership test — the
    done-set is |partitions|-sized), and writes only the missing ones, so a
    failed 100-TB job resumes from the last committed partition instead of
    rewriting everything. The write itself is a ``groupby(partition_col).
    map_groups`` — one task per partition, no driver I/O.

    Returns the number of partitions written THIS run.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = {
        d.split("=", 1)[1]
        for d in os.listdir(out_dir)
        if "=" in d and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    }
    done_ref = ray.put(frozenset(done))

    def drop_done(batch: pa.Table) -> pa.Table:
        d = ray.get(done_ref)
        if not d:
            return batch
        vals = [str(v) for v in batch[partition_col].to_pylist()]
        mask = pa.array([v not in d for v in vals])
        return batch.filter(mask)

    def write_group(group: pa.Table) -> pa.Table:
        val = str(group[partition_col][0].as_py())
        pdir = os.path.join(out_dir, f"{partition_col}={val}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part-0.parquet.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        with open(os.path.join(pdir, "_SUCCESS"), "w"):
            pass
        return pa.table({"partition": pa.array([val], pa.string())})

    written = (
        ds.map_batches(drop_done, batch_format="pyarrow")
        .groupby(partition_col)
        .map_groups(write_group, batch_format="pyarrow")
    )
    return written.count()
