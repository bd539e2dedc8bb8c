#!/usr/bin/env python
"""Index-build job entry point for ``ray job submit``.

On a real cluster:

    ray job submit --address http://head:8265 \
        --working-dir . -- python scripts/build_job.py \
        --input s3://corpus/webpages/ --out /shared/index \
        --text-column text --key-column url --docs-per-segment 250000 \
        --auto-segment

Resumable: re-submitting the same job skips segments whose ``_SUCCESS``
marker exists (content-derived segment names make this safe across retries
and reschedules). Per-stage metrics land in ``<out>/manifest.json``.
Locally the same script runs under ``ray.init(address="local")``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet file/dir (or csv/json)")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--format", default=None)
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--key-column", default="url")
    ap.add_argument("--store-columns", default="", help="comma-separated filter/facet columns")
    ap.add_argument("--docs-per-segment", type=int, default=250_000)
    ap.add_argument("--auto-segment", action="store_true", help="chunk long docs (target 200, overlap 0.2)")
    ap.add_argument("--merge", action="store_true", help="compact to one segment after the build")
    ap.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        init_kwargs = {"include_dashboard": False}
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    from infidex_ray.build import build_index, merge_index
    from infidex_ray.config import AutoSegmentSetup, EngineConfig
    from infidex_ray.sources import read_corpus

    store = tuple(c for c in args.store_columns.split(",") if c)
    cfg = EngineConfig(
        target_docs_per_segment=args.docs_per_segment,
        auto_segment=AutoSegmentSetup(200, 0.2) if args.auto_segment else None,
    )
    columns = [args.key_column, args.text_column, *store]
    ds = read_corpus(args.input, format=args.format, columns=columns)
    manifest = build_index(
        ds, args.out, cfg,
        text_column=args.text_column, key_column=args.key_column,
        store_columns=store,
    )
    if args.merge:
        merged = args.out.rstrip("/") + "-merged"
        manifest = merge_index(args.out, merged)
        print(f"compacted into {merged}", file=sys.stderr)
    print(json.dumps({"stats": manifest["stats"], "metrics": manifest.get("metrics", {})}))
    ray.shutdown()


if __name__ == "__main__":
    main()
