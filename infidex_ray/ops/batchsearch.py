"""Batch search — score a Dataset of QUERIES through a built index as a
Ray Data transform ("search as a data transform").

The serving path (`engine.py` / `query/executor.py`) optimizes latency of
one query at a time; offline jobs — relevance eval sweeps, query-log
mining, hard-negative mining for ranker training — instead need THROUGHPUT
over millions of stored queries. This op is the Ray-Data-native shape for
that: a stateful actor pool (``map_batches`` with a callable class) where
each actor opens the index ONCE in ``__init__`` (mmap'd segments, df
tables) and then scores whole query batches per call — no per-query
engine setup, no driver round-trips, linear scale-out with the pool size.

The index tree must be readable by every worker (shared filesystem or
object store path) — the same assumption every multi-node Ray Data read
makes.

No direct reference analogue (the reference is a serving engine;
SearchEngine.cs:228-306 scores one query per call) — this is the
beyond-reference batch form of the same stage-1/coverage pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _SearchActor:
    def __init__(
        self,
        index_dir: str,
        top_k: int,
        enable_coverage: bool,
        query_col: str,
        score_mode: str,
    ):
        from ..engine import Engine

        self.eng = Engine.load(index_dir)
        self.top_k = top_k
        self.enable_coverage = enable_coverage
        self.query_col = query_col
        self.score_mode = score_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"query": [], "rank": [], "doc_id": [], "score": []}
        for q in batch[self.query_col].to_pylist():
            q = q or ""
            hits = self.eng.search(
                q, top_k=self.top_k, enable_coverage=self.enable_coverage
            )
            if self.score_mode == "float64_sql":
                smap = dict(self.eng.bm25_all_scores(q, include_fuzzy=True))
            for r, hit in enumerate(hits):
                out["query"].append(q)
                out["rank"].append(r + 1)
                out["doc_id"].append(hit.doc_key)
                if self.score_mode == "float64_sql":
                    s = smap[hit.doc_key]
                    s = float(
                        np.floor(abs(s) * 1e4 + 0.5) * np.sign(s) / 1e4
                    )
                else:
                    s = float(hit.score)
                out["score"].append(s)
        return pa.table(
            {
                "query": pa.array(out["query"], pa.string()),
                "rank": pa.array(out["rank"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )


def batch_search(
    queries_ds,
    index_dir: str,
    top_k: int = 10,
    enable_coverage: bool = True,
    query_col: str = "query",
    score_mode: str = "engine",
    concurrency=(1, 8),
    batch_size: int = 256,
):
    """Run every query row through the index; returns ``(query, rank,
    doc_id, score)`` rows (rank 1-based, ranking identical to
    ``Engine.search`` — the golden rank-identity suite covers the
    underlying pipeline).

    ``score_mode='engine'`` emits the serving path's float32 score;
    ``'float64_sql'`` re-derives scores via ``bm25_all_scores`` (the
    SQL-surface float64 scorer, rounded half-away to 4) so the output
    hash-matches the ``sqlgen.stage1_topk_sql`` oracle — use with
    ``enable_coverage=False`` (the coverage cascade is not
    SQL-expressible).

    Scale: the actor pool autoscales within ``concurrency`` (a FIXED pool
    sized at the CPU count deadlocks small sessions — see the decontam
    note); each actor holds the mmap'd index once, so memory is
    O(index) × pool size, and throughput scales with the pool."""
    if score_mode not in ("engine", "float64_sql"):
        # validate driver-side: a worker-side raise surfaces as an opaque
        # RayTaskError
        raise ValueError(f"unknown score_mode {score_mode!r}")
    if score_mode == "float64_sql" and enable_coverage:
        # the coverage cascade can surface wordmatch-only hits absent
        # from bm25_all_scores (small corpora) → KeyError in the actor
        raise ValueError("score_mode='float64_sql' requires enable_coverage=False")
    return queries_ds.map_batches(
        _SearchActor,
        fn_constructor_args=(
            index_dir,
            top_k,
            enable_coverage,
            query_col,
            score_mode,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
