"""Web-graph operators over edge-list Datasets.

`extract_links` (ops/html.py) produces the crawl's (src, dst) edge list;
this module runs the graph analytics a crawl pipeline derives page-quality
signals from. Everything is expressed as Dataset joins + groupbys — ranks
and edges live in the object store end-to-end, the driver holds only
scalars (N, iteration counter), so the same code runs on a 256-node
cluster's multi-billion-edge graph.

No reference-engine analogue (pure beyond-reference training-data ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _join_partitions, round_half_up4_arr

__all__ = ["graph_nodes", "pagerank", "connected_components"]


def graph_nodes(edges_ds, src_col: str = "src", dst_col: str = "dst"):
    """Distinct node ids of an edge list (src ∪ dst) as a (node) Dataset —
    per-batch unique partials, one node-keyed groupby."""

    def srcs(t: pa.Table) -> pa.Table:
        u = np.unique(t[src_col].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    def dsts(t: pa.Table) -> pa.Table:
        u = np.unique(t[dst_col].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    both = edges_ds.map_batches(srcs, batch_format="pyarrow").union(
        edges_ds.map_batches(dsts, batch_format="pyarrow")
    )
    distinct = both.groupby("node").count()
    return distinct.map_batches(
        lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow"
    )


def pagerank(
    edges_ds,
    num_iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
):
    """Power-iteration PageRank over an integer edge list; returns
    ``(node, rank)`` with rank rounded half-away-from-zero to 4 decimals.

    Simplified (SQL-unrollable) variant: ``r ← (1−d)/N + d·Σ_in r/outdeg``
    with NO dangling-mass redistribution — a dangling page's rank simply
    leaks, which is the common edge-list formulation and keeps every
    iteration a pure join+groupby (bit-reproducible against the unrolled
    DuckDB oracle modulo summation order under round-4).

    Physical plan per iteration: one ``inner`` join (edge ⨝ rank on src),
    one dst-keyed ``groupby().sum`` of contributions, one ``left_outer``
    join back onto the node set — rank state is a materialized Dataset, the
    driver never sees a per-node row. Join parallelism follows
    :func:`infidex_ray.ops.dedup._join_partitions` (pass ``num_partitions``
    explicitly for billion-edge graphs).
    """
    num_partitions = _join_partitions(num_partitions)
    nodes = graph_nodes(edges_ds, src_col, dst_col).materialize()
    n = float(nodes.count())
    if n == 0:
        return nodes.map_batches(
            lambda t: pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )
    base = (1.0 - damping) / n

    outdeg = edges_ds.groupby(src_col).count()

    def od_rename(t: pa.Table) -> pa.Table:
        c = "count()" if "count()" in t.column_names else "count"
        return pa.table(
            {src_col: t[src_col], "od": t[c].cast(pa.float64())}
        )

    edges_od = edges_ds.join(
        outdeg.map_batches(od_rename, batch_format="pyarrow"),
        "inner",
        num_partitions,
        on=(src_col,),
    ).materialize()

    def init_r(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "r": pa.array(np.full(len(t), 1.0 / n))}
        )

    ranks = nodes.map_batches(init_r, batch_format="pyarrow").materialize()

    for _ in range(num_iters):
        joined = edges_od.join(
            ranks, "inner", num_partitions, on=(src_col,), right_on=("node",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = t["r"].to_numpy(zero_copy_only=False)
            od = t["od"].to_numpy(zero_copy_only=False)
            return pa.table({"node": t[dst_col], "c": pa.array(r / od)})

        contribs = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .sum("c")
        )

        def c_rename(t: pa.Table) -> pa.Table:
            c = "sum(c)" if "sum(c)" in t.column_names else "c"
            return pa.table({"node": t["node"], "c": t[c]})

        merged = nodes.join(
            contribs.map_batches(c_rename, batch_format="pyarrow"),
            "left_outer",
            num_partitions,
            on=("node",),
        )

        def update(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c.astype(np.float64)), 0.0, c)
            return pa.table(
                {"node": t["node"], "r": pa.array(base + damping * c)}
            )

        ranks = merged.map_batches(update, batch_format="pyarrow").materialize()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "rank": pa.array(
                    round_half_up4_arr(t["r"].to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")


def connected_components(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
):
    """Connected components over an undirected edge Dataset: returns
    (node, component) with component = the min node id reachable from each
    node. The same size-gated machinery as near-dup clustering
    (``dedup.dedup_clusters_ds``): ≤1M edges union-find on the driver;
    bigger graphs run distributed min-label propagation with pointer
    jumping (O(log diameter) rounds of hash joins, Dataset-resident
    labels) — promoted to a public graph op because component labeling is
    its own pipeline primitive (site clusters, near-dup families, user
    identity stitching), not just a dedup internal."""
    from .dedup import _BROADCAST_VERIFY_MAX_PAIRS, dedup_clusters, dedup_clusters_ds

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": t[src_col].cast(pa.int64()),
                "id_b": t[dst_col].cast(pa.int64()),
            }
        )

    pairs = edges_ds.map_batches(rename, batch_format="pyarrow")
    if num_partitions is None:
        pairs = pairs.materialize()
        if pairs.count() <= _BROADCAST_VERIFY_MAX_PAIRS:
            import ray
            import ray.data

            blocks = [
                t.select(["id_a", "id_b"])
                for t in ray.get(pairs.to_arrow_refs())
                if t.num_rows
            ]
            if not blocks:
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "node": pa.array([], pa.int64()),
                            "component": pa.array([], pa.int64()),
                        }
                    )
                )
            labels = dedup_clusters(pa.concat_tables(blocks).combine_chunks())
            nodes = sorted(labels)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(nodes, pa.int64()),
                        "component": pa.array(
                            [labels[n] for n in nodes], pa.int64()
                        ),
                    }
                )
            )
    out = dedup_clusters_ds(pairs, num_partitions=num_partitions)

    def comp_rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "component": t["label"]})

    return out.map_batches(comp_rename, batch_format="pyarrow")
