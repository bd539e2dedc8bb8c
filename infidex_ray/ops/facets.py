"""Corpus-scale facet counts as a Ray pipeline.

The serving-time facet path (`Engine.query` with ``enable_facets`` —
FacetBuilder.BuildFacets, src/Infidex/Core/FacetBuilder.cs:19-74) walks the
result set in one process, which is faithful to the reference but wrong for
corpus-scale "facet the whole crawl" jobs: a match-all query materializes
every document's stored fields in the engine process. This module is the
documented offline path: the same semantics (optional Infiscript filter →
per-field value counts → count desc, value asc → top 100 values/field)
expressed as ``filter → groupby(field).count → sort.limit`` over a
``ray.data.Dataset`` — the corpus streams, the driver sees only the top-k
value rows. ``Engine.query`` refuses match-all facets beyond its cap and
points here.
"""

from __future__ import annotations

import pyarrow as pa

MAX_FACET_VALUES = 100  # FacetBuilder.cs:23 — at most 100 values per field


def facet_counts_offline(
    ds,
    fields: list[str],
    filter_expr: str | None = None,
    max_per_field: int = MAX_FACET_VALUES,
) -> dict[str, pa.Table]:
    """Facet value counts per field over an (optionally filtered) corpus.

    Returns {field: Table(value: string, n_docs: int64)} ordered count desc
    then value asc, capped at ``max_per_field`` rows — exactly
    ``Engine._build_facets``'s ordering contract. Null values are skipped;
    non-string values are stringified (FacetBuilder stringifies too); list
    values contribute one count per element."""
    from ..filters import filter_dataset

    if filter_expr:
        ds = filter_dataset(ds, filter_expr)

    out: dict[str, pa.Table] = {}
    for field in fields:

        def project(batch: pa.Table, _f=field) -> pa.Table:
            vals: list[str] = []
            for v in batch[_f].to_pylist():
                if v is None:
                    continue
                if isinstance(v, (list, tuple)):
                    vals.extend(str(x) for x in v)
                else:
                    vals.append(str(v))
            return pa.table({"value": pa.array(vals, pa.string())})

        counted = (
            ds.map_batches(project, batch_format="pyarrow")
            .groupby("value")
            .count()
            .map_batches(
                lambda t: pa.table(
                    {
                        "value": t["value"],
                        "n_docs": t[
                            "count()" if "count()" in t.column_names else "count"
                        ],
                    }
                ),
                batch_format="pyarrow",
            )
            .sort(["n_docs", "value"], descending=[True, False])
            .limit(max_per_field)
        )
        parts = list(counted.iter_batches(batch_size=None, batch_format="pyarrow"))
        out[field] = (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {"value": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())}
            )
        )
    return out
