"""URL parsing / normalization for web-crawl corpora.

Crawl pipelines key nearly everything on the URL: per-domain caps and
quality priors, dedup of ?utm-tracked variants, robots/blocklist joins. This
op splits a URL column into (scheme, host, path, query) plus a normalized
registered host (lowercased, leading ``www.`` stripped) — the standard
domain key.

Scale design: one stateless ``map_batches`` built from Arrow RE2 kernels
(``extract_regex`` with named groups + ``ascii_lower`` /
``replace_substring_regex``) — fully vectorized, no Python per row, and
engine-identical to a DuckDB ``regexp_extract`` oracle (both RE2). No
shuffle; downstream per-domain ops groupby the ``domain`` column this op
emits.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["URL_PATTERN", "url_parse"]

# scheme optional; host = up to the first /?#; path = up to ?#; query after ?
URL_PATTERN = (
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://)?"
    r"(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
)


def url_parse_batch(
    batch: pa.Table, url_col: str = "url", keep_cols: list[str] | None = None
) -> pa.Table:
    col = batch[url_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    urls = pc.coalesce(col, pa.scalar("", pa.string()))
    parts = pc.extract_regex(urls, URL_PATTERN)
    # extract_regex yields null structs only if the whole pattern misses —
    # everything is optional here, so it always matches; unmatched groups
    # come back as empty strings (scheme/query: '' means absent)
    scheme = pc.struct_field(parts, "scheme")
    host = pc.struct_field(parts, "host")
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")
    domain = pc.replace_substring_regex(
        pc.utf8_lower(host), r"^www\.", "", max_replacements=1
    )
    keep = (
        [c for c in batch.column_names if c != url_col]
        if keep_cols is None
        else list(keep_cols)
    )
    cols = {c: batch[c] for c in keep}
    cols.update(
        {"scheme": scheme, "host": host, "domain": domain, "path": path,
         "url_query": query}
    )
    return pa.table(cols)


def url_parse(ds, url_col: str = "url", keep_cols: list[str] | None = None):
    """Dataset wrapper: splits ``url_col`` into scheme/host/domain/path/
    url_query columns (url_col dropped, other columns pass through)."""
    import functools

    return ds.map_batches(
        functools.partial(url_parse_batch, url_col=url_col, keep_cols=keep_cols),
        batch_format="pyarrow",
    )
