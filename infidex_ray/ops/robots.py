"""robots.txt gating for crawl pipelines: parse Allow/Disallow path-prefix
rules and evaluate each URL against them with longest-match-wins semantics
(the Google/RFC 9309 rule: the most specific — longest — matching rule
decides; on an exact length tie Allow wins; no matching rule ⇒ allowed).

Simplified on purpose so the semantics stay SQL-oracle-checkable: plain
path prefixes only (no ``*``/``$`` wildcards), one rule set for the
``*`` user-agent. That covers the overwhelming majority of real-world
rules; a wildcard-aware evaluator would slot into the same broadcast +
vectorized-prefix-scan shape.

Scale shape: the rule set (KBs–MBs across a whole crawl) ships ONCE via
``ray.put``; URLs stream through ``map_batches`` and each batch is scored
with one vectorized ``starts_with`` pass per rule — no shuffle, no joins.

No reference-engine analogue (beyond-reference crawl op).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["parse_robots_txt", "robots_allowed", "sitemap_urls"]


def parse_robots_txt(text: str) -> list[tuple[bool, str]]:
    """Rules for the ``*`` user-agent as ``(allow, path_prefix)`` tuples,
    in file order. Groups for other agents are skipped; blank/comment
    lines reset nothing (RFC 9309 group rules, simplified)."""
    rules: list[tuple[bool, str]] = []
    active = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            active = value == "*"
        elif active and field in ("allow", "disallow") and value:
            rules.append((field == "allow", value))
    return rules


def robots_allowed(
    ds,
    rules: list[tuple[bool, str]],
    path_col: str = "path",
    out_col: str = "allowed",
):
    """Append a boolean ``allowed`` column: longest matching rule decides,
    Allow wins length ties, unmatched paths are allowed.

    ``rules`` may come from :func:`parse_robots_txt`; they are broadcast
    once via ``ray.put`` and every batch runs one vectorized
    ``starts_with`` per rule — score = 2·len(prefix) + allow, best score
    wins (the +1 encodes the Allow tiebreak)."""
    import pyarrow.compute as pc
    import ray

    rref = ray.put(list(rules))

    def fn(batch: pa.Table) -> pa.Table:
        rl = ray.get(rref)
        n = batch.num_rows
        best = np.full(n, -1, dtype=np.int64)  # unmatched
        verdict = np.ones(n, dtype=bool)  # default allow
        paths = batch[path_col].combine_chunks()
        for allow, prefix in rl:
            m = pc.starts_with(paths, prefix).fill_null(False).to_numpy(
                zero_copy_only=False
            )
            score = 2 * len(prefix) + (1 if allow else 0)
            take = m & (score > best)
            best[take] = score
            verdict[take] = allow
        return batch.append_column(out_col, pa.array(verdict))

    return ds.map_batches(fn, batch_format="pyarrow")


def sitemap_urls(ds, xml_col: str = "xml", id_col: str = "doc_id"):
    """Extract ``<loc>`` URL entries from sitemap-XML blobs — the crawl
    frontier's seed expansion step (robots.txt's Sitemap: pointers lead
    here). Returns distinct ``(doc_id, url)`` pairs.

    Fully vectorized, the ``extract_links`` pattern (ops/html.py): Arrow
    ``split_pattern`` on ``<loc>`` explodes each sitemap, numpy offset
    arithmetic masks the pre-first fragment, and the URL is each remaining
    fragment's prefix up to ``</loc>`` (unclosed tags are dropped —
    matching the regex-oracle semantics of ``<loc>([^<]*)</loc>``).
    Distinct per batch via Arrow group-by (a sitemap lives in one batch,
    so per-batch distinct ≡ global distinct — zero shuffle)."""
    import numpy as np
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[xml_col]
        if len(batch) == 0 or pa.types.is_null(col.type):
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type if len(batch.schema.names) else pa.int64()),
                    "url": pa.array([], pa.string()),
                }
            )
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            col = col.cast(pa.string())
        parts = pc.split_pattern(col, pattern="<loc>")
        ln = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        ln = np.nan_to_num(ln.astype(np.float64)).astype(np.int64)
        flat = pc.list_flatten(parts)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), ln)
        first = np.zeros(len(flat), dtype=bool)
        offs = np.cumsum(ln) - ln
        first[offs[ln > 0]] = True
        keep = ~first
        frag = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        cut = pc.split_pattern(frag, pattern="</loc>", max_splits=1)
        closed = pc.greater(pc.list_value_length(cut), 1).to_numpy(
            zero_copy_only=False
        )
        url = pc.list_element(cut, 0).filter(pa.array(closed))
        doc_idx = doc_idx[closed]
        # regex-oracle parity: <loc>([^<]*)</loc> rejects captures holding
        # a '<' (nested tag before the close) — drop them here too
        no_lt = pc.equal(pc.find_substring(url, "<"), -1).to_numpy(
            zero_copy_only=False
        )
        url = url.filter(pa.array(no_lt))
        doc_idx = doc_idx[no_lt]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        pairs = pa.table({id_col: pa.array(ids), "url": url})
        return pairs.group_by([id_col, "url"]).aggregate([])

    return ds.select_columns([id_col, xml_col]).map_batches(
        fn, batch_format="pyarrow"
    )
