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

__all__ = ["parse_robots_txt", "robots_allowed"]


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
