"""HTML → text extraction stage for Common-Crawl-style corpora.

The BASELINE input carries both ``html:binary`` and ``text:string``; when only
html is present, this stage derives the text column. Deterministic,
dependency-free extraction (no parser libraries in this environment):
drop script/style/head subtrees, strip tags, unescape entities, collapse
whitespace. Runs as a plain ``map_batches`` stage ahead of the index build;
the per-url byte-identical invariant then applies to ITS output.
"""

from __future__ import annotations

import html as _htmllib
import re

import pyarrow as pa

_DROP_SUBTREES = re.compile(
    r"<(script|style|head|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAGS = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    r"footer|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]*>")
# re.ASCII: the oracle collapses RE2 \s+ (ASCII only) — exotic Unicode
# whitespace must survive both engines identically (ops/asciiws.py).
_WS = re.compile(r"\s+", re.ASCII)
# Unicode category Zs — what DuckDB trim() strips (probed per codepoint).
_ZS_CHARS = (
    "\x20\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u202f\u205f\u3000"
)


def html_to_text(html_bytes: bytes | None) -> str:
    """Extract readable text from one HTML payload (deterministic)."""
    if not html_bytes:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _COMMENTS.sub(" ", raw)
    raw = _DROP_SUBTREES.sub(" ", raw)
    raw = _BLOCK_TAGS.sub(" ", raw)  # block boundaries become whitespace
    raw = _ANY_TAG.sub("", raw)
    raw = _htmllib.unescape(raw)
    # DuckDB trim() strips exactly Unicode Zs (space separators) — NOT the
    # control whitespace \t\n\v\f\r\x85   that Python .strip()
    # would also eat (probed empirically; the oracle mirrors this trim).
    return _WS.sub(" ", raw).strip(_ZS_CHARS)


def extract_text_batch(
    batch: pa.Table, html_col: str = "html", out_col: str = "text"
) -> pa.Table:
    """map_batches stage: html binary column → extracted text column
    (replaces ``out_col`` if present)."""
    texts = [html_to_text(b) for b in batch[html_col].to_pylist()]
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(texts, pa.string()))


def extract_text(ds, html_col: str = "html", out_col: str = "text"):
    """Dataset-level wrapper; drops the heavy html column afterwards so only
    the extracted text flows into the index build."""

    def fn(batch: pa.Table) -> pa.Table:
        out = extract_text_batch(batch, html_col, out_col)
        return out.drop_columns([html_col])

    return ds.map_batches(fn, batch_format="pyarrow")


# --- outlink extraction (web-graph side of a crawl pipeline) -----------------


def extract_links(ds, html_col: str = "html", id_col: str = "doc_id"):
    """Distinct ``(doc_id, href)`` outlink pairs from an HTML column — the
    web-graph edge list a crawl pipeline feeds into PageRank-style quality
    signals and frontier scheduling.

    Fully vectorized (no Python loop over rows or matches): Arrow
    ``split_pattern`` on ``href="`` explodes each page into fragments, the
    per-list first fragment is masked off with numpy offset arithmetic, and
    the URL is the prefix of each remaining fragment up to the closing quote
    (fragments without one — truncated pages — are dropped, matching the
    regex-oracle semantics of ``href="([^"]*)"``). Distinctness is resolved
    per batch with an Arrow C++ group-by: each doc's links live in exactly
    one batch, so per-batch distinct ≡ global distinct — no shuffle."""
    import numpy as np
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[html_col]
        if len(batch) == 0 or pa.types.is_null(col.type):  # all-null block
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "href": pa.array([], pa.string()),
                }
            )
        col = _decode_html_col(col)
        parts = pc.split_pattern(col, pattern='href="')
        ln = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        ln = np.nan_to_num(ln.astype(np.float64)).astype(np.int64)  # nulls → 0
        flat = pc.list_flatten(parts)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), ln)
        first = np.zeros(len(flat), dtype=bool)
        offs = np.cumsum(ln) - ln
        first[offs[ln > 0]] = True  # fragment 0 of each page = pre-href text
        keep = ~first
        frag = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        cut = pc.split_pattern(frag, pattern='"', max_splits=1)
        closed = pc.greater(pc.list_value_length(cut), 1).to_numpy(
            zero_copy_only=False
        )
        href = pc.list_element(cut, 0).filter(pa.array(closed))
        doc_idx = doc_idx[closed]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        pairs = pa.table({id_col: pa.array(ids), "href": href})
        return pairs.group_by([id_col, "href"]).aggregate([])

    return ds.select_columns([id_col, html_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def _decode_html_col(col):
    """binary → utf-8 string column (lossy decode for non-utf8 crawl bytes)."""
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        try:
            col = col.cast(pa.string())
        except pa.ArrowInvalid:
            col = pa.array(
                [
                    b.decode("utf-8", errors="replace") if b is not None else None
                    for b in col.to_pylist()
                ],
                pa.string(),
            )
    return col


def extract_anchors(ds, html_col: str = "html", id_col: str = "doc_id"):
    """``(doc_id, href, anchor)`` triples from an HTML column — one row per
    link OCCURRENCE (unlike :func:`extract_links`' distinct edge list), with
    the visible anchor text, matching the regex semantics
    ``<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a``: href must appear inside the
    opening tag (no ``>`` before it), and anchors containing nested markup
    (a ``<`` before ``</a``) are dropped.

    Anchor text is the strongest off-page relevance signal a web corpus has
    (what OTHER pages call a target); this is the extraction stage feeding
    :func:`anchor_stats`. Fully vectorized: one ``split_pattern`` explosion
    per page on ``<a ``, then four ``max_splits=1`` cuts with numpy masks —
    no Python loop over rows or matches, no shuffle."""
    import numpy as np
    import pyarrow.compute as pc

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "href": pa.array([], pa.string()),
            "anchor": pa.array([], pa.string()),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[html_col]
        if len(batch) == 0 or pa.types.is_null(col.type):
            return empty.set_column(
                0, id_col, pa.array([], batch[id_col].type)
            )
        col = _decode_html_col(col)
        parts = pc.split_pattern(col, pattern="<a ")
        ln = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        ln = np.nan_to_num(ln.astype(np.float64)).astype(np.int64)
        flat = pc.list_flatten(parts)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), ln)
        first = np.zeros(len(flat), dtype=bool)
        offs = np.cumsum(ln) - ln
        first[offs[ln > 0]] = True
        keep = ~first
        frag, doc_idx = flat.filter(pa.array(keep)), doc_idx[keep]
        # NB: pc.list_element(col, 1) raises on ANY length-1 list, so each
        # cut filters to the surviving rows BEFORE taking element 1.
        # cut 1: href=" must exist, with no '>' before it (same opening tag)
        cut = pc.split_pattern(frag, pattern='href="', max_splits=1)
        has = pc.greater(pc.list_value_length(cut), 1).to_numpy(zero_copy_only=False)
        intag = pc.equal(
            pc.count_substring(pc.list_element(cut, 0), ">"), 0
        ).to_numpy(zero_copy_only=False)
        ok = has & intag
        rest = pc.list_element(cut.filter(pa.array(ok)), 1)
        doc_idx = doc_idx[ok]
        # cut 2: closing quote of the href value
        cut = pc.split_pattern(rest, pattern='"', max_splits=1)
        ok = pc.greater(pc.list_value_length(cut), 1).to_numpy(zero_copy_only=False)
        cut = cut.filter(pa.array(ok))
        href, rest = pc.list_element(cut, 0), pc.list_element(cut, 1)
        doc_idx = doc_idx[ok]
        # cut 3: end of the opening tag
        cut = pc.split_pattern(rest, pattern=">", max_splits=1)
        ok = pc.greater(pc.list_value_length(cut), 1).to_numpy(zero_copy_only=False)
        href = href.filter(pa.array(ok))
        body = pc.list_element(cut.filter(pa.array(ok)), 1)
        doc_idx = doc_idx[ok]
        # cut 4: anchor text up to </a, rejecting nested markup ([^<]*)
        cut = pc.split_pattern(body, pattern="</a", max_splits=1)
        closed = pc.greater(pc.list_value_length(cut), 1).to_numpy(
            zero_copy_only=False
        )
        anchor = pc.list_element(cut, 0)
        clean = pc.equal(
            pc.count_substring(anchor, "<"), 0
        ).to_numpy(zero_copy_only=False)
        ok = closed & clean
        mask = pa.array(ok)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx[ok]]
        return pa.table(
            {
                id_col: pa.array(ids),
                "href": href.filter(mask),
                "anchor": anchor.filter(mask),
            }
        )

    return ds.select_columns([id_col, html_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def anchor_stats(anchors_ds, href_col: str = "href", anchor_col: str = "anchor"):
    """Per-target-domain anchor-text rollup over an ``(href, anchor)``
    occurrence stream: ``n_links`` (total inbound link occurrences),
    ``n_unique_anchors`` (distinct anchor strings), ``top_anchor`` (the most
    frequent anchor, ties → lexicographically smallest) — the classic
    anchor-corpus signal table (site-level descriptors for ranking /
    spam triage).

    Scale shape: domain = host part of the href (vectorized scheme/path
    cuts), then per-batch ``(domain, anchor)`` count partials (≤ distinct
    pairs per block leave each task) → one domain-keyed shuffle whose
    groups are (domain, anchor, partial_n) rows, re-summed and reduced
    vectorized per group. A hot domain costs rows = its distinct anchors,
    not its inbound links."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        href = batch[href_col]
        # host: drop the scheme (RE2 rewrite — total, safe on empty/relative
        # hrefs) then keep the prefix up to the first '/'
        tail = pc.replace_substring_regex(
            href, pattern=r"^[A-Za-z][A-Za-z0-9+.-]*://", replacement=""
        )
        host = pc.list_element(pc.split_pattern(tail, pattern="/", max_splits=1), 0)
        pairs = pa.table({"domain": host, anchor_col: batch[anchor_col]})
        return pairs.group_by(["domain", anchor_col]).aggregate(
            [("domain", "count")]
        ).rename_columns(["domain", anchor_col, "n"])

    def final(group: pa.Table) -> pa.Table:
        summed = group.group_by(["domain", anchor_col]).aggregate([("n", "sum")])
        n = summed["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        anchors = summed[anchor_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((anchors, -n))
        top = order[0]
        return pa.table(
            {
                "domain": summed["domain"].take(pa.array([0])),
                "n_links": pa.array([int(n.sum())], pa.int64()),
                "n_unique_anchors": pa.array([len(summed)], pa.int64()),
                "top_anchor": pa.array([str(anchors[top])], pa.string()),
            }
        )

    return (
        anchors_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .map_groups(final, batch_format="pyarrow")
    )


def link_in_degrees(links_ds, href_col: str = "href"):
    """In-degree per link target over a distinct edge list: per-batch Arrow
    ``value_counts`` partials (≤ |targets| rows leave each task) → one
    target-keyed ``groupby().sum`` — the word-count combiner shape, so a hot
    target (every page links the homepage) costs one row per block."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[href_col])
        return pa.table(
            {
                href_col: vc.field("values").cast(pa.string()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    agg = (
        links_ds.select_columns([href_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(href_col)
        .sum("n")
    )

    def rename(t: pa.Table) -> pa.Table:
        c = "sum(n)" if "sum(n)" in t.column_names else "n"
        return pa.table({href_col: t[href_col], "in_degree": t[c].cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")


def html_density_batch(
    batch: pa.Table, html_col: str = "html", id_col: str = "doc_id"
) -> pa.Table:
    """Per-page markup-density quality signals — the boilerplate-page
    detector crawl pipelines gate on BEFORE extraction (a page that is
    mostly tags is nav/chrome, not content): ``(doc_id, html_len, n_tags,
    text_len, text_ratio)`` with text = html minus ``<...>`` tag spans and
    text_ratio = round(text_len / html_len, 4) (0 for empty pages).

    Three Arrow RE2 kernels per batch, no Python loop; the DuckDB oracle
    recomputes every column with the same regex engine semantics."""
    import numpy as np
    import pyarrow.compute as pc

    col = batch[html_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        col = col.cast(pa.string())
    html = pc.coalesce(col, pa.scalar("", pa.string()))
    html_len = pc.binary_length(html).cast(pa.int64())
    n_tags = pc.count_substring_regex(html, r"<[^>]*>").cast(pa.int64())
    stripped = pc.replace_substring_regex(html, r"<[^>]*>", "")
    text_len = pc.binary_length(stripped).cast(pa.int64())
    hl = html_len.to_numpy(zero_copy_only=False).astype(np.float64)
    tl = text_len.to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(hl > 0, tl / np.maximum(hl, 1.0), 0.0)
    ratio = np.copysign(np.floor(np.abs(ratio) * 1e4 + 0.5) / 1e4, ratio)
    return pa.table(
        {
            id_col: batch[id_col],
            "html_len": html_len,
            "n_tags": n_tags,
            "text_len": text_len,
            "text_ratio": pa.array(ratio, pa.float64()),
        }
    )


def html_density(ds, html_col: str = "html", id_col: str = "doc_id"):
    """Dataset wrapper for :func:`html_density_batch` — stateless
    vectorized ``map_batches``, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        return html_density_batch(batch, html_col, id_col)

    return ds.map_batches(fn, batch_format="pyarrow")
