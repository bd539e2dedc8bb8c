"""Line-level corpus deduplication (CCNet / RefinedWeb boilerplate removal).

Web pages share enormous amounts of line-level boilerplate — cookie
banners, nav menus, copyright footers — and the standard curation move
(CCNet §3.1, RefinedWeb "line-wise filtering") is: count every line's
frequency ACROSS the corpus, then strip lines that occur more than a
threshold number of times, keeping each document's remaining lines in
order.

Scale design (two passes, corpus never reassembled through a shuffle):

1. **Frequent-line mining** — per batch, one Arrow ``split_pattern`` +
   ``value_counts`` collapses the block to distinct ``(line, n)`` partials
   (the combiner pattern), each keyed by a coarse md5 SLICE of the line —
   never a per-line Ray group (a ~unique-key groupby pays per group; the
   slice pass is the same trick as minhash bucketing / duplicate_spans).
   Each slice sums its partials vectorized and emits ONLY lines with total
   count > ``max_freq`` — the boilerplate set, which is tiny relative to
   the corpus (guarded by ``max_frequent_lines``).
2. **Strip + rejoin** — the frequent set broadcasts once via ``ray.put``;
   each batch drops matching lines with ``pc.is_in`` and reassembles
   documents with offset arithmetic + ``binary_join`` — fully vectorized,
   zero Python per row, no shuffle of the corpus.

The op is engine-identical to a DuckDB oracle built from
``string_split(text, chr(10))`` + ``string_agg(... ORDER BY ord)``: lines
compare as exact UTF-8 strings (no hashing on the comparison path, so no
collision caveat).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_num_slices, _md5_u64

__all__ = ["frequent_lines", "dedup_lines"]


def _line_partials(batch: pa.Table, text_col: str, num_slices: int) -> pa.Table:
    texts = pc.fill_null(pc.cast(batch[text_col], pa.large_string()), "")
    flat = pc.list_flatten(pc.split_pattern(texts, "\n"))
    vc = pc.value_counts(flat)
    lines = vc.field("values")
    ns = vc.field("counts").cast(pa.int64())
    sl = np.asarray(
        [_md5_u64(s) % num_slices for s in lines.to_pylist()], dtype=np.int32
    )
    return pa.table(
        {"line": lines.cast(pa.large_string()), "n": ns, "slice": pa.array(sl)}
    )


def frequent_lines(
    ds,
    text_col: str = "text",
    max_freq: int = 1,
    num_slices: int | None = None,
):
    """Dataset of ``(line, n)`` for every line whose total occurrence count
    across the corpus (within-doc repeats included) exceeds ``max_freq``."""
    if num_slices is None:
        num_slices = _default_num_slices()

    def mine(group: pa.Table) -> pa.Table:
        agg = group.group_by(["line"]).aggregate([("n", "sum")])
        keep = pc.greater(agg["n_sum"], max_freq)
        agg = agg.filter(keep)
        return pa.table(
            {"line": agg["line"], "n": agg["n_sum"].cast(pa.int64())}
        )

    return (
        ds.select_columns([text_col])
        .map_batches(
            lambda b: _line_partials(b, text_col, num_slices),
            batch_format="pyarrow",
        )
        .groupby("slice")
        .map_groups(mine, batch_format="pyarrow")
    )


def dedup_lines(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_freq: int = 1,
    num_slices: int | None = None,
    max_frequent_lines: int = 10_000_000,
):
    """Strip corpus-frequent lines from every document.

    Returns ``(id_col, text, n_removed)``: the document with every line
    occurring more than ``max_freq`` times corpus-wide removed (order of
    the surviving lines preserved, re-joined with ``\\n``; a document whose
    every line is boilerplate becomes the empty string), plus the count of
    removed lines.

    ``max_frequent_lines`` bounds the broadcast set: if more distinct lines
    than this exceed ``max_freq``, the threshold is too low for the corpus
    and the op raises rather than silently shipping a corpus-sized
    broadcast (same honesty rule as facet_counts' match-all guard).
    """
    import ray

    freq_ds = frequent_lines(
        ds, text_col=text_col, max_freq=max_freq, num_slices=num_slices
    ).materialize()
    n_freq = freq_ds.count()
    if n_freq > max_frequent_lines:
        raise ValueError(
            f"{n_freq} lines exceed max_freq={max_freq} (> max_frequent_lines="
            f"{max_frequent_lines}); raise max_freq or the cap"
        )
    if n_freq == 0:
        flat_lines = pa.array([], pa.large_string())
    else:
        # the frequent set is boilerplate-sized (guarded above) → driver-safe
        flat_lines = pa.array(
            [r["line"] for r in freq_ds.take_all()], pa.large_string()
        )
    freq_ref = ray.put(flat_lines)

    def strip(batch: pa.Table) -> pa.Table:
        frequent = ray.get(freq_ref)
        texts = pc.fill_null(pc.cast(batch[text_col], pa.large_string()), "")
        lists = pc.split_pattern(texts, "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_of = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        drop = pc.is_in(flat, value_set=frequent).to_numpy(zero_copy_only=False)
        keep = ~drop
        kept_per_doc = (
            np.bincount(doc_of[keep], minlength=len(lens)).astype(np.int64)
            if len(flat)
            else np.zeros(len(lens), dtype=np.int64)
        )
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int64)
        new_lists = pa.LargeListArray.from_arrays(
            offsets, flat.filter(pa.array(keep))
        )
        joined = pc.binary_join(new_lists, pa.scalar("\n", pa.large_string()))
        out_cols = {
            id_col: batch[id_col],
            "text": joined.cast(pa.string()),
            "n_removed": pa.array((lens - kept_per_doc).astype(np.int64)),
        }
        return pa.table(out_cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        strip, batch_format="pyarrow"
    )
