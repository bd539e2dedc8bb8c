"""Distributed query serving: posting-list-holding shard actors + driver.

The north-star serving model (SURVEY §3.2 "Ray query shape"): the index's
doc-range segments are split into contiguous shards, each owned by one
``IndexShardActor`` that loads its segments ONCE (postings via np.memmap,
docmap, word-matcher tables, doc-prep caches — all per-actor state built in
``__init__``/first use). Queries fan out from the driver:

* stage 1: the two-phase tier protocol (phase A counts → global decide →
  phase B scoring) — identical math to the in-process engine, so results are
  rank-identical regardless of shard count;
* coverage: the driver computes the candidate plan (wm cap, doc-key index)
  and ships per-shard job slices; every doc's jobs land on the shard owning
  its segment, preserving the reference's memo semantics;
* short queries: per-shard scans with two small synchronization points
  (fuzzy-fallback gate, global max raw score); per-query scratch state stays
  inside the actor so only small aggregates cross the wire.

On a multi-node cluster each actor holds ~(index_size / num_shards); the
driver traffic per query is O(top_k + unique query terms), independent of
corpus size.
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import ray

from ..config import EngineConfig
from ..engine import Engine, load_df_lookup
from . import coverage as cov
from . import pipeline as qp
from . import shortquery as sq
from . import stage1 as s1


@ray.remote
class IndexShardActor:
    """Owns a contiguous slice of index segments; all per-segment state
    (mmap'd postings, docmap, word tables, LRU fuzzy cache) lives here."""

    def __init__(self, index_dir: str, segment_indices: list[int]):
        self.engine = Engine.load(index_dir, segment_indices=segment_indices)
        self._sq_state: dict[str, tuple[dict, set]] = {}

    def set_deleted(self, keys) -> None:
        self.engine.deleted = set(keys)

    def field_rows(self, keys) -> dict:
        """Stored field rows for the subset of ``keys`` this shard owns
        (Query-API post-processing: filter/boost/sort/facet inputs)."""
        out = {}
        for k in keys:
            row = self.engine._field_row(int(k))
            if row:
                out[int(k)] = row
        return out

    def warm(self) -> int:
        """Pre-build word-matcher tables + doc preps (actor-init cost paid
        once, in parallel across the pool)."""
        if self.engine.cfg.enable_word_matcher:
            for seg in self.engine.segments:
                qp._word_matcher_for(self.engine, seg.seg_id)
        return self.engine.total_docs

    # ---- stage 1 ------------------------------------------------------
    def fuzzy_df(self, text: str) -> int:
        return sum(s.fuzzy_union(text)[1] for s in self.engine.searchers)

    def fuzzy_df_batch(self, texts: list[str]) -> list[int]:
        return [self.fuzzy_df(t) for t in texts]

    def phase_a(self, plan) -> list[int]:
        vecs = [s.phase_a(plan) for s in self.engine.searchers]
        width = max((len(v) for v in vecs), default=0)
        total = np.zeros(width, dtype=np.int64)
        for v in vecs:
            total[: len(v)] += v
        return total.tolist()

    def phase_b(self, plan, level: int, top_k: int, avgdl: float):
        per = [s.phase_b(plan, level, top_k, avgdl) for s in self.engine.searchers]
        # packed columns: the driver merges 16 shards' results per query —
        # numpy columns cross the wire ~9x cheaper than Python tuples
        return s1.pack_topk(per, top_k)

    def phase_ab(self, plan, packed):
        """Fused cardinality + speculative scoring round: phase_a counts AND
        phase_b results at the driver's guessed level in ONE actor RTT. The
        driver uses the speculative results only when the globally decided
        level equals the guess (else it issues a corrective phase_b round),
        so ranks are identical to the two-round protocol by construction.
        Both phases share the per-plan memo, so a fused call costs the same
        compute as the two separate calls.

        ``packed`` = (guess_level, top_k, avgdl) as ONE tuple — Ray pays a
        fixed per-ARGUMENT serialization cost on every ``.remote()``
        (~0.05 ms each, profiled), so the scalar args ride in one slot;
        ``plan`` stays top-level because an ObjectRef only auto-derefs
        there."""
        guess_level, top_k, avgdl = packed
        counts = self.phase_a(plan)
        per = self.phase_b(plan, guess_level, top_k, avgdl)
        return counts, per

    def fused_ab(self, plan, ctx, packed):
        """SINGLE-round warm path: phase_a counts + speculative phase_b at
        the guessed level + WordMatcher candidate computation + speculative
        coverage COMPONENTS for this shard's local top candidates — one
        actor RTT where the old protocol paid two (phase_ab, cov_fused).

        Correctness layering (every speculation driver-checked, with the
        old two-round path as the fallback — rank identity by
        construction):
        * stage-1: identical to phase_ab (corrective round on level miss);
        * coverage components are bm25-INDEPENDENT
          (fusion.fusion_components) — the driver blends the GLOBAL
          norm_bm25 via fusion_finish, bit-identical to actor-side
          fusion_calculate;
        * a shard's contribution to the global top-``cdepth`` is a PREFIX
          of its local rank order (the global cut is monotone per shard),
          so components for the first ``spec_budget`` local candidates
          cover the shard's survivors with high probability; the driver
          falls back to the cov_fused round when any survivor is missing;
        * the global top-2 docs (the 2-slot LCS memo, MEMO_HEIGHT) are
          always some shard's LOCAL top-2 (the global #1/#2 are their own
          shard's #1/#2), so the lcs-variant components computed here for
          the local top-2 cover them;
        * wm overlap classification is per-(si, lid) membership of this
          shard's wm candidate set — the driver intersects with the global
          top; the unique-wm stream is only non-empty when the global page
          is NOT full, and the driver falls back to cov_fused then.

        ``packed`` = (guess, top_k, avgdl, q, qid, spec_budget). Returns
        (counts, packed_per, comp_main, comp_lcs, memo_local, n_wm_total,
        wm_flags)."""
        guess, top_k, avgdl, q, qid, spec_budget = packed
        counts = self.phase_a(plan)
        per = self.phase_b(plan, guess, top_k, avgdl)
        pre = None
        stash = getattr(self, "_wm_stash", None)
        if qid is not None and stash is not None and stash[0] == qid:
            pre = stash[1]
            self._wm_stash = None
        wm_ids = pre if pre is not None else qp.wm_candidates(self.engine, q)
        n_wm_total = sum(len(v) for v in wm_ids.values())
        comp_main: list = []
        comp_lcs: list = []
        memo_local: dict = {}
        wm_flags: list = []
        if per is not None and len(per[0]):
            _sc, ky, _tb, si_a, lid_a = per
            n = int(min(spec_budget, len(ky)))
            best_chunk: dict[int, tuple[int, int]] = {}
            for k, s, l in zip(ky.tolist(), si_a.tolist(), lid_a.tolist()):
                best_chunk.setdefault(int(k), (int(s), int(l)))
            jobs = [
                (int(si_a[i]), int(lid_a[i]), 0.0, -1) for i in range(n)
            ]
            comp_main, _m = qp.process_candidates(
                self.engine, ctx, jobs, best_chunk, components=True
            )
            lcs_jobs = [
                (int(si_a[i]), int(lid_a[i]), 0.0, i)
                for i in range(min(2, len(ky)))
            ]
            comp_lcs, memo_local = qp.process_candidates(
                self.engine, ctx, lcs_jobs, best_chunk, components=True
            )
            wm_sets = {si: set(ids.tolist()) for si, ids in wm_ids.items()}
            for i in range(n):
                ids = wm_sets.get(int(si_a[i]))
                wm_flags.append(
                    bool(ids is not None and int(lid_a[i]) in ids)
                )
        return (
            counts, per, comp_main, comp_lcs, memo_local, n_wm_total,
            wm_flags,
        )

    # ---- coverage -----------------------------------------------------
    def wm_prefetch(self, qid: str, norm_query: str) -> None:
        """Fire-ahead half of the WordMatcher lookup: compute the per-segment
        candidate ids NOW (concurrently with the stage-1 fan-out — actor
        tasks execute serially in submission order, so a later wm_scan with
        the same qid is guaranteed to see the stash)."""
        self._wm_stash = (qid, qp.wm_candidates(self.engine, norm_query))

    def wm_scan(self, norm_query: str, tfidf_lids, cap: int, qid: str | None = None):
        pre = None
        stash = getattr(self, "_wm_stash", None)
        if qid is not None and stash is not None and stash[0] == qid:
            pre = stash[1]
            self._wm_stash = None
        return qp.wm_scan(self.engine, norm_query, tfidf_lids, cap, precomputed=pre)

    def cov_fused(self, ctx, packed):
        """``packed`` = (norm_query, s1_jobs, tfidf_lids, cap, spec_budget,
        memo_keys, qid, budget_s) as ONE tuple (fixed per-argument
        ``.remote()`` serialization cost — see phase_ab); ``ctx`` stays a
        top-level arg so its ObjectRef auto-derefs."""
        (
            norm_query,
            s1_jobs,
            tfidf_lids,
            cap,
            spec_budget,
            memo_keys,
            qid,
            budget_s,
        ) = packed
        return self._cov_fused_impl(
            ctx, norm_query, s1_jobs, tfidf_lids, cap, spec_budget,
            memo_keys, qid, budget_s,
        )

    def _cov_fused_impl(
        self,
        ctx,
        norm_query: str,
        s1_jobs: list,
        tfidf_lids,
        cap: int,
        spec_budget: int,
        memo_keys: dict,
        qid: str | None = None,
        budget_s: float | None = None,
    ):
        """Fused coverage round: WordMatcher split + candidate scoring in ONE
        actor RTT (the old protocol paid separate wm_scan and run_jobs
        fan-outs; on a loaded host each 16-way fan-out costs 20-40 ms, so the
        round count IS the latency floor).

        ``s1_jobs`` = this shard's stage-1 jobs ``(si, lid, norm_bm25, di)``
        in global rank order. The shard classifies its wm candidates against
        ``tfidf_lids`` (its segments' stage-1 lids), then scores
        ``[overlapping, stage-1]`` plus — speculatively, in a SECOND
        ``process_candidates`` call with its own memo — the first
        ``spec_budget`` unique wm candidates. The driver keeps speculative
        results/memo only within the global ``coverage_depth − overlap``
        unique cap, so ranks are identical to the unfused protocol by
        construction (rank-identity goldens in tests/test_executor.py).

        Memo-exactness notes (the 2-slot LCS/wordHits memo of
        SearchPipeline.cs:492,517): all of a doc key's jobs are co-located on
        the shard owning its segment, memo VALUES are chunk-independent
        (lcs/word_hits derive from the best chunk's prep), and the driver
        only enables this path for queries ≤ 255 chars, where the min(·,255)
        store clamp is the identity — so write order across a key's jobs
        cannot change any value. ``memo_keys`` maps the global top-2 doc keys
        to their doc_index slots for candidates whose stage-1 entry carried
        no (si, lid) location.

        best_chunk needs no shipping: for any key this shard can see, the
        stage-1 best chunk is in its OWN ``s1_jobs`` (all chunks of a source
        doc live in one segment → one shard).

        Returns (n_wm_total, overlapping, unique, n_spec_scored,
        main_results, spec_results, main_memo, spec_memo), or ("timeout",)
        when the budget expires mid-scan."""
        import time as _time

        deadline = _time.monotonic() + budget_s if budget_s is not None else None
        pre = None
        stash = getattr(self, "_wm_stash", None)
        if qid is not None and stash is not None and stash[0] == qid:
            pre = stash[1]
            self._wm_stash = None
        n_total, overlapping, unique = qp.wm_scan(
            self.engine, norm_query, tfidf_lids, cap, precomputed=pre
        )
        key_di: dict[int, int] = dict(memo_keys)
        best_chunk: dict[int, tuple[int, int]] = {}
        for si, lid, _base, di in s1_jobs:
            key = int(self.engine.seg_by_id(si).doc_keys[lid])
            key_di[key] = di
            best_chunk.setdefault(key, (si, lid))
        jobs: list[tuple[int, int, float, int]] = []
        for si, lid, key in overlapping:
            jobs.append((si, lid, 0.0, key_di.get(key, -1)))
        jobs.extend(s1_jobs)
        try:
            results, memo = qp.process_candidates(
                self.engine, ctx, jobs, best_chunk, deadline=deadline
            )
            n_spec = min(len(unique), spec_budget)
            spec_results: list = []
            spec_memo: dict = {}
            if n_spec:
                spec_jobs = [
                    (si, lid, 0.0, key_di.get(key, -1))
                    for si, lid, key in unique[:n_spec]
                ]
                spec_results, spec_memo = qp.process_candidates(
                    self.engine, ctx, spec_jobs, best_chunk, deadline=deadline
                )
        except qp.DeadlineExceeded:
            return ("timeout",)
        return (
            n_total, overlapping, unique, n_spec,
            results, spec_results, memo, spec_memo,
        )

    def prescreen_keys(self, words, keys):
        """Shard-local posting-union ∩ candidates for the lexical prescreen."""
        return qp.segment_prescreen_keys(self.engine.segments, words, keys)

    def run_jobs(self, ctx, jobs, best_chunk, budget_s: float | None = None):
        """budget_s = remaining query budget at dispatch (monotonic clocks
        are per-process, so the driver ships a relative budget, not an
        absolute deadline). Returns ("timeout", None) instead of raising so
        the sentinel crosses the actor boundary cleanly."""
        import time as _time

        deadline = _time.monotonic() + budget_s if budget_s is not None else None
        try:
            return qp.process_candidates(
                self.engine, ctx, jobs, best_chunk, deadline=deadline
            )
        except qp.DeadlineExceeded:
            return "timeout", None

    # ---- short queries ------------------------------------------------
    def short_doc_count(self, q: str) -> int:
        return sum(s.count_word_start_docs(q) for s in self.engine.shorts)

    def single_char(self, ch: str, top_k: int):
        # per-shard top-k (champion lists when k ≤ 64) — the global top-k is
        # contained in the union of per-shard top-ks
        return sq.run_single_char(self.engine.shorts, ch, top_k)

    def sq_phase1(self, qid: str, patterns, q: str) -> tuple[int, int, int | None]:
        """Fused phase 1: per-segment prefix passes PLUS a speculative local
        fuzzy pass. The reference's fuzzy-fallback gate is on the GLOBAL
        matched count (< FUZZY_FALLBACK_DOC_LIMIT, ShortQuery :221), and
        global < LIMIT implies every local count < LIMIT — so speculating
        whenever the LOCAL count is under the limit covers every case where
        the driver will decide to use fuzzy. One actor RTT replaces the old
        sq_prefix + sq_fuzzy rounds; results are identical by construction
        (the prefix snapshot is used when the global gate says no-fuzzy).

        Returns (matched doc count, prefix max score, fuzzy max or None)."""
        states = [s.prefix_pass(patterns, q) for s in self.engine.shorts]
        n = sum(len(ds) for ds, _ in states)
        pre_max = max((max(ds.values(), default=0) for ds, _ in states), default=0)
        fuzzy_states = None
        fuzzy_max = None
        if n < sq.FUZZY_FALLBACK_DOC_LIMIT:
            fuzzy_states = [(dict(ds), set(fp)) for ds, fp in states]
            for s, (ds, fp) in zip(self.engine.shorts, fuzzy_states):
                s.fuzzy_pass(patterns, q, ds, fp)
            fuzzy_max = max(
                (max(ds.values(), default=0) for ds, _ in fuzzy_states), default=0
            )
        self._sq_state[qid] = (states, fuzzy_states)
        return n, pre_max, fuzzy_max

    def sq_final(self, qid: str, use_fuzzy: bool, global_max: int, q: str, query_tokens):
        states, fuzzy_states = self._sq_state.pop(qid)
        if use_fuzzy:
            states = fuzzy_states
        out = []
        for s, (ds, fp) in zip(self.engine.shorts, states):
            out.extend(s.final_entries(ds, fp, global_max, q, query_tokens))
        return out


class DistributedEngine(Engine):
    """Driver-side engine: holds only global stats + the actor pool. All
    routing/decision logic is inherited from ``Engine``; the per-segment
    primitives fan out to shards."""

    def __init__(self, index_dir, cfg, df_lookup, word_df, total_docs, avgdl, actors, shard_of_seg):
        super().__init__(index_dir, cfg, [], df_lookup, word_df, total_docs, avgdl)
        self.actors = actors
        self.shard_of_seg = shard_of_seg
        # qid namespace unique per engine: several driver-side engines may
        # share one actor pool (concurrent serving threads), and the actors'
        # per-qid scratch must not collide across them
        import uuid as _uuid

        self._qid_prefix = _uuid.uuid4().hex[:8]
        self._qid = itertools.count()
        # (plan_key, top_k) → last globally decided candidate level, enabling
        # the fused speculative phase_ab round on repeat plans
        self._level_memo: dict = {}

    def shutdown(self) -> None:
        """Tear down the shard actor pool (SearchEngine.Dispose parity for
        the distributed engine). Idempotent; the index on disk is untouched
        — ``connect`` again to resume serving."""
        import ray

        for a in self.actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self.actors = []

    @classmethod
    def connect(
        cls,
        index_dir: str,
        num_shards: int | None = None,
        cfg: EngineConfig | None = None,
        warm: bool = True,
        num_cpus_per_actor: float = 1.0,
    ) -> "DistributedEngine":
        import json

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
                enable_coverage=c.get("enable_coverage", True),
            )
        n_segments = len(manifest["segments"])
        if num_shards is None:
            num_shards = max(1, min(n_segments, int(ray.cluster_resources().get("CPU", 4)) - 1))
        num_shards = min(num_shards, n_segments)
        slices = np.array_split(np.arange(n_segments), num_shards)
        # max_restarts=-1: a shard killed by node loss / OOM is transparently
        # restarted and reloads its slice (incl. persisted tombstones) from
        # the index dir in __init__ — all cross-RTT state is per-query, so
        # the driver just retries the whole query once (see search_ex)
        actors = [
            IndexShardActor.options(
                num_cpus=num_cpus_per_actor, max_restarts=-1
            ).remote(index_dir, s.tolist())
            for s in slices
            if len(s)
        ]
        shard_of_seg = {}
        for ai, s in enumerate([s for s in slices if len(s)]):
            for si in s.tolist():
                shard_of_seg[si] = ai
        df_lookup = load_df_lookup(index_dir, "df")
        word_df = load_df_lookup(index_dir, "word_df")
        stats = manifest["stats"]
        eng = cls(
            index_dir, cfg, df_lookup, word_df, stats["total_docs"],
            stats["avg_doc_len"], actors, shard_of_seg,
        )
        if warm:
            # a bounded wait turns "actors can never schedule" (cluster has
            # fewer free CPUs than num_shards × num_cpus_per_actor — e.g. a
            # leaked engine still holding its pool) into a diagnosable error
            # instead of a silent driver hang
            timeout_s = float(os.environ.get("INFIDEX_WARM_TIMEOUT_S", "600"))
            try:
                ray.get([a.warm.remote() for a in actors], timeout=timeout_s)
            except ray.exceptions.GetTimeoutError:
                for a in actors:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
                avail = ray.available_resources().get("CPU", 0)
                raise RuntimeError(
                    f"DistributedEngine.connect: {len(actors)} shard actors "
                    f"did not warm within {timeout_s:.0f}s — the cluster has "
                    f"{avail} free CPUs for {len(actors)} × "
                    f"{num_cpus_per_actor} CPU actors. Lower num_shards / "
                    "num_cpus_per_actor, shut down other engines, or raise "
                    "INFIDEX_WARM_TIMEOUT_S."
                ) from None
        return eng

    # ---- overridden primitives ---------------------------------------
    def _fuzzy_global_df(self, text: str) -> int:
        return sum(ray.get([a.fuzzy_df.remote(text) for a in self.actors]))

    def _fuzzy_global_df_batch(self, texts: list[str]) -> list[int]:
        """All unknown terms probed in ONE fan-out round (per-term rounds
        made a two-typo query pay two sequential ~30 ms RTTs). The coverage
        ctx prep overlaps with this RTT too — typo queries reach the stage-1
        fan-out with the ctx already in the object store.

        Warm repeats skip the round entirely: the index is immutable for
        the lifetime of this engine, so per-term fuzzy dfs are cached on
        the driver (bounded LRU-ish) — a repeated typo query goes straight
        to the stage-1 fan-out (2 RTTs, same as a clean query)."""
        cache = getattr(self, "_fuzzy_df_cache", None)
        if cache is None:
            cache = self._fuzzy_df_cache = {}
        need = [t for t in texts if t not in cache]
        if need:
            refs = [a.fuzzy_df_batch.remote(need) for a in self.actors]
            self._overlap_ctx_prep()
            parts = ray.get(refs)
            if len(cache) >= 4096:  # bounded: drop entries NOT in this
                # query (evicting a term `texts` already holds would
                # KeyError on the read below)
                keep = set(texts)
                for k in list(itertools.islice(
                    (k for k in cache if k not in keep), len(need)
                )):
                    cache.pop(k, None)
            for i, t in enumerate(need):
                cache[t] = sum(p[i] for p in parts)
        return [cache[t] for t in texts]

    def _pre_stage1(self, q: str, coverage_likely: bool) -> None:
        """Fire the WordMatcher candidate computation on every shard BEFORE
        the stage-1 fan-out — actor tasks run serially in submission order,
        so the later wm_scan(qid=...) is ordered after the prefetch on each
        actor and reuses its stash. Saves the wm probe compute from the
        critical path (it is independent of stage-1 results)."""
        self._wm_qid = None
        self._cov_q = q if coverage_likely else None
        if not (coverage_likely and self.cfg.enable_word_matcher):
            return
        # OFF by default since the fused protocol: the prefetch can only hide
        # wm compute inside the driver's ~5-10 ms plan-prep window, but costs
        # a whole extra 16-way submission fan-out (~0.9 ms driver CPU per
        # actor call). Interleaved A/B on the 480k-page index, 96 samples,
        # rank-identity asserted per query: p50 114.9→84.9 ms (−26 %),
        # p90 219→166 ms with the prefetch off. INFIDEX_WM_PREFETCH=1
        # re-enables it (the old default) for word-table-heavy corpora.
        if os.environ.get("INFIDEX_WM_PREFETCH", "0") != "1":
            return
        import uuid

        qid = uuid.uuid4().hex
        for a in self.actors:
            a.wm_prefetch.remote(qid, q)  # fire-and-forget; ordering by actor queue
        self._wm_qid = qid

    def stage1(self, norm_lower_query: str, top_k: int):
        infos = s1.prepare_query_terms(
            norm_lower_query, self.cfg, self.df_lookup, self.total_docs, self.avgdl,
            fuzzy_df_fn=self._fuzzy_global_df,
            fuzzy_df_batch_fn=self._fuzzy_global_df_batch,
        )
        plan = s1.build_plan(infos)
        if plan is None:
            return []
        # plans pickle to ~1-2 KB / ~0.2 ms (profiled on the bench panel):
        # inlining into the task args costs ~3 ms/query across 16 actors,
        # while a ray.put measured ~9 ms median on the critical path — so
        # small plans are inlined and only unusually large ones (many fuzzy
        # expansions) go through the object store once
        plan_ref = plan if plan.approx_nbytes() < 64_000 else ray.put(plan)
        if plan.n_levels == 1:
            # single candidate level → decide_level is constant 1; skip the
            # phase-A cardinality fan-out entirely (one fewer RTT)
            refs = [
                a.phase_b.remote(plan_ref, 1, top_k, self.avgdl)
                for a in self.actors
            ]
            self._overlap_ctx_prep()
            per = ray.get(refs)
            return s1.merge_packed(per, top_k)
        memo_key = (s1.SegmentStage1._plan_key(plan), top_k)
        guess = self._level_memo.get(memo_key)
        if guess is None:
            # cold plan: speculate with the session's last decided level —
            # decided levels are heavily skewed in practice, so this usually
            # saves the phase-A round; a miss pays exactly the old cold cost
            # (corrective phase_b) and ranks are identical either way
            guess = getattr(self, "_default_level", None)
            if guess is not None and not (1 <= guess <= plan.n_levels):
                guess = None
        self._fused_stash = None
        cov_q = getattr(self, "_cov_q", None)
        one_rtt = (
            guess is not None
            and cov_q is not None
            and self.cfg.enable_word_matcher
            and not self.cfg.coverage.enable_lexical_prescreen
            and len(cov_q) <= 255
            # OPT-IN (INFIDEX_1RTT=1): on a real multi-node cluster the
            # round COUNT is the latency floor (fan-out sync ≫ per-shard
            # compute), so collapsing 2 warm RTTs to 1 halves it. On this
            # single-node sandbox the fan-out costs ~3 ms while the fused
            # round SERIALIZES stage-1 + wm + coverage compute that the
            # two-round protocol pipelines — interleaved A/B read p50
            # 33-38 ms both ways (noise), so the default stays the
            # two-round path here. Rank identity across the toggle is
            # asserted by tests/test_executor.py::test_one_rtt_*.
            and os.environ.get("INFIDEX_1RTT", "0") == "1"
        )
        if one_rtt:
            # SINGLE-round warm path: the fused_ab round also carries wm +
            # speculative coverage components (see IndexShardActor.fused_ab
            # for the correctness layering); every speculation is checked
            # on the driver with the cov_fused round as the fallback, so
            # ranks are identical to the two-round protocol.
            _ctx, ctx_ref = self._ctx_for(cov_q)
            budget = int(
                os.environ.get("INFIDEX_1RTT_BUDGET", "0")
            ) or max(64, -(-2 * top_k // max(1, len(self.actors))))
            packed = (
                guess, top_k, self.avgdl, cov_q,
                getattr(self, "_wm_qid", None), budget,
            )
            refs = [
                a.fused_ab.remote(plan_ref, ctx_ref, packed)
                for a in self.actors
            ]
            outs_f = ray.get(refs)
            count_vecs = [o[0] for o in outs_f]
            per = [o[1] for o in outs_f]
        elif guess is not None:
            # warm path: fused counts + speculative scoring in ONE round;
            # the speculative results are used only when the global decision
            # matches the guess, so ranks are identical to the two-round
            # protocol (corrective round on a miss)
            packed = (guess, top_k, self.avgdl)
            refs = [
                a.phase_ab.remote(plan_ref, packed) for a in self.actors
            ]
            self._overlap_ctx_prep()
            outs = ray.get(refs)
            count_vecs = [o[0] for o in outs]
            per = [o[1] for o in outs]
            outs_f = None
        else:
            refs = [a.phase_a.remote(plan_ref) for a in self.actors]
            self._overlap_ctx_prep()
            count_vecs = ray.get(refs)
            per = None
            outs_f = None
        width = max((len(c) for c in count_vecs), default=0)
        if width == 0:
            return []
        total = np.zeros(width, dtype=np.int64)
        for c in count_vecs:
            total[: len(c)] += c
        level = s1.decide_level(plan, total, top_k)
        if len(self._level_memo) >= 256:  # bounded: drop an arbitrary entry
            self._level_memo.pop(next(iter(self._level_memo)))
        self._level_memo[memo_key] = level
        self._default_level = level
        if per is None or level != guess:
            per = ray.get(
                [
                    a.phase_b.remote(plan_ref, level, top_k, self.avgdl)
                    for a in self.actors
                ]
            )
        elif one_rtt and outs_f is not None:
            # stage-1 speculation held → the coverage components are for
            # the decided level; stash them for _coverage_stage
            self._fused_stash = (cov_q, outs_f)
        return s1.merge_packed(per, top_k)

    # per-shard speculative budget for unique wm candidates in the fused
    # round: on real corpora overlap == coverage_depth so the unique cap is 0
    # and nothing is wasted; on small corpora (tests) unique counts are tiny
    # and the speculation keeps the round count at 2
    SPEC_UNIQUE_BUDGET = 64

    def _ctx_for(self, q: str):
        """Coverage query context + its object-store ref, cached for the
        current query. Depends only on (q, global stats) — NOT on stage-1
        results — so ``stage1`` builds it while the phase fan-out is in
        flight, taking ctx prep + ray.put off the critical path."""
        hit = getattr(self, "_ctx_cache", None)
        if hit is not None and hit[0] == q:
            return hit[1], hit[2]
        cfg = self.cfg
        ctx = cov.prepare_query(
            q, cfg.coverage.min_word_size, frozenset(cfg.delimiters),
            cfg.index_sizes, self.df_lookup, self.word_df, self.total_docs,
            cfg.stop_term_limit,
        )
        ref = ray.put(ctx)
        self._ctx_cache = (q, ctx, ref)
        return ctx, ref

    def _overlap_ctx_prep(self) -> None:
        """Called by ``stage1`` right after submitting a fan-out round (the
        driver would otherwise idle inside ray.get)."""
        q = getattr(self, "_cov_q", None)
        if q is not None:
            self._ctx_for(q)

    def _coverage_stage(self, q, stage1_results, coverage_depth, top_k, deadline=None):
        cfg = self.cfg
        if (
            cfg.enable_word_matcher
            and not cfg.coverage.enable_lexical_prescreen
            and len(stage1_results) >= 2
            and len(q) <= 255  # min(lcs, 255) memo clamp is the identity
        ):
            ok, res = self._coverage_from_stash(
                q, stage1_results, coverage_depth, top_k
            )
            if ok:
                return res
            return self._coverage_fused(
                q, stage1_results, coverage_depth, top_k, deadline
            )
        return self._coverage_unfused(
            q, stage1_results, coverage_depth, top_k, deadline
        )

    def _coverage_from_stash(self, q, stage1_results, coverage_depth, top_k):
        """Consume the fused_ab round's speculative coverage components —
        ZERO additional RTTs when every check holds. Returns (ok, result);
        ok=False means the stash can't serve this query exactly and the
        caller must run the cov_fused round (the unchanged two-round
        protocol), so ranks are identical by construction.

        Exactness checks, in order: stash is for this query and the
        decided level; the global page is FULL (otherwise the unique-wm
        stream could be non-empty, which the stash doesn't carry); every
        global survivor carries a component row (per-shard spec budget was
        enough — survivors per shard are a prefix of its local order);
        the global top-2 docs have lcs-variant rows (always true: the
        global #1/#2 are their own shard's local #1/#2).

        Score assembly mirrors cov_fused exactly: per candidate the
        bm25-independent components finish with the GLOBAL norm
        (fusion_finish ≡ fusion_calculate's tail, parity-tested); wm
        overlap rows re-finish the SAME components with base 0.0 (the
        feat_cache identity the fused protocol already relies on); the
        truncation memo comes from the lcs-variant rows of the top-2."""
        from .fusion import fusion_finish

        stash = getattr(self, "_fused_stash", None)
        self._fused_stash = None
        if stash is None or stash[0] != q:
            return False, None
        outs = stash[1]
        top = stage1_results[:coverage_depth]
        if len(top) < coverage_depth:
            return False, None  # unique wm candidates could matter
        comp_of: dict[tuple[int, int], tuple] = {}
        flag_of: dict[tuple[int, int], bool] = {}
        lcs_comp_of_key: dict[int, tuple] = {}
        lcs_memo_of_key: dict[int, list] = {}
        n_wm_total = 0
        for o in outs:
            _c, per, comp_main, comp_lcs, memo_local, n_t, wm_flags = o
            n_wm_total += n_t
            if per is None or not len(per[0]):
                continue
            _sc, _ky, _tb, si_a, lid_a = per
            for i, row in enumerate(comp_main):
                loc = (int(si_a[i]), int(lid_a[i]))
                comp_of[loc] = row
                flag_of[loc] = bool(wm_flags[i]) if i < len(wm_flags) else False
            for j, row in enumerate(comp_lcs):
                lcs_comp_of_key[row[5]] = row
                if j in memo_local:
                    lcs_memo_of_key[row[5]] = memo_local[j]
        doc_index: dict[int, int] = {}
        for e in top:
            if not (len(e) >= 5 and e[3] >= 0 and e[4] >= 0):
                return False, None  # no chunk location → can't map comps
            if (e[3], e[4]) not in comp_of:
                return False, None  # under-speculated shard → fallback
            if e[1] not in doc_index:
                doc_index[e[1]] = len(doc_index)
        memo: dict[int, list[int]] = {}
        for key, di in doc_index.items():
            if di >= qp.MEMO_HEIGHT:
                continue
            entry = lcs_memo_of_key.get(key)
            if entry is None:
                return False, None  # lcs variant missing (shouldn't happen)
            memo[di] = entry
        max_tfidf = top[0][0] if top else 1.0
        results: list[tuple[float, int, int, int]] = []
        for e in top:
            loc = (e[3], e[4])
            key = e[1]
            di = doc_index[key]
            row = (
                lcs_comp_of_key[key]
                if di < qp.MEMO_HEIGHT and key in lcs_comp_of_key
                else comp_of[loc]
            )
            p, sp, cr, hp, tb, _key, wh = row
            nb = e[0] / max_tfidf if max_tfidf > 0 else 0.0
            if flag_of.get(loc):
                # wm-overlap job for the same chunk: identical features,
                # base 0.0 (cov_fused's feat_cache sharing, made explicit)
                results.append((fusion_finish(p, sp, cr, hp, 0.0), key, tb, wh))
            results.append((fusion_finish(p, sp, cr, hp, nb), key, tb, wh))
        return True, qp.finalize_coverage(
            self.cfg.coverage, results, memo, doc_index, n_wm_total,
            coverage_depth, top_k,
        )

    def _coverage_fused(self, q, stage1_results, coverage_depth, top_k, deadline=None):
        """Two-RTT warm path: one fused wm+score round (see
        IndexShardActor.cov_fused), plus a small second round ONLY when the
        speculative unique budget under-covered the global unique cap."""
        import time as _time

        top = stage1_results[:coverage_depth]
        ctx, ctx_ref = self._ctx_for(q)
        by_seg = qp.tfidf_lids_by_seg(top)
        doc_index: dict[int, int] = {}
        for e in top:
            if e[1] not in doc_index:
                doc_index[e[1]] = len(doc_index)
        memo_keys = {
            key: di for key, di in doc_index.items() if di < qp.MEMO_HEIGHT
        }
        max_tfidf = top[0][0] if top else 1.0
        jobs_by_shard: dict[int, list] = {ai: [] for ai in range(len(self.actors))}
        for e in top:
            if not (len(e) >= 5 and e[3] >= 0 and e[4] >= 0):
                continue
            si, lid = e[3], e[4]
            norm_bm25 = e[0] / max_tfidf if max_tfidf > 0 else 0.0
            jobs_by_shard[self.shard_of_seg[si]].append(
                (si, lid, norm_bm25, doc_index[e[1]])
            )
        budget_s = None if deadline is None else deadline - _time.monotonic()
        if budget_s is not None and budget_s <= 0:
            raise qp.DeadlineExceeded
        qid = getattr(self, "_wm_qid", None)
        # speculation pays only when the unique cap (depth − overlap) can be
        # big: with a FULL stage-1 page the overlap is ~always == depth on
        # web-scale corpora (every top candidate contains a query word), so
        # every speculative job would be discarded — skip them and let the
        # rare partial-overlap query pay the small second round instead
        spec_budget = 0 if len(top) >= coverage_depth else self.SPEC_UNIQUE_BUDGET
        lids_by_shard: dict[int, dict] = {
            ai: {} for ai in range(len(self.actors))
        }
        for si, lids in by_seg.items():
            ai = self.shard_of_seg.get(si)
            if ai is not None:
                lids_by_shard[ai][si] = lids
        outs = ray.get(
            [
                a.cov_fused.remote(
                    ctx_ref,
                    (
                        q, jobs_by_shard[ai], lids_by_shard[ai],
                        coverage_depth, spec_budget, memo_keys,
                        qid, budget_s,
                    ),
                )
                for ai, a in enumerate(self.actors)
            ]
        )
        n_wm_total = 0
        overlapping: list = []
        results: list = []
        memo: dict[int, list[int]] = {}
        per_shard: list = []
        for o in outs:
            if o[0] == "timeout":
                raise qp.DeadlineExceeded
            n_t, ov, un, n_spec, main_res, spec_res, main_memo, spec_memo = o
            n_wm_total += n_t
            overlapping.extend(ov)
            results.extend(main_res)
            memo.update(main_memo)
            per_shard.append((un, n_spec, spec_res, spec_memo))

        # global unique cap = first (coverage_depth − overlap) of the
        # shard-order concatenation (coverage_driver's unique[:wm_limit])
        top_key_of_di = {di: key for key, di in memo_keys.items()}
        remaining = max(0, coverage_depth - len(overlapping))
        allowed_unique: list = []
        missing_by_shard: dict[int, list] = {}
        for ai, (un, n_spec, spec_res, spec_memo) in enumerate(per_shard):
            take = min(remaining, len(un))
            remaining -= take
            allowed = un[:take]
            allowed_unique.extend(allowed)
            results.extend(spec_res[: min(take, n_spec)])
            if take > n_spec:
                missing_by_shard[ai] = [
                    (si, lid, 0.0, -1) for si, lid, _k in un[n_spec:take]
                ]
            if spec_memo:
                allowed_keys_shard = {k for _si, _lid, k in allowed}
                for di, entry in spec_memo.items():
                    if top_key_of_di.get(di) in allowed_keys_shard:
                        memo.setdefault(di, entry)
        if missing_by_shard:
            budget_s = None if deadline is None else deadline - _time.monotonic()
            if budget_s is not None and budget_s <= 0:
                raise qp.DeadlineExceeded
            # stage-1 best-chunk map for unique candidates whose KEY is a
            # stage-1 doc via a different chunk (coverage text must be the
            # stage-1 chunk's, SegmentProcessor.GetBestSegmentText)
            best_chunk: dict[int, tuple[int, int]] = {}
            for e in top:
                if len(e) >= 5 and e[3] >= 0 and e[4] >= 0:
                    best_chunk.setdefault(e[1], (e[3], e[4]))
            bc_ref = ray.put(best_chunk)
            outs2 = ray.get(
                [
                    self.actors[ai].run_jobs.remote(ctx_ref, js, bc_ref, budget_s)
                    for ai, js in sorted(missing_by_shard.items())
                ]
            )
            for res2, m2 in outs2:
                if res2 == "timeout":
                    raise qp.DeadlineExceeded
                results.extend(res2)
                memo.update(m2)

        for _si, _lid, key in sorted(
            overlapping + allowed_unique, key=lambda t: (t[0], t[1])
        ):
            if key not in doc_index:
                doc_index[key] = len(doc_index)
        return qp.finalize_coverage(
            self.cfg.coverage, results, memo, doc_index, n_wm_total,
            coverage_depth, top_k,
        )

    def _coverage_unfused(self, q, stage1_results, coverage_depth, top_k, deadline=None):
        import time as _time

        cfg = self.cfg
        if cfg.coverage.enable_lexical_prescreen and stage1_results:
            top = stage1_results[:coverage_depth]
            words = qp.prescreen_words(cfg, q)
            if words and all(self.df_lookup(w) > 0 for w in words):
                keys = [e[1] for e in top]
                parts = ray.get(
                    [a.prescreen_keys.remote(words, keys) for a in self.actors]
                )
                hit = set().union(*parts) if parts else set()
                if hit:
                    filtered = [e for e in top if e[1] in hit]
                    if filtered:
                        stage1_results = filtered
        wm_result = (0, [], [])
        wm_refs = None
        if cfg.enable_word_matcher:
            top = stage1_results[:coverage_depth]
            by_seg = qp.tfidf_lids_by_seg(top)
            # ship each shard only its own segments' stage-1 lids; SUBMIT the
            # round but don't block yet — the ctx prep + object-store put
            # below overlap with the in-flight actor compute
            wm_refs = [
                a.wm_scan.remote(
                    q,
                    {
                        si: lids
                        for si, lids in by_seg.items()
                        if self.shard_of_seg.get(si) == ai
                    },
                    coverage_depth,
                    qid=getattr(self, "_wm_qid", None),
                )
                for ai, a in enumerate(self.actors)
            ]
        # shared per-query state goes through the object store once instead
        # of being re-pickled into every shard's task args (and may already
        # be cached from the stage-1 overlap hook)
        ctx, ctx_ref = self._ctx_for(q)
        if wm_refs is not None:
            parts = ray.get(wm_refs)
            n_total = sum(p[0] for p in parts)
            overlapping = [t for p in parts for t in p[1]]
            unique = [t for p in parts for t in p[2]]
            wm_result = (n_total, overlapping, unique)

        def run_jobs(jobs, best_chunk):
            by_shard: dict[int, list] = {}
            for job in jobs:
                by_shard.setdefault(self.shard_of_seg[job[0]], []).append(job)
            items = sorted(by_shard.items())
            budget_s = None if deadline is None else deadline - _time.monotonic()
            if budget_s is not None and budget_s <= 0:
                raise qp.DeadlineExceeded
            bc_ref = ray.put(best_chunk)
            outs = ray.get(
                [
                    self.actors[ai].run_jobs.remote(ctx_ref, js, bc_ref, budget_s)
                    for ai, js in items
                ]
            )
            results = []
            memo: dict[int, list[int]] = {}
            for res, m in outs:
                if res == "timeout":
                    raise qp.DeadlineExceeded
                results.extend(res)
                memo.update(m)
            return results, memo

        return qp.coverage_driver(
            cfg, ctx, stage1_results, wm_result, coverage_depth, top_k, run_jobs
        )

    def _run_single_char(self, q: str, top_k: int):
        entries = []
        for part in ray.get([a.single_char.remote(q, top_k) for a in self.actors]):
            entries.extend(part)
        entries.sort(key=lambda e: (-e[0], -e[2], e[1]))
        return entries[:top_k]

    def _run_short_query(self, q: str):
        from ..analyzer import _word_splitter

        qid = f"{self._qid_prefix}-{next(self._qid)}"
        patterns = sq.build_prefix_patterns(
            q, self.cfg.min_index_size, self.cfg.start_pad_size
        )
        phase1 = ray.get([a.sq_phase1.remote(qid, patterns, q) for a in self.actors])
        total_matched = sum(n for n, _pm, _fm in phase1)
        use_fuzzy = total_matched < sq.FUZZY_FALLBACK_DOC_LIMIT
        # global < LIMIT ⇒ every local count < LIMIT ⇒ every shard speculated
        # the fuzzy pass in phase 1 — no second fuzzy round needed
        maxes = [fm if use_fuzzy else pm for _n, pm, fm in phase1]
        global_max = max(maxes, default=0)
        splitter = _word_splitter(self.cfg.delimiters)
        query_tokens = [w for w in splitter.split(q) if w]
        entries = []
        for part in ray.get(
            [
                a.sq_final.remote(qid, use_fuzzy, global_max, q, query_tokens)
                for a in self.actors
            ]
        ):
            entries.extend(part)
        entries.sort(key=lambda e: (-e[0], -e[2], e[1]))
        return entries

    def _short_doc_count(self, q: str) -> int:
        return sum(ray.get([a.short_doc_count.remote(q) for a in self.actors]))

    # ---- driver-side APIs that need local segment state -----------------
    # (serving pool is read-only; do these through an in-process Engine)
    def doc_text_by_key(self, key: int):  # pragma: no cover
        raise NotImplementedError("use shard actors / the in-process Engine")

    # Query API (filters/boosts/sort/facets) is inherited from Engine: the
    # post-processing operates on stored rows fetched via the batched
    # _prefetch_field_rows fan-out above — no process-local segments needed.

    def search_ex(
        self,
        query_text: str,
        top_k: int = 10,
        enable_coverage: bool | None = None,
        timeout_ms: int | None = None,
    ):
        """One transparent retry on shard-actor death: actors restart
        automatically (max_restarts=-1) and reload their slice + persisted
        tombstones from disk in ``__init__``; every piece of cross-RTT
        state (stage-1 scratch, wm stash, short-query state) is per-query,
        so re-running the whole query from scratch is rank-identical. The
        restart itself takes seconds (index reload), so retries back off
        until the pool is reachable again (bounded at ~30 s)."""
        import time as _time

        deadline = _time.monotonic() + 30.0
        while True:
            try:
                return super().search_ex(
                    query_text, top_k, enable_coverage, timeout_ms
                )
            except (
                ray.exceptions.RayActorError,
                ray.exceptions.ActorUnavailableError,
            ):
                if _time.monotonic() >= deadline:
                    raise
                _time.sleep(0.5)

    def _prefetch_field_rows(self, keys) -> None:
        """ONE batched shard fan-out fetches every stored row the Query-API
        post-processing (filter → boosts → sort → facets) will touch; each
        shard returns only the keys it owns. Payload is result-sized
        (≤ max_results rows), never corpus-sized."""
        keys = [int(k) for k in keys]
        merged: dict[int, dict] = {}
        if keys:
            for part in ray.get([a.field_rows.remote(keys) for a in self.actors]):
                merged.update(part)
        self._row_cache = merged

    def _field_row(self, key: int) -> dict:
        return getattr(self, "_row_cache", {}).get(int(key), {})

    def get_document(self, document_key: int) -> dict | None:
        """GetDocument parity on the distributed engine: one shard fan-out
        for the single key (the inherited implementation reads only the
        last query's prefetch cache, which would be stale/empty here)."""
        rows = self.get_documents([document_key])
        return rows[0] if rows else None

    def get_documents(self, document_keys) -> list[dict]:
        """Batched GetDocuments: ONE fan-out; each shard returns only the
        keys it owns; input order preserved, unknown/tombstoned skipped."""
        keys = [int(k) for k in document_keys]
        merged: dict[int, dict] = {}
        if keys:
            for part in ray.get([a.field_rows.remote(keys) for a in self.actors]):
                merged.update(part)
        deleted = getattr(self, "deleted", set())
        return [merged[k] for k in keys if k in merged and k not in deleted]

    def get_statistics(self):
        """GetStatistics parity: the driver-side engine holds no segments —
        document count comes from the manifest stats, vocabulary size from
        the word-df lookup (cheap range-metadata path when sharded)."""
        from ..engine import IndexStatistics

        wd = self.word_df
        if hasattr(wd, "vocab_size"):
            vocab = wd.vocab_size()
        else:
            vocab = len(getattr(wd, "terms", ()))
        return IndexStatistics(
            document_count=int(self.total_docs), vocabulary_size=int(vocab)
        )

    def _empty_query_with_facets(self, q):
        raise ValueError(
            "match-all facets are an in-process serving feature "
            "(Engine.load(...).query(...)); for corpus-scale facet jobs use "
            "infidex_ray.ops.facets.facet_counts_offline (streaming Ray groupby)"
        )

    def add_documents(self, docs, fields=None):  # pragma: no cover
        raise NotImplementedError(
            "mutations go through Engine.load(index_dir); reconnect the "
            "actor pool afterwards to pick up the new delta segment"
        )

    def delete_documents(self, keys) -> None:
        """Tombstone keys and broadcast to shards (stage-1 results are
        filtered on the driver; wm candidates are filtered shard-side)."""
        import json as _json

        self.deleted.update(int(k) for k in keys)
        with open(os.path.join(self.index_dir, "tombstones.json"), "w") as f:
            _json.dump(sorted(self.deleted), f)
        ray.get([a.set_deleted.remote(sorted(self.deleted)) for a in self.actors])
