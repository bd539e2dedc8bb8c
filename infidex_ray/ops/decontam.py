"""Test-set decontamination: flag corpus documents that share word n-grams
with a (small) benchmark set.

The standard training-data hygiene pass (public recipe — GPT-3 App. C /
PaLM / Llama report 8–13-gram overlap checks): hash every word n-gram of the
benchmark side, broadcast the hash set, and stream the corpus through a
membership test. No reference-engine analogue (the reference indexes and
searches; it never cross-references two corpora), so this is a pure
beyond-reference training-data op.

Scale design (100 TB corpus, benchmark ≪ corpus):
* The benchmark side is aggregated to DISTINCT n-gram hashes (uint64) with a
  per-batch partial (`np.unique`) before the driver ever sees a row, so the
  driver holds one sorted uint64 array bounded by the benchmark vocabulary —
  MMLU/GSM8K-class suites are ≤ a few million grams (≤ 10s of MB). The array
  is `ray.put` ONCE and every corpus task reads it zero-copy from the object
  store (broadcast join — no shuffle of the 100-TB side).
* The corpus side is a single stateless `map_batches` over zero-copy Arrow:
  vectorized word hashing + polynomial shingle combine (same splitmix64
  scheme as `ops.dedup._shingle_hashes`) and an `np.isin`-style sorted
  `searchsorted` membership probe. No all-to-all anywhere.
* Word n-grams are joined on raw whitespace tokens (``str.split``), no case
  folding — bijective with the SQL oracle's ``array_to_string(w[i:i+n-1],
  ' ')`` join because whitespace cannot occur inside a token. 64-bit hash
  collisions are the only divergence source (~2⁻⁶⁴ per pair — negligible,
  and the oracle would catch one).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .asciiws import split_ascii_ws
from .dedup import _shingle_hashes, _word_hashes

__all__ = ["benchmark_ngram_hashes", "decontaminate"]


def _doc_gram_hashes(text: str | None, n: int, cache: dict) -> np.ndarray:
    """Distinct word-n-gram hashes of one document; docs with < n words have
    NO n-grams (unlike dedup's short-doc synthetic-shingle contract — a
    3-word doc cannot contain a 5-gram)."""
    ws = split_ascii_ws(text or "")
    if len(ws) < n:
        return np.empty(0, dtype=np.uint64)
    return _shingle_hashes(_word_hashes(ws, cache), n)


def benchmark_ngram_hashes(bench_ds, n: int = 5, text_col: str = "text") -> np.ndarray:
    """Sorted distinct uint64 word-n-gram hashes of the benchmark side.

    Per-batch partial dedup (`np.unique`) runs in the tasks; the driver merge
    is bounded by the benchmark's distinct-gram count, not its row count.
    """

    def partial(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        parts = [
            _doc_gram_hashes(t, n, cache) for t in batch[text_col].to_pylist()
        ]
        u = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        return pa.table({"h": pa.array(u, pa.uint64())})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in bench_ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts).astype(np.uint64))


class _ContamCheck:
    """Actor-pool stage: deserialize the broadcast hash array once per actor
    (object-store get in ``__init__``), probe per batch with searchsorted."""

    def __init__(self, bench_ref, n: int, id_col: str, text_col: str):
        import ray

        self.bench = (
            ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        )
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache: dict = {}
        texts = batch[self.text_col].to_pylist()
        n_grams = np.zeros(len(texts), dtype=np.int64)
        n_hits = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            g = _doc_gram_hashes(t, self.n, cache)
            n_grams[i] = len(g)
            if len(g) and len(self.bench):
                idx = np.searchsorted(self.bench, g)
                idx[idx == len(self.bench)] = 0
                n_hits[i] = int(np.count_nonzero(self.bench[idx] == g))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )


def decontaminate(
    corpus_ds,
    bench,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Per-corpus-doc contamination report against a benchmark n-gram set.

    ``bench`` is a Dataset (its n-gram hashes are computed and broadcast) or
    a pre-computed sorted uint64 array from :func:`benchmark_ngram_hashes`
    (reuse it across corpus shards / reruns). Returns a Dataset with
    ``(id_col, n_grams, n_hits, contaminated)`` — ``n_grams`` / ``n_hits``
    are DISTINCT totals so thresholded drop policies (e.g. "drop if > 10 %
    of grams are contaminated") are stable under within-doc repetition.
    """
    import ray

    hashes = bench if isinstance(bench, np.ndarray) else benchmark_ngram_hashes(
        bench, n=n, text_col=text_col
    )
    ref = ray.put(np.ascontiguousarray(hashes, dtype=np.uint64))
    return corpus_ds.select_columns([id_col, text_col]).map_batches(
        _ContamCheck,
        fn_constructor_args=(ref, n, id_col, text_col),
        batch_format="pyarrow",
        # autoscaling pool (min 1): a fixed pool sized at the CPU count would
        # reserve every core and starve the upstream read tasks (deadlock on
        # small clusters / the 4-cpu test session)
        concurrency=(1, concurrency),
    )
