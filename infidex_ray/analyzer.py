"""Text normalization + tokenization (the byte-identical per-url contract).

Reproduces the reference analyzer chain exactly:

* ``normalize``   — TextNormalizer.CreateDefault semantics
  (reference: src/Infidex/Tokenization/TextNormalizer.cs:120-303):
  tab/newline/CR → space, collapse runs of spaces, ~120-entry Latin
  diacritic fold table.
* ``tokenize_for_indexing`` — n-gram shingles over padded text + whole words
  (reference: src/Infidex/Tokenization/Tokenizer.cs:89-139,276-329).
* ``tokenize_for_search`` — words first, then shingles
  (reference: src/Infidex/Tokenization/Tokenizer.cs:144-267).
* ``count_tokens_batch`` — vectorized per-batch (term, doc) → occurrence
  counting used by the Ray build path; numerically identical to feeding
  ``tokenize_for_indexing`` through ``Term.FirstCycleAdd``
  (reference: src/Infidex/Core/Term.cs:71-122) with field weight 1.0.

Indexing-side text is ``normalize(text).lower()``
(reference: src/Infidex/Indexing/VectorModel.cs:84-88); the coverage stage
uses ``normalize(text)`` without lowering
(reference: src/Infidex/Scoring/SegmentProcessor.cs:70-73).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import DEFAULT_DELIMITERS, START_PAD_CHAR, STOP_PAD_CHAR

# --- normalization -----------------------------------------------------------

# Latin diacritic fold table, copied verbatim from
# TextNormalizer.CreateDefaultInternal (TextNormalizer.cs:216-291).
_FOLD_PAIRS = [
    # Nordic/German
    ("Æ", "E"), ("æ", "e"), ("Ø", "O"), ("ø", "o"), ("Å", "A"), ("å", "a"),
    ("Ä", "A"), ("ä", "a"), ("Ö", "O"), ("ö", "o"), ("Ü", "U"), ("ü", "u"),
    ("ß", "s"),
    # Czech/Slovak carons
    ("Š", "S"), ("š", "s"), ("Č", "C"), ("č", "c"), ("Ř", "R"), ("ř", "r"),
    ("Ž", "Z"), ("ž", "z"), ("Ň", "N"), ("ň", "n"), ("Ť", "T"), ("ť", "t"),
    ("Ď", "D"), ("ď", "d"), ("Ě", "E"), ("ě", "e"),
    # acute accents + Czech kroužek
    ("Á", "A"), ("á", "a"), ("É", "E"), ("é", "e"), ("Í", "I"), ("í", "i"),
    ("Ó", "O"), ("ó", "o"), ("Ú", "U"), ("ú", "u"), ("Ý", "Y"), ("ý", "y"),
    ("Ů", "U"), ("ů", "u"),
    # Polish
    ("Ą", "A"), ("ą", "a"), ("Ć", "C"), ("ć", "c"), ("Ę", "E"), ("ę", "e"),
    ("Ł", "L"), ("ł", "l"), ("Ń", "N"), ("ń", "n"), ("Ś", "S"), ("ś", "s"),
    ("Ź", "Z"), ("ź", "z"), ("Ż", "Z"), ("ż", "z"),
    # Hungarian
    ("Ő", "O"), ("ő", "o"), ("Ű", "U"), ("ű", "u"),
    # Romanian
    ("Ă", "A"), ("ă", "a"), ("Â", "A"), ("â", "a"), ("Î", "I"), ("î", "i"),
    ("Ș", "S"), ("ș", "s"), ("Ț", "T"), ("ț", "t"),
    # Turkish
    ("Ğ", "G"), ("ğ", "g"), ("İ", "I"), ("ı", "i"), ("Ş", "S"), ("ş", "s"),
    # French/Spanish/Portuguese
    ("À", "A"), ("à", "a"), ("Ç", "C"), ("ç", "c"), ("È", "E"), ("è", "e"),
    ("Ê", "E"), ("ê", "e"), ("Ë", "E"), ("ë", "e"), ("Ì", "I"), ("ì", "i"),
    ("Ï", "I"), ("ï", "i"), ("Ñ", "N"), ("ñ", "n"), ("Ò", "O"), ("ò", "o"),
    ("Ô", "O"), ("ô", "o"), ("Õ", "O"), ("õ", "o"), ("Ù", "U"), ("ù", "u"),
    ("Û", "U"), ("û", "u"), ("Ÿ", "Y"), ("ÿ", "y"),
    # Icelandic
    ("Ð", "D"), ("ð", "d"), ("Þ", "T"), ("þ", "t"),
]

FOLD_MAP: dict[str, str] = dict(_FOLD_PAIRS)

_TRANSLATE_TABLE: dict[int, int] = {ord(k): ord(v) for k, v in _FOLD_PAIRS}
_TRANSLATE_TABLE.update({0x09: 0x20, 0x0A: 0x20, 0x0D: 0x20})

_SPACE_RUN_RE = re.compile(" {2,}")


def normalize(text: str) -> str:
    """Exact TextNormalizer.Normalize for the default configuration
    (TextNormalizer.cs:137-200): map \\t/\\n/\\r → ' ' and fold diacritics,
    then collapse runs of spaces produced by the mapping."""
    if not text:
        return text
    return _SPACE_RUN_RE.sub(" ", text.translate(_TRANSLATE_TABLE))


_STD_WS_REPLACEMENTS = {"  ": " ", "\t": " ", "\n": " ", "\r": " "}


class TextNormalizer:
    """User-configurable normalizer — the reference's replacement-map hook
    (TextNormalizer.cs:8-209): ``string_replacements`` applied first, in
    insertion order, each via all-occurrence ``str.replace``
    (ReplaceStrings, :63-70), then the char map in one pass (ReplaceChars,
    :75-115). When the string replacements are EXACTLY the standard
    whitespace set {'  ', '\\t', '\\n', '\\r'} → ' ' the fast single-scan
    path collapses space runs produced by the mapping (:45-57, :137-200) —
    with the default fold table that path is byte-identical to
    :func:`normalize`.

    ``one_way_mode``: replacements apply only on the indexing side; query
    text goes through the default chain (TextNormalizer.cs:17-20)."""

    def __init__(
        self,
        string_replacements: dict[str, str] | None = None,
        char_replacements: dict[str, str] | None = None,
        one_way_mode: bool = False,
    ):
        self.string_replacements = dict(string_replacements or {})
        self.char_replacements = dict(char_replacements or {})
        self.one_way_mode = one_way_mode
        self._table = {
            ord(k): ord(v) for k, v in self.char_replacements.items()
        }
        self._std_ws = self.string_replacements == _STD_WS_REPLACEMENTS
        if self._std_ws:
            t = dict(self._table)
            t.update({0x09: 0x20, 0x0A: 0x20, 0x0D: 0x20})
            self._ws_table = t

    @classmethod
    def create_default(cls) -> "TextNormalizer":
        """CreateDefault: standard whitespace + the diacritic fold table
        (TextNormalizer.cs:211-302)."""
        return cls(dict(_STD_WS_REPLACEMENTS), dict(_FOLD_PAIRS))

    def normalize(self, text: str) -> str:
        if not text:
            return text
        if self._std_ws:
            return _SPACE_RUN_RE.sub(" ", text.translate(self._ws_table))
        for k, v in self.string_replacements.items():
            text = text.replace(k, v)
        return text.translate(self._table) if self._table else text


def normalize_with(normalizer: "TextNormalizer | None", text: str, is_query: bool = False) -> str:
    """Config-aware normalize: the custom normalizer when one is configured
    (query side falls back to the default chain in one-way mode), else the
    default fast path."""
    if normalizer is None or (is_query and normalizer.one_way_mode):
        return normalize(text)
    return normalizer.normalize(text)


# --- word splitting ----------------------------------------------------------


def split_words_with_offsets(
    text: str, delimiters: tuple[str, ...] = DEFAULT_DELIMITERS
) -> list[tuple[str, int]]:
    """Split on the delimiter set, returning (word, offset) pairs
    (Tokenizer.cs:117-137)."""
    dset = frozenset(delimiters)
    out: list[tuple[str, int]] = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in dset:
            i += 1
        if i >= n:
            break
        start = i
        while i < n and text[i] not in dset:
            i += 1
        out.append((text[start:i], start))
    return out


def split_words(text: str, delimiters: tuple[str, ...] = DEFAULT_DELIMITERS) -> list[str]:
    return [w for w, _ in split_words_with_offsets(text, delimiters)]


# --- tokenization (exact, string-based) --------------------------------------


def _is_all_padding(gram: str) -> bool:
    return all(c == START_PAD_CHAR or c == STOP_PAD_CHAR for c in gram)


def _sizes_to_run(padded_len: int, index_sizes: tuple[int, ...]) -> list[int]:
    """GenerateNGramsToVisitor size-selection (Tokenizer.cs:288-298):
    run sizes in order, stopping after maxSize; if the padded text is no longer
    than the smallest size, only the smallest size runs."""
    max_size = index_sizes[-1]
    if padded_len <= index_sizes[0]:
        max_size = index_sizes[0]
    out = []
    for n in index_sizes:
        out.append(n)
        if n == max_size:
            break
    return out


def tokenize_for_indexing(
    text: str,
    index_sizes: tuple[int, ...] = (3,),
    start_pad_size: int = 2,
    stop_pad_size: int = 0,
    delimiters: tuple[str, ...] = DEFAULT_DELIMITERS,
    is_segment_continuation: bool = False,
) -> list[tuple[str, int]]:
    """Emit (token, position) in reference order: all n-grams, then words
    (Tokenizer.cs:89-139). ``text`` must already be normalized + lowercased."""
    if not text:
        return []
    start_pad = "" if is_segment_continuation else START_PAD_CHAR * start_pad_size
    padded = start_pad + text + STOP_PAD_CHAR * stop_pad_size

    out: list[tuple[str, int]] = []
    for n in _sizes_to_run(len(padded), index_sizes):
        if len(padded) >= n:
            for i in range(len(padded) - n + 1):
                gram = padded[i : i + n]
                if not _is_all_padding(gram):
                    out.append((gram, i))

    if delimiters is not None:  # None ⇔ C# TokenizerSetup == null: no word pass
        base = 0 if is_segment_continuation else start_pad_size
        min_size = index_sizes[0]
        for word, off in split_words_with_offsets(text, delimiters):
            if len(word) >= min_size:
                out.append((word, base + off))
    return out


def tokenize_for_search(
    text: str,
    index_sizes: tuple[int, ...] = (3,),
    start_pad_size: int = 2,
    stop_pad_size: int = 0,
    delimiters: tuple[str, ...] = DEFAULT_DELIMITERS,
    high_resolution_mode: bool = False,
) -> list[str]:
    """Search-side token emission: words first, then shingles over the padded
    buffer (Tokenizer.cs:144-267). ``text`` must already be normalized
    (+ lowercased by the caller, mirroring SearchEngine.Search)."""
    out: list[str] = []
    min_size = index_sizes[0]
    for word, _ in split_words_with_offsets(text, delimiters):
        if len(word) >= min_size:
            out.append(word)

    padded = START_PAD_CHAR * start_pad_size + text + STOP_PAD_CHAR * stop_pad_size
    for n in _sizes_to_run(len(padded), index_sizes):
        if len(padded) >= n:
            for i in range(len(padded) - n + 1):
                gram = padded[i : i + n]
                if not _is_all_padding(gram):
                    out.append(gram)

    if high_resolution_mode:
        joined = "".join(c for c in text if c not in frozenset(delimiters))
        padded_j = START_PAD_CHAR * start_pad_size + joined + STOP_PAD_CHAR * stop_pad_size
        for n in _sizes_to_run(len(padded_j), index_sizes):
            if len(padded_j) >= n:
                for i in range(len(padded_j) - n + 1):
                    gram = padded_j[i : i + n]
                    if not _is_all_padding(gram):
                        out.append(gram)
        if len(joined) >= min_size:
            out.append(joined)
    return out


# --- multi-field analysis (fielded documents) --------------------------------


def concat_fields(
    values: list, weight_indices: list[int], delimiter: str = "§"
) -> tuple[str, list[tuple[int, int]]]:
    """DocumentFields.GetSearchableTexts (DocumentFields.cs:124-170): fields
    (pre-sorted by weight, High first) joined with '§'; returns
    (concatenated_text, [(position, weight_index)] boundaries). List-valued
    fields emit one boundary per element with a trailing delimiter."""
    parts: list[str] = []
    boundaries: list[tuple[int, int]] = []
    pos = 0
    n = len(values)
    for i, (v, widx) in enumerate(zip(values, weight_indices)):
        if isinstance(v, (list, tuple)):
            for item in v:
                boundaries.append((pos, widx))
                s = "" if item is None else str(item)
                parts.append(s)
                parts.append(delimiter)
                pos += len(s) + 1
        else:
            boundaries.append((pos, widx))
            s = "" if v is None else str(v)
            parts.append(s)
            pos += len(s)
            if i < n - 1:
                parts.append(delimiter)
                pos += 1
    return "".join(parts), boundaries


def field_weight_at(
    token_position: int,
    boundaries: list[tuple[int, int]],
    field_weights: tuple[float, ...],
) -> float:
    """VectorModel.DetermineFieldWeight (VectorModel.cs:114-128). NOTE the
    reference compares token positions over the PADDED NORMALIZED text with
    boundaries over the raw concatenated text — an accepted approximation,
    ported as-is."""
    if not boundaries:
        return 1.0
    weight_index = 0
    for position, widx in boundaries:
        if position <= token_position:
            weight_index = widx
        else:
            break
    return field_weights[weight_index] if weight_index < len(field_weights) else 1.0


def analyze_fielded(
    lower_text: str,
    boundaries: list[tuple[int, int]],
    field_weights: tuple[float, ...],
    index_sizes: tuple[int, ...],
    start_pad_size: int,
    stop_pad_size: int,
    delimiters: tuple[str, ...],
) -> dict[str, list]:
    """Per-doc term accumulation with field weights — literal
    Term.FirstCycleAdd semantics (Term.cs:71-122): first occurrence stores
    round(fieldWeight); repeats add fieldWeight, accumulation stored as
    round(); past 255 the df keeps counting. Returns term → [weight_byte,
    df_contribution]."""
    out: dict[str, list] = {}
    for tok, pos in tokenize_for_indexing(
        lower_text, index_sizes, start_pad_size, stop_pad_size, delimiters
    ):
        fw = field_weight_at(pos, boundaries, field_weights)
        st = out.get(tok)
        if st is None:
            out[tok] = [min(round(fw), 255), 1]
        else:
            new_w = st[0] + fw
            if new_w <= 255:
                st[0] = round(new_w)
            else:
                st[1] += 1  # saturated: df keeps incrementing (Term quirk)
    return out


# --- vectorized batch counting (build hot path) ------------------------------

_PAD_CODES = (0xFFFF, 0xFFFE)
_GRAM3_FLAG = np.uint64(1) << np.uint64(63)


def encode_gram_key(term: str) -> int:
    """Pack a 2- or 3-char term into a uint64 (21 bits/codepoint, bit 63 set
    for length 3). Bijective for codepoints < 0x200000."""
    cps = [ord(c) for c in term]
    if len(cps) == 2:
        return (cps[0] << 21) | cps[1]
    if len(cps) == 3:
        return (1 << 63) | (cps[0] << 42) | (cps[1] << 21) | cps[2]
    raise ValueError("only 2/3-char terms are key-encodable")


def decode_gram_key(key: int) -> str:
    key = int(key)
    if key >> 63:
        return chr((key >> 42) & 0x1FFFFF) + chr((key >> 21) & 0x1FFFFF) + chr(key & 0x1FFFFF)
    return chr((key >> 21) & 0x1FFFFF) + chr(key & 0x1FFFFF)


def decode_gram_keys(keys: np.ndarray) -> list[str]:
    return [decode_gram_key(k) for k in keys]


def _doc_gram_keys(
    lower_text: str,
    index_sizes: tuple[int, ...],
    start_pad_size: int,
    stop_pad_size: int,
) -> np.ndarray:
    """All n-gram occurrences of one doc as uint64 keys (order-free multiset)."""
    padded = (
        START_PAD_CHAR * start_pad_size + lower_text + STOP_PAD_CHAR * stop_pad_size
    )
    cp = np.frombuffer(padded.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    is_pad = (cp == _PAD_CODES[0]) | (cp == _PAD_CODES[1])
    parts = []
    for n in _sizes_to_run(len(cp), index_sizes):
        if len(cp) < n:
            continue
        win = np.lib.stride_tricks.sliding_window_view(cp, n)
        all_pad = np.lib.stride_tricks.sliding_window_view(is_pad, n).all(axis=1)
        if n == 2:
            k = (win[:, 0] << np.uint64(21)) | win[:, 1]
        elif n == 3:
            k = (
                _GRAM3_FLAG
                | (win[:, 0] << np.uint64(42))
                | (win[:, 1] << np.uint64(21))
                | win[:, 2]
            )
        else:  # pragma: no cover - non-default sizes use the string path
            raise ValueError("fast path supports n-gram sizes 2/3 only")
        parts.append(k[~all_pad])
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


class BatchTokenCounts:
    """Occurrence counts for a batch of documents.

    gram terms: ``gram_doc/gram_key/gram_count`` (parallel arrays; sorted by
    (key, doc)); long words (len ≥ 4, not key-encodable): ``word_counts``
    dict ``word → (doc_idx array, count array)`` with doc ascending.
    ``doc_total``/``doc_sat_excess`` give per-doc total occurrences and the
    amount lost to uint8 weight saturation — doc_len = total − excess
    (Term weight saturates at 255, Term.cs:103-113; doc lengths sum the byte
    weights, VectorModel.cs:180-216).
    """

    __slots__ = ("gram_doc", "gram_key", "gram_count", "word_counts", "doc_len", "doc_df_extra")

    def __init__(self, gram_doc, gram_key, gram_count, word_counts, doc_len, doc_df_extra):
        self.gram_doc = gram_doc
        self.gram_key = gram_key
        self.gram_count = gram_count
        self.word_counts = word_counts
        self.doc_len = doc_len
        self.doc_df_extra = doc_df_extra


_WORD_RE_CACHE: dict[tuple[str, ...], re.Pattern] = {}


def _word_splitter(delimiters: tuple[str, ...]) -> re.Pattern:
    pat = _WORD_RE_CACHE.get(delimiters)
    if pat is None:
        pat = re.compile("[" + re.escape("".join(delimiters)) + "]+")
        _WORD_RE_CACHE[delimiters] = pat
    return pat


def _split_words_flat(
    lower_texts: list[str], delimiters: tuple[str, ...]
) -> tuple["pa.Array", np.ndarray, np.ndarray]:
    """Batch word split via Arrow RE2 (same explicit char-class pattern as
    ``_word_splitter`` — literal classes behave identically in RE2 and
    Python ``re``): returns (flat token Array, doc index per token int64,
    codepoint length per token int64). Empty tokens are INCLUDED (length 0)
    — callers mask on length, mirroring the Python ``if w`` filters."""
    arr = pa.array(lower_texts, pa.large_string())
    toks = pc.split_pattern_regex(
        arr, pattern="[" + re.escape("".join(delimiters)) + "]+"
    )
    lens = (
        pc.list_value_length(toks)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_of = np.repeat(np.arange(len(lower_texts), dtype=np.int64), lens)
    wl = (
        pc.utf8_length(flat)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return flat, doc_of, wl


def _batch_gram3_keys(
    lower_texts: list[str], start_pad_size: int, stop_pad_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All 3-gram occurrences of the whole batch in ONE numpy pass
    (index_sizes == (3,) fast path): pad + concatenate every doc, encode
    once, slide one window over the combined codepoint array, and invalidate
    windows that cross a document boundary by position — no per-doc numpy
    setup (the former per-doc path spent most of its time there).

    Returns (doc_idx int32, keys uint64, per-doc gram counts int64)."""
    n = 3
    start_pad = START_PAD_CHAR * start_pad_size
    stop_pad = STOP_PAD_CHAR * stop_pad_size
    padded = [start_pad + t + stop_pad for t in lower_texts]
    lens = np.fromiter((len(p) for p in padded), dtype=np.int64, count=len(padded))
    ends = np.cumsum(lens)
    starts = ends - lens
    big = "".join(padded)
    if len(big) < n:
        e = np.empty(0, dtype=np.uint64)
        return np.empty(0, np.int32), e, np.zeros(len(padded), np.int64)
    cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n_win = len(cp) - n + 1
    pos = np.arange(n_win, dtype=np.int64)
    # doc of each window-start position: one repeat instead of a per-window
    # searchsorted; windows are valid iff they end inside the same doc
    d = np.repeat(np.arange(len(padded), dtype=np.int64), lens)[:n_win]
    valid = pos + n <= ends[d]
    is_pad = (cp == _PAD_CODES[0]) | (cp == _PAD_CODES[1])
    all_pad = is_pad[: n_win] & is_pad[1 : n_win + 1] & is_pad[2 : n_win + 2]
    keep = valid & ~all_pad
    # pack from three shifted 1-D slices — no (n_win, 3) window matrix and
    # no 2-D fancy gather (they were ~40% of this function's time)
    keys = (
        _GRAM3_FLAG
        | (cp[: n_win][keep] << np.uint64(42))
        | (cp[1 : n_win + 1][keep] << np.uint64(21))
        | cp[2 : n_win + 2][keep]
    )
    doc_idx = d[keep].astype(np.int32)
    per_doc = np.bincount(doc_idx, minlength=len(padded)).astype(np.int64)
    return doc_idx, keys, per_doc


def count_tokens_batch(
    lower_texts: list[str],
    index_sizes: tuple[int, ...] = (3,),
    start_pad_size: int = 2,
    stop_pad_size: int = 0,
    delimiters: tuple[str, ...] = DEFAULT_DELIMITERS,
) -> BatchTokenCounts:
    """Vectorized (term, doc) occurrence counting for a batch.

    Semantically equal (for field weight 1.0) to running every doc through
    ``tokenize_for_indexing`` and accumulating with Term.FirstCycleAdd:
    posting weight = min(occurrences, 255), document length = Σ weights.
    """
    if index_sizes == (3,):
        return _count_tokens_batch_gram3(
            lower_texts, start_pad_size, stop_pad_size, delimiters
        )
    fast = all(n in (2, 3) for n in index_sizes)
    splitter = _word_splitter(delimiters)
    min_size = index_sizes[0]

    doc_arrays: list[np.ndarray] = []
    key_arrays: list[np.ndarray] = []
    # long words: word -> list of doc idx (may repeat per occurrence)
    long_word_occ: dict[str, list[int]] = {}
    n_docs = len(lower_texts)
    doc_total = np.zeros(n_docs, dtype=np.int64)

    for d, text in enumerate(lower_texts):
        if not text:
            continue
        if fast:
            keys = _doc_gram_keys(text, index_sizes, start_pad_size, stop_pad_size)
        else:
            toks = [
                t
                for t, _ in tokenize_for_indexing(
                    text, index_sizes, start_pad_size, stop_pad_size, None
                )
            ]
            keys = None
            for t in toks:
                long_word_occ.setdefault(t, []).append(d)
            doc_total[d] += len(toks)
        words = splitter.split(text)
        extra_keys = []
        for w in words:
            lw = len(w)
            if lw < min_size or lw == 0:
                continue
            doc_total[d] += 1
            if fast and lw <= 3:
                extra_keys.append(encode_gram_key(w))
            else:
                long_word_occ.setdefault(w, []).append(d)
        if fast and keys is not None:
            doc_total[d] += len(keys)
            if extra_keys:
                keys = np.concatenate([keys, np.array(extra_keys, dtype=np.uint64)])
            doc_arrays.append(np.full(len(keys), d, dtype=np.int32))
            key_arrays.append(keys)

    if doc_arrays:
        doc_idx = np.concatenate(doc_arrays)
        keys = np.concatenate(key_arrays)
        order = np.lexsort((doc_idx, keys))
        doc_idx = doc_idx[order]
        keys = keys[order]
        # run-length encode equal (key, doc) pairs
        if len(keys):
            boundary = np.empty(len(keys), dtype=bool)
            boundary[0] = True
            boundary[1:] = (keys[1:] != keys[:-1]) | (doc_idx[1:] != doc_idx[:-1])
            starts = np.flatnonzero(boundary)
            counts = np.diff(np.append(starts, len(keys))).astype(np.int32)
            gram_doc = doc_idx[starts]
            gram_key = keys[starts]
            gram_count = counts
        else:
            gram_doc = np.empty(0, np.int32)
            gram_key = np.empty(0, np.uint64)
            gram_count = np.empty(0, np.int32)
    else:
        gram_doc = np.empty(0, np.int32)
        gram_key = np.empty(0, np.uint64)
        gram_count = np.empty(0, np.int32)

    word_counts: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for w, occ in long_word_occ.items():
        arr = np.asarray(occ, dtype=np.int32)
        docs, counts = np.unique(arr, return_counts=True)
        word_counts[w] = (docs.astype(np.int32), counts.astype(np.int32))

    # uint8 saturation: weight = min(occ, 255); doc_len subtracts the excess
    sat = gram_count > 255
    doc_sat = np.zeros(n_docs, dtype=np.int64)
    if sat.any():
        np.add.at(doc_sat, gram_doc[sat], (gram_count[sat] - 255).astype(np.int64))
    for w, (docs, counts) in word_counts.items():
        over = counts > 255
        if over.any():
            np.add.at(doc_sat, docs[over], (counts[over] - 255).astype(np.int64))

    doc_len = (doc_total - doc_sat).astype(np.float32)
    return BatchTokenCounts(gram_doc, gram_key, gram_count, word_counts, doc_len, None)


def _count_tokens_batch_gram3(
    lower_texts: list[str],
    start_pad_size: int,
    stop_pad_size: int,
    delimiters: tuple[str, ...],
) -> BatchTokenCounts:
    """Default-config (IndexSizes=[3]) batch counting: single-pass 3-gram
    extraction over the concatenated batch + the word emission pass."""
    n_docs = len(lower_texts)
    doc_idx, keys, doc_total = _batch_gram3_keys(
        lower_texts, start_pad_size, stop_pad_size
    )

    # word pass (words len ≥ 3; 3-char words are gram-key-encodable) —
    # vectorized: one Arrow RE2 split over the batch (the char-class pattern
    # is engine-identical to the Python splitter), utf8_length mask, and a
    # C++ dictionary-encode for the long-word vocabulary. The former per-word
    # Python loop was ~25% of segment-build CPU.
    flat, doc_of, wl = _split_words_flat(lower_texts, delimiters)
    ge3 = wl >= 3
    if ge3.any():
        doc_total += np.bincount(doc_of[ge3], minlength=n_docs)

    m3 = wl == 3
    if m3.any():
        w3 = flat.filter(pa.array(m3))
        cps = np.frombuffer(
            "".join(w3.to_pylist()).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.uint64)
        cps = cps.reshape(-1, 3)
        keys3 = (
            _GRAM3_FLAG
            | (cps[:, 0] << np.uint64(42))
            | (cps[:, 1] << np.uint64(21))
            | cps[:, 2]
        )
        doc_idx = np.concatenate([doc_idx, doc_of[m3].astype(np.int32)])
        keys = np.concatenate([keys, keys3])

    mL = wl > 3
    if mL.any():
        flatL = flat.filter(pa.array(mL))
        docL = doc_of[mL]
        enc = flatL.dictionary_encode()
        widx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        wordsL = enc.dictionary.to_pylist()
        order = np.lexsort((docL, widx))
        ii, dd = widx[order], docL[order]
        pair_b = np.empty(len(ii), dtype=bool)
        pair_b[0] = True
        pair_b[1:] = (ii[1:] != ii[:-1]) | (dd[1:] != dd[:-1])
        pst = np.flatnonzero(pair_b)
        pcnt = np.diff(np.append(pst, len(ii))).astype(np.int32)
        u_idx, u_doc = ii[pst], dd[pst].astype(np.int32)
        wb = np.flatnonzero(np.concatenate(([True], u_idx[1:] != u_idx[:-1])))
        we = np.append(wb[1:], len(u_idx))
        word_counts_v: dict[str, tuple[np.ndarray, np.ndarray]] = {
            wordsL[u_idx[wb[k]]]: (u_doc[wb[k] : we[k]], pcnt[wb[k] : we[k]])
            for k in range(len(wb))
        }
    else:
        word_counts_v = {}

    if len(keys):
        order = np.lexsort((doc_idx, keys))
        doc_idx = doc_idx[order]
        keys = keys[order]
        boundary = np.empty(len(keys), dtype=bool)
        boundary[0] = True
        boundary[1:] = (keys[1:] != keys[:-1]) | (doc_idx[1:] != doc_idx[:-1])
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(keys))).astype(np.int32)
        gram_doc = doc_idx[starts]
        gram_key = keys[starts]
        gram_count = counts
    else:
        gram_doc = np.empty(0, np.int32)
        gram_key = np.empty(0, np.uint64)
        gram_count = np.empty(0, np.int32)

    word_counts = word_counts_v

    sat = gram_count > 255
    doc_sat = np.zeros(n_docs, dtype=np.int64)
    if sat.any():
        np.add.at(doc_sat, gram_doc[sat], (gram_count[sat] - 255).astype(np.int64))
    for w, (docs, counts2) in word_counts.items():
        over = counts2 > 255
        if over.any():
            np.add.at(doc_sat, docs[over], (counts2[over] - 255).astype(np.int64))

    doc_len = (doc_total - doc_sat).astype(np.float32)
    return BatchTokenCounts(gram_doc, gram_key, gram_count, word_counts, doc_len, None)
