"""Deterministic synthetic corpora (FIXTURES.md; seed=42, no external data).

* ``webpages``  — Common-Crawl-style table per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string).
* ``titles``    — movie-style ranking corpus with the planted families the
  reference parity tests exercise (MovieSearchParityTests.cs shapes).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = (
    "the quick brown fox jumps over lazy dog journey thousand miles begins "
    "single step question glitters gold clever forest batman robin fight "
    "crime gotham city superman flies faster speeding bullet spider man "
    "swings through new york wonder woman protects innocent flash runs "
    "incredible speeds data pipeline index search engine ranking score "
    "document term posting segment merge shuffle partition stream batch "
    "arrow parquet column table filter aggregate window join hash sort"
).split()

_DIACRITIC_WORDS = ["Škoda", "café", "naïve", "Łódź", "straße", "señor", "Ćevapi"]

_LANGS = ["en"] * 9 + ["cs", "de", "fr"]


def make_webpages(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.RandomState(seed)
    urls, texts, langs, htmls, ts = [], [], [], [], []
    base_ts = 1_600_000_000_000_000  # µs epoch
    vocab = np.array(_VOCAB)
    for i in range(n_rows):
        cat = f"cat{i % 17}"
        urls.append(f"https://site{i % 1000}.example/{cat}/page-{i:08d}")
        n_words = 20 + int(rng.randint(0, 120))
        words = list(vocab[rng.randint(0, len(vocab), n_words)])
        if i % 13 == 0:
            words.insert(0, _DIACRITIC_WORDS[i % len(_DIACRITIC_WORDS)])
        if i % 29 == 0:
            words.append("multi\tspace\n\nrun")
        text = " ".join(words)
        if i % 37 == 0:
            text = text.replace(" ", "  ", 3)
        texts.append(text)
        langs.append(_LANGS[i % len(_LANGS)])
        htmls.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        ts.append(base_ts + i * 1_000_000)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_webpages(
    path: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 10_000,
    row_group_size: int = 2_048,
) -> str:
    """Write (or reuse) the deterministic webpages corpus as a DIRECTORY of
    parquet part files (like a Common-Crawl dump: many WARC-sized shards) so
    reads parallelize at file/row-group granularity; returns the dir path."""
    marker = os.path.join(path, f"_META-{n_rows}-{seed}")
    if os.path.isdir(path) and os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    table = make_webpages(n_rows, seed)
    for fi, start in enumerate(range(0, n_rows, rows_per_file)):
        part = table.slice(start, rows_per_file)
        pq.write_table(
            part, os.path.join(path, f"part-{fi:05d}.parquet"), row_group_size=row_group_size
        )
    with open(marker, "w") as f:
        f.write("ok")
    return path


# --- titles corpus (parity fixtures) ----------------------------------------

PLANTED_TITLES = [
    "The Shawshank Redemption",
    "Redemption Day",
    "Redemption Road",
    "Shaws",
    "The Matrix",
    "The Matrix Reloaded",
    "The Matrix Revolutions",
    "The Match",
    "Matriarch",
    "X",
    "Io",
    "De Palma Story",
    "The Godfather",
    "Pulp Fiction",
    "Forrest Gump",
    "Inception",
    "Interstellar",
]

_GENRES = ["Drama", "Sci-Fi", "Action", "Comedy", "Crime"]


def make_titles(n_rows: int = 2000, seed: int = 42) -> pa.Table:
    rng = np.random.RandomState(seed)
    vocab = np.array(_VOCAB)
    titles, keys, desc, genre, year = [], [], [], [], []
    for i, t in enumerate(PLANTED_TITLES):
        keys.append(i + 1)
        titles.append(t)
        desc.append("classic film about " + " ".join(vocab[rng.randint(0, len(vocab), 6)]))
        genre.append(_GENRES[i % len(_GENRES)])
        year.append(1980 + (i * 3) % 45)
    for i in range(len(PLANTED_TITLES), n_rows):
        n_words = 2 + int(rng.randint(0, 4))
        words = [str(w).capitalize() for w in vocab[rng.randint(0, len(vocab), n_words)]]
        keys.append(i + 1)
        titles.append(" ".join(words))
        desc.append(" ".join(vocab[rng.randint(0, len(vocab), 8)]))
        genre.append(_GENRES[i % len(_GENRES)])
        year.append(1950 + int(rng.randint(0, 75)))
    return pa.table(
        {
            "doc_key": pa.array(keys, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "description": pa.array(desc, pa.string()),
            "genre": pa.array(genre, pa.string()),
            "year": pa.array(year, pa.int32()),
        }
    )
