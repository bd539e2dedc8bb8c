"""DuckDB oracle-SQL builders mirroring the engine's analyzer/scoring math.

These generate ANSI-ish SQL (DuckDB dialect) that recomputes, from the raw
parquet tables, exactly what the Ray pipelines compute — used by the driver's
correctness gate (__ray_entry__.oracle_sql) and by tests.
"""

from __future__ import annotations

from .analyzer import _FOLD_PAIRS
from .config import DEFAULT_DELIMITERS


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def delim_regex_class() -> str:
    """RE2 character class matching the engine's 22 delimiters."""
    out = []
    for c in DEFAULT_DELIMITERS:
        if c == "\t":
            out.append("\\t")
        elif c in "\\^]-[":
            out.append("\\" + c)
        else:
            out.append(c)
    return "[" + "".join(out) + "]"


def norm_expr(col: str = "text") -> str:
    """SQL expression for normalize(text).lower() (TextNormalizer semantics:
    fold diacritics, \\t\\n\\r→space, collapse space runs, then lower)."""
    fold_from = "".join(k for k, _ in _FOLD_PAIRS)
    fold_to = "".join(v for _, v in _FOLD_PAIRS)
    inner = (
        f"translate({col}, {sql_quote(fold_from)} || chr(9) || chr(10) || chr(13), "
        f"{sql_quote(fold_to)} || '   ')"
    )
    return f"lower(regexp_replace({inner}, ' {{2,}}', ' ', 'g'))"


def norm_docs_cte(table: str = "documents", id_col: str = "doc_id") -> str:
    return (
        f"norm_docs AS (SELECT {id_col} AS doc_id, {norm_expr('text')} AS norm "
        f"FROM {table})"
    )


def grams_cte() -> str:
    """3-grams over the padded normalized text (startPad=2, U+FFFF)."""
    return (
        "padded AS (SELECT doc_id, repeat(chr(65535), 2) || norm AS p FROM norm_docs), "
        "series AS (SELECT unnest(generate_series(1, (SELECT coalesce(max(length(p)),1) FROM padded))) AS i), "
        "grams AS (SELECT doc_id, substr(p, i, 3) AS term FROM padded, series "
        "WHERE i <= length(p) - 2)"
    )


def words_cte(min_len: int = 3) -> str:
    dre = sql_quote(delim_regex_class())
    return (
        f"words AS (SELECT doc_id, unnest(string_split_regex(norm, {dre})) AS term "
        f"FROM norm_docs) , words_f AS (SELECT doc_id, term FROM words "
        f"WHERE length(term) >= {min_len})"
    )


def tokens_cte() -> str:
    """All token occurrences (grams + words), mirroring tokenize_for_indexing."""
    return (
        "tokens AS (SELECT doc_id, term FROM grams UNION ALL "
        "SELECT doc_id, term FROM words_f)"
    )


def term_df_sql(table: str = "documents") -> str:
    """(term, df): distinct docs per term over grams ∪ words."""
    return (
        f"WITH {norm_docs_cte(table)}, {grams_cte()}, {words_cte()} "
        "SELECT term, count(DISTINCT doc_id) AS df FROM "
        "(SELECT doc_id, term FROM grams UNION SELECT doc_id, term FROM words_f) "
        "GROUP BY term ORDER BY term"
    )


def word_df_sql(table: str = "documents") -> str:
    """Word-level df over ALL word lengths (word-IDF cache input)."""
    dre = sql_quote(delim_regex_class())
    return (
        f"WITH {norm_docs_cte(table)}, "
        f"w AS (SELECT doc_id, unnest(string_split_regex(norm, {dre})) AS word FROM norm_docs) "
        "SELECT word, count(DISTINCT doc_id) AS df FROM w WHERE length(word) >= 1 "
        "GROUP BY word ORDER BY word"
    )


def doc_len_sql(table: str = "documents") -> str:
    """(doc_id, doc_len): #3-gram windows (= length of norm) + #words len≥3.
    Assumes no per-doc term occurrence exceeds 255 (true for this corpus;
    the engine additionally applies uint8 saturation)."""
    return (
        f"WITH {norm_docs_cte(table)}, {grams_cte()}, {words_cte()} "
        "SELECT n.doc_id AS doc_id, "
        "  (CASE WHEN length(n.norm) >= 1 THEN length(n.norm) ELSE 0 END) "
        "  + coalesce(w.cnt, 0) AS doc_len "
        "FROM norm_docs n LEFT JOIN "
        "(SELECT doc_id, count(*) AS cnt FROM words_f GROUP BY doc_id) w "
        "ON n.doc_id = w.doc_id ORDER BY doc_id"
    )


def normalize_sql(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, {norm_expr('text')} AS norm_text FROM {table} ORDER BY doc_id"
    )


def ngram_jaccard_sql(
    table: str = "documents", threshold: float = 0.5, cap: int = 20
) -> str:
    """Exact Jaccard over distinct UNPADDED char 3-grams of normalize(text)
    .lower(); candidates restricted to pairs sharing a rare shingle
    (df ≤ cap) — identical semantics to ops.dedup.ngram_jaccard_pairs."""
    return f"""
WITH n AS (SELECT doc_id, {norm_expr('text')} AS norm FROM {table}),
g AS (
  SELECT DISTINCT doc_id, substr(norm, i, 3) AS term
  FROM n, (SELECT unnest(generate_series(1,
        (SELECT coalesce(max(length(norm)),1) FROM n))) AS i) s
  WHERE i <= length(norm) - 2
),
sdf AS (SELECT term, count(*) AS c FROM g GROUP BY term),
rare AS (SELECT term FROM sdf WHERE c BETWEEN 2 AND {cap}),
cand AS (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM g a JOIN rare r ON a.term = r.term
  JOIN g b ON b.term = a.term AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
inter AS (
  SELECT c.ia, c.ib, count(*) AS i
  FROM cand c
  JOIN g ga ON ga.doc_id = c.ia
  JOIN g gb ON gb.doc_id = c.ib AND gb.term = ga.term
  GROUP BY c.ia, c.ib
)
SELECT c.ia AS id_a, c.ib AS id_b,
       round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 4) AS jaccard
FROM cand c
JOIN inter i ON i.ia = c.ia AND i.ib = c.ib
JOIN sizes sa ON sa.doc_id = c.ia
JOIN sizes sb ON sb.doc_id = c.ib
WHERE i.i::DOUBLE / (sa.sz + sb.sz - i.i) >= {threshold}
ORDER BY id_a, id_b
"""


def quality_sql(table: str = "documents") -> str:
    """DuckDB oracle for ops.textstats.quality_batch: token counts over the
    normalized word split, stopword/distinct ratios, and the composite
    quality = 0.4·min(1, n_tokens/100) + 0.3·distinct_ratio + 0.3·stop_ratio
    (same left-to-right float64 accumulation order as the numpy side)."""
    from .ops.textstats import STOPWORDS

    dre = sql_quote(delim_regex_class())
    stoplist = ", ".join(sql_quote(w) for w in sorted(STOPWORDS))
    return f"""
WITH n AS (SELECT doc_id, {norm_expr('text')} AS norm FROM {table}),
w AS (SELECT doc_id, unnest(string_split_regex(norm, {dre})) AS w FROM n),
wf AS (SELECT doc_id, w FROM w WHERE length(w) >= 1),
s AS (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct,
         sum(CASE WHEN w IN ({stoplist}) THEN 1 ELSE 0 END) AS n_stop
  FROM wf GROUP BY doc_id)
SELECT n.doc_id,
  coalesce(s.n_tokens, 0) AS n_tokens,
  round(coalesce(s.n_stop::DOUBLE / s.n_tokens, 0.0), 4) AS stopword_ratio,
  round(coalesce(s.n_distinct::DOUBLE / s.n_tokens, 0.0), 4) AS distinct_ratio,
  round(0.4 * least(1.0, coalesce(s.n_tokens, 0) / 100.0)
      + 0.3 * coalesce(s.n_distinct::DOUBLE / s.n_tokens, 0.0)
      + 0.3 * coalesce(s.n_stop::DOUBLE / s.n_tokens, 0.0), 4) AS quality
FROM n LEFT JOIN s ON n.doc_id = s.doc_id
ORDER BY n.doc_id
"""


def bm25_sql(query_tokens: list[str], table: str = "documents") -> str:
    """Full-corpus disjunctive BM25+ scores for a fixed token multiset
    (float64; the engine's oracle entry scores in float64 too)."""
    vals = ", ".join(f"({sql_quote(t)})" for t in sorted(set(query_tokens)))
    return f"""
WITH {norm_docs_cte(table)}, {grams_cte()}, {words_cte()}, {tokens_cte()},
qterms(term) AS (VALUES {vals}),
occ AS (
  SELECT t.doc_id, t.term, count(*) AS occ FROM tokens t
  JOIN qterms q ON t.term = q.term GROUP BY t.doc_id, t.term
),
alltok AS (SELECT doc_id, count(*) AS n_tok FROM tokens GROUP BY doc_id),
doclen AS (
  SELECT n.doc_id, coalesce(a.n_tok, 0)::DOUBLE AS dl
  FROM norm_docs n LEFT JOIN alltok a ON n.doc_id = a.doc_id
),
corpus AS (
  SELECT count(*)::DOUBLE AS n, (SELECT avg(dl) FROM doclen) AS avgdl FROM norm_docs
),
df AS (
  SELECT t.term, count(DISTINCT t.doc_id)::DOUBLE AS df FROM tokens t
  JOIN qterms q ON t.term = q.term GROUP BY t.term
),
scored AS (
  SELECT o.doc_id,
    sum(
      ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
      ( (least(o.occ, 255)::DOUBLE * 2.2)
        / (least(o.occ, 255)::DOUBLE
           + 1.2 * (0.25 + 0.75 * (CASE WHEN d.dl <= 0 THEN 1.0 ELSE d.dl END) / c.avgdl))
        + 1.0 )
    ) AS score
  FROM occ o
  JOIN df ON o.term = df.term
  JOIN doclen d ON o.doc_id = d.doc_id
  CROSS JOIN corpus c
  GROUP BY o.doc_id
)
SELECT doc_id, round(score, 4) AS score FROM scored WHERE score > 0 ORDER BY doc_id
"""
