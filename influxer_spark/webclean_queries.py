"""Driver-contract queries + DuckDB oracle SQL for the web-corpus cleaning
operators (operators/webclean.py: line dedup, URL canonicalization, PII
redaction).

The documents table has no natural line breaks or URLs, so each query
derives its input deterministically FROM the table with the identical
expression on both engines (same trick as the IVF centroid / LSH plane
literals in training_queries.py): newlines are injected every 5 words for
line_dedup, and synthetic URLs / PII strings are built from (doc_id,
source) with branch-identical CASE arms. Parity is therefore structural —
no floats cross the oracle boundary anywhere in this module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.operators import webclean as W

# ---------------------------------------------------------------------------
# shared derivations (Spark Column ⟷ DuckDB SQL, kept textually adjacent so
# a change to one side is visibly a change to both)
# ---------------------------------------------------------------------------

# newline after every 5th word — turns the word soup into "lines"
_LINES_SPARK = lambda c: F.regexp_replace(  # noqa: E731
    F.trim(c), r"((?:\S+ ){4}\S+) ", "$1\n"
)
_LINES_SQL = (
    "regexp_replace(trim(text), '((?:\\S+ ){4}\\S+) ', '\\1' || chr(10), 'g')"
)


def _urls_spark(df: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    host = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.when(d % 2 == 0, F.lit(".EXAMPLE.COM:443")).otherwise(
            F.lit(".example.org:8080")
        ),
    )
    path = (
        F.when(d % 3 == 0, F.lit("/A/B/"))
        .when(d % 3 == 1, F.lit(""))
        .otherwise(F.lit("/index.html"))
    )
    tail = (
        F.when(d % 4 == 0, F.lit("?utm_source=rss&b=2&a=1#top"))
        .when(d % 4 == 1, F.lit("?z=9&utm_campaign=x&A=1"))
        .when(d % 4 == 2, F.lit("#frag"))
        .otherwise(F.lit(""))
    )
    return df.select(d.alias("id"), F.concat(host, path, tail).alias("raw"))


_URLS_SQL = """
SELECT doc_id AS id,
  'HTTPS://WWW.' || upper(source)
  || CASE WHEN doc_id % 2 = 0 THEN '.EXAMPLE.COM:443' ELSE '.example.org:8080' END
  || CASE WHEN doc_id % 3 = 0 THEN '/A/B/' WHEN doc_id % 3 = 1 THEN '' ELSE '/index.html' END
  || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=rss&b=2&a=1#top'
          WHEN doc_id % 4 = 1 THEN '?z=9&utm_campaign=x&A=1'
          WHEN doc_id % 4 = 2 THEN '#frag' ELSE '' END AS raw
FROM documents
"""


def _pii_text_spark(df: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    return df.select(
        d.alias("id"),
        F.concat(
            F.lit("user"), d, F.lit(" mail a.b"), (d % 5),
            F.lit("@ex"), (d % 3), F.lit(".org ip 10."), (d % 200),
            F.lit(".0."), (d % 250), F.lit(" tel +1 555 010 "), (d % 90) + 10,
            F.lit(" end"),
        ).alias("ptext"),
    )


_PII_TEXT_SQL = """
SELECT doc_id AS id,
  'user' || doc_id || ' mail a.b' || (doc_id % 5) || '@ex' || (doc_id % 3)
  || '.org ip 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
  || ' tel +1 555 010 ' || (doc_id % 90 + 10) || ' end' AS ptext
FROM documents
"""


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_line_dedup(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id", _LINES_SPARK(F.col("text")).alias("text")
    )
    return W.line_dedup(docs, "doc_id", "text", min_doc_freq=2)


def _q_url_canonicalize(spark, sf_dir):
    urls = _urls_spark(_docs(spark, sf_dir))
    return urls.select("id", "raw", W.canonicalize_url("raw").alias("canon"))


def _q_pii_scrub(spark, sf_dir):
    return W.pii_scrub_df(_pii_text_spark(_docs(spark, sf_dir)), "id", "ptext")


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_LINE_DEDUP_SQL = f"""
WITH base AS (
  SELECT doc_id, {_LINES_SQL} AS t FROM documents
), ls AS (
  SELECT doc_id, string_split(t, chr(10)) AS l FROM base
), lines AS (
  SELECT doc_id, unnest(generate_series(1, len(l))) AS pos, unnest(l) AS line
  FROM ls
), freq AS (
  SELECT line, count(*) AS doc_freq
  FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY line
)
SELECT l.doc_id AS id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(count(*) FILTER (WHERE f.doc_freq < 2) AS BIGINT) AS n_kept,
  coalesce(
    string_agg(l.line, chr(10) ORDER BY l.pos) FILTER (WHERE f.doc_freq < 2),
    '') AS text
FROM lines l JOIN freq f ON f.line = l.line
GROUP BY 1
"""

# mirror of webclean.canonicalize_url, stepwise CTE per transformation
_URL_CANON_SQL = f"""
WITH urls AS ({_URLS_SQL}),
s1 AS (
  SELECT id, raw, regexp_replace(raw, '#.*$', '') AS u FROM urls
), parts AS (
  SELECT id, raw, u,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
    coalesce(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '') AS path0,
    -- DuckDB regexp_extract is NULL on no match where Spark returns ''
    coalesce(regexp_extract(u, '\\?([^#]*)', 1), '') AS q
  FROM s1
), hp AS (
  SELECT *,
    coalesce(regexp_extract(auth, ':([0-9]+)$', 1), '') AS port,
    regexp_replace(regexp_replace(auth, ':[0-9]+$', ''), '^www\\.', '') AS host
  FROM parts
), np AS (
  SELECT *,
    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
           OR (scheme = 'https' AND port = '443')
         THEN '' ELSE ':' || port END AS port_part,
    CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
         ELSE regexp_replace(path0, '/+$', '') END AS path,
    -- coalesce: DuckDB list_sort([]) yields NULL, Spark array_join gives ''
    coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
      p -> p <> '' AND NOT regexp_matches(p,
        '{W.TRACKING_PARAM_PATTERN}'))), '&'), '') AS qs
  FROM hp
)
SELECT id, raw,
  scheme || '://' || host || port_part || path
  || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon
FROM np
"""

_PII_SQL = f"""
WITH p AS ({_PII_TEXT_SQL}),
st AS (
  SELECT id, ptext,
    regexp_replace(ptext, '{W.EMAIL_PATTERN}', '<EMAIL>', 'g') AS ae
  FROM p
), st2 AS (
  SELECT *, regexp_replace(ae, '{W.IPV4_PATTERN}', '<IP>', 'g') AS ai FROM st
)
SELECT id,
  CAST(len(regexp_extract_all(ptext, '{W.EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(ae, '{W.IPV4_PATTERN}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(ai, '{W.PHONE_PATTERN}')) AS BIGINT) AS n_phones,
  regexp_replace(ai, '{W.PHONE_PATTERN}', '<PHONE>', 'g') AS redacted
FROM st2
"""


# ---------------------------------------------------------------------------
# C4 cleaning rules (webclean.c4_rules).  The word soup has no punctuation,
# so the query decorates it deterministically — identical expressions both
# sides: newline every 5 words, then a per-line suffix chosen by LINE LENGTH
# (content-derived, so no index plumbing is needed in either engine), then
# page-level injections keyed on doc_id that exercise every page rule.
# ---------------------------------------------------------------------------

_C4_BADWORDS = ("badword",)


def _c4_page_spark(df: DataFrame) -> DataFrame:
    lines = F.split(_LINES_SPARK(F.col("text")), "\n")
    deco = F.transform(
        lines,
        lambda l: F.concat(
            l,
            F.when(F.length(l) % 7 == 0, F.lit(" javascript required."))
            .when(F.length(l) % 5 == 0, F.lit(" see our privacy policy."))
            .when(F.length(l) % 3 != 2, F.lit("."))
            .otherwise(F.lit("")),
        ),
    )
    d = F.col("doc_id")
    page = F.concat(
        F.array_join(deco, "\n"),
        F.when(d % 11 == 0, F.lit("\nlorem ipsum dolor.")).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit("\nvar x = { a: 1 };")).otherwise(F.lit("")),
        F.when(d % 17 == 0, F.lit("\nsome badword here.")).otherwise(F.lit("")),
    )
    return df.select("doc_id", page.alias("page"))


def _q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line+page heuristics (Raffel et al. 2020 §2.2) over synthetic
    decorated pages; every line rule (terminal punctuation, min words,
    javascript, policy boilerplate) and page rule (sentence floor, lorem
    ipsum, curly brace, badword) fires on a deterministic subset."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = _c4_page_spark(docs)
    return W.c4_rules(pages, "doc_id", "page", badwords=_C4_BADWORDS)


_C4_POLICY_PRED = " OR ".join(
    f"contains(lower(l), '{p}')" for p in W.C4_POLICY_SUBSTRINGS
)

_C4_SQL = f"""
WITH pages AS (
  SELECT doc_id,
    array_to_string(list_transform(string_split({_LINES_SQL}, chr(10)),
      l -> l || CASE WHEN length(l) % 7 = 0 THEN ' javascript required.'
                     WHEN length(l) % 5 = 0 THEN ' see our privacy policy.'
                     WHEN length(l) % 3 != 2 THEN '.'
                     ELSE '' END), chr(10))
    || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum dolor.' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'var x = {{ a: 1 }};' ELSE '' END
    || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'some badword here.' ELSE '' END
      AS page
  FROM documents
), r AS (
  SELECT doc_id AS id, page,
    string_split(page, chr(10)) AS ls,
    list_filter(string_split(page, chr(10)), l ->
      regexp_matches(trim(l), '[.!?"]$')
      AND len(string_split_regex(trim(l), '\\s+')) >= 3
      AND NOT contains(lower(l), 'javascript')
      AND NOT ({_C4_POLICY_PRED})) AS kept
  FROM pages
), s AS (
  SELECT id, page, ls, kept,
    coalesce(array_to_string(kept, chr(10)), '') AS clean_text
  FROM r
)
SELECT id,
  CAST(len(ls) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS BIGINT) AS n_sentences,
  contains(lower(page), 'lorem ipsum') AS has_lorem,
  contains(page, '{{') AS has_brace,
  regexp_matches(lower(page), '\\bbadword\\b') AS has_badword,
  (len(regexp_extract_all(clean_text, '[.!?]')) >= 5
   AND NOT contains(lower(page), 'lorem ipsum')
   AND NOT contains(page, '{{')
   AND NOT regexp_matches(lower(page), '\\bbadword\\b')) AS keep,
  clean_text
FROM s
"""


def webclean_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "line_dedup_corpus": _q_line_dedup,
        "url_canonicalize": _q_url_canonicalize,
        "pii_scrub_counts": _q_pii_scrub,
        "c4_quality_flags": _q_c4_rules,
    }


def webclean_oracle_sql() -> dict[str, str]:
    return {
        "line_dedup_corpus": _LINE_DEDUP_SQL,
        "url_canonicalize": _URL_CANON_SQL,
        "pii_scrub_counts": _PII_SQL,
        "c4_quality_flags": _C4_SQL,
    }
