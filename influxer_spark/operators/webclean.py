"""Web-corpus cleaning operators: corpus-level line dedup (boilerplate
removal), URL canonicalization, and PII redaction.

These extend the reference's per-value scrub (Influxer/ExtensionMethods.cs:38-44,
replicated in ingest/scrub.py) from identifier hygiene to the corpus-hygiene
steps a crawl-derived training set needs before packing:

- C4 / CCNet remove *lines* that repeat across many documents (cookie
  banners, nav bars) — :func:`line_dedup` is that step as two shuffles.
- Crawl frontiers and dedup keys both want ONE canonical URL per page —
  :func:`canonicalize_url` normalizes scheme/host/port/path and strips
  tracking parameters as a pure Column expression (JVM codegen, no UDF).
- :func:`pii_scrub` redacts emails / IPv4s / phone-like digit runs with
  typed placeholders and counts each, RE2-safe so the DuckDB oracle can run
  the byte-identical patterns.

Determinism discipline (see training_queries.py): no floats anywhere in
these operators — counts are BIGINT, strings are exact — so oracle parity
is structural, not numeric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns shared verbatim with the DuckDB oracle: every construct below is
# in the RE2 ∩ java.util.regex common subset (no backrefs, no lookaround,
# no escaped spaces in classes — see spark-graft oracle discipline).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b"
PHONE_PATTERN = r"\b\+?\d[\d. -]{6,}\d\b"
# tracking params dropped by canonicalize_url (key match, with or without =value)
TRACKING_PARAM_PATTERN = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)"


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-level line deduplication (C4's "three-sentence span" /
    CCNet's paragraph-hash step, at line granularity): drop every line that
    occurs in ``min_doc_freq`` or more *distinct* documents, keeping each
    document's surviving lines in their original order.

    Returns (id, n_lines, n_kept, text) — ``text`` is the surviving lines
    re-joined with ``delim`` ('' when everything was boilerplate).

    Scale: the line→doc-frequency table is built with a two-level
    aggregation ((line, id) partial first), so Spark plans two plain
    partial-aggregated shuffles instead of a countDistinct Expand; the
    frequency side is then joined back on the line key (AQE broadcasts it
    when the boilerplate vocabulary is small, which on real crawls it is —
    frequency tables are Zipfian). Reconstruction is one groupBy(id) whose
    collect_list holds only that document's own lines — bounded by document
    size, never by corpus size.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    )
    freq = (
        lines.groupBy("line", "id")
        .agg(F.count("*").alias("_m"))
        .groupBy("line")
        .agg(F.count("*").alias("doc_freq"))
    )
    keep = F.col("doc_freq") < min_doc_freq
    return (
        lines.join(freq, "line")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.concat_ws(
                delim,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text"),
        )
    )


def _strip_fragment(u: Column) -> Column:
    return F.regexp_replace(u, "#.*$", "")


def canonicalize_url(url: str | Column, strip_www: bool = True) -> Column:
    """Canonical form of a URL as a single JVM Column expression:

    - scheme and host lowercased (path/query case preserved, per RFC 3986)
    - fragment dropped
    - default ports dropped (http:80, https:443); other ports kept
    - leading ``www.`` dropped (``strip_www=False`` to keep)
    - trailing slashes on the path collapsed ('' → '/')
    - query parameters: tracking keys (utm_*, fbclid, gclid, msclkid, ref)
      and empty fragments removed, the rest sorted bytewise and re-joined

    This is the dedup-key normalization CommonCrawl-style pipelines apply
    before URL-level dedup (C4 keeps one page per URL); the reference's
    analogue is the identifier scrub it applies to every tag value
    (Influxer/GenericFile.cs:107). Pure ``pyspark.sql.functions`` — stays
    inside whole-stage codegen, no UDF, safe in a 100-TB scan projection.
    """
    u = _strip_fragment(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def pii_scrub(text: str | Column) -> dict[str, Column]:
    """Redact emails, IPv4 addresses, and phone-like digit runs with typed
    placeholders, counting each kind.

    Returns a dict of Columns: ``redacted`` plus BIGINT ``n_emails`` /
    ``n_ips`` / ``n_phones``. Redaction is staged (emails first, then IPs
    over the email-redacted text, then phones) so the three counts
    partition the matches deterministically — an address inside an email is
    counted once, as the email. All four outputs are pure regexp
    expressions over the RE2 ∩ Java pattern subset, so the DuckDB oracle
    runs the byte-identical patterns and the scan stays in codegen.
    """
    t = F.col(text) if isinstance(text, str) else text
    after_email = F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_PATTERN, "<IP>")
    after_phone = F.regexp_replace(after_ip, PHONE_PATTERN, "<PHONE>")
    return {
        "redacted": after_phone,
        "n_emails": F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long"),
        "n_ips": F.regexp_count(after_email, F.lit(IPV4_PATTERN)).cast("long"),
        "n_phones": F.regexp_count(after_ip, F.lit(PHONE_PATTERN)).cast("long"),
    }


def pii_scrub_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """DataFrame form of :func:`pii_scrub`:
    (id, n_emails, n_ips, n_phones, redacted)."""
    cols = pii_scrub(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        cols["n_emails"].alias("n_emails"),
        cols["n_ips"].alias("n_ips"),
        cols["n_phones"].alias("n_phones"),
        cols["redacted"].alias("redacted"),
    )


# C4 line- and page-level heuristics (Raffel et al. 2020 §2.2 and the
# tensorflow_datasets c4_utils reference implementation).  The policy-line
# substrings are C4's boilerplate list; the badword list is caller-supplied
# (C4 uses an external blocklist the engine does not embed).
C4_TERMINAL_LINE = r'[.!?"]$'
C4_POLICY_SUBSTRINGS = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)


def c4_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as pure Column exprs.

    Line level (a line survives iff ALL hold):
    - ends in a terminal punctuation mark (``. ! ? "``);
    - has ≥ ``min_words_per_line`` whitespace words (paper: 3);
    - does not contain the word "javascript" (case-insensitive);
    - does not contain a C4 policy-boilerplate substring.

    Page level: ``keep`` requires ≥ ``min_sentences`` sentences in the
    surviving text (terminal-mark count, paper: 5), no "lorem ipsum", no
    curly brace, and no caller-supplied badword.  (C4's fourth page rule —
    3-sentence-span dedup — is the corpus-level job of ``line_dedup`` /
    ``dedup.containment_pairs``.)

    Output: (id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    has_badword, keep, clean_text).  No shuffle, no UDF — the whole filter
    is one codegen stage and composes with downstream dedup at any scale;
    all counts are BIGINT so oracle parity is structural.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    low = F.lower
    kept = F.filter(
        lines,
        lambda l: F.trim(l).rlike(C4_TERMINAL_LINE)
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line)
        & ~low(l).contains("javascript")
        & ~sum(
            [low(l).contains(p).cast("int") for p in C4_POLICY_SUBSTRINGS],
            F.lit(0),
        ).cast("boolean"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]")).cast("long")
    has_lorem = low(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    has_bad = F.lit(False)
    for w in badwords:
        has_bad = has_bad | low(t).rlike(rf"\b{w}\b")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_badword"),
        (
            (n_sent >= min_sentences) & ~has_lorem & ~has_brace & ~has_bad
        ).alias("keep"),
        clean.alias("clean_text"),
    )
