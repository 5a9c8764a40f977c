"""Text-analysis operators for training-data curation.

The reference's per-column transform pipeline (SURVEY §2.3) is a scalar
string-processing stage; these are its corpus-curation analogues, all pure
Column expressions (whole-stage codegen, zero UDFs):

- ``token_stats``       whitespace token count + BPE-ish regex token count.
- ``quality_features``  length / punctuation-ratio / stopword-ratio features
                        and a combined quality score.
- ``langid``            n-gram (stopword-hit) language heuristic with a fixed
                        priority tiebreak — deterministic, oracle-replicable.
- ``fingerprints``      document fingerprinting: md5 of normalized text +
                        min-shingle-hash ("winnowing-lite") + prefix hash.

Determinism: every ratio is int/int IEEE division and every score combines
the same operands in the same order as the oracle SQL, so values are
bit-identical across engines.  Scale: narrow per-row expressions — no
shuffle at all until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from influxer_spark.operators.dedup import (
    h32,
    normalize_text,
    shingle_hashes,
    word_shingles,
)

# language → distinctive-stopword alternation (shared with the oracle SQL)
LANG_PATTERNS: dict[str, str] = {
    "en": r"\b(the|a|of|and|to|in|is)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
    "fr": r"\b(le|la|les|et|est|un)\b",
    "es": r"\b(el|los|las|y|es|un)\b",
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # argmax tiebreak order

STOPWORD_PATTERN = LANG_PATTERNS["en"]
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"


def n_words(col: Column) -> Column:
    return F.size(F.split(F.trim(col), r"\s+"))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens) — whitespace vs regex-BPE tokenization."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        n_words(t).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_PATTERN)).cast("long").alias("n_bpe_tokens"),
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features + combined score.

    score = 0.5*stop_ratio + 0.3*min(n_words,500)/500 − 0.2*punct_ratio —
    a simple linear heuristic; what matters is that it is the same IEEE
    expression in Spark and in the oracle.
    """
    t = F.col(text_col)
    nc = F.length(t).cast("long")
    nw = n_words(t).cast("long")
    npunct = F.regexp_count(t, F.lit(PUNCT_PATTERN)).cast("long")
    nstop = F.regexp_count(t, F.lit(STOPWORD_PATTERN)).cast("long")
    stop_ratio = nstop / nw
    punct_ratio = npunct / nc
    length_score = F.least(nw, F.lit(500)) / F.lit(500)
    return df.select(
        F.col(id_col).alias("id"),
        nc.alias("n_chars_m"),
        nw.alias("n_words"),
        npunct.alias("n_punct"),
        nstop.alias("n_stop"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        (stop_ratio * 0.5 + length_score * 0.3 - punct_ratio * 0.2).alias("quality"),
    )


def langid_scores(col: Column) -> dict[str, Column]:
    return {
        lang: F.regexp_count(col, F.lit(pat)).cast("long")
        for lang, pat in LANG_PATTERNS.items()
    }


def predicted_lang(col: Column) -> Column:
    """Argmax of per-language stopword hits; ties resolve by LANG_PRIORITY;
    all-zero → 'und'."""
    scores = langid_scores(col)
    expr = F.lit("und")
    # build the CASE from lowest priority up so higher priority wins ties
    for lang in reversed(LANG_PRIORITY):
        others = [scores[o] for o in LANG_PRIORITY if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def langid(df: DataFrame, text_col: str, label_col: str | None = None) -> DataFrame:
    """Confusion counts (label_lang, pred_lang, n_docs); label-less if None."""
    pred = predicted_lang(F.col(text_col)).alias("pred_lang")
    keys = ([F.col(label_col).alias("label_lang")] if label_col else []) + [pred]
    return df.groupBy(*keys).agg(F.count("*").alias("n_docs"))


def _top_multiplicity(arr: Column) -> Column:
    """Max multiplicity of any element of ``arr`` — the longest run in the
    sorted array.  O(n log n) per row, pure codegen: boundary positions where
    adjacent sorted elements differ, then max gap between boundaries.  Keeps
    the whole computation row-local (no explode → no shuffle)."""
    s = F.array_sort(arr)
    n = F.size(s)
    bounds = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i > F.lit(0)) & (F.get(s, i) != F.get(s, i - 1)),
    )
    full = F.concat(F.array(F.lit(0)), bounds, F.array(n))
    m = F.size(full)
    return F.array_max(
        F.zip_with(F.slice(full, 1, m - 1), F.slice(full, 2, m - 1), lambda a, b: b - a)
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1):
    duplicate-word fraction, top-unigram fraction, top-bigram fraction — the
    standard "is this page boilerplate/spam?" filters for crawl curation.

    (doc_id, n_words, n_distinct_words, top_word_cnt, dup_word_frac,
    top_word_frac, n_bigrams, top_bigram_cnt, top_bigram_frac)

    Scale: zero shuffles — every statistic is computed inside the row via
    array expressions (`_top_multiplicity`), so the operator is a pure map
    over the corpus scan; the alternative explode→groupBy(doc, gram) plan
    shuffles the entire tokenized corpus twice.  Per-row cost is
    O(words · log words), bounded by document length, independent of corpus
    size.  Every ratio is long/long IEEE division with identical operand
    order in the oracle SQL, so values are bit-exact across engines.
    """
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    bigrams = word_shingles(t, 2)
    nw = F.size(words).cast("long")
    nd = F.size(F.array_distinct(words)).cast("long")
    top_w = _top_multiplicity(words).cast("long")
    nb = F.size(bigrams).cast("long")
    top_b = _top_multiplicity(bigrams).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        nw.alias("n_words"),
        nd.alias("n_distinct_words"),
        top_w.alias("top_word_cnt"),
        ((nw - nd) / nw).alias("dup_word_frac"),
        (top_w / nw).alias("top_word_frac"),
        nb.alias("n_bigrams"),
        top_b.alias("top_bigram_cnt"),
        (top_b / nb).alias("top_bigram_frac"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp_md5, fp_minshingle, fp_prefix) — three fingerprint flavors:
    whole-document, content-sampled (min 3-gram shingle hash, the 1-perm
    MinHash used by winnowing), and head-anchored (first 64 normalized chars).
    """
    t = F.col(text_col)
    norm = normalize_text(t)
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("fp_md5"),
        F.array_min(shingle_hashes(t, k=3)).alias("fp_minshingle"),
        h32(F.substring(norm, 1, 64)).alias("fp_prefix"),
    )


# Gopher quality-rule stopwords (Rae et al. 2021 §A1.1, public): a document
# must contain at least two of these to pass the "stop word" rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-rule quality filter (Rae et al. 2021, Appendix A1.1) — the
    standard web-corpus document filter, as pure Column expressions:

    - ``min_words`` ≤ word count ≤ 100,000  (paper default 50)
    - 3 ≤ mean word length ≤ 10
    - symbol-to-word ratio ≤ 0.1  (symbols: ``#`` and ``...``)
    - ≤ 90% of lines start with a bullet; ≤ 30% of lines end with "..."
    - ≥ 80% of words contain at least one alphabetic character
    - ≥ ``min_stop_hits`` distinct Gopher stopwords present (default 2)

    The two floor thresholds are parameters because corpora with short
    documents (or non-English heavy) tune them; the paper defaults stay
    the defaults.

    Returns per-doc features + per-rule flags + the combined ``keep``.
    Every ratio is BIGINT/BIGINT IEEE division (oracle-exact); no shuffle —
    the filter composes with any downstream dedup/sampling stage at scale.
    """
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    lines = F.split(t, "\n")
    nw = F.size(words).cast("long")
    nl = F.size(lines).cast("long")
    sum_wl = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_wl = sum_wl / nw
    n_sym = (
        F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\."))
    ).cast("long")
    sym_ratio = n_sym / nw
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    ).cast("long")
    n_ell = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))
    ).cast("long")
    bullet_ratio = n_bullet / nl
    ellipsis_ratio = n_ell / nl
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    alpha_ratio = n_alpha / nw
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = (F.regexp_count(t, F.lit(rf"\b{w}\b")) > 0).cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit

    f_words = (nw >= min_words) & (nw <= 100_000)
    f_mwl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    f_sym = sym_ratio <= 0.1
    f_bullet = bullet_ratio <= 0.9
    f_ell = ellipsis_ratio <= 0.3
    f_alpha = alpha_ratio >= 0.8
    f_stop = stop_hits >= min_stop_hits
    return df.select(
        F.col(id_col).alias("id"),
        nw.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        f_words.alias("ok_words"),
        f_mwl.alias("ok_mean_word_len"),
        f_sym.alias("ok_symbols"),
        f_bullet.alias("ok_bullets"),
        f_ell.alias("ok_ellipsis"),
        f_alpha.alias("ok_alpha"),
        f_stop.alias("ok_stopwords"),
        (
            f_words & f_mwl & f_sym & f_bullet & f_ell & f_alpha & f_stop
        ).alias("keep"),
    )
