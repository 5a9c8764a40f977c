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

from influxer_spark.operators.dedup import h32, normalize_text, shingle_hashes

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
