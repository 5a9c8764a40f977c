"""Unit tests for text-analysis operators (tokens / quality / langid /
fingerprints)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import textstats as T


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a b  c"), (3, "don't stop! 42 times")],
        ["doc_id", "text"],
    )
    out = {r["id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in
           T.token_stats(df, "doc_id", "text").collect()}
    assert out[1] == (2, 2)
    assert out[2] == (3, 3)           # double space collapses in \s+ split
    # don ' t stop ! 42 times → 7 BPE-ish tokens, 4 whitespace tokens
    assert out[3] == (4, 7)


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "the cat and the dog!")], ["doc_id", "text"])
    r = T.quality_features(df, "doc_id", "text").collect()[0]
    assert r["n_words"] == 5
    assert r["n_stop"] == 3            # the, and, the
    assert r["n_punct"] == 1
    assert r["stop_ratio"] == 3 / 5
    assert r["punct_ratio"] == 1 / r["n_chars_m"]
    expected = (3 / 5) * 0.5 + (5 / 500) * 0.3 - (1 / r["n_chars_m"]) * 0.2
    assert r["quality"] == pytest.approx(expected, abs=0)


def test_predicted_lang(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund und die katze ist ein tier"),
            (3, "le chat et la maison est un endroit"),
            (4, "el perro y los gatos es un animal"),
            (5, "xyzzy qwerty zzz"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pred"] for r in
           df.select("doc_id", T.predicted_lang(F.col("text")).alias("pred")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_langid_confusion_shape(spark):
    df = spark.createDataFrame(
        [("en", "the cat is here"), ("en", "the dog is there"), ("de", "der hund und")],
        ["lang", "text"],
    )
    rows = T.langid(df, "text", label_col="lang").collect()
    conf = {(r["label_lang"], r["pred_lang"]): r["n_docs"] for r in rows}
    assert conf[("en", "en")] == 2
    assert conf[("de", "de")] == 1


def test_fingerprints_stable_under_case_and_space(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different text")],
        ["doc_id", "text"],
    )
    fps = {r["id"]: r for r in T.fingerprints(df, "doc_id", "text").collect()}
    assert fps[1]["fp_md5"] == fps[2]["fp_md5"]
    assert fps[1]["fp_prefix"] == fps[2]["fp_prefix"]
    assert fps[1]["fp_md5"] != fps[3]["fp_md5"]
    # minshingle fingerprint is case-sensitive (content-level, not normalized)
    assert fps[1]["fp_minshingle"] != fps[2]["fp_minshingle"]


def test_repetition_stats_known_values(spark):
    # "a a a b": words a×3 b×1; bigrams "a a"×2, "a b"×1
    df = spark.createDataFrame([(1, "a a a b"), (2, "x")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           T.repetition_stats(df, "doc_id", "text").collect()}
    r = out[1]
    assert (r["n_words"], r["n_distinct_words"], r["top_word_cnt"]) == (4, 2, 3)
    assert r["dup_word_frac"] == 2 / 4
    assert r["top_word_frac"] == 3 / 4
    assert (r["n_bigrams"], r["top_bigram_cnt"]) == (3, 2)
    assert r["top_bigram_frac"] == 2 / 3
    # single-word doc: one word, one fallback "bigram" (the whole doc)
    s = out[2]
    assert (s["n_words"], s["n_distinct_words"], s["top_word_cnt"]) == (1, 1, 1)
    assert (s["n_bigrams"], s["top_bigram_cnt"]) == (1, 1)


def test_top_multiplicity_matches_python(spark):
    import collections
    rows = [
        (1, "q w e r t y q w q"),
        (2, "z z z z"),
        (3, "one two three four five six"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["top_word_cnt"] for r in
           T.repetition_stats(df, "doc_id", "text").collect()}
    for i, text in rows:
        assert got[i] == max(collections.Counter(text.split()).values()), i


def test_gopher_quality_rules(spark):
    from influxer_spark.operators.textstats import gopher_quality

    good = ("the quick brown fox jumps over the lazy dog and runs off to be "
            "seen with many other words that have quite reasonable shape "
            * 5)
    short = "too few words to pass"
    symbols = "the be to of and that have with " + "# " * 40 + "word " * 50
    rows = [(1, good), (2, short), (3, symbols)]
    out = {r["id"]: r for r in gopher_quality(
        spark.createDataFrame(rows, ["doc_id", "text"]), "doc_id", "text"
    ).collect()}

    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_words"] is False
    assert out[3]["keep"] is False and out[3]["ok_symbols"] is False
    # ratios are plain IEEE divisions of integer counts
    assert out[1]["alpha_ratio"] == 1.0
    assert out[1]["stop_hits"] >= 2
