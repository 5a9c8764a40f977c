"""ExactSubstr span dedup (operators/exactsubstr.py) — hand-pinned
span-merge semantics and pass-through behavior."""

from __future__ import annotations

from influxer_spark.operators.exactsubstr import exact_substr_spans


def _rows(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = exact_substr_spans(df, "doc_id", "text", k=3, min_count=2)
    return {r["id"]: r for r in out.collect()}


def test_shared_boilerplate_span_removed(spark):
    boiler = "subscribe to our newsletter today"
    docs = [
        (1, f"alpha beta gamma {boiler} delta epsilon zeta"),
        (2, f"one two three four {boiler} five six"),
        (3, "totally unique words nowhere else repeated ever again"),
    ]
    out = _rows(spark, docs)
    # the 5-word boilerplate = three 3-grams, all duplicated -> one span
    assert out[1]["n_spans"] == 1 and out[1]["dup_words"] == 5
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon zeta"
    assert out[2]["clean_text"] == "one two three four five six"
    # untouched doc passes through whitespace-normalized
    assert out[3]["n_spans"] == 0 and out[3]["dup_words"] == 0
    assert out[3]["clean_text"] == docs[2][1]


def test_adjacent_spans_merge_and_full_cover(spark):
    # two docs that are complete copies: every position covered -> empty
    text = "a b c d e f g h"
    out = _rows(spark, [(1, text), (2, text)])
    for i in (1, 2):
        assert out[i]["n_spans"] == 1
        assert out[i]["dup_words"] == out[i]["n_words"] == 8
        assert out[i]["clean_text"] == ""


def test_short_docs_emit_no_grams(spark):
    out = _rows(spark, [(1, "just two"), (2, "just two")])
    assert out[1]["n_dup_grams"] == 0
    assert out[1]["clean_text"] == "just two"


def test_within_doc_repetition_counts(spark):
    # the duplicated 3-gram occurs twice INSIDE one doc
    out = _rows(spark, [(1, "x y z pad1 pad2 pad3 x y z tail")])
    r = out[1]
    assert r["n_dup_grams"] == 2 and r["n_spans"] == 2
    assert r["dup_words"] == 6
    assert r["clean_text"] == "pad1 pad2 pad3 tail"
