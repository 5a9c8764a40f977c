"""Unit tests for the web-corpus cleaning operators (line dedup, URL
canonicalization, PII redaction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from influxer_spark.operators import webclean as W


def test_line_dedup_removes_shared_lines(spark):
    boiler = "accept all cookies"
    df = spark.createDataFrame(
        [
            (1, f"{boiler}\nunique one\nmore text"),
            (2, f"{boiler}\nunique two"),
            (3, "all original\nhere"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r for r in W.line_dedup(df, "doc_id", "text").collect()
    }
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["text"] == "unique one\nmore text"  # order preserved
    assert out[2]["text"] == "unique two"
    assert out[3]["n_kept"] == 2 and out[3]["text"] == "all original\nhere"


def test_line_dedup_within_doc_repeat_not_removed(spark):
    # a line repeated inside ONE doc has doc_freq 1 — kept (corpus-level
    # boilerplate removal, not within-document dedup)
    df = spark.createDataFrame([(1, "x\nx\ny")], ["doc_id", "text"])
    r = W.line_dedup(df, "doc_id", "text").collect()[0]
    assert r["n_lines"] == 3 and r["n_kept"] == 3


def test_line_dedup_all_boilerplate_empty_text(spark):
    df = spark.createDataFrame([(1, "b"), (2, "b")], ["doc_id", "text"])
    out = {r["id"]: r for r in W.line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["n_kept"] == 0 and out[1]["text"] == ""


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], ["u"])
    return df.select(W.canonicalize_url("u").alias("c")).collect()[0]["c"]


def test_canonicalize_url_forms(spark):
    assert (
        _canon(spark, "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#f")
        == "http://example.com/a/b?a=1&b=2"
    )
    # non-default port kept; param order sorted bytewise; case of path kept
    assert (
        _canon(spark, "https://Host.org:8080/Path?z=1&A=2")
        == "https://host.org:8080/Path?A=2&z=1"
    )
    # empty path → '/', fragment-only tail dropped
    assert _canon(spark, "https://example.com#frag") == "https://example.com/"
    # https default port dropped, bare tracking key (no =value) dropped
    assert (
        _canon(spark, "https://example.com:443/x?fbclid&gclid=1&q=ok")
        == "https://example.com/x?q=ok"
    )
    # ref is a tracking key; refresh is NOT (prefix must match whole key)
    assert (
        _canon(spark, "https://e.com/?ref=tw&refresh=1")
        == "https://e.com/?refresh=1"
    )


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.org or c.d@e.co.uk ip 10.0.0.1 tel +1 555 010 99 x")],
        ["doc_id", "text"],
    )
    r = W.pii_scrub_df(df, "doc_id", "text").collect()[0]
    assert r["n_emails"] == 2
    assert r["n_ips"] == 1
    assert r["n_phones"] == 1
    assert "<EMAIL>" in r["redacted"] and "<IP>" in r["redacted"]
    assert "a@b.org" not in r["redacted"] and "10.0.0.1" not in r["redacted"]
    assert r["redacted"].endswith(" x")


def test_pii_scrub_no_pii_passthrough(spark):
    df = spark.createDataFrame([(1, "nothing to see here")], ["doc_id", "text"])
    r = W.pii_scrub_df(df, "doc_id", "text").collect()[0]
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)
    assert r["redacted"] == "nothing to see here"
