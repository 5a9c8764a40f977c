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


def test_c4_rules_line_and_page_level(spark):
    """C4 §2.2: every line rule and page rule pinned on a hand-built page."""
    from influxer_spark.operators.webclean import c4_rules

    page = "\n".join(
        [
            "This is a good first sentence.",        # kept
            "Short one.",                             # 2 words -> dropped
            "no terminal punctuation here",           # dropped
            "Please enable JavaScript to continue.",  # javascript -> dropped
            "Read our privacy policy for details.",   # policy -> dropped
            'A quoted line counts as terminal."',     # kept (quote terminal)
            "Another real sentence right here!",      # kept
            "Is this a question or what?",            # kept
            "And one final closing sentence.",        # kept
        ]
    )
    df = spark.createDataFrame([(1, page)], ["doc_id", "text"])
    r = c4_rules(df, "doc_id", "text").collect()[0]
    assert r["n_lines"] == 9
    assert r["n_kept"] == 5
    assert r["n_sentences"] == 5
    assert not r["has_lorem"] and not r["has_brace"] and not r["has_badword"]
    assert r["keep"]  # exactly at the 5-sentence floor
    assert "JavaScript" not in r["clean_text"]
    assert "privacy policy" not in r["clean_text"]

    # page-level rules each kill an otherwise-clean page
    rows = [
        (2, page + "\nSome Lorem Ipsum filler text."),
        (3, page + "\nif (x) { return; }."),
        (4, page.replace("final closing", "merely fourth") + "\nnope"),
    ]
    df2 = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in c4_rules(df2, "doc_id", "text", badwords=("nope",)).collect()
    }
    assert out[2]["has_lorem"] and not out[2]["keep"]
    assert out[3]["has_brace"] and not out[3]["keep"]
    assert out[4]["has_badword"] and not out[4]["keep"]
