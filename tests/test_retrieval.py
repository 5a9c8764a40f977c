"""Unit tests for BM25 lexical retrieval."""

from __future__ import annotations

import math

from influxer_spark.operators import retrieval as R


def test_bm25_ranks_by_tf_and_idf(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
            (4, "rare filler filler filler filler"),
        ],
        ["doc_id", "text"],
    )
    out = R.bm25_topk(df, "doc_id", "text", ["spark", "rare"], k=10).collect()
    ids = [r["id"] for r in out]
    # doc 3 has no query term at all — absent
    assert 3 not in ids and len(out) == 3
    # 'rare' (df=1) outscores repeated 'spark' (df=2): idf dominates
    assert ids[0] == 4
    # among the 'spark' docs, higher tf wins
    assert ids.index(1) < ids.index(2)
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["n_hit_terms"] == 1 and by_id[4]["n_hit_terms"] == 1
    # score_q is the exact integer key; score its float rendering
    assert by_id[4]["score"] == by_id[4]["score_q"] / R.SCORE_SCALE


def test_bm25_score_matches_reference_formula(spark):
    # single doc, single term — check the closed-form number end to end
    df = spark.createDataFrame(
        [(1, "t a b c"), (2, "a b c d")], ["doc_id", "text"]
    )
    r = R.bm25_topk(df, "doc_id", "text", ["t"], k=1).collect()[0]
    idf_q = round(math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5)) * R.IDF_SCALE)
    k1, b = 1.2, 0.75
    expect = round(
        (idf_q / float(R.IDF_SCALE))
        * (1 * (k1 + 1.0))
        / (1 + k1 * ((1.0 - b) + b * 4 / (8 / 2)))
        * R.SCORE_SCALE
    )
    assert r["id"] == 1 and r["score_q"] == expect


def test_bm25_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(5)], ["doc_id", "text"]
    )
    out = R.bm25_topk(df, "doc_id", "text", ["same"], k=3).collect()
    assert [r["id"] for r in out] == [0, 1, 2]  # equal scores → id asc


def test_rrf_fuse_hand_example(spark):
    """RRF (k=60): doc in both lists beats a #1-in-one-list doc; ties break
    by id; docs missing from a list contribute 0 for it."""
    from influxer_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["id", "rank"])
    sem = spark.createDataFrame([(20, 1), (40, 2), (10, 3)], ["id", "rank"])
    out = rrf_fuse([("lex", lex), ("sem", sem)], k_const=60, topk=10).collect()
    rows = {r["id"]: r for r in out}
    assert [r["id"] for r in out][:2] == [20, 10]  # both-list docs first
    assert rows[20]["rrf"] == 1.0 / 62 + 1.0 / 61
    assert rows[10]["rrf"] == 1.0 / 61 + 1.0 / 63
    assert rows[30]["rrf"] == 1.0 / 63 and rows[30]["n_lists"] == 1
    assert rows[40]["rank_lex"] is None and rows[40]["rank_sem"] == 2
    assert rows[30]["id"] < rows[40]["id"] or rows[30]["rrf"] != rows[40]["rrf"]


def test_rrf_fuse_requires_lists(spark):
    import pytest as _pytest

    from influxer_spark.operators.retrieval import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])
