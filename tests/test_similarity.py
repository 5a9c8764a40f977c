"""Unit tests for similarity search (brute-force cosine top-k + sign-LSH ANN)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_topk_ordering(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    rows = S.brute_topk(vecs, q, k=3).collect()
    got = [(r["rank"], r["vec_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == [(1, 1), (2, 2), (3, 3)]
    expected = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    (top_cos,) = [r["cos"] for r in rows if r["rank"] == 1]
    assert top_cos == pytest.approx(expected)


def test_brute_topk_excludes_self(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    assert all(r["vec_id"] != 0 for r in S.brute_topk(vecs, q, k=5).collect())


def test_lsh_bucket_deterministic(vecs):
    a = S.with_lsh_bucket(vecs, "embedding", dim=3, n_planes=6).collect()
    b = S.with_lsh_bucket(vecs, "embedding", dim=3, n_planes=6).collect()
    assert {r["vec_id"]: r["lsh_bucket"] for r in a} == {r["vec_id"]: r["lsh_bucket"] for r in b}


def test_lsh_bucket_separates_antipodes(vecs):
    buckets = {r["vec_id"]: r["lsh_bucket"] for r in
               S.with_lsh_bucket(vecs, "embedding", dim=3, n_planes=8).collect()}
    # an antipodal pair flips EVERY hyperplane sign → different bucket
    assert buckets[0] != buckets[4]
    assert 0 <= buckets[0] < 2**8


def test_lsh_ann_subset_of_brute(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    brute = {(r["query_id"], r["vec_id"]): r["cos"]
             for r in S.brute_topk(vecs, q, k=5).collect()}
    ann = S.lsh_ann(vecs, q, dim=3, n_planes=2, k=5).collect()
    assert len(ann) >= 1  # wide buckets (2 planes) must catch the near neighbor
    for r in ann:
        assert brute[(r["query_id"], r["vec_id"])] == pytest.approx(r["cos"], abs=0)
