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


def test_ivf_deterministic_and_scored_exactly(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    cent = S.ivf_random_centroids(3, 4)
    a = S.ivf_ann(vecs, q, centroids=cent, n_probe=2, k=5).collect()
    b = S.ivf_ann(vecs, q, centroids=cent, n_probe=2, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # within probed lists the cosine is exact — must agree with brute force
    brute = {(r["query_id"], r["vec_id"]): r["cos"]
             for r in S.brute_topk(vecs, q, k=10).collect()}
    for r in a:
        assert brute[(r["query_id"], r["vec_id"])] == pytest.approx(r["cos"], abs=0)


def test_ivf_full_probe_equals_brute(vecs):
    """Probing every list makes IVF exhaustive: identical to brute top-k."""
    q = vecs.filter(F.col("vec_id") == 0)
    cent = S.ivf_random_centroids(3, 4)
    ivf = S.ivf_ann(vecs, q, centroids=cent, n_probe=4, k=5).collect()
    brute = S.brute_topk(vecs, q, k=5).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in brute]


def test_kmeans_centroids_deterministic_and_unit_norm():
    import numpy as np

    rng = np.random.default_rng(7)
    sample = rng.standard_normal((200, 8))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    a = S.kmeans_centroids(sample, 4)
    b = S.kmeans_centroids(sample, 4)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
    # trained centroids should beat random ones on mean best-cosine
    rand = S.ivf_random_centroids(8, 4)
    assert (sample @ a.T).max(axis=1).mean() >= (sample @ rand.T).max(axis=1).mean()
