"""Exact Gram summary + PCA/whitening (operators/pca.py).

Contract: gram_exact's two paths (mapInPandas partial vs explode/join
reference) are bit-identical integer sums; pca_fit matches numpy run
directly on the quantized data; projection/whitening have the textbook
properties (variance = eigenvalue, whitened variance = 1, reconstruction
improves with k).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import pca


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def local(vecs):
    rows = vecs.orderBy("vec_id").collect()
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def _gram_dict(df):
    return {
        (r["i"], r["j"]): (r["n"], r["sum_qi"], r["sum_qj"], r["sum_qq"])
        for r in df.collect()
    }


def test_partial_equals_explode(vecs):
    a = _gram_dict(pca.gram_exact(vecs, "embedding", method="partial"))
    b = _gram_dict(
        pca.gram_exact(vecs, "embedding", method="explode", id_col="vec_id")
    )
    assert a == b
    assert len(a) == 64 * 65 // 2


def test_gram_matches_numpy(vecs, local):
    q = np.floor(local * 1024 + 0.5).astype(np.int64)
    got = _gram_dict(pca.gram_exact(vecs, "embedding"))
    n = len(q)
    for (i, j) in [(0, 0), (0, 1), (3, 60), (63, 63)]:
        assert got[(i, j)] == (
            n,
            int(q[:, i].sum()),
            int(q[:, j].sum()),
            int((q[:, i] * q[:, j]).sum()),
        )


def test_partial_overflow_guard(spark):
    big = spark.createDataFrame(
        [(i, [2.0e6, -2.0e6]) for i in range(600)], ["id", "v"]
    ).coalesce(1)
    with pytest.raises(Exception, match="overflow int64"):
        pca.gram_exact(big, "v", scale=1024).collect()


def test_fit_matches_numpy_eigh(vecs, local):
    q = np.floor(local * 1024 + 0.5)
    mean, comps, vals, n = pca.pca_fit(pca.gram_exact(vecs, "embedding"), k=8)
    assert n == len(q)
    np.testing.assert_allclose(mean, q.mean(axis=0), rtol=0, atol=1e-9)
    cov = np.cov(q, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    np.testing.assert_allclose(vals, w[::-1][:8], rtol=1e-9)
    for r in range(8):
        ref = v[:, ::-1][:, r]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[r], ref, atol=1e-8)


def test_projection_variance_is_eigenvalue(vecs, local):
    gram = pca.gram_exact(vecs, "embedding")
    mean, comps, vals, _ = pca.pca_fit(gram, k=4)
    out = pca.pca_project(vecs, "vec_id", "embedding", mean, comps)
    p = np.stack([np.asarray(r["proj"]) for r in out.collect()])
    # projection is in INPUT units: variance = eigval(q-units) / scale²
    np.testing.assert_allclose(
        p.var(axis=0, ddof=0), vals / 1024.0**2, rtol=1e-9
    )
    np.testing.assert_allclose(p.mean(axis=0), 0.0, atol=1e-12)


def test_whitened_projection_has_unit_variance(vecs):
    gram = pca.gram_exact(vecs, "embedding")
    mean, comps, vals, _ = pca.pca_fit(gram, k=4)
    out = pca.pca_project(vecs, "vec_id", "embedding", mean, comps, eigvals=vals)
    p = np.stack([np.asarray(r["proj"]) for r in out.collect()])
    np.testing.assert_allclose(p.var(axis=0, ddof=0), 1.0, rtol=1e-9)


def test_opq_rotation_is_orthogonal_and_preserves_dots(spark, vecs, local):
    gram = pca.gram_exact(vecs, "embedding")
    R = pca.opq_rotation(gram, m=8)
    np.testing.assert_allclose(R @ R.T, np.eye(64), atol=1e-10)
    rot = pca.rotate_embeddings(vecs, "vec_id", "embedding", R)
    got = {r["vec_id"]: np.asarray(r["embedding"]) for r in rot.collect()}
    ids = sorted(got)[:20]
    raw = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in vecs.collect()}
    for a in ids[:5]:
        for b in ids[5:10]:
            np.testing.assert_allclose(
                got[a] @ got[b], raw[a] @ raw[b], rtol=1e-9, atol=1e-9
            )


def test_opq_balances_subspace_variance(spark):
    # strongly anisotropic data: variance 100:1 across halves of the dims
    rng = np.random.default_rng(5)
    v = rng.standard_normal((400, 8))
    v[:, :4] *= 10.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v[i]]) for i in range(400)], ["id", "e"]
    )
    gram = pca.gram_exact(df, "e", scale=1024)
    _, _, vals, _ = pca.pca_fit(gram, k=8)
    R = pca.opq_rotation(gram, m=2)
    assert R.shape == (8, 8)
    # replay the greedy allocation; its subspace log-variance-product
    # spread must beat the naive in-eigen-order split (which puts all
    # four large eigenvalues in one subspace on this data)
    buckets, load = [[], []], [0.0, 0.0]
    for i in range(8):
        j = min((j for j in range(2) if len(buckets[j]) < 4),
                key=lambda j: load[j])
        buckets[j].append(i)
        load[j] += float(np.log(max(vals[i], 1e-18)))
    naive = abs(float(sum(np.log(vals[:4])) - sum(np.log(vals[4:]))))
    assert abs(load[0] - load[1]) < naive
    # and the rotation's rows really are the permuted eigenvectors:
    # subspace 0's rows span the dims buckets[0] picked
    _, comps, _, _ = pca.pca_fit(gram, k=8)
    np.testing.assert_allclose(R[:4], comps[buckets[0]], atol=1e-12)


def test_reconstruction_error_decreases_with_k(vecs, local):
    q = np.floor(local * 1024 + 0.5)
    gram = pca.gram_exact(vecs, "embedding")
    errs = []
    for k in (2, 8, 32, 64):
        mean, comps, vals, _ = pca.pca_fit(gram, k=k)
        c = (q - mean) @ comps.T
        rec = c @ comps + mean
        errs.append(float(((q - rec) ** 2).sum()))
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < 1e-6 * errs[0]  # full-rank reconstruction ≈ exact
