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
