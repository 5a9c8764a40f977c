"""Measure recall@k of every ANN variant against exact brute-force cosine.

The contract queries prove VALUES are right; this tool reports how much of
the exact top-k each approximate index retrieves — the honest accuracy
number an ANN needs alongside its speed story.  Deterministic (seeded
structures, fixed query set).

Usage: python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from influxer_spark.operators import similarity as S  # noqa: E402
from influxer_spark.session import get_spark  # noqa: E402


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & e) for q, e in exact.items())
    total = sum(len(e) for e in exact.values())
    return hits / total


def clustered_vecs(spark, n: int = 2000, dim: int = 64, centers: int = 50):
    """Deterministic clustered embeddings — the realistic corpus case
    (documents cluster by topic).  Isotropic random vectors (the synthetic
    testdata) are the information-theoretically WORST case for any ANN:
    all pairwise cosines concentrate near 0 and the true top-k is noise,
    so bucketing recall there is a floor, not the expected operating
    point."""
    rng = np.random.default_rng(7)
    cent = rng.standard_normal((centers, dim))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    assign = rng.integers(0, centers, size=n)
    m = cent[assign] + 0.15 * rng.standard_normal((n, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(n)],
        ["vec_id", "embedding"],
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-recall", cores=8)
    if sf_dir == "--clustered":
        vecs = clustered_vecs(spark)
        vecs.cache().count()
    else:
        vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = vecs.count()
    queries = vecs.filter(F.col("vec_id") % 100 == 0)
    nq = queries.count()
    dim = len(vecs.select("embedding").first()[0])

    exact = topk_sets(S.brute_topk(vecs, queries, k=k).collect())

    # trained structures from the full (bounded) embedding set — the faiss
    # train-on-sample flow; at corpus scale this is a driver-side sample
    mat = np.asarray(
        [r[0] for r in vecs.select("embedding").collect()], dtype=np.float64
    )
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n_lists = max(4, int(np.sqrt(n)))
    trained_cent = S.kmeans_centroids(mat, n_lists)
    rand_cent = S.ivf_random_centroids(dim, 8)
    books_rand = S.pq_random_codebooks(dim, m=8, ksub=16)
    books_trained = S.pq_train_codebooks(mat, m=8, ksub=16)
    # OPQ-lite (parametric init, Ge et al. CVPR 2013): PCA-rotate with
    # eigenvalue allocation so the 8 subquantizers see balanced variance;
    # rotation is orthogonal → cosine scores unchanged, recall measured
    # in the ORIGINAL id space
    from influxer_spark.operators import pca as P

    gram = P.gram_exact(vecs, "embedding")
    R = P.opq_rotation(gram, m=8)
    vecs_rot = P.rotate_embeddings(vecs, "vec_id", "embedding", R)
    vecs_rot.cache().count()
    queries_rot = vecs_rot.filter(F.col("vec_id") % 100 == 0)
    books_opq = S.pq_train_codebooks(mat @ R.T, m=8, ksub=16)
    # faiss IndexIVFPQ trains the PQ on RESIDUALS (vec - coarse centroid),
    # not raw vectors — mirror that for the residual variant
    assign = np.argmax(mat @ trained_cent.T, axis=1)
    books_resid = S.pq_train_codebooks(mat - trained_cent[assign], m=8, ksub=16)

    variants = {
        f"lsh_ann(8 planes, {2**8} buckets)": S.lsh_ann(
            vecs, queries, dim=dim, n_planes=8, k=k
        ),
        "lsh_ann(4 planes, 16 buckets)": S.lsh_ann(
            vecs, queries, dim=dim, n_planes=4, k=k
        ),
        "ivf_ann(8 rand lists, probe 2)": S.ivf_ann(
            vecs, queries, centroids=rand_cent, n_probe=2, k=k
        ),
        f"ivf_ann({n_lists} kmeans lists, probe 2)": S.ivf_ann(
            vecs, queries, centroids=trained_cent, n_probe=2, k=k
        ),
        f"ivf_ann({n_lists} kmeans lists, probe 4)": S.ivf_ann(
            vecs, queries, centroids=trained_cent, n_probe=4, k=k
        ),
        "pq_adc(m=8, ksub=16, rand books)": S.pq_adc_topk(
            vecs, queries, books_rand, k=k
        ),
        "pq_adc(m=8, ksub=16, trained books)": S.pq_adc_topk(
            vecs, queries, books_trained, k=k
        ),
        "pq_adc(m=8, ksub=16, OPQ-rotated)": S.pq_adc_topk(
            vecs_rot, queries_rot, books_opq, k=k
        ),
        f"ivf_pq({n_lists} kmeans, probe 4, trained, raw)": S.ivf_pq_topk(
            vecs, queries, trained_cent, books_trained, n_probe=4, k=k
        ),
        f"ivf_pq({n_lists} kmeans, probe 4, trained, residual)": S.ivf_pq_topk(
            vecs, queries, trained_cent, books_resid, n_probe=4, k=k,
            residual=True,
        ),
    }
    print(f"n={n} queries={nq} k={k} (recall@{k} vs exact cosine)")
    for name, df in variants.items():
        r = recall(topk_sets(df.collect()), exact)
        print(f"  {r:6.3f}  {name}")


if __name__ == "__main__":
    main()
