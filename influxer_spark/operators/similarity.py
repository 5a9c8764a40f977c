"""Approximate-nearest-neighbor / similarity search over embedding columns.

- ``brute_topk``   exact cosine top-k: broadcast the (small) query set against
                   the corpus — the correctness baseline and the within-bucket
                   kernel of every ANN variant.
- ``lsh_ann``      sign-LSH (random hyperplane) bucketing: vectors hash to a
                   b-bit sign code; search only the query's bucket.  The
                   bucket assignment is a vectorized pandas UDF (numpy matmul
                   over Arrow batches — no per-row Python); hyperplanes are
                   seeded, so results are deterministic.

Scale notes (100 TB posture):
- brute_topk is a broadcast-nested-loop by design: the QUERY side is tiny
  (broadcast), the corpus streams once, and the per-partition top-k is folded
  by the final window — no corpus shuffle at all until the (queries × k)-sized
  aggregate.  At 10^12 vectors this is the scan-bound scatter-gather every
  vector DB does for exact search.
- lsh_ann reduces the scan to matching buckets: corpus bucketing is
  embarrassingly parallel, the join shuffles on the bucket code, and recall
  is tuned by ``n_planes`` (fewer bits → bigger buckets → higher recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from influxer_spark.operators.dedup import dot_f64

LSH_SEED = 42


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, rank, vec_id, cos) with rank 1..k by (cos desc, vec_id
    asc) — the tiebreak makes the ordering fully deterministic.  Self-matches
    (query_id == vec_id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(dot_f64(F.col(vec_col), F.col(vec_col))).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(dot_f64(F.col(vec_col), F.col(vec_col))).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (dot_f64(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic random hyperplanes (seeded standard normals)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((dim, n_planes))


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
) -> DataFrame:
    """Attach a sign-LSH bucket code (int) to every row.

    Pure Column expressions: one left-to-right fold dot product per plane
    (plane inlined as an array literal), sign bits packed into a long.  All
    JVM-side — no Python in the bucketing path at all — and bit-identical to
    the DuckDB oracle's sequential ``list_reduce`` sum, which is what makes
    the LSH contract query value-oracle-able (a BLAS matmul's pairwise
    summation could flip the sign of a near-zero dot product; a sequential
    fold cannot diverge from the oracle's identical fold).
    """
    planes = _hyperplanes(dim, n_planes)
    vec = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in planes[:, p]])
        bit = F.when(dot_f64(vec, plane_lit) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit * F.lit(int(2**p))).cast("long")
    return df.withColumn("lsh_bucket", bucket)


def ivf_random_centroids(dim: int, n_lists: int, seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic unit-norm random centroids — the data-independent coarse
    quantizer.  Data-independence is what makes the IVF contract query
    oracle-able: the same literals are inlined into the DuckDB SQL."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def kmeans_centroids(
    sample: np.ndarray, n_lists: int, iters: int = 10, seed: int = LSH_SEED
) -> np.ndarray:
    """Driver-side Lloyd k-means over a bounded sample — the trained coarse
    quantizer for production IVF (train on a collected sample, broadcast the
    centroids; the classic faiss-style flow).  Deterministic: seeded init,
    fixed iteration count, empty clusters re-seeded from the sample."""
    rng = np.random.default_rng(seed)
    sample = np.asarray(sample, dtype=np.float64)
    cent = sample[rng.choice(len(sample), n_lists, replace=False)].copy()
    for _ in range(iters):
        d = sample @ cent.T  # cosine-proportional for normalized input
        assign = np.argmax(d, axis=1)
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
            else:
                cent[j] = sample[rng.integers(len(sample))]
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _ivf_scores_udf(centroids: np.ndarray):
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def ranked_lists(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        scores = (m @ cent.T) / np.maximum(norms, 1e-12)  # cosine (cent unit)
        # argsort desc with stable ties → equal scores keep ascending list id,
        # matching the oracle's ORDER BY score DESC, cid ASC
        order = np.argsort(-scores, axis=1, kind="stable")
        return pd.Series([row.astype("int32").tolist() for row in order])

    return ranked_lists


def with_ivf_list(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """Assign each vector to its nearest centroid list (one numpy matmul per
    Arrow batch; centroids ride into the workers as a closure broadcast)."""
    ranked = _ivf_scores_udf(centroids)
    return df.withColumn("ivf_list", ranked(F.col(vec_col)).getItem(0))


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    dim: int = 64,
    n_lists: int = 8,
    n_probe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors land in their nearest centroid's
    inverted list; each query scans only its ``n_probe`` nearest lists.

    Scale shape: list assignment is a narrow vectorized pass; the search join
    shuffles on the (small-cardinality) list id; recall is tuned by
    n_probe/n_lists.  At 10^12 vectors the inverted lists are the partition
    keys of the vector table — probing is partition pruning.
    """
    if centroids is None:
        centroids = ivf_random_centroids(dim, n_lists)
    cb = with_ivf_list(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")),
        "cvec", centroids,
    )
    ranked = _ivf_scores_udf(centroids)
    qb = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
        .withColumn("_probes", F.slice(ranked(F.col("qvec")), 1, n_probe))
        .withColumn("ivf_list", F.explode("_probes"))
        .drop("_probes")
    )
    scored = (
        cb.join(qb, on="ivf_list")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                dot_f64(F.col("qvec"), F.col("cvec"))
                / (
                    F.sqrt(dot_f64(F.col("qvec"), F.col("qvec")))
                    * F.sqrt(dot_f64(F.col("cvec"), F.col("cvec")))
                )
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's bucket.

    Recall < 1 by construction (neighbors across a hyperplane are missed);
    deterministic given the seed.  The corpus/queries join shuffles on the
    bucket code — 2^n_planes buckets bound the fan-out.
    """
    cb = with_lsh_bucket(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")),
        "cvec", dim, n_planes,
    )
    qb = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec", dim, n_planes,
    )
    scored = (
        cb.join(qb, on="lsh_bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                dot_f64(F.col("qvec"), F.col("cvec"))
                / (
                    F.sqrt(dot_f64(F.col("qvec"), F.col("qvec")))
                    * F.sqrt(dot_f64(F.col("cvec"), F.col("cvec")))
                )
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
