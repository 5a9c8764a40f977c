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

    One numpy matmul per Arrow batch: (batch × dim) @ (dim × planes) → signs
    → packed int.  That is the whole cost — no shuffle, no per-row Python.
    """
    planes = _hyperplanes(dim, n_planes)
    weights = (2 ** np.arange(n_planes)).astype(np.int64)

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        signs = (m @ planes) > 0
        return pd.Series(signs @ weights)

    return df.withColumn("lsh_bucket", bucket(F.col(vec_col)))


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
