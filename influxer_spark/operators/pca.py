"""Exact distributed Gram/covariance + PCA / whitening over embeddings.

Dimensionality reduction is the missing primitive between the embedding
column and half the engine's similarity stack: IVF coarse quantizers,
PQ codebooks, and semantic-dedup clustering all get cheaper and better
conditioned after projecting 64-dim (or 768-dim) vectors onto the top-k
principal directions, and whitening is the standard pre-step for
embedding near-dup thresholds to mean the same thing across corpora.

The Spark-shaped decomposition (classic "summarize then solve"):

1. ``gram_exact`` — ONE corpus pass computing the d×d Gram matrix, the
   per-dimension sums, and the row count.  Components are quantized to
   integers first (``floor(x·scale + 0.5)``, the engine's established
   quantize idiom), so every aggregate is an EXACT integer sum —
   order-independent, hence bit-identical between the scale path, the
   reference path, and the DuckDB oracle (float sums would differ in
   the last ulp under Spark's nondeterministic reduce order).
   - ``method="partial"`` (default, the 100 TB path): Arrow-batched
     ``mapInPandas`` accumulates one int64 ``qᵀq`` per partition (a
     d×d numpy matmul per batch — BLAS, not Python loops) and emits a
     single partial row per partition; the ≤ num-partitions partials
     are summed on the driver in arbitrary-precision Python ints.  No
     shuffle at all; network cost is partitions × d² longs.
   - ``method="explode"`` — the reference kernel: posexplode to
     (row, i, qᵢ), self-join on the row id, groupBy (i, j).  A d²
     row-blowup, kept because it is the shape the SQL oracle can
     express; the property tests pin both paths identical.
2. ``pca_fit`` — driver-side eigendecomposition of the d×d covariance
   assembled from the exact sums (d is bounded; this is the standard
   "reduce to a small exact summary, solve locally" split — same
   pattern as the k-means codebooks in similarity.py).  Deterministic
   sign convention: each eigenvector's largest-|·| component is made
   positive, so reruns and test reruns agree.
3. ``pca_project`` — corpus-sized but embarrassingly parallel: one
   Arrow-batched matmul per batch projecting onto the (broadcast) k×d
   basis, optionally whitened (divide by √eigenvalue).

Overflow posture (the matrixprofile.py discipline): the partial path
tracks the max |q| per batch and fails loudly when rows·qmax² could
exceed int64 headroom instead of letting numpy wrap silently.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("sum_qi", T.LongType(), False),
        T.StructField("sum_qj", T.LongType(), False),
        T.StructField("sum_qq", T.LongType(), False),
    ]
)

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.ArrayType(T.LongType()), False),
        T.StructField("g", T.ArrayType(T.LongType()), False),  # d*d row-major
    ]
)


def gram_exact(
    df: DataFrame,
    vec_col: str,
    scale: int = 1024,
    method: str = "partial",
    id_col: str | None = None,
) -> DataFrame:
    """(i, j, n, sum_qi, sum_qj, sum_qq) for 0 ≤ i ≤ j < d over integer-
    quantized components q = floor(v·scale + 0.5).  Exact — see module
    docstring for why integers and not float sums.  ``method="explode"``
    needs ``id_col`` (a stable row key) for its self-join."""
    if method not in ("partial", "explode"):
        raise ValueError(f"method must be 'partial' or 'explode', got {method!r}")
    spark = df.sparkSession
    if method == "explode":
        if id_col is None:
            raise ValueError("method='explode' needs id_col for the self-join")
        q = df.select(
            F.col(id_col).alias("_rid"),
            F.posexplode(F.col(vec_col)).alias("i", "_v"),
        ).select(
            "_rid",
            "i",
            F.floor(F.col("_v").cast("double") * scale + F.lit(0.5))
            .cast("long")
            .alias("q"),
        )
        b = q.select(
            F.col("_rid"),
            F.col("i").alias("j"),
            F.col("q").alias("qj"),
        )
        return (
            q.join(b, "_rid")
            .where(F.col("i") <= F.col("j"))
            .groupBy("i", "j")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("q").alias("sum_qi"),
                F.sum("qj").alias("sum_qj"),
                F.sum(F.col("q") * F.col("qj")).alias("sum_qq"),
            )
        )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        bound = 0  # running Σ len(batch)·qmax(batch)² in Python ints —
        # bounds every accumulated |g_ij|; checking only the CURRENT
        # batch's qmax against the cumulative row count would let later
        # smaller-qmax batches push g past int64 silently
        s = None
        g = None
        for b in batches:
            if not len(b):
                continue
            v = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(v * scale + 0.5).astype(np.int64)
            qmax = int(np.abs(q).max(initial=0))
            # int64 headroom check BEFORE the matmul (numpy wraps silently)
            bound += len(q) * qmax * qmax
            if bound >= (1 << 62):
                raise OverflowError(
                    f"gram_exact partial would overflow int64: "
                    f"{n + len(q)} rows with accumulated |g| bound "
                    f"{bound}; lower scale= or repartition into smaller "
                    f"partitions"
                )
            if s is None:
                d = q.shape[1]
                s = np.zeros(d, dtype=np.int64)
                g = np.zeros((d, d), dtype=np.int64)
            n += len(q)
            s += q.sum(axis=0)
            g += q.T @ q
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    if not rows:
        return spark.createDataFrame([], _GRAM_SCHEMA)
    d = len(rows[0]["s"])
    # driver combine in Python ints — arbitrary precision, no overflow
    n = sum(r["n"] for r in rows)
    s = [sum(r["s"][i] for r in rows) for i in range(d)]
    g = [
        [sum(r["g"][i * d + j] for r in rows) for j in range(d)]
        for i in range(d)
    ]
    out = [
        (i, j, n, s[i], s[j], g[i][j]) for i in range(d) for j in range(i, d)
    ]
    return spark.createDataFrame(out, _GRAM_SCHEMA)


def pca_fit(
    gram: DataFrame, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Solve the d×d eigenproblem from the exact sums.  Returns (mean,
    components k×d, eigvals desc, n) in the ORIGINAL (unquantized) units.

    The covariance assembles as (Σqqᵀ/n − q̄q̄ᵀ)/scale² — but scale
    cancels against the quantized mean, so we reconstruct with the
    sums' own scale baked in and divide once at the end.  Sign
    convention: each component's largest-|·| entry is positive."""
    rows = gram.collect()
    if not rows:
        raise ValueError("empty gram — no input rows")
    d = max(r["j"] for r in rows) + 1
    return pca_fit_rows(rows, d, k)


def opq_rotation(gram: DataFrame, m: int) -> np.ndarray:
    """Parametric OPQ rotation (Ge, He, Ke, Sun, "Optimized Product
    Quantization", CVPR 2013 §4: eigenvalue allocation): a d×d ORTHOGONAL
    matrix whose row blocks give each of the m PQ subspaces an
    (approximately) equal variance PRODUCT — the provably optimal
    dimension split for a Gaussian source.  Orthogonality preserves dot
    products, so rotating the corpus and the queries leaves cosine
    scores untouched while the subquantizers see decorrelated,
    variance-balanced inputs (lower quantization error → higher recall
    at the same code budget).

    Allocation: dims sorted by eigenvalue descending; each goes to the
    non-full subspace with the smallest accumulated log-eigenvalue sum.
    Rows of the result are permuted eigenvectors: subspace j owns rows
    j·(d/m) … (j+1)·(d/m)−1."""
    rows = gram.collect()
    if not rows:
        raise ValueError("empty gram — no input rows")
    d = max(r["j"] for r in rows) + 1
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    _, comps, vals, _ = pca_fit_rows(rows, d, k=d)
    cap = d // m
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = [0.0] * m
    eps = max(float(vals[-1]), 1e-12) * 1e-6
    for i in range(d):  # eigenvalues already descending
        j = min(
            (j for j in range(m) if len(buckets[j]) < cap),
            key=lambda j: load[j],
        )
        buckets[j].append(i)
        load[j] += float(np.log(max(float(vals[i]), eps)))
    order = [i for b in buckets for i in b]
    return comps[order]


def pca_fit_rows(
    rows, d: int, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """pca_fit over already-collected gram rows (shared by pca_fit and
    opq_rotation so the eigensolve happens once per caller)."""
    n = rows[0]["n"]
    s = np.zeros(d)
    G = np.zeros((d, d))
    for r in rows:
        i, j = r["i"], r["j"]
        G[i, j] = G[j, i] = r["sum_qq"]
        s[i] = r["sum_qi"]
        s[j] = r["sum_qj"]
    mean_q = s / n
    cov_q = G / n - np.outer(mean_q, mean_q)
    vals, vecs = np.linalg.eigh(cov_q)
    order = np.argsort(vals)[::-1][:k]
    vals = vals[order]
    comps = vecs[:, order].T
    for r_ in range(comps.shape[0]):
        m_ = np.argmax(np.abs(comps[r_]))
        if comps[r_, m_] < 0:
            comps[r_] = -comps[r_]
    return mean_q, comps, vals, n


def rotate_embeddings(
    df: DataFrame, id_col: str, vec_col: str, rotation: np.ndarray
) -> DataFrame:
    """(id, embedding) with vectors rotated by the (broadcast) orthogonal
    matrix — no centering, so every dot product/cosine is preserved
    exactly up to float round-off; one Arrow-batched matmul per batch."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(np.asarray(rotation, dtype=np.float64))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def rot(vecs: pd.Series) -> pd.Series:
        R = b.value
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(list(v @ R.T))

    return df.select(F.col(id_col).alias("vec_id"),
                     rot(F.col(vec_col)).alias("embedding"))


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mean_q: np.ndarray,
    components: np.ndarray,
    eigvals: np.ndarray | None = None,
    scale: int = 1024,
) -> DataFrame:
    """(id, proj ARRAY<DOUBLE>) — center on the fitted mean and project
    onto the top-k basis; pass ``eigvals`` to whiten (unit variance per
    direction).  One Arrow-batched matmul per batch, basis broadcast."""
    spark = df.sparkSession
    comps = np.asarray(components, dtype=np.float64)
    mq = np.asarray(mean_q, dtype=np.float64)
    w = None
    if eigvals is not None:
        ev = np.asarray(eigvals, dtype=np.float64)
        if np.any(ev <= 0):
            raise ValueError("whitening needs strictly positive eigenvalues")
        w = np.sqrt(ev)
    b = spark.sparkContext.broadcast((mq, comps, w))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def proj(vecs: pd.Series) -> pd.Series:
        mean_b, comps_b, w_b = b.value
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        q = np.floor(v * scale + 0.5)            # same grid the fit saw
        c = (q - mean_b) @ comps_b.T             # centered, q-units
        # eigvals are in q-units (pca_fit works on cov_q), so whitening
        # divides by √eigval directly and the scale cancels; the plain
        # projection divides by scale to land back in input units
        p = c / w_b if w_b is not None else c / scale
        return pd.Series(list(p))

    return df.select(F.col(id_col).alias("id"), proj(F.col(vec_col)).alias("proj"))
