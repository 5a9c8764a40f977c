"""Measure the persisted-index effect: IVF-PQ search over catalog-stored,
list-partitioned postings (manifest-pruned read of n_probe/n_lists of the
bytes) vs the in-memory operator that re-encodes and scans the WHOLE
corpus per query batch.

The contract queries prove the two return identical VALUES; this tool
reports the wall-clock ratio — the number that justifies persisting the
index at all.  Deterministic (seeded vectors and geometry).

Usage: python tools/ann_index_bench.py [n_vectors] [n_lists] [n_probe]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from influxer_spark.catalog import TableCatalog  # noqa: E402
from influxer_spark.operators import similarity as S  # noqa: E402
from influxer_spark.session import get_spark  # noqa: E402


def clustered_vecs(spark, n: int, dim: int = 64, centers: int = 64):
    rng = np.random.default_rng(7)
    cent = rng.standard_normal((centers, dim))
    mat = cent[rng.integers(0, centers, n)] + 0.15 * rng.standard_normal((n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ann_index_bench", cores=cores)
    vecs = clustered_vecs(spark, n)
    vecs.persist().count()
    queries = vecs.filter(F.col("vec_id") % (n // 50) == 0)  # ~50 queries
    cent = S.ivf_random_centroids(64, n_lists)
    books = S.pq_random_codebooks(64, m=8, ksub=16)

    cat = TableCatalog(tempfile.mkdtemp(prefix="ann_index_bench_"))
    t0 = time.perf_counter()
    S.build_ivfpq_index(
        spark, cat, vecs, centroids=cent, books=books, dim=64, n_lists=n_lists
    )
    build_s = time.perf_counter() - t0

    def timed(fn, runs: int = 3) -> float:
        fn()  # warm (JIT + plan cache) — same discipline as bench.py
        best = min(
            (lambda t: (fn(), time.perf_counter() - t)[1])(time.perf_counter())
            for _ in range(runs)
        )
        return best

    mem_s = timed(
        lambda: S.ivf_pq_topk(
            vecs, queries, cent, books, n_probe=n_probe, k=10
        ).count()
    )
    idx_s = timed(
        lambda: S.ivfpq_search_index(
            spark, cat, queries, n_probe=n_probe, k=10
        ).count()
    )
    print(
        json.dumps(
            {
                "n_vectors": n,
                "n_lists": n_lists,
                "n_probe": n_probe,
                "build_sec": round(build_s, 2),
                "inmemory_search_sec": round(mem_s, 2),
                "index_search_sec": round(idx_s, 2),
                "index_speedup": round(mem_s / idx_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
