"""Measure matrix-profile throughput at tier-sized series lengths — the
numbers behind the operator's max_points guard and "profile the tier"
posture (a year of 1h buckets ≈ 8,760 points; a month of 1m ≈ 43,200).

Usage: python tools/mp_bench.py [m] [series_len ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from influxer_spark.operators import matrixprofile as MP  # noqa: E402
from influxer_spark.session import get_spark  # noqa: E402


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    lens = [int(x) for x in sys.argv[2:]] or [8760, 20000, 43200]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("mp_bench", cores=cores)
    rng = np.random.default_rng(3)
    out = {"m": m, "series": []}
    for n in lens:
        v = rng.integers(0, 5_000_000, size=n)
        df = spark.createDataFrame(
            [("s", int(i), int(x)) for i, x in enumerate(v)],
            "k string, i int, v long",
        ).persist()
        df.count()
        prof = MP.matrix_profile(df, ["k"], "i", "v", m=m, max_points=n)
        prof.count()  # warm
        t0 = time.perf_counter()
        rows = prof.count()
        dt = time.perf_counter() - t0
        out["series"].append(
            {
                "len": n,
                "windows": rows,
                "sec": round(dt, 2),
                "points_per_sec": round(n / dt),
            }
        )
        df.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
