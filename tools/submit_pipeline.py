"""spark-submit driver for the pages pipeline (north rule's cluster entry).

Runs the full raw→1m→1h→1d + Gorilla pipeline over a pages table, committing
each tier through the snapshot catalog with per-partition lineage+counters;
resumable (already-committed days are skipped on rerun).

Local smoke (same code path the cluster runs):

    python tools/submit_pipeline.py --pages /tmp/pages.parquet --catalog /tmp/cat

Cluster (two sizes for the scaling criterion — same job, N and 4N executors):

    python tools/package_pyfiles.py
    spark-submit --master yarn --num-executors N  --executor-cores 4 \
        --executor-memory 8g --py-files dist/influxer_spark.zip \
        tools/submit_pipeline.py --pages s3://…/pages --catalog s3://…/cat
    spark-submit --master yarn --num-executors 4N --executor-cores 4 ...

Throughput = sum(points)/wall printed at the end; scaling efficiency =
(points_per_sec@4N / points_per_sec@N) / 4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain `python tools/submit_pipeline.py` runs: repo root on the path
# (spark-submit --py-files covers driver and executors on a cluster)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--catalog", required=True, help="catalog root (tier tables)")
    ap.add_argument("--no-gorilla", action="store_true")
    ap.add_argument("--validate", action="store_true",
                    help="enforce the byte-identical extraction invariant")
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess every day even if committed")
    ap.add_argument("--retention", action="store_true",
                    help="apply the retention DAG after the wave")
    args = ap.parse_args()

    from influxer_spark.pipeline import run_pipeline
    from influxer_spark.session import get_spark

    spark = get_spark("influxer_pipeline")
    t0 = time.time()
    res = run_pipeline(
        spark,
        args.pages,
        args.catalog,
        encode_gorilla=not args.no_gorilla,
        validate_extraction=args.validate,
        resume=not args.no_resume,
    )
    wall = time.time() - t0
    points = sum(c.get("points", 0) for c in res.counters.values())
    if args.retention:
        from influxer_spark.catalog import TableCatalog
        from influxer_spark.operators.retention import apply_retention

        report = apply_retention(TableCatalog(args.catalog))
    else:
        report = {}
    print(json.dumps({
        "days": sorted(res.counters),
        "points": points,
        "wall_s": round(wall, 3),
        "points_per_sec": round(points / wall, 1) if wall else None,
        "retention": report,
        "parallelism": spark.sparkContext.defaultParallelism,
    }))


if __name__ == "__main__":
    main()
