"""End-to-end engine pipeline: pages → extract → points → tier cascade →
Gorilla blobs, with per-partition (per-day) checkpoint/resume and lineage
(north rule: "resumable from per-partition checkpoints with lineage +
counters").

The reference's run loop (parse → batch → POST with retry → status report,
Influxer/GenericFile.cs:282-357) maps here to: per-day partition unit →
idempotent catalog commit (replaces batch+retry; Spark task retry handles
transient failure) → manifest counters (ProcessStatus analogue,
Influxer/ProcessStatus.cs:3-9) + lineage per partition.

Scale notes:
- The day loop is a CHECKPOINT boundary, not a parallelism boundary: within a
  day all work is one distributed DataFrame job; on a cluster, days can also
  be dispatched concurrently since partitions commit independently.
- Only the 1m tier reads raw pages; 1h/1d re-aggregate committed 1m partials
  (orders of magnitude smaller).
- Partition pruning: the day filter on ``warc_ts`` reaches the parquet scan
  (PushedFilters), so resume never re-reads completed days' bytes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.catalog import TableCatalog
from influxer_spark.extract import pages_to_points, with_crawl_metrics, with_extracted
from influxer_spark.operators import rollup as R
from influxer_spark.operators.gorilla import encode_series_df

POINT_KEYS = ["url", "metric"]


@dataclass
class PipelineResult:
    days_processed: list[str] = field(default_factory=list)
    days_skipped: list[str] = field(default_factory=list)
    counters: dict[str, dict[str, Any]] = field(default_factory=dict)
    elapsed_s: float = 0.0


def _distinct_days(pages: DataFrame) -> list[str]:
    return sorted(
        r["d"]
        for r in pages.select(
            F.date_format("warc_ts", "yyyy-MM-dd").alias("d")
        ).distinct().collect()
    )


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    catalog_root: str,
    resume: bool = True,
    encode_gorilla: bool = True,
    validate_extraction: bool = False,
) -> PipelineResult:
    """Run (or resume) the full pipeline over a pages parquet table."""
    t0 = time.time()
    catalog = TableCatalog(catalog_root)
    pages = spark.read.parquet(pages_path)
    res = PipelineResult()

    done = set(catalog.committed_partitions("rollup_1d")) if resume else set()
    for day in _distinct_days(pages):
        if day in done:
            res.days_skipped.append(day)
            continue
        counters = process_day(
            spark, pages, catalog, day,
            encode_gorilla=encode_gorilla,
            validate_extraction=validate_extraction,
            source=pages_path,
        )
        res.days_processed.append(day)
        res.counters[day] = counters
    res.elapsed_s = time.time() - t0
    return res


def process_day(
    spark: SparkSession,
    pages: DataFrame,
    catalog: TableCatalog,
    day: str,
    encode_gorilla: bool = True,
    validate_extraction: bool = False,
    source: str = "",
) -> dict[str, Any]:
    """Process one day partition through every tier; commit each tier's
    partition with counters + lineage.  Idempotent: a crashed/partial run
    leaves uncommitted staging only, and rerunning overwrites cleanly."""
    # day filter as PLAIN RANGE PREDICATES on the timestamp column — unlike
    # to_date(warc_ts)==day these push down to the parquet scan (row-group
    # stats pruning; Iceberg days(warc_ts) partition pruning at scale).
    # Literal cast matches the column type so the cast lands on the constant,
    # not the column (which would defeat pushdown).
    import datetime as _dt

    d0 = _dt.datetime.fromisoformat(day)
    d1 = d0 + _dt.timedelta(days=1)
    ts_type = dict(pages.dtypes)["warc_ts"]
    lo, hi = F.lit(d0).cast(ts_type), F.lit(d1).cast(ts_type)
    day_pages = pages.filter((F.col("warc_ts") >= lo) & (F.col("warc_ts") < hi))
    ext = with_extracted(day_pages, validate=validate_extraction)
    if validate_extraction:
        n_bad = ext.filter(~F.col("text_ok")).count()
        if n_bad:
            raise ValueError(f"extraction invariant violated on {n_bad} rows ({day})")
    points = pages_to_points(with_crawl_metrics(ext)).cache()
    try:
        # one action for both counters: every page emits exactly one
        # html_bytes point, so rows_in is derivable from the cached narrow
        # points — no second scan of the raw table
        crow = points.agg(
            F.count("*").alias("points_n"),
            F.count(F.when(F.col("metric") == "html_bytes", 1)).alias("rows_in"),
        ).collect()[0]
        rows_in, points_n = crow["rows_in"], crow["points_n"]
        lineage = {"source": source, "day": day}

        catalog.write_partition(
            points, "raw_points", day,
            counters={"rows_in": rows_in, "points_out": points_n},
            lineage=lineage,
        )

        t1m = R.rollup(points, "warc_ts", POINT_KEYS, "value", "1m")
        catalog.write_partition(
            t1m, "rollup_1m", day,
            counters={"rows_in": points_n}, lineage=lineage,
        )
        t1m_committed = catalog.read_partition(spark, "rollup_1m", day).cache()
        try:
            buckets_1m = t1m_committed.count()
            t1h = R.cascade(t1m_committed, POINT_KEYS, "1h")
            catalog.write_partition(
                t1h, "rollup_1h", day,
                counters={"rows_in": buckets_1m}, lineage=lineage,
            )
            t1h_committed = catalog.read_partition(spark, "rollup_1h", day)
            t1d = R.cascade(t1h_committed, POINT_KEYS, "1d")
            catalog.write_partition(
                t1d, "rollup_1d", day,
                counters={"rows_in": buckets_1m}, lineage=lineage,
            )

            counters: dict[str, Any] = {
                "rows_in": rows_in,
                "points": points_n,
                "buckets_1m": buckets_1m,
            }
            if encode_gorilla:
                enc = encode_series_df(
                    t1m_committed.withColumn("v", F.col("sum_v") / F.col("cnt")),
                    POINT_KEYS, "bucket", "v",
                )
                catalog.write_partition(
                    enc, "rollup_1m_gorilla", day,
                    counters={"rows_in": buckets_1m}, lineage=lineage,
                )
                stats = catalog.read_partition(spark, "rollup_1m_gorilla", day).agg(
                    F.sum("n_points").alias("n"),
                    F.sum("encoded_bytes").alias("enc"),
                    F.sum("raw_bytes").alias("raw"),
                ).collect()[0]
                counters["gorilla_bytes_per_point"] = (
                    stats["enc"] / stats["n"] if stats["n"] else None
                )
                counters["gorilla_ratio"] = (
                    stats["enc"] / stats["raw"] if stats["raw"] else None
                )
            return counters
        finally:
            t1m_committed.unpersist()
    finally:
        points.unpersist()
