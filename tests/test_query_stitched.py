"""Stitched mixed-granularity tier reads (query.read_rollup_stitched).

Widths that divide no coarse tier (90m, 25h) are served from a UNION of
1d + 1h + 1m partials instead of the 1m tier alone; the union must equal
the direct raw-width rollup bit-for-bit, and the coarse tiers must carry
most of the rows (the whole point of the rewrite).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from influxer_spark.catalog import TableCatalog
from influxer_spark.operators import rollup as R
from influxer_spark.operators.refresh import build_point_tiers
from influxer_spark.query import read_rollup_stitched, stitch_tier_frames

KEYS = ["event_type"]


@pytest.fixture(scope="module")
def stitched(spark, sf_dir, tmp_path_factory):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cat = TableCatalog(str(tmp_path_factory.mktemp("stitch_cat")))
    build_point_tiers(spark, cat, ev, "ts", KEYS, "value")
    return cat, ev


def _rows(df):
    return sorted(
        (
            r["bucket"],
            r["event_type"],
            r["cnt"],
            int(round(r["sum_v"] * 100)),
            r["min_v"],
            r["max_v"],
        )
        for r in df.select(
            "bucket", "event_type", "cnt", "sum_v", "min_v", "max_v"
        ).collect()
    )


def _direct(ev, width, start=None, end=None):
    if start is not None:
        ev = ev.filter(F.col("ts") >= F.lit(start))
    if end is not None:
        ev = ev.filter(F.col("ts") < F.lit(end))
    return R.rollup_width(ev, "ts", KEYS, "value", width)


@pytest.mark.parametrize("width", [90 * 60, 25 * 3600])
def test_stitched_equals_direct(spark, stitched, width):
    cat, ev = stitched
    got = read_rollup_stitched(spark, cat, width, key_cols=KEYS)
    assert _rows(got) == _rows(_direct(ev, width))


def test_stitched_reads_fewer_rows(spark, tmp_path):
    """On a DENSE series (one point per minute — the regime the rewrite
    exists for) a 49h read reads ~100× fewer rows than the 1m fallback:
    every 49h bucket is wider than 2 days, so it always contains whole
    day blocks, and hours cover the drift edges."""
    t0 = dt.datetime(2024, 3, 1)
    dense = spark.range(10 * 1440).select(
        F.timestamp_seconds(
            F.lit(int(t0.timestamp())) + F.col("id") * 60
        ).alias("ts"),
        F.lit("m").alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    cat = TableCatalog(str(tmp_path / "dense_cat"))
    build_point_tiers(spark, cat, dense, "ts", KEYS, "value")

    got = read_rollup_stitched(spark, cat, 49 * 3600, key_cols=KEYS)
    assert _rows(got) == _rows(_direct(dense, 49 * 3600))

    frames = stitch_tier_frames(spark, cat, 49 * 3600)
    n = {t: f.count() for t, f in frames.items()}
    rows_1m_tier = spark.read.parquet(
        *cat.partition_paths("rollup_1m", cat.committed_partitions("rollup_1m"))
    ).count()
    assert rows_1m_tier == 10 * 1440
    assert n["1d"] > 0 and n["1h"] > 0
    assert sum(n.values()) < rows_1m_tier / 50


def test_stitched_covers_each_minute_once(spark, stitched):
    """Coverage proof at the partial level: summed cnt over all stitched
    sources equals the 1m tier's summed cnt (every point counted exactly
    once, no overlap between tiers)."""
    cat, _ = stitched
    frames = stitch_tier_frames(spark, cat, 90 * 60)
    total = sum(
        f.agg(F.sum("cnt")).collect()[0][0] or 0 for f in frames.values()
    )
    tier_1m = spark.read.parquet(
        *cat.partition_paths("rollup_1m", cat.committed_partitions("rollup_1m"))
    )
    assert total == tier_1m.agg(F.sum("cnt")).collect()[0][0]


def test_stitched_clipped_range(spark, stitched):
    """Minute-aligned start/end cutting output buckets mid-bucket: edge
    buckets must aggregate only in-range minutes, exactly like the raw
    path over the filtered points."""
    cat, ev = stitched
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    start = (lo + dt.timedelta(days=2)).replace(
        hour=7, minute=17, second=0, microsecond=0
    )
    end = (hi - dt.timedelta(days=2)).replace(
        hour=3, minute=43, second=0, microsecond=0
    )
    got = read_rollup_stitched(spark, cat, 25 * 3600, start, end, KEYS)
    assert _rows(got) == _rows(_direct(ev, 25 * 3600, start, end))


def test_stitched_rejects_unaligned(spark, stitched):
    cat, _ = stitched
    with pytest.raises(ValueError, match="multiple of 60"):
        read_rollup_stitched(spark, cat, 90, key_cols=KEYS)
    with pytest.raises(ValueError, match="minute-aligned"):
        read_rollup_stitched(
            spark,
            cat,
            5400,
            start=dt.datetime(2024, 1, 1, 0, 0, 30),
            key_cols=KEYS,
        )
