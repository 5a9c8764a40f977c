"""Continuous-aggregate query API: tier selection, exactness vs raw rollup,
and manifest-level partition pruning (dropped days never touched)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from influxer_spark.catalog import TableCatalog
from influxer_spark.datagen import generate_pages
from influxer_spark.extract import pages_to_points, with_crawl_metrics, with_extracted
from influxer_spark.operators.rollup import rollup_width
from influxer_spark.pipeline import run_pipeline
from influxer_spark.query import read_rollup, select_tier


def test_select_tier_picks_coarsest_divisor():
    assert select_tier(60) == "1m"
    assert select_tier(300) == "1m"
    assert select_tier(3600) == "1h"
    assert select_tier(4 * 3600) == "1h"
    assert select_tier(86400) == "1d"
    assert select_tier(7 * 86400) == "1d"
    assert select_tier(90) == "1m"  # divides nothing → finest


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("qapi")
    pages = generate_pages(str(d / "pg"), n_rows=4000, seed=42, days=3)
    root = str(d / "cat")
    run_pipeline(spark, pages, root, encode_gorilla=False)
    return pages, TableCatalog(root)


def test_read_rollup_matches_raw_recompute(spark, built):
    pages, cat = built
    points = pages_to_points(with_crawl_metrics(with_extracted(
        spark.read.parquet(pages)
    )))
    for width in (300, 4 * 3600):
        want = {
            (r["bucket"], r["url"], r["metric"]): (r["cnt"], r["min_v"], r["max_v"])
            for r in rollup_width(points, "warc_ts", ["url", "metric"], "value", width).collect()
        }
        got_df = read_rollup(spark, cat, width)
        got = {
            (r["bucket"], r["url"], r["metric"]): (r["cnt"], r["min_v"], r["max_v"])
            for r in got_df.collect()
        }
        assert got == want, f"width={width}"


def test_read_rollup_prunes_dropped_partitions(spark, built):
    _pages, cat = built
    days = sorted(cat.committed_partitions("rollup_1h"))
    assert len(days) >= 3
    # physically delete an out-of-range day's files: if pruning works the
    # query never notices
    import shutil, os

    victim = days[0]
    shutil.rmtree(os.path.join(cat.table_path("rollup_1h"), f"p={victim}"))
    start = dt.datetime.fromisoformat(days[1])
    df = read_rollup(spark, cat, 4 * 3600, start=start)
    assert df.count() > 0
    assert df.agg(F.min("bucket")).collect()[0][0] >= start


@pytest.fixture(scope="module")
def built_gorilla(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("qarchive")
    pages = generate_pages(str(d / "pg"), n_rows=3000, seed=11, days=3)
    root = str(d / "cat")
    run_pipeline(spark, pages, root, encode_gorilla=True)
    return pages, TableCatalog(root)


def test_read_series_decodes_expired_1m_tier_exactly(spark, built_gorilla):
    """Retention lifecycle: expire the plain 1m tier; the Gorilla archive
    still answers the 1m mean series bit-exactly."""
    from influxer_spark.query import read_series

    _pages, cat = built_gorilla
    want = {
        (r["url"], r["metric"], r["bucket"]): r["sum_v"] / r["cnt"]
        for r in spark.read.parquet(
            *cat.partition_paths("rollup_1m", sorted(cat.committed_partitions("rollup_1m")))
        ).collect()
    }
    # drop + expire every 1m parquet partition (the DAG's cold transition)
    for day in sorted(cat.committed_partitions("rollup_1m")):
        assert cat.drop_partition("rollup_1m", day, reason="cold-archive")
    cat.expire_snapshots("rollup_1m", keep_last=1)
    assert not cat.committed_partitions("rollup_1m")

    got = {
        (r["url"], r["metric"], r["bucket"]): r["v"]
        for r in read_series(spark, cat).collect()
    }
    assert got == want  # bit-exact: codec round-trip + same IEEE division


def test_read_count_series_decodes_counts_archive_exactly(spark, built_gorilla):
    """The integer-codec counts archive answers the exact per-bucket cnt
    even with the plain 1m tier expired (the previous test dropped it) —
    expected counts recomputed independently from the pages source."""
    from influxer_spark.extract import (
        pages_to_points, with_crawl_metrics, with_extracted,
    )
    from influxer_spark.operators.rollup import rollup
    from influxer_spark.query import read_count_series

    pages, cat = built_gorilla
    pts = pages_to_points(
        with_crawl_metrics(with_extracted(spark.read.parquet(pages))))
    want = {
        (r["url"], r["metric"], r["bucket"]): r["cnt"]
        for r in rollup(
            pts, "warc_ts", ["url", "metric"], "value", "1m"
        ).collect()
    }
    got = {
        (r["url"], r["metric"], r["bucket"]): r["cnt"]
        for r in read_count_series(spark, cat).collect()
    }
    assert got == want


def test_read_count_series_prunes_partitions(spark, built_gorilla):
    from influxer_spark.query import read_count_series

    _pages, cat = built_gorilla
    days = sorted(cat.committed_partitions("rollup_1m_counts"))
    d1 = dt.datetime.fromisoformat(days[1])
    out = read_count_series(spark, cat, start=d1, end=d1 + dt.timedelta(days=1))
    files = out.inputFiles()
    assert files and all(f"p={days[1]}" in f for f in files)


def test_read_series_prunes_and_filters_time_range(spark, built_gorilla):
    from influxer_spark.query import read_series

    _pages, cat = built_gorilla
    days = sorted(cat.committed_partitions("rollup_1m_gorilla"))
    assert len(days) == 3
    d1 = dt.datetime.fromisoformat(days[1])
    out = read_series(spark, cat, start=d1, end=d1 + dt.timedelta(days=1))
    mins = out.select(F.min("bucket").alias("lo"), F.max("bucket").alias("hi")).collect()[0]
    assert mins["lo"] >= d1 and mins["hi"] < d1 + dt.timedelta(days=1)
    # manifest pruning: only the one day dir is in the scan
    files = out.inputFiles()
    assert files and all(f"p={days[1]}" in f for f in files)


def test_read_quantile_prunes_partitions_at_manifest(spark, tmp_path_factory):
    """A bounded read_quantile must only scan the in-range day partitions
    (manifest-level pruning — the property that keeps a p99 panel reading
    O(days-in-range), not the whole table, at 10^12-point scale)."""
    import datetime as dt

    from influxer_spark.operators.rollup import log2_bounds
    from influxer_spark.query import read_quantile

    d = tmp_path_factory.mktemp("qhist")
    pages = generate_pages(str(d / "pg"), n_rows=3000, seed=9, days=4)
    root = str(d / "cat")
    bounds = log2_bounds(1.0, 2.0**21)
    run_pipeline(spark, pages, root, encode_gorilla=False, hist_bounds=bounds)
    cat = TableCatalog(root)
    days = sorted(cat.committed_partitions("rollup_1h"))
    assert len(days) >= 3
    start = dt.datetime.fromisoformat(days[1])
    end = start + dt.timedelta(days=1)
    out = read_quantile(
        spark, cat, 4 * 3600, 0.95, start=start, end=end,
        key_cols=("metric",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert f"p={days[1]}" in plan          # the in-range day is read
    assert f"p={days[0]}" not in plan      # out-of-range days never listed
    assert f"p={days[-1]}" not in plan
    rows = out.collect()
    assert rows and all(r["q_v"] is not None for r in rows)


def test_read_realtime_merges_tier_and_raw_tail(spark, sf_dir):
    """Real-time continuous aggregate: commit tiers for all but the last 2
    days, query 3-DAY buckets (coarser than the watermark granularity, so
    one bucket STRADDLES it) — tier partials + raw-tail partials must merge
    to exactly the full-rollup answer."""
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators.refresh import (
        build_point_tiers,
        source_day_counts,
    )
    from influxer_spark.operators.rollup import rollup_width
    from influxer_spark.query import read_realtime, tier_watermark

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = sorted(source_day_counts(ev, "ts"))
    root = tempfile.mkdtemp(prefix="rt_test_")
    cat = TableCatalog(root)
    build_point_tiers(
        spark, cat, ev, "ts", ["event_type"], "value", days=days[:-2]
    )
    # last committed day is days[-3]; the watermark is the midnight after it
    assert tier_watermark(cat, "1d").date().isoformat() == days[-2]

    width = 3 * 86400
    got = sorted(
        (r["bucket"], r["event_type"], r["cnt"],
         int(round(r["sum_v"] * 100)), r["min_v"], r["max_v"])
        for r in read_realtime(
            spark, cat, ev, width, "ts", "value", ["event_type"]
        ).collect()
    )
    want = sorted(
        (r["bucket"], r["event_type"], r["cnt"],
         int(round(r["sum_v"] * 100)), r["min_v"], r["max_v"])
        for r in rollup_width(ev, "ts", ["event_type"], "value", width).collect()
    )
    assert got == want

    # empty catalog → everything served from raw
    empty = TableCatalog(tempfile.mkdtemp(prefix="rt_empty_"))
    raw_only = read_realtime(
        spark, empty, ev, width, "ts", "value", ["event_type"]
    )
    assert sorted(
        (r["bucket"], r["event_type"], r["cnt"]) for r in raw_only.collect()
    ) == [(b, e, c) for b, e, c, *_ in want]


def test_read_sliding_warmup_aware_pruning(spark, built):
    """read_sliding loads [start − window, end) but outputs [start, end):
    the first buckets of the range carry FULL trailing windows (fed by
    warm-up rows before start), bit-equal to sliding over the whole tier
    then filtering — the answer a naive start-pruned read silently
    shrinks."""
    import datetime as dtm

    from influxer_spark.operators.rollup import rollup_sliding
    from influxer_spark.query import read_sliding

    _pages, cat = built
    days = sorted(cat.committed_partitions("rollup_1h"))
    assert len(days) >= 3
    # anchor on the LAST day with the previous day as warm-up: an earlier
    # test in this module physically deletes days[0]'s files to prove
    # manifest pruning, so neither side may touch that day
    start = dtm.datetime.fromisoformat(days[2])
    win = 6 * 3600

    got = {
        (r["bucket"], r["url"], r["metric"]): (r["cnt"], r["sum_v"], r["n_buckets"])
        for r in read_sliding(
            spark, cat, win, start=start, tier="1h"
        ).collect()
    }
    full = spark.read.parquet(
        *cat.partition_paths("rollup_1h", days[1:])
    )
    want = {
        (r["bucket"], r["url"], r["metric"]): (r["cnt"], r["sum_v"], r["n_buckets"])
        for r in rollup_sliding(full, ["url", "metric"], 6, 3600)
        .filter(F.col("bucket") >= F.lit(start))
        .collect()
    }
    assert got == want and len(got) > 50
    # early-morning buckets of day 2 must see day-1 warm-up rows
    assert any(
        k[0].hour < 5 and v[2] == 6 for k, v in got.items()
    ), "first buckets lost their warm-up window"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        read_sliding(spark, cat, 5400, tier="1h")


def test_read_exact_rollup_reaggregates_exactly(spark, built_gorilla):
    """The (cnt, sum_cents) integer archive re-aggregates to 5m buckets
    EXACTLY: integer sums match a cents-quantized raw recompute, and the
    archive answers even though only rollup_1m_counts is read."""
    from influxer_spark.query import read_exact_rollup

    pages, cat = built_gorilla
    points = pages_to_points(with_crawl_metrics(with_extracted(
        spark.read.parquet(pages)
    )))
    t1m = rollup_width(points, "warc_ts", ["url", "metric"], "value", 60)
    want = {
        (r["url"], r["metric"], r["b5"]): (r["c"], r["sc"])
        for r in t1m.select(
            "url", "metric",
            F.timestamp_seconds(
                (F.unix_timestamp("bucket") - F.unix_timestamp("bucket") % 300)
            ).alias("b5"),
            F.col("cnt").alias("c1"),
            F.round(F.col("sum_v") * 100, 0).cast("long").alias("sc1"),
        ).groupBy("url", "metric", "b5").agg(
            F.sum("c1").alias("c"), F.sum("sc1").alias("sc")
        ).collect()
    }
    got = {
        (r["url"], r["metric"], r["bucket"]): (r["cnt"], r["sum_cents"])
        for r in read_exact_rollup(
            spark, cat, 300, key_cols=("url", "metric")
        ).collect()
    }
    assert got == want and len(got) > 100


def test_decode_int2_raises_on_blob_timestamp_mismatch(spark):
    """A corrupted archive row (blobs from different timestamp runs) fails
    loudly instead of silently zipping misaligned values."""
    import numpy as np

    from influxer_spark.operators.intcodec import (
        decode_int2_series_df,
        encode_int,
    )

    t1 = np.array([0, 60, 120], dtype=np.int64)
    t2 = np.array([0, 60, 180], dtype=np.int64)
    v = np.array([1, 2, 3], dtype=np.int64)
    df = spark.createDataFrame(
        [(["d", "k"], encode_int(t1, v), encode_int(t2, v))],
        "series_keys array<string>, blob binary, sum_blob binary",
    )
    with pytest.raises(Exception, match="disagree|corrupted"):
        decode_int2_series_df(df).collect()
