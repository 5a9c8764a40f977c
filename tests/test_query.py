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
