"""Manifest column-stats data skipping (catalog.write_partition(s)
stats_cols= → pruned_partitions / read_where) — the Iceberg zone-map
contract: pruning only ever drops partitions the recorded (min, max)
PROVES empty for the predicate, so a pruned read is value-identical to a
full-scan filter while touching a fraction of the bytes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxer_spark.catalog import TableCatalog


@pytest.fixture()
def stats_cat(spark, tmp_path):
    """Three day partitions with DISJOINT value ranges (0-9 / 100-109 /
    200-209) committed in one wave with stats on ``value``."""
    cat = TableCatalog(str(tmp_path))
    rows = []
    for d, base in (("2024-01-01", 0), ("2024-01-02", 100), ("2024-01-03", 200)):
        rows += [(d, f"u{i}", float(base + i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["day", "user", "value"])
    cat.write_partitions(
        df, "metrics", ["2024-01-01", "2024-01-02", "2024-01-03"],
        stats_cols=["value"],
    )
    return cat


def test_stats_recorded_per_partition(stats_cat):
    parts = stats_cat.committed_partitions("metrics")
    st = parts["2024-01-02"]["stats"]["value"]
    assert st["min"] == 100.0 and st["max"] == 109.0 and st["nulls"] == 0


def test_pruning_drops_provably_empty_partitions(stats_cat):
    assert stats_cat.pruned_partitions("metrics", "value", 102, 105) == [
        "2024-01-02"
    ]
    # straddling two ranges keeps both
    assert stats_cat.pruned_partitions("metrics", "value", 9, 100) == [
        "2024-01-01", "2024-01-02",
    ]
    # unbounded side
    assert stats_cat.pruned_partitions("metrics", "value", lo=199) == [
        "2024-01-03"
    ]


def test_read_where_equals_full_filter_and_skips_files(spark, stats_cat):
    pruned = stats_cat.read_where(spark, "metrics", "value", 102, 105)
    full = stats_cat.read_committed(spark, "metrics").filter(
        (F.col("value") >= 102) & (F.col("value") <= 105)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
    # the pruned plan never opens the other two partitions' files
    touched = {f for f in pruned.inputFiles()}
    assert all("p=2024-01-02" in f for f in touched) and touched


def test_partition_without_stats_is_never_skipped(spark, stats_cat):
    extra = spark.createDataFrame(
        [("x", 5000.0)], ["user", "value"]
    )
    stats_cat.write_partition(extra, "metrics", "2024-01-04")  # no stats_cols
    keep = stats_cat.pruned_partitions("metrics", "value", 102, 105)
    assert keep == ["2024-01-02", "2024-01-04"]  # conservative: no stats → kept
    rows = stats_cat.read_where(spark, "metrics", "value", 102, 105).collect()
    assert all(102 <= r["value"] <= 105 for r in rows)  # residual filter exact


def test_all_null_partition_is_skipped_for_range(spark, stats_cat):
    nulls = spark.createDataFrame(
        [("n", None)], "user string, value double"
    )
    stats_cat.write_partition(
        nulls, "metrics", "2024-01-05", stats_cols=["value"]
    )
    assert "2024-01-05" not in stats_cat.pruned_partitions(
        "metrics", "value", 0, 10_000
    )


def test_all_null_partition_kept_when_no_bounds(spark, stats_cat):
    """With NO bounds the residual filter keeps every row, so an all-null
    partition must still be read — its other columns are live data."""
    nulls = spark.createDataFrame(
        [("n", None)], "user string, value double"
    )
    stats_cat.write_partition(
        nulls, "metrics", "2024-01-05", stats_cols=["value"]
    )
    assert "2024-01-05" in stats_cat.pruned_partitions("metrics", "value")
    users = {r["user"] for r in
             stats_cat.read_where(spark, "metrics", "value").collect()}
    assert "n" in users  # row with NULL value survives the unbounded read


def test_timestamp_bounds_accept_iso_T_and_datetime_objects(spark, tmp_path):
    """Stats store timestamps as 'YYYY-MM-DD HH:MM:SS'; a 'T'-separated
    ISO bound or a datetime object must prune identically — lexical
    comparison of mixed separators would silently drop live partitions
    (' ' sorts below 'T')."""
    import datetime as dt

    cat = TableCatalog(str(tmp_path))
    rows = [
        ("2024-03-01", f"2024-03-01 {h:02d}:00:00") for h in (6, 12, 18)
    ] + [
        ("2024-03-02", f"2024-03-02 {h:02d}:00:00") for h in (6, 12, 18)
    ]
    df = spark.createDataFrame(rows, ["day", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    cat.write_partitions(df, "t", ["2024-03-01", "2024-03-02"],
                         stats_cols=["ts"])
    want = ["2024-03-01", "2024-03-02"]
    # noon day 1 onward intersects BOTH partitions, in every bound form
    assert cat.pruned_partitions("t", "ts", lo="2024-03-01 12:00:00") == want
    assert cat.pruned_partitions("t", "ts", lo="2024-03-01T12:00:00") == want
    assert cat.pruned_partitions(
        "t", "ts", lo=dt.datetime(2024, 3, 1, 12)) == want
    # and a bound past day 1's max prunes day 1 in every form
    only2 = ["2024-03-02"]
    assert cat.pruned_partitions("t", "ts", lo="2024-03-01T19:00:00") == only2
    assert cat.pruned_partitions(
        "t", "ts", lo=dt.datetime(2024, 3, 1, 19)) == only2
    got = cat.read_where(spark, "t", "ts", lo="2024-03-01T12:00:00").count()
    assert got == 5  # ≥ noon day 1: 12:00 + 18:00 day 1, all three day 2


def test_single_partition_write_records_stats(spark, tmp_path):
    cat = TableCatalog(str(tmp_path))
    df = spark.createDataFrame([("a", 3.0), ("b", 7.0)], ["user", "value"])
    cat.write_partition(df, "t", "2024-02-01", stats_cols=["value"])
    st = cat.committed_partitions("t")["2024-02-01"]["stats"]["value"]
    assert (st["min"], st["max"], st["nulls"]) == (3.0, 7.0, 0)
