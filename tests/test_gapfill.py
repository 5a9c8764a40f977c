"""Gap-fill + linear interpolation (SURVEY.md A5)."""

from __future__ import annotations

import datetime as dt

import pytest

from influxer_spark.operators.gapfill import gapfill_interpolate, gapfill_locf


@pytest.fixture(scope="module")
def rolled(spark):
    # series "a": hours 0, 1, 4 observed (gap at 2, 3); series "b": hours 0, 2
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0), 10.0),
        ("a", dt.datetime(2024, 1, 1, 1), 20.0),
        ("a", dt.datetime(2024, 1, 1, 4), 50.0),
        ("b", dt.datetime(2024, 1, 1, 0), 1.0),
        ("b", dt.datetime(2024, 1, 1, 2), 3.0),
    ]
    return spark.createDataFrame(rows, "key string, bucket timestamp, v double")


def test_linear_interpolation(rolled):
    out = gapfill_interpolate(rolled, ["key"], "v", "1h")
    got = {(r["key"], r["bucket"].hour): (r["v"], r["filled"]) for r in out.collect()}
    assert got[("a", 0)] == (10.0, False)
    assert got[("a", 1)] == (20.0, False)
    assert got[("a", 2)] == (30.0, True)  # 20 + (50-20) * 1/3
    assert got[("a", 3)] == (40.0, True)
    assert got[("a", 4)] == (50.0, False)
    assert got[("b", 1)] == (2.0, True)
    assert len(got) == 8  # 5 spine hours for a + 3 for b


def test_no_extrapolation_beyond_series_range(rolled):
    out = gapfill_interpolate(rolled, ["key"], "v", "1h")
    # spine is bounded by each series' own min/max bucket
    b_hours = sorted(r["bucket"].hour for r in out.filter("key = 'b'").collect())
    assert b_hours == [0, 1, 2]


def test_locf(rolled):
    out = gapfill_locf(rolled, ["key"], "v", "1h")
    got = {(r["key"], r["bucket"].hour): r["v"] for r in out.collect()}
    assert got[("a", 2)] == 20.0
    assert got[("a", 3)] == 20.0


def test_spine_is_dense_per_series(spark):
    rows = [
        ("k", dt.datetime(2024, 1, 1, 0), 1.0),
        ("k", dt.datetime(2024, 1, 3, 0), 2.0),
    ]
    df = spark.createDataFrame(rows, "key string, bucket timestamp, v double")
    out = gapfill_interpolate(df, ["key"], "v", "1d")
    assert out.count() == 3
    assert out.filter("filled").count() == 1
