"""Time-weighted average tiers (operators/timeweight.py).

The load-bearing property: cascading fine summaries through the monoid
merge is bit-identical to computing the coarse bucket from raw points —
same area (integer cent·seconds), same endpoints, same twa double.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import timeweight as TW

KEYS = ["event_type"]


def _raw(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("coarse", ["1h", "1d"])
def test_cascade_equals_direct(spark, sf_dir, coarse):
    ev = _raw(spark, sf_dir)
    direct = TW.twa_value(TW.twa_rollup(ev, "ts", KEYS, "value", coarse))
    fine = TW.twa_rollup(ev, "ts", KEYS, "value", "1m")
    cascaded = TW.twa_value(TW.twa_cascade(fine, KEYS, coarse))
    d, c = _pdf(direct), _pdf(cascaded)
    assert d.shape == c.shape
    for col in ["first_t", "first_v", "last_t", "last_v", "area", "dur"]:
        assert (d[col] == c[col]).all(), col
    # twa is double: cascaded and direct divide the SAME integers → identical bits
    assert ((d["twa"] == c["twa"]) | (d["twa"].isna() & c["twa"].isna())).all()


def test_two_level_cascade_associative(spark, sf_dir):
    """1m → 1h → 1d equals 1m → 1d: the merge is associative."""
    ev = _raw(spark, sf_dir)
    fine = TW.twa_rollup(ev, "ts", KEYS, "value", "1m")
    via_1h = TW.twa_cascade(TW.twa_cascade(fine, KEYS, "1h"), KEYS, "1d")
    straight = TW.twa_cascade(fine, KEYS, "1d")
    a, b = _pdf(via_1h), _pdf(straight)
    assert a.shape == b.shape
    for col in TW.SUMMARY_COLS:
        assert (a[col] == b[col]).all(), col


def test_hand_computed_locf_area(spark):
    """Points (t=0,v=1.00), (t=10,v=3.00), (t=70,v=5.00) for one series:
    minute 0 holds 100 cents for 10 s (area 1000), the 3.00 bridges 60 s
    into minute 1 only via the cascade; the 1h summary has area
    1000 + 300·60 = 19000 cent·s over dur 70 → twa = 19000/70/100."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 1.0),
        ("a", base + dt.timedelta(seconds=10), 3.0),
        ("a", base + dt.timedelta(seconds=70), 5.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    t1m = TW.twa_rollup(df, "ts", KEYS, "value", "1m")
    m = {r["bucket"].minute: r for r in t1m.collect()}
    assert m[0]["area"] == 100 * 10 and m[0]["last_v"] == 300
    assert m[1]["area"] == 0  # single-point minute: no in-bucket segment
    t1h = TW.twa_value(TW.twa_cascade(t1m, KEYS, "1h")).collect()[0]
    assert t1h["area"] == 100 * 10 + 300 * 60
    assert t1h["dur"] == 70
    assert t1h["twa"] == pytest.approx(19000 / 70 / 100.0)


def test_single_point_bucket_has_null_twa(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 0, 30), 2.0)],
        ["event_type", "ts", "value"],
    )
    out = TW.twa_value(TW.twa_rollup(df, "ts", KEYS, "value", "1m")).collect()[0]
    assert out["area"] == 0 and out["dur"] == 0 and out["twa"] is None


def test_same_second_ties_are_deterministic(spark):
    """Two values in the same second collapse to max() before weighting —
    a zero-duration reading must not make area order-dependent."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 1.0),
        ("a", base, 9.0),  # tie: max wins
        ("a", base + dt.timedelta(seconds=5), 2.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = TW.twa_rollup(df, "ts", KEYS, "value", "1m").collect()[0]
    assert out["first_v"] == 900 and out["area"] == 900 * 5
