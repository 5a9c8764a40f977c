"""InfluxQL function semantics on hand-computed frames: nearest-rank
percentile, mode tie-break, derivative/moving-average emission rules,
trapezoidal integral, first/last selectors."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from influxer_spark.operators import influxql as Q


def _frame(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        ("a", t0 + dt.timedelta(minutes=i), v)
        for i, v in enumerate([10.0, 20.0, 20.0, 40.0, 30.0])
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_percentile_nearest_rank(spark):
    df = _frame(spark)
    # sorted: 10,20,20,30,40; p90 → ceil(0.9*5)=5th → 40; p50 → ceil(2.5)=3rd → 20
    assert Q.agg_percentile(df, ["k"], "v", 90.0).collect()[0]["p90"] == 40.0
    assert Q.agg_median(df, ["k"], "v").collect()[0]["median"] == 20.0


def test_percentile_influxdb_rounding(spark):
    """InfluxDB rounds the rank: floor(n*p/100 + 0.5); below 1 → no row.
    n=5, p=44 → floor(2.7) = 2nd smallest (a ceil impl would give the 3rd)."""
    df = _frame(spark)  # sorted v: 10,20,20,30,40
    assert Q.agg_percentile(df, ["k"], "v", 44.0).collect()[0]["p44"] == 20.0
    assert Q.agg_percentile(df, ["k"], "v", 5.0).collect() == []  # rank 0 → no row


def test_elapsed_truncates_to_whole_units(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, 1.0), ("a", t0 + dt.timedelta(seconds=90), 2.0)],
        ["k", "ts", "v"],
    )
    out = df.select(Q.tr_elapsed(df, ["k"], "ts", 60).alias("el")).orderBy("el").collect()
    # 90 s at unit=60 s → 1 whole minute (InfluxQL integer truncation), not 1.5
    assert [r["el"] for r in out] == [None, 1]


def test_mode_tie_breaks_to_smallest(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 3.0), ("a", 3.0), ("a", 2.0)], ["k", "v"]
    )
    assert Q.agg_mode(df, ["k"], "v").collect()[0]["mode"] == 1.0


def test_spread_first_last(spark):
    df = _frame(spark)
    assert Q.agg_spread(df, ["k"], "v").collect()[0]["spread"] == 30.0
    r = Q.sel_first_last(df, ["k"], "ts", "v").collect()[0]
    assert (r["first_v"], r["last_v"]) == (10.0, 30.0)


def test_transforms_emission_rules(spark):
    df = _frame(spark)
    out = df.select(
        "ts",
        Q.tr_difference(df, ["k"], "ts", "v").alias("d"),
        Q.tr_derivative(df, ["k"], "ts", "v", 60).alias("dv"),
        Q.tr_non_negative_derivative(df, ["k"], "ts", "v", 60).alias("nn"),
        Q.tr_moving_average(df, ["k"], "ts", "v", 3).alias("ma"),
        Q.tr_cumulative_sum(df, ["k"], "ts", "v").alias("cs"),
        Q.tr_elapsed(df, ["k"], "ts", 60).alias("el"),
    ).orderBy("ts").collect()
    assert [r["d"] for r in out] == [None, 10.0, 0.0, 20.0, -10.0]
    assert [r["dv"] for r in out] == [None, 10.0, 0.0, 20.0, -10.0]  # per-minute
    assert [r["nn"] for r in out] == [None, 10.0, 0.0, 20.0, None]
    assert [r["ma"] for r in out][:3] == [None, None, (10 + 20 + 20) / 3]
    assert [r["cs"] for r in out] == [10.0, 30.0, 50.0, 90.0, 120.0]
    assert [r["el"] for r in out] == [None, 1.0, 1.0, 1.0, 1.0]


def test_moving_percentile(spark):
    df = _frame(spark)
    out = df.select(
        "ts",
        Q.tr_moving_percentile(df, ["k"], "ts", "v", 50, 3).alias("mp"),
        Q.tr_moving_percentile(df, ["k"], "ts", "v", 100, 3).alias("mx"),
    ).orderBy("ts").collect()
    # v = [10, 20, 20, 40, 30]; rank(p50, n=3) = floor(1.5+0.5) = 2 of sorted 3
    assert [r["mp"] for r in out] == [None, None, 20.0, 20.0, 30.0]
    # p100 → rank 3 = trailing max, an actual data point
    assert [r["mx"] for r in out] == [None, None, 20.0, 40.0, 40.0]


def test_integral_trapezoid(spark):
    df = _frame(spark)
    # trapezoids over 60s gaps: (15+20+30+35)*60 = 6000; per-minute → 100
    r = Q.agg_integral(df, ["k"], "ts", "v", 60).collect()[0]
    assert r["integral"] == 100.0


def test_top_bottom(spark):
    df = _frame(spark)
    top2 = Q.sel_top(df, ["k"], "v", 2).collect()
    assert [r["v"] for r in top2] == [40.0, 30.0]
    bot2 = Q.sel_top(df, ["k"], "v", 2, bottom=True).collect()
    assert [r["v"] for r in bot2] == [10.0, 20.0]
    # equal values tie-break to the earlier timestamp
    assert bot2[1]["ts"] == dt.datetime(2024, 1, 1, 0, 1)
