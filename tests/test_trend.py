"""Mann-Kendall / Theil-Sen robust trend statistics per series."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from influxer_spark.operators.trend import mk_theilsen


def _brute(x: list[int]) -> tuple[int, int, float, float]:
    """Reference O(n²) python loop: (n, S, tau, sen_slope)."""
    n = len(x)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = x[j] - x[i]
            s += (d > 0) - (d < 0)
            slopes.append(d / (j - i))
    return n, s, s / (n * (n - 1) / 2), float(np.median(slopes))


def _series_df(spark, v, key="a"):
    return spark.createDataFrame(
        [(key, i, int(x)) for i, x in enumerate(v)], ["k", "i", "v"]
    )


def test_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    v = rng.integers(-500, 500, size=40).tolist()
    row = mk_theilsen(_series_df(spark, v), ["k"], "i", "v").collect()[0]
    n, s, tau, sen = _brute(v)
    assert (row["n_points"], row["mk_s"]) == (n, s)
    assert row["mk_tau"] == tau
    assert row["sen_slope"] == sen


def test_monotonic_rising_is_tau_one(spark):
    v = [3 * i + 7 for i in range(20)]
    row = mk_theilsen(_series_df(spark, v), ["k"], "i", "v").collect()[0]
    assert row["mk_tau"] == 1.0
    assert row["mk_s"] == 20 * 19 // 2
    assert row["sen_slope"] == 3.0


def test_constant_series_is_flat(spark):
    row = mk_theilsen(_series_df(spark, [5] * 15), ["k"], "i", "v").collect()[0]
    assert row["mk_s"] == 0 and row["mk_tau"] == 0.0 and row["sen_slope"] == 0.0


def test_single_point_emits_nothing(spark):
    assert mk_theilsen(_series_df(spark, [1]), ["k"], "i", "v").count() == 0


def test_max_points_guard(spark):
    with pytest.raises(Exception, match="max_points"):
        mk_theilsen(
            _series_df(spark, list(range(30))), ["k"], "i", "v", max_points=10
        ).collect()


def test_multiple_series_independent(spark):
    rng = np.random.default_rng(3)
    va = rng.integers(0, 100, 25).tolist()
    vb = sorted(rng.integers(0, 100, 18).tolist())
    df = _series_df(spark, va, "a").union(_series_df(spark, vb, "b"))
    rows = {r["k"]: r for r in mk_theilsen(df, ["k"], "i", "v").collect()}
    for key, v in (("a", va), ("b", vb)):
        n, s, tau, sen = _brute(v)
        r = rows[key]
        assert (r["n_points"], r["mk_s"], r["mk_tau"], r["sen_slope"]) == (
            n, s, tau, sen
        )
    assert rows["b"]["mk_tau"] > 0.9  # sorted series is near-perfectly rising


def test_influxql_trend_field_form(spark):
    from influxer_spark.influxql_frontend import influxql

    rows = [("a", f"2024-01-01 {h:02d}:00:00", float(3 * h + 7)) for h in range(20)]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"]).withColumn(
        "bucket", F.to_timestamp("bucket")
    )
    out = influxql(
        "SELECT trend(v) FROM m GROUP BY k", {"m": df}, ts_col="bucket"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["trend"] == 3.0 and r["trend_tau"] == 1.0
    assert r["trend_s"] == 20 * 19 // 2 and r["trend_n"] == 20


def test_influxql_trend_agg_form(spark):
    from influxer_spark.influxql_frontend import influxql

    # two points per hour, mean = 2h exactly; hourly mean series rises 2/bucket
    rows = []
    for h in range(12):
        rows.append(("a", f"2024-01-01 {h:02d}:10:00", float(2 * h - 1)))
        rows.append(("a", f"2024-01-01 {h:02d}:40:00", float(2 * h + 1)))
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = influxql(
        "SELECT trend(mean(v)) AS drift FROM m GROUP BY time(1h), k",
        {"m": df}, ts_col="ts",
    ).collect()
    assert len(out) == 1 and out[0]["drift"] == 2.0 and out[0]["drift_tau"] == 1.0


def test_influxql_trend_rejections(spark):
    import pytest as _pytest

    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)], ["k", "ts", "v"]
    )
    with _pytest.raises(InfluxQLError, match="needs an aggregate"):
        influxql("SELECT trend(v) FROM m GROUP BY time(1h)", {"m": df}, ts_col="ts")
    with _pytest.raises(InfluxQLError, match="GROUP BY time"):
        influxql("SELECT trend(mean(v)) FROM m", {"m": df}, ts_col="ts")
    with _pytest.raises(InfluxQLError, match="only projection"):
        influxql(
            "SELECT trend(v), mean(v) FROM m GROUP BY time(1h)",
            {"m": df}, ts_col="ts",
        )


def test_order_col_gaps_rank_not_time(spark):
    # points at irregular order values: index is the RANK, so the slope
    # denominator counts observed steps, not wall-clock gaps
    df = spark.createDataFrame(
        [("a", 100, 10), ("a", 5, 0), ("a", 900, 20)], ["k", "i", "v"]
    )
    row = mk_theilsen(df, ["k"], "i", "v").collect()[0]
    assert row["sen_slope"] == 10.0 and row["mk_s"] == 3
