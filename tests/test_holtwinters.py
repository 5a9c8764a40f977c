"""Holt-Winters (operators/holtwinters.py): method properties the fit must
satisfy regardless of optimizer trajectory, determinism, and the string
front-end path.  (No SQL oracle by nature — iterative optimization.)
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators.holtwinters import holt_winters

T0 = dt.datetime(2024, 1, 1)
HOUR_US = 3_600_000_000


def _series(spark, values, key="a", step_h=1):
    rows = [
        (key, T0 + dt.timedelta(hours=i * step_h), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_linear_series_forecast_is_exact_continuation(spark):
    """Holt's linear method reproduces an exactly-linear series with zero
    one-step error for ANY smoothing params (trend init = the true slope),
    so the forecast is the exact continuation — optimizer-independent."""
    vals = [3.0 + 2.0 * i for i in range(12)]
    out = holt_winters(
        _series(spark, vals), ["k"], "ts", "v",
        n_predict=4, season_length=0, interval_seconds=3600,
    ).orderBy("ts").collect()
    assert len(out) == 4
    for h, r in enumerate(out, start=1):
        assert r["holt_winters"] == pytest.approx(3.0 + 2.0 * (11 + h), abs=1e-9)
        assert r["ts"] == T0 + dt.timedelta(hours=11 + h)


def test_seasonal_series_forecast_tracks_season(spark):
    """Linear trend + exact additive season of length 4: the fitted model
    reproduces it, so forecasts must continue trend + season closely."""
    season = [5.0, -2.0, 0.5, -3.5]
    vals = [10.0 + 0.5 * i + season[i % 4] for i in range(24)]
    out = holt_winters(
        _series(spark, vals), ["k"], "ts", "v",
        n_predict=8, season_length=4, interval_seconds=3600,
    ).orderBy("ts").collect()
    assert len(out) == 8
    for h, r in enumerate(out, start=1):
        want = 10.0 + 0.5 * (23 + h) + season[(23 + h) % 4]
        assert r["holt_winters"] == pytest.approx(want, rel=0.02, abs=0.3)


def test_with_fit_emits_history_then_forecast(spark):
    vals = [3.0 + 2.0 * i for i in range(10)]
    out = holt_winters(
        _series(spark, vals), ["k"], "ts", "v",
        n_predict=3, season_length=0, interval_seconds=3600, with_fit=True,
    ).orderBy("ts").collect()
    # fitted one-step-ahead values start at the 2nd point: 9 history + 3
    assert len(out) == 12
    assert out[0]["ts"] == T0 + dt.timedelta(hours=1)
    # on a linear series the fitted values are the series itself
    for i, r in enumerate(out[:9]):
        assert r["holt_winters"] == pytest.approx(vals[i + 1], abs=1e-9)


def test_deterministic_and_per_series_isolated(spark):
    vals_a = [math.sin(i / 3.0) * 4 + i * 0.2 + 7 for i in range(20)]
    vals_b = [v * 2 + 1 for v in vals_a]
    df = _series(spark, vals_a, "a").unionByName(_series(spark, vals_b, "b"))
    run = lambda: holt_winters(  # noqa: E731
        df, ["k"], "ts", "v", 5, 0, 3600
    ).orderBy("k", "ts").collect()
    r1, r2 = run(), run()
    assert [x["holt_winters"] for x in r1] == [x["holt_winters"] for x in r2]
    a = [x["holt_winters"] for x in r1 if x["k"] == "a"]
    b = [x["holt_winters"] for x in r1 if x["k"] == "b"]
    assert len(a) == len(b) == 5
    assert all(abs(2 * x + 1 - y) < 1.5 for x, y in zip(a, b))


def test_too_short_series_emits_nothing(spark):
    out = holt_winters(
        _series(spark, [5.0]), ["k"], "ts", "v", 3, 0, 3600
    ).collect()
    assert out == []


def test_frontend_holt_winters_string(spark):
    from influxer_spark.influxql_frontend import influxql

    vals = [3.0 + 2.0 * i for i in range(12)]
    raw = _series(spark, vals)
    out = influxql(
        "SELECT holt_winters(mean(v), 4, 0) AS hw FROM m"
        " GROUP BY time(1h), k",
        {"m": raw}, ts_col="ts",
    ).orderBy("time").collect()
    assert len(out) == 4
    for h, r in enumerate(out, start=1):
        assert r["hw"] == pytest.approx(3.0 + 2.0 * (11 + h), abs=1e-9)
        assert r["time"] == T0 + dt.timedelta(hours=11 + h)


def test_frontend_holt_winters_requires_group_by_time(spark):
    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    with pytest.raises(InfluxQLError, match="GROUP BY time"):
        influxql(
            "SELECT holt_winters(mean(v), 4, 0) FROM m GROUP BY k",
            {"m": _series(spark, [1.0, 2.0])}, ts_col="ts",
        )


def test_frontend_holt_winters_with_fit_string(spark):
    from influxer_spark.influxql_frontend import influxql

    vals = [3.0 + 2.0 * i for i in range(12)]
    out = influxql(
        "SELECT holt_winters_with_fit(mean(v), 3, 0) AS hw FROM m"
        " GROUP BY time(1h), k",
        {"m": _series(spark, vals)}, ts_col="ts",
    ).orderBy("time").collect()
    assert len(out) == 11 + 3  # fitted history from pt 2 + forecasts
    for i, r in enumerate(out):
        assert r["hw"] == pytest.approx(3.0 + 2.0 * (i + 1), abs=1e-9)


def test_null_buckets_are_skipped(spark):
    """fill(null) leaves NULL buckets; one NaN in the SSE would poison
    every forecast, so the fit must drop them."""
    vals = [3.0 + 2.0 * i for i in range(12)]
    rows = [("a", T0 + dt.timedelta(hours=i), v if i != 5 else None)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = holt_winters(df, ["k"], "ts", "v", 3, 0, 3600).orderBy("ts").collect()
    assert len(out) == 3
    for h, r in enumerate(out, start=1):
        assert r["holt_winters"] == pytest.approx(3.0 + 2.0 * (11 + h), abs=1e-9)


def test_seasonal_naive_mase_detects_seasonality(spark):
    """A perfectly period-24 series has zero seasonal-naive error (mase=0);
    a trending series is better explained by naive-1 (mase > 1)."""
    import datetime as dt
    import math

    from influxer_spark.operators.holtwinters import seasonal_naive_eval

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(96):
        ts = t0 + dt.timedelta(hours=i)
        rows.append(("seasonal", ts, math.sin(2 * math.pi * (i % 24) / 24)))
        rows.append(("trend", ts, float(i)))
    df = spark.createDataFrame(rows, ["event_type", "bucket", "v"])
    out = {r["event_type"]: r for r in seasonal_naive_eval(
        df, ["event_type"], "bucket", "v", period=24).collect()}

    assert out["seasonal"]["mase"] == 0.0
    assert out["seasonal"]["n_eval_snaive"] == 96 - 24
    # trend: snaive error = 24 per point, naive-1 error = 1 → mase = 24
    assert out["trend"]["mase"] == 24.0


def test_hw_gate_query_matches_mirror_on_same_series(spark, sf_dir):
    """End-to-end gate pin for the rows-only entry: collect the EXACT
    hourly-mean series the front-end aggregates (so optimizer-trajectory
    sensitivity to last-ulp input differences is out of the picture) and
    require the gate output to equal the plain-Python mirror kernel
    bit-for-bit — pinning the front-end's grouping, time spine, season
    phase, and horizon stamping."""
    import numpy as np
    from pyspark.sql import functions as F

    from influxer_spark.influxql_queries import _q_holt_winters
    from influxer_spark.operators.holtwinters import hw_forecast_series

    got = {}
    for r in _q_holt_winters(spark, sf_dir).collect():
        got.setdefault(r["event_type"], []).append((r["bucket"], r["hw"]))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("b"))
        .agg(F.avg("value").alias("y"))
        .orderBy("event_type", "b")
        .collect()
    )
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append((r["b"], r["y"]))
    assert sorted(series) == sorted(got)
    for key, pts in series.items():
        ts_us = np.asarray(
            [int(b.timestamp() * 1_000_000) for b, _ in pts], dtype=np.int64
        )
        y = np.asarray([v for _, v in pts], dtype=np.float64)
        out_t, out_v = hw_forecast_series(
            ts_us, y, n_predict=24, season_length=24,
            interval_us=3_600_000_000, with_fit=False,
        )
        want = [
            (int(t), float(v)) for t, v in zip(out_t.tolist(), out_v.tolist())
        ]
        have = [
            (int(b.timestamp() * 1_000_000), v) for b, v in sorted(got[key])
        ]
        assert have == want, key
