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


# ---------------------------------------------------------------------------
# linear_forecast — closed-form per-series OLS continuation
# ---------------------------------------------------------------------------

from influxer_spark.operators.trend import linear_forecast  # noqa: E402


def test_linear_forecast_exact_on_perfect_line(spark):
    # y = 7t + 3 in ticks: the fit must recover slope 7 exactly (rational
    # slope_num/slope_den reduces to 7/1 scaled) and continue the line.
    df = _series_df(spark, [3 + 7 * t for t in range(10)])
    out = linear_forecast(df, ["k"], "i", "v", [10, 11, 12], tick_scale=1)
    rows = {r["i"]: r for r in out.collect()}
    assert set(rows) == {10, 11, 12}
    for i, r in rows.items():
        assert r["n_fit"] == 10
        assert r["slope_num"] / r["slope_den"] == 7.0
        assert r["pred"] == float(3 + 7 * i)


def test_linear_forecast_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    v = rng.integers(0, 10_000, size=50).tolist()
    out = linear_forecast(
        _series_df(spark, v), ["k"], "i", "v", [50, 60], tick_scale=1
    ).collect()
    slope, intercept = np.polyfit(np.arange(50), np.asarray(v, float), 1)
    by_idx = {r["i"]: r["pred"] for r in out}
    assert by_idx[50] == pytest.approx(intercept + slope * 50, rel=1e-9)
    assert by_idx[60] == pytest.approx(intercept + slope * 60, rel=1e-9)


def test_linear_forecast_series_isolated_and_degenerate_dropped(spark):
    # series "a" is a line; series "b" has one point (no fit) — it must
    # vanish rather than emit NaNs.
    a = [(("a"), i, 10 * i) for i in range(5)]
    b = [("b", 0, 99)]
    df = spark.createDataFrame(a + b, ["k", "i", "v"])
    out = linear_forecast(df, ["k"], "i", "v", [5], tick_scale=1).collect()
    assert len(out) == 1 and out[0]["k"] == "a" and out[0]["pred"] == 50.0


def test_linear_forecast_tick_scale_divides_once(spark):
    # ticks are 1e-4 units: pred must come back in field units.
    df = _series_df(spark, [20_000 + 10_000 * t for t in range(4)])
    out = linear_forecast(df, ["k"], "i", "v", [4], tick_scale=10_000).collect()
    assert out[0]["pred"] == 6.0  # 2.0 + 1.0·t at t=4


def test_linear_forecast_gate_query_matches_duckdb(spark, sf_dir):
    import duckdb

    from influxer_spark.influxql_queries import (
        _FORECAST_LINEAR_SQL,
        _q_forecast_linear,
    )

    got = _q_forecast_linear(spark, sf_dir)
    cols = sorted(got.columns)
    spark_rows = sorted(
        tuple(r[c] for c in cols) for r in got.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    cur = con.execute(_FORECAST_LINEAR_SQL)
    names = [d[0] for d in cur.description]
    idx = [names.index(c) for c in cols]
    ora_rows = sorted(tuple(row[i] for i in idx) for row in cur.fetchall())
    assert len(spark_rows) == len(ora_rows) > 0
    for s, o in zip(spark_rows, ora_rows):
        for a, b in zip(s, o):
            if hasattr(a, "replace") and hasattr(a, "tzinfo"):  # timestamps
                a = a.replace(tzinfo=None)
                b = b.replace(tzinfo=None)
            assert a == b, (s, o)


# ---------------------------------------------------------------------------
# forecast_linear through the InfluxQL string front-end
# ---------------------------------------------------------------------------


def test_linear_forecast_horizon_per_series_continuation(spark):
    from influxer_spark.operators.trend import linear_forecast_horizon

    # series "a": line over idx 100..104 (ends at 104); series "b": line over
    # idx 200..202 (ends at 202) — each continues from ITS OWN last index,
    # and the large absolute index exercises the internal centering.
    rows = [("a", 100 + t, 5 + 2 * t) for t in range(5)]
    rows += [("b", 200 + t, 50 - 3 * t) for t in range(3)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = linear_forecast_horizon(df, ["k"], "i", "v", horizon=2, tick_scale=1)
    got = {(r["k"], r["i"]): r["pred"] for r in out.collect()}
    assert got == {
        ("a", 105): float(5 + 2 * 5),
        ("a", 106): float(5 + 2 * 6),
        ("b", 203): float(50 - 3 * 3),
        ("b", 204): float(50 - 3 * 4),
    }


def test_frontend_forecast_linear_string(spark):
    from influxer_spark.influxql_frontend import influxql

    # hourly sums 0,10,20,…  → forecast continues the line
    rows = [("2024-01-01T%02d:00:00" % h, "x", 10 * h) for h in range(6)]
    df = spark.createDataFrame(rows, ["bucket", "tag", "v"]).withColumn(
        "bucket", F.to_timestamp("bucket")
    )
    out = influxql(
        "SELECT forecast_linear(sum(v), 3) AS fc"
        " FROM m GROUP BY time(1h), tag",
        {"m": df},
        ts_col="bucket",
    ).collect()
    assert len(out) == 3
    by_time = {r["time"].hour: r["fc"] for r in out}
    assert by_time == {6: 60.0, 7: 70.0, 8: 80.0}
    assert all(r["tag"] == "x" for r in out)


def test_frontend_forecast_linear_offset_grid(spark):
    """GROUP BY time(1h, 15m): every output row — observed-range and
    horizon alike — must land on the k*w+off grid, and the forecast values
    must be computed on that same grid (the r03 ADVICE regression rebuilt
    times as floor(epoch/w)*w, shifting every row by -off)."""
    from influxer_spark.influxql_frontend import influxql

    # buckets at HH:15 → sums 0,10,…,50 over 6 offset-aligned hours
    rows = [("2024-01-01T%02d:15:00" % h, "x", 10 * h) for h in range(6)]
    df = spark.createDataFrame(rows, ["bucket", "tag", "v"]).withColumn(
        "bucket", F.to_timestamp("bucket")
    )
    out = influxql(
        "SELECT forecast_linear(sum(v), 2) AS fc"
        " FROM m GROUP BY time(1h, 15m), tag",
        {"m": df},
        ts_col="bucket",
    ).collect()
    got = {(r["time"].hour, r["time"].minute): r["fc"] for r in out}
    assert got == {(6, 15): 60.0, (7, 15): 70.0}


def test_frontend_forecast_linear_rejects_tz(spark):
    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    df = spark.createDataFrame(
        [("2024-01-01T00:00:00", "x", 1.0)], ["bucket", "tag", "v"]
    ).withColumn("bucket", F.to_timestamp("bucket"))
    with pytest.raises(InfluxQLError, match="tz"):
        influxql(
            "SELECT forecast_linear(sum(v), 2) FROM m"
            " GROUP BY time(1h) tz('America/New_York')",
            {"m": df},
            ts_col="bucket",
        ).collect()


def test_frontend_forecast_linear_rejections(spark):
    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    df = spark.createDataFrame(
        [("2024-01-01T00:00:00", "x", 1.0)], ["bucket", "tag", "v"]
    ).withColumn("bucket", F.to_timestamp("bucket"))
    for q, msg in [
        ("SELECT forecast_linear(v, 3) FROM m GROUP BY time(1h)", "aggregate"),
        ("SELECT forecast_linear(sum(v), 3) FROM m", "GROUP BY time"),
        (
            "SELECT forecast_linear(sum(v), 3), mean(v) FROM m"
            " GROUP BY time(1h)",
            "only projection",
        ),
    ]:
        with pytest.raises(InfluxQLError, match=msg):
            influxql(q, {"m": df}, ts_col="bucket").collect()


def test_influxql_forecast_gate_matches_duckdb(spark, sf_dir):
    import duckdb

    from influxer_spark.influxql_queries import (
        _INFLUXQL_FORECAST_SQL,
        _q_influxql_forecast,
    )

    got = _q_influxql_forecast(spark, sf_dir)
    cols = sorted(got.columns)
    spark_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    cur = con.execute(_INFLUXQL_FORECAST_SQL)
    names = [d[0] for d in cur.description]
    idx = [names.index(c) for c in cols]
    ora_rows = sorted(tuple(row[i] for i in idx) for row in cur.fetchall())
    assert len(spark_rows) == len(ora_rows) > 0
    for s, o in zip(spark_rows, ora_rows):
        for a, b in zip(s, o):
            if hasattr(a, "tzinfo"):
                a = a.replace(tzinfo=None)
                b = b.replace(tzinfo=None)
            assert a == b, (s, o)
