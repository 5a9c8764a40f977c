"""Theta-method forecasting (operators/theta.py)."""

from __future__ import annotations

import numpy as np
import pytest

from influxer_spark.operators.theta import (
    _best_alpha,
    _ses_level,
    theta_forecast,
    theta_forecast_1d,
)


def test_linear_series_damps_trend_at_half_drift():
    # the canonical Theta identity (Hyndman & Billah 2003): the forecast
    # is SES-with-drift b/2 — on a pure line the flat SES level plus the
    # extrapolating trend line average to HALF the slope per step.  This
    # deliberate damping is the method, not an error.
    x = 3.0 + 2.0 * np.arange(60)
    fc, alpha, a, b = theta_forecast_1d(x, 5)
    assert b == pytest.approx(2.0, abs=1e-9)
    steps = np.diff(fc)
    assert np.allclose(steps, b / 2.0, atol=1e-9)
    # step-1 sits between the last observation and the true continuation
    assert x[-1] < fc[0] < 3.0 + 2.0 * 60 + 1e-9


def test_constant_series_forecasts_constant():
    fc, alpha, a, b = theta_forecast_1d(np.full(40, 7.0), 3)
    assert np.allclose(fc, 7.0) and b == pytest.approx(0.0, abs=1e-12)


def test_ses_hand_computed():
    # level seeds at y0; alpha=0.5: 1, then 1+0.5(3−1)=2, then 2+0.5(2−2)=2
    level, sse = _ses_level(np.array([1.0, 3.0, 2.0]), 0.5)
    assert level == 2.0
    assert sse == pytest.approx((3 - 1) ** 2 + (2 - 2) ** 2)


def test_alpha_grid_deterministic_and_tracks_noise():
    rng = np.random.default_rng(5)
    smooth = np.cumsum(rng.normal(0, 1, 200))  # random walk → high alpha
    noisy = rng.normal(0, 1, 200)              # white noise → low alpha
    a1, a2 = _best_alpha(smooth), _best_alpha(noisy)
    assert a1 == _best_alpha(smooth)  # deterministic
    assert a1 > a2


def test_single_point_series():
    fc, alpha, a, b = theta_forecast_1d(np.array([5.0]), 4)
    assert np.allclose(fc, 5.0)


def test_dataframe_fold_matches_kernel(spark):
    rng = np.random.default_rng(9)
    x = 10.0 + 0.5 * np.arange(120) + rng.normal(0, 2.0, 120)
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    rows += [("b", i, 7.0) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = theta_forecast(df, ["k"], "i", "v", horizon=6)
    got_a = {r["step"]: r["forecast"] for r in out.filter("k = 'a'").collect()}
    fc, alpha, _a, _b = theta_forecast_1d(x, 6)
    assert got_a == {i + 1: fc[i] for i in range(6)}
    got_b = [r["forecast"] for r in out.filter("k = 'b'").collect()]
    assert np.allclose(got_b, 7.0)


def test_null_values_are_absent_points(spark):
    rows = [("a", i, float(i)) for i in range(30)]
    rows.insert(10, ("a", 100, None))
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = theta_forecast(df, ["k"], "i", "v", horizon=2).collect()
    assert all(np.isfinite(r["forecast"]) for r in out)


def test_max_points_guard(spark):
    rows = [("a", i, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    with pytest.raises(Exception, match="max_points"):
        theta_forecast(df, ["k"], "i", "v", horizon=2, max_points=10).collect()


def test_theta_gate_query_matches_duckdb(spark, sf_dir):
    """The r04 conversion contract: the theta gate query replays
    bit-for-bit on the recursive-CTE DuckDB oracle (exact-integer OLS +
    pinned SES op order) — the same cross-check the driver runs."""
    import duckdb

    from influxer_spark.influxql_queries import _THETA_SQL, _q_theta_forecast

    got = _q_theta_forecast(spark, sf_dir)
    cols = sorted(got.columns)
    spark_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    cur = con.execute(_THETA_SQL)
    names = [d[0] for d in cur.description]
    idx = [names.index(c) for c in cols]
    ora_rows = sorted(tuple(row[i] for i in idx) for row in cur.fetchall())
    assert len(spark_rows) == len(ora_rows) > 0
    assert spark_rows == ora_rows
