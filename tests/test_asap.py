"""ASAP automatic smoothing (operators/asap.py)."""

from __future__ import annotations

import numpy as np
import pytest

from influxer_spark.operators.asap import (
    _acf,
    _kurtosis,
    _roughness,
    _sma,
    asap_smooth,
    asap_window,
)


def _seasonal_noisy(n=480, period=24, spike=20.0, noise=4.0, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = 10.0 * np.sin(2 * np.pi * t / period) + rng.normal(0, noise, n)
    x[200] += spike  # a mild spike the smoothing must keep visible
    return x


def test_acf_finds_the_season():
    x = _seasonal_noisy()
    acf = _acf(x, 60)
    # strongest interior peak at the period
    peak = int(np.argmax(acf[2:])) + 3
    assert abs(peak - 24) <= 1


def test_sma_matches_numpy_convolve():
    rng = np.random.default_rng(1)
    x = rng.normal(size=100)
    for w in (2, 5, 24):
        ref = np.convolve(x, np.ones(w) / w, mode="valid")
        assert np.allclose(_sma(x, w), ref, rtol=1e-12, atol=1e-12)


def test_window_choice_smooths_season_keeps_spike():
    x = _seasonal_noisy()
    w = asap_window(x, max_window=60)
    assert w >= 2  # found a usable candidate (the ACF season)
    s = _sma(x, w)
    assert _roughness(s) < _roughness(x)          # visibly smoother
    assert _kurtosis(s) >= _kurtosis(x)           # spike preserved


def test_dominant_spike_forces_pass_through():
    # when one huge spike carries the kurtosis, ANY moving average dilutes
    # it below the original — spike preservation wins and ASAP refuses to
    # smooth (the paper's constraint, exactly)
    x = _seasonal_noisy(spike=80.0, noise=2.0)
    assert asap_window(x, max_window=60) == 1


def test_white_noise_without_structure_passes_through():
    rng = np.random.default_rng(9)
    x = rng.normal(size=300)
    # white noise has no ACF peak above the floor → window 1 (no smoothing)
    assert asap_window(x, max_window=50, corr_threshold=0.2) == 1


def test_constant_series_is_safe():
    assert asap_window(np.full(50, 3.0)) == 1


def test_dataframe_fold_matches_kernel(spark):
    x = _seasonal_noisy(n=480)
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = asap_smooth(df, ["k"], "i", "v", max_window=60)
    got = (
        out.orderBy("idx").toPandas()
    )
    w = asap_window(x, max_window=60)
    ref = _sma(x, w) if w > 1 else x
    assert (got["window"] == w).all()
    assert np.allclose(got["smoothed"].to_numpy(), ref, rtol=0, atol=0)
    assert len(got) == len(x) - w + 1


def test_series_isolated(spark):
    a = _seasonal_noisy(n=480, seed=5)
    rng = np.random.default_rng(11)
    b = rng.normal(size=480)  # no structure
    rows = [("a", i, float(v)) for i, v in enumerate(a)]
    rows += [("b", i, float(v)) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = asap_smooth(df, ["k"], "i", "v", max_window=60)
    ws = {r["k"]: r["window"] for r in out.select("k", "window")
          .distinct().collect()}
    assert ws["a"] >= 2 and ws["b"] == 1


def test_max_points_guard(spark):
    rows = [("a", i, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    with pytest.raises(Exception, match="max_points"):
        asap_smooth(df, ["k"], "i", "v", max_points=10).collect()


def test_frontend_asap_string(spark):
    from pyspark.sql import functions as F

    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    x = _seasonal_noisy(n=480)
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(hours=i), "x", float(v)) for i, v in enumerate(x)
    ]
    df = spark.createDataFrame(rows, ["ts", "tag", "v"])
    out = influxql(
        "SELECT asap(mean(v)) AS sm FROM m GROUP BY time(1h), tag",
        {"m": df},
        ts_col="ts",
    ).collect()
    w = asap_window(np.asarray(x), max_window=max(2, len(x) // 10))
    assert len(out) == len(x) - w + 1
    assert all(r["sm_window"] == w for r in out)
    ref = _sma(np.asarray(x), w)
    got = {r["time"]: r["sm"] for r in out}
    # the first output row sits at the series start and carries the first
    # window mean
    assert got[t0] == ref[0]

    with pytest.raises(InfluxQLError, match="aggregate"):
        influxql(
            "SELECT asap(v) FROM m GROUP BY time(1h)", {"m": df}, ts_col="ts"
        ).collect()
    with pytest.raises(InfluxQLError, match="GROUP BY time"):
        influxql("SELECT asap(mean(v)) FROM m", {"m": df}, ts_col="ts").collect()


def test_frontend_asap_offset_grid_keeps_true_times(spark):
    import datetime as dt

    from influxer_spark.influxql_frontend import influxql

    # offset grid: buckets at :30 — output timestamps must stay on it
    x = _seasonal_noisy(n=480)
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (t0 + dt.timedelta(hours=i), "x", float(v)) for i, v in enumerate(x)
    ]
    df = spark.createDataFrame(rows, ["ts", "tag", "v"])
    out = influxql(
        "SELECT asap(mean(v)) AS sm FROM m GROUP BY time(1h, 30m), tag",
        {"m": df},
        ts_col="ts",
    ).collect()
    assert out and all(r["time"].minute == 30 for r in out)
    assert min(r["time"] for r in out) == t0


def test_asap_null_values_are_absent_points(spark):
    # a NULL mid-series must neither poison the ACF nor appear in output
    x = _seasonal_noisy(n=480)
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    rows.insert(100, ("a", 1000, None))
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = asap_smooth(df, ["k"], "i", "v", max_window=60)
    got = out.toPandas()
    assert got["window"].iloc[0] >= 2          # structure still found
    assert not got["smoothed"].isna().any()    # no NaN leaked


def test_asap_gate_query_matches_independent_duckdb_series(spark, sf_dir):
    """End-to-end gate pin (the strongest check available for a rows-only
    entry): DuckDB rebuilds the IDENTICAL hourly mean series (the exact
    round(sum*100)/(count*100.0) form is one IEEE division on both
    engines), the Python kernel smooths it, and every (idx, window,
    smoothed) row must equal the Spark gate output bit-for-bit — pinning
    the Spark-side fold, ordering, and NULL handling, not just the
    kernel."""
    import duckdb
    import numpy as np

    from influxer_spark.influxql_queries import _q_asap_smooth
    from influxer_spark.operators.asap import _sma, asap_window

    got = {}
    for r in _q_asap_smooth(spark, sf_dir).collect():
        got.setdefault(r["event_type"], []).append(
            (r["idx"], r["window"], r["smoothed"])
        )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    series = con.execute(
        """
        SELECT event_type,
               list(CAST(round(s * 100, 0) AS BIGINT) / (c * 100.0)
                    ORDER BY bucket) AS v
        FROM (SELECT event_type, date_trunc('hour', ts) AS bucket,
                     sum(value) AS s, count(value) AS c
              FROM events GROUP BY 1, 2)
        GROUP BY 1
        """
    ).fetchall()
    assert len(series) == len(got) > 0
    for key, v in series:
        x = np.asarray(v, dtype=np.float64)
        w = asap_window(x, max_window=72)
        sm = _sma(x, w) if w > 1 else x
        want = [(i, w, float(sm[i])) for i in range(len(sm))]
        assert sorted(got[key]) == want, key
