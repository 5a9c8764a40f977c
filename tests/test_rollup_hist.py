"""Quantile histograms in the rollup tiers (operators/rollup.py).

The property that makes bucket-count histograms tier-able: element-wise
integer sum of per-minute cell counts == the cell counts of the union, so a
cascaded coarse tier is BIT-identical to a direct rollup at that tier —
asserted below, along with quantile accuracy vs exact percentile (bounded by
the bound spacing) and the JVM-only plan.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from influxer_spark.operators import rollup as R

T0 = dt.datetime(2024, 1, 1)
BOUNDS = R.log2_bounds(0.5, 512.0)


def _events(spark, n=5000):
    rows = [
        (
            T0 + dt.timedelta(seconds=(i * 37) % 86400),
            "click" if i % 3 else "view",
            # log-uniform-ish positive values spanning the bound range
            float(0.5 * math.exp((i * 2654435761 % 1000) / 1000.0 * math.log(900.0))),
        )
        for i in range(n)
    ]
    rows.append((T0, "click", None))  # NULL contributes to nothing
    return spark.createDataFrame(rows, ["ts", "event_type", "value"])


def test_cascaded_hist_equals_direct_rollup(spark):
    ev = _events(spark)
    t1m = R.rollup_with_histogram(ev, "ts", ["event_type"], "value", BOUNDS)
    via_cascade = R.cascade_with_histogram(
        t1m, ["event_type"], "1h", len(BOUNDS) + 1
    )
    direct = R.rollup_with_histogram(
        ev, "ts", ["event_type"], "value", BOUNDS, "1h"
    )
    # hist cells and cnt are INTEGER sums — cascade is bit-exact for them
    # (sum_v is float and associativity-drifts; its exactness contract is
    # cents-level, covered by the rollup oracle queries)
    a = {
        (r["bucket"], r["event_type"]): (r["hist"], r["cnt"])
        for r in via_cascade.collect()
    }
    b = {
        (r["bucket"], r["event_type"]): (r["hist"], r["cnt"])
        for r in direct.collect()
    }
    assert a == b  # exact, not approximate: integer cell counts


def test_hist_mass_conservation_and_null_skip(spark):
    ev = _events(spark)
    t1h = R.rollup_with_histogram(ev, "ts", ["event_type"], "value", BOUNDS, "1h")
    for r in t1h.collect():
        assert sum(r["hist"]) == r["cnt"]  # every non-null value lands in one cell


def test_histogram_quantile_within_bound_spacing(spark):
    ev = _events(spark).where(F.col("value").isNotNull())
    t1d = R.cascade_with_histogram(
        R.rollup_with_histogram(ev, "ts", ["event_type"], "value", BOUNDS),
        ["event_type"],
        "1d",
        len(BOUNDS) + 1,
    )
    got = {
        r["event_type"]: r["p95"]
        for r in R.histogram_quantile(t1d, 0.95, BOUNDS, "p95").collect()
    }
    exact = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.95)").alias("x"))
        .collect()
    }
    for k, est in got.items():
        # half-octave bounds => containing cell is within 1.5x of the true
        # value; interpolation keeps the estimate inside that cell
        assert exact[k] / 1.5 <= est <= exact[k] * 1.5, (k, est, exact[k])


def test_quantile_edges(spark):
    # all mass in the overflow cell -> clamps to bounds[-1]; q=1.0 legal
    ev = spark.createDataFrame(
        [(T0, "a", 10000.0), (T0, "a", 20000.0)], ["ts", "event_type", "value"]
    )
    t = R.rollup_with_histogram(ev, "ts", ["event_type"], "value", BOUNDS, "1d")
    r = R.histogram_quantile(t, 1.0, BOUNDS, "p100").collect()[0]
    assert r["p100"] == BOUNDS[-1]
    # all mass in the first cell -> interpolates from 0
    ev2 = spark.createDataFrame(
        [(T0, "a", 0.25), (T0, "a", 0.25)], ["ts", "event_type", "value"]
    )
    t2 = R.rollup_with_histogram(ev2, "ts", ["event_type"], "value", BOUNDS, "1d")
    r2 = R.histogram_quantile(t2, 0.5, BOUNDS, "p50").collect()[0]
    assert 0.0 < r2["p50"] <= BOUNDS[0]


def test_hist_plan_is_jvm_only(spark):
    ev = _events(spark)
    t = R.histogram_quantile(
        R.rollup_with_histogram(ev, "ts", ["event_type"], "value", BOUNDS, "1h"),
        0.99,
        BOUNDS,
        "p99",
    )
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one aggregation exchange, same as plain rollup (no extra shuffle for hist)
    assert plan.count("Exchange") <= 2  # partial/final hashagg pair
