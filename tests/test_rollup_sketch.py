"""HLL distinct-count sketches in the rollup tiers (operators/rollup.py).

The property that makes sketches tier-able: union of per-minute sketches ==
sketch of the union, so a cascaded coarse tier is BIT-identical to a direct
rollup at that tier — asserted below, along with accuracy vs exact distinct
and the JVM-only plan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from influxer_spark.operators import rollup as R

T0 = dt.datetime(2024, 1, 1)


def _events(spark, n=5000, users=700):
    rows = [
        (
            T0 + dt.timedelta(seconds=(i * 37) % 86400),
            "click" if i % 3 else "view",
            f"u{(i * 911) % users}",
            float(i % 100),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["ts", "event_type", "user_id", "value"])


def test_cascaded_sketch_equals_direct_rollup(spark):
    ev = _events(spark)
    t1m = R.rollup_with_distinct(ev, "ts", ["event_type"], "value", "user_id")
    via_cascade = R.with_distinct_count(
        R.cascade_with_distinct(t1m, ["event_type"], "1h")
    )
    direct = R.with_distinct_count(
        R.rollup_with_distinct(ev, "ts", ["event_type"], "value", "user_id", "1h")
    )
    a = {
        (r["bucket"], r["event_type"]): (r["uu"], r["cnt"], r["sum_v"])
        for r in via_cascade.collect()
    }
    b = {
        (r["bucket"], r["event_type"]): (r["uu"], r["cnt"], r["sum_v"])
        for r in direct.collect()
    }
    assert a == b  # estimates AND algebra identical, not just close


def test_estimate_tracks_exact_distinct(spark):
    ev = _events(spark)
    t1d = R.with_distinct_count(
        R.cascade_with_distinct(
            R.rollup_with_distinct(
                ev, "ts", ["event_type"], "value", "user_id"
            ),
            ["event_type"],
            "1d",
        )
    )
    exact = {
        (r["bucket"], r["event_type"]): r["uu_exact"]
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("uu_exact"))
        .collect()
    }
    for r in t1d.collect():
        want = exact[(r["bucket"], r["event_type"])]
        assert abs(r["uu"] - want) / want < 0.05  # lg_k=12 → ~1.6% rse


def test_sketch_column_is_bounded_binary(spark):
    ev = _events(spark, n=20000, users=15000)
    t1d = R.cascade_with_distinct(
        R.rollup_with_distinct(ev, "ts", ["event_type"], "value", "user_id"),
        ["event_type"],
        "1d",
    )
    sizes = [len(r["uu_sketch"]) for r in t1d.collect()]
    assert all(s <= (1 << 12) + 64 for s in sizes)  # ~2^lg_k bytes, not O(n)


def test_sketch_plan_stays_jvm_side(spark):
    ev = _events(spark, n=500)
    plan = (
        R.with_distinct_count(
            R.rollup_with_distinct(ev, "ts", ["event_type"], "value", "user_id")
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan
