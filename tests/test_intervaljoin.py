"""Chunked interval join (operators/intervaljoin.py): boundary semantics,
multi-chunk intervals, overlap multiplicity, and the no-nested-loop plan.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from influxer_spark.operators.intervaljoin import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    pts = spark.createDataFrame(
        [
            ("a", _ts(0), 1.0),    # == w_start: inclusive
            ("a", _ts(119), 2.0),  # last in-window minute
            ("a", _ts(120), 4.0),  # == w_end: exclusive
            ("a", _ts(200), 8.0),  # in the second (overlapping) window only
            ("b", _ts(60), 16.0),  # right time, wrong key
        ],
        ["event_type", "ts", "value"],
    )
    iv = spark.createDataFrame(
        [
            ("a", _ts(0), _ts(120)),    # 2h window spanning 2 hour-chunks
            ("a", _ts(90), _ts(210)),   # overlaps the first window
        ],
        ["event_type", "w_start", "w_end"],
    )
    return pts, iv


def test_boundaries_keys_and_multiplicity(spark):
    pts, iv = _frames(spark)
    got = sorted(
        (r["value"], r["w_start"])
        for r in interval_join(
            pts, iv, "ts", ["event_type"], chunk_seconds=3600
        ).collect()
    )
    assert got == [
        (1.0, _ts(0)),    # w_start inclusive
        (2.0, _ts(0)),
        (2.0, _ts(90)),   # overlap: one point, both windows, exactly once each
        (4.0, _ts(90)),   # w_end exclusive for window 1, inside window 2
        (8.0, _ts(90)),
    ]


def test_chunk_width_invariance(spark):
    pts, iv = _frames(spark)
    fine = interval_join(pts, iv, "ts", ["event_type"], chunk_seconds=60)
    wide = interval_join(pts, iv, "ts", ["event_type"], chunk_seconds=86400)
    key = lambda r: (r["value"], r["w_start"])  # noqa: E731
    assert sorted(map(key, fine.collect())) == sorted(map(key, wide.collect()))


def test_no_nested_loop_plan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = (
        ev.filter(F.col("user_id") % 97 == 0)
        .select(
            "event_type",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
        )
        .distinct()
    )
    j = interval_join(ev, iv, "ts", ["event_type"], chunk_seconds=3600)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = j._jdf.queryExecution().explainString(mode)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan)
