"""M4 downsampling (operators/m4.py) — the error-free line-chart
downsample: ≤4 real points (first/last/min/max) per pixel bucket."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from influxer_spark.operators.m4 import m4_downsample

T0 = dt.datetime(2024, 1, 1)


def _series(spark):
    rows = []
    for i in range(500):
        rows.append(
            (
                T0 + dt.timedelta(seconds=i * 29),
                "a" if i % 2 else "b",
                float((i * 613) % 97) - 10.0,
            )
        )
    rows.append((T0 + dt.timedelta(seconds=1), "a", None))  # not drawable
    # duplicate value ties inside one bucket (determinism contract)
    rows.append((T0 + dt.timedelta(seconds=3), "a", 5.0))
    rows.append((T0 + dt.timedelta(seconds=5), "a", 5.0))
    return spark.createDataFrame(rows, ["ts", "key", "value"])


def test_m4_covers_extremes_and_endpoints(spark):
    df = _series(spark)
    out = m4_downsample(df, "ts", ["key"], "value", 600)
    picked = {}
    for r in out.collect():
        picked.setdefault((r["key"], r["bucket"]), []).append(
            (r["ts"], r["value"])
        )
    src = [
        r
        for r in df.where(F.col("value").isNotNull())
        .withColumn(
            "bucket",
            F.timestamp_seconds(
                (
                    F.unix_timestamp("ts")
                    - F.unix_timestamp("ts") % 600
                ).cast("long")
            ),
        )
        .collect()
    ]
    groups = {}
    for r in src:
        groups.setdefault((r["key"], r["bucket"]), []).append(
            (r["ts"], r["value"])
        )
    assert set(picked) == set(groups)
    for g, pts in groups.items():
        sel = picked[g]
        assert len(sel) <= 4
        vs = [v for _, v in pts]
        # exact extremes and endpoints present, drawn from REAL points
        assert min(vs) in [v for _, v in sel]
        assert max(vs) in [v for _, v in sel]
        assert min(pts)[0] in [t for t, _ in sel]
        assert max(pts)[0] in [t for t, _ in sel]
        assert set(sel) <= set(pts)


def test_m4_deterministic_on_ties(spark):
    df = _series(spark)
    a = sorted(map(tuple, m4_downsample(df, "ts", ["key"], "value", 600).collect()))
    b = sorted(
        map(
            tuple,
            m4_downsample(df.repartition(7), "ts", ["key"], "value", 600).collect(),
        )
    )
    assert a == b


def test_m4_plan_single_exchange_no_sort_on_raw(spark):
    df = _series(spark)
    out = m4_downsample(df, "ts", ["key"], "value", 600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # one agg shuffle, not 4 window sorts
    assert "Window" not in plan
