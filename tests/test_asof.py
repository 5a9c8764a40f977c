"""As-of join semantics (inclusive <=, per-key, null before first right row)
and arbitrary-width bucket alignment."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from influxer_spark.operators.asof import asof_join
from influxer_spark.operators.rollup import rollup_width


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:00:00"), 1),  # before any right row → null
            ("a", _ts("2024-01-01 11:00:00"), 2),  # == right ts → inclusive match
            ("a", _ts("2024-01-01 11:30:00"), 3),  # between → 11:00 row
            ("a", _ts("2024-01-01 12:30:00"), 4),  # after 12:00 → 12:00 row
            ("b", _ts("2024-01-01 11:30:00"), 5),  # other key → its own rights
        ],
        ["k", "ts", "n"],
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 11:00:00"), 100.0),
            ("a", _ts("2024-01-01 12:00:00"), 200.0),
            ("b", _ts("2024-01-01 11:00:00"), 999.0),
        ],
        ["k", "ts", "v"],
    )
    out = {
        r["n"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, by=["k"]).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01 11:00:00"), 100.0)
    assert out[3] == (_ts("2024-01-01 11:00:00"), 100.0)
    assert out[4] == (_ts("2024-01-01 12:00:00"), 200.0)
    assert out[5] == (_ts("2024-01-01 11:00:00"), 999.0)


def test_asof_preserves_left_rowcount(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.limit(500)
    right = rollup_width(ev, "ts", ["event_type"], "value", 21600).select(
        "event_type", F.col("bucket").alias("ts"), "cnt"
    )
    joined = asof_join(left, right, by=["event_type"], value_cols=["cnt"])
    assert joined.count() == left.count()
    assert joined.filter(F.col("asof_cnt").isNull()).count() == 0


def test_rollup_width_epoch_aligned(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 10:07:29"), "x", 1.0), (_ts("2024-01-01 10:09:59"), "x", 3.0)],
        ["ts", "k", "v"],
    )
    r = rollup_width(df, "ts", ["k"], "v", 300).collect()
    assert {row["bucket"] for row in r} == {_ts("2024-01-01 10:05:00")}
    assert r[0]["cnt"] == 2 and r[0]["sum_v"] == 4.0


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from influxer_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    right = spark.createDataFrame(
        [("a", t0, 100.0)], ["k", "ts", "state"]
    )
    left = spark.createDataFrame(
        [
            ("a", t0 + dt.timedelta(minutes=30), 1),   # within 1h tolerance
            ("a", t0 + dt.timedelta(hours=3), 2),      # stale -> NULL
        ],
        ["k", "ts", "event"],
    )
    out = {r["event"]: (r["asof_ts"], r["asof_state"]) for r in asof_join(
        left, right, by=["k"], value_cols=["state"], tolerance_seconds=3600
    ).collect()}
    assert out[1] == (t0, 100.0)
    assert out[2] == (None, None)


def test_asof_directions_match_pandas_merge_asof(spark):
    """backward/forward/nearest (± tolerance) must agree with pandas
    merge_asof row-for-row on random keyed series — the semantics the
    operator claims parity with."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    t0 = pd.Timestamp("2024-01-01")
    right = pd.DataFrame({
        "k": rng.choice(["a", "b"], 60),
        "ts": t0 + pd.to_timedelta(rng.choice(86400, 60, replace=False), "s"),
        "v": rng.integers(0, 1000, 60).astype("int64"),
    })
    left = pd.DataFrame({
        "k": rng.choice(["a", "b"], 80),
        "ts": t0 + pd.to_timedelta(rng.choice(86400, 80, replace=False), "s"),
        "eid": np.arange(80, dtype="int64"),
    })
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 3600.0):
            got = (
                asof_join(
                    ldf, rdf, by=["k"], value_cols=["v"],
                    direction=direction, tolerance_seconds=tol,
                )
                .orderBy("eid")
                .toPandas()
            )
            want = pd.merge_asof(
                left.sort_values("ts"),
                right.sort_values("ts"),
                on="ts", by="k", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            ).sort_values("eid")
            g = got["asof_v"].astype("float64").to_numpy()
            w = want["v"].astype("float64").to_numpy()
            assert ((g == w) | (np.isnan(g) & np.isnan(w))).all(), (
                direction, tol,
            )
