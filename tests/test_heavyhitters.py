"""Misra-Gries heavy-hitter tiers (operators/heavyhitters.py).

Two regimes: capacity ≥ cardinality (exact — what the driver oracle
checks) and pathological capacity (the 100 TB regime — counts must stay
lower bounds with a sound, carried error bound)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from influxer_spark.operators import heavyhitters as HH

KEYS = ["event_type"]
T0 = dt.datetime(2024, 5, 1)


def _skewed(spark):
    """Zipf-ish: item i appears ~90/i times, spread over 3 hours of one day
    plus a second day, single series."""
    rows = []
    n = 0
    for day in (0, 1):
        for i in range(1, 13):
            for j in range(90 // i):
                ts = T0 + dt.timedelta(days=day, hours=j % 3, minutes=i, seconds=j)
                rows.append(("k", ts, i))
                n += 1
    return spark.createDataFrame(rows, ["event_type", "ts", "item"]), n


def _true_daily(df):
    return {
        (r["bucket"], r["item"]): r["cnt"]
        for r in df.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), F.col("item")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }


def test_exact_when_capacity_sufficient(spark):
    df, _ = _skewed(spark)
    h1 = HH.topk_rollup(df, "ts", KEYS, "item", "1h", capacity=64)
    d1 = HH.topk_cascade(h1, KEYS, "1d", capacity=64)
    truth = _true_daily(df)
    got = HH.topk_query(d1, KEYS, 100).collect()
    assert all(r["err"] == 0 for r in got)
    assert {(r["bucket"], r["item"]): r["cnt"] for r in got} == truth


def test_cascade_matches_direct_when_exact(spark):
    df, _ = _skewed(spark)
    via = HH.topk_query(
        HH.topk_cascade(
            HH.topk_rollup(df, "ts", KEYS, "item", "1h", 64), KEYS, "1d", 64
        ),
        KEYS, 5,
    )
    direct = HH.topk_query(HH.topk_rollup(df, "ts", KEYS, "item", "1d", 64), KEYS, 5)
    assert sorted(map(tuple, via.collect())) == sorted(map(tuple, direct.collect()))


def test_mg_bounds_under_pathological_capacity(spark):
    """capacity 4 with 12 items: stored counts are lower bounds, the true
    count never exceeds stored + err, the per-day top-1 item survives, and
    err respects the MG guarantee Σ n_bucket/(c+1) accumulated over the
    trims that produced the summary."""
    df, _ = _skewed(spark)
    cap = 4
    h1 = HH.topk_rollup(df, "ts", KEYS, "item", "1h", capacity=cap)
    d1 = HH.topk_cascade(h1, KEYS, "1d", capacity=cap)
    truth = _true_daily(df)
    rows = HH.topk_query(d1, KEYS, cap).collect()
    assert rows, "summary must not be empty"
    per_day_n = {}
    for (bucket, _), c in truth.items():
        per_day_n[bucket] = per_day_n.get(bucket, 0) + c
    for r in rows:
        t = truth[(r["bucket"], r["item"])]
        assert r["cnt"] <= t <= r["cnt"] + r["err"], (r, t)
        # accumulated error can never exceed the day's total over (c+1)
        assert r["err"] <= per_day_n[r["bucket"]] // (cap + 1) + cap
    top_true = {}
    for (bucket, item), c in truth.items():
        if bucket not in top_true or c > truth[(bucket, top_true[bucket])]:
            top_true[bucket] = item
    got_top = {r["bucket"]: r["item"] for r in rows if r["rank"] == 1}
    assert got_top == top_true


def test_topk_exact_matches_full_groupby(spark, sf_dir):
    """topk_exact (MG candidates + broadcast recount + runtime proof)
    equals the brute-force exact top-k, and is partitioning-independent:
    different input partitionings nominate different candidate sets but
    must return the identical proven answer."""
    import os

    from influxer_spark.operators.heavyhitters import topk_exact

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("item")
    )
    want = sorted(
        tuple(r)
        for r in ev.groupBy("event_type", F.col("user_id").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .select("event_type", "rank", "item", "cnt")
        .collect()
    )
    for parts in (3, 13):
        got = sorted(
            tuple(r)
            for r in topk_exact(
                ev.repartition(parts), ["event_type"], "user_id", 7,
                capacity=8192,
            ).collect()
        )
        assert got == want


def test_topk_exact_fails_loud_when_unprovable(spark):
    """A capacity too small for the distribution must FAIL with the
    undercount-bound message, never return a silently approximate
    top-k: uniform counts over many items trim every partition summary,
    so the k-th count cannot exceed the accumulated bound."""
    import pytest as _pytest

    from influxer_spark.operators.heavyhitters import topk_exact

    rows = [("a", i % 500) for i in range(5000)]  # uniform: 10 each
    df = spark.createDataFrame(rows, ["event_type", "user_id"]).repartition(8)
    with _pytest.raises(Exception, match="undercount bound"):
        topk_exact(df, ["event_type"], "user_id", 3, capacity=4).collect()
