"""Log-linear (HDR-style) quantile sketch tiers — operators/hdrsketch.py.

Pins: (a) the integer bucket math (exact singletons below 2^s, exact
lower bounds, clamp of non-positive cents); (b) lossless cascade — the
1m→1h merged sketch is IDENTICAL to the sketch built from raw at 1h;
(c) the relative-error guarantee ≤ 2^-s of every quantile estimate vs
the exact nearest-rank percentile of the clamped cents.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import hdrsketch as H


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_bucket_index_and_lower_bound_exact(spark):
    # singletons below 2^s (= 32): lb == v; above: lb <= v < lb + 2^(e-s)
    vals = [1, 2, 3, 31, 32, 33, 100, 1023, 1024, 49002, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        F.col("v"),
        (F.length(F.bin(F.col("v"))) - 1).cast("long").alias("_e"),
    )
    s = 1 << H.DEFAULT_SUB_BITS
    df = df.withColumn("_m", F.expr(f"shiftright(v * {s}, cast(_e as int))"))
    df = df.withColumn("idx", F.col("_e") * s + F.col("_m") - s)
    df = df.withColumn("lb", H.hdr_lower_bound_expr("idx"))
    for r in df.collect():
        width = 2 ** max(r["_e"] - H.DEFAULT_SUB_BITS, 0)
        assert r["lb"] <= r["v"] < r["lb"] + max(width, 1)
        if r["v"] < s:
            assert r["lb"] == r["v"]
        # relative error of the lower-bound estimate
        assert (r["v"] - r["lb"]) / r["v"] <= 2.0 ** -H.DEFAULT_SUB_BITS


def test_nonpositive_cents_clamp_to_one(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:30", -5.0), ("a", "2024-01-01 00:00:31", 0.0)],
        "k string, ts string, value double",
    )
    sk = H.hdr_rollup(df, "ts", ["k"], "value", "1m")
    rows = sk.collect()
    assert len(rows) == 1 and rows[0]["idx"] == 0 and rows[0]["cnt"] == 2


def test_cascade_is_lossless(spark, sf_dir):
    ev = _events(spark, sf_dir)
    t1m = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1m")
    via = H.hdr_cascade(t1m, ["event_type"], "1h")
    direct = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h")
    assert via.exceptAll(direct).count() == 0
    assert direct.exceptAll(via).count() == 0


def test_quantile_relative_error_bound(spark, sf_dir):
    ev = _events(spark, sf_dir)
    sk = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1d")
    q = H.hdr_quantiles(sk, ["event_type"], (0.5, 0.95, 0.99)).collect()
    # exact nearest-rank percentiles of the clamped cents, per (series, day)
    cents = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("bucket"),
        F.greatest(
            F.round(F.col("value") * 100, 0).cast("long"), F.lit(1).cast("long")
        ).alias("v"),
    )
    exact = {}
    for r in cents.groupBy("event_type", "bucket").agg(
        F.sort_array(F.collect_list("v")).alias("vs")
    ).collect():
        exact[(r["event_type"], r["bucket"])] = r["vs"]
    assert q, "no quantile rows"
    for row in q:
        vs = exact[(row["event_type"], row["bucket"])]
        assert row["n"] == len(vs)
        for p in (50, 95, 99):
            est = row[f"q{p}"] * 100.0
            true = vs[math.ceil(p / 100.0 * len(vs)) - 1]
            # estimate is the bucket lower bound of the true rank value
            assert est <= true
            assert (true - est) / true <= 2.0 ** -H.DEFAULT_SUB_BITS + 1e-12


def test_unknown_tier_raises(spark):
    df = spark.range(1).select(
        F.lit("a").alias("k"),
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(ValueError):
        H.hdr_rollup(df, "ts", ["k"], "value", "7m")
    with pytest.raises(ValueError):
        H.hdr_cascade(df.select(F.col("ts").alias("bucket"), "k"), ["k"], "9h")


def test_tier_read_matches_direct_build(spark, sf_dir, tmp_path):
    """build_hdr_tiers → read_percentile at 4h is EXACT vs sketching the
    raw points at 4h directly (lossless re-bucket), sub_bits pin enforced,
    non-hour widths refused."""
    from influxer_spark.catalog import TableCatalog
    from influxer_spark.query import read_percentile

    ev = _events(spark, sf_dir)
    cat = TableCatalog(str(tmp_path / "cat"))
    days = H.build_hdr_tiers(spark, cat, ev, "ts", ["event_type"], "value")
    assert days == sorted(cat.committed_partitions("hdr_1h"))
    assert cat.table_property("hdr_1h", "hdr_sub_bits") == H.DEFAULT_SUB_BITS

    got = {
        (r["event_type"], r["bucket"]): (r["n"], r["q50"], r["q95"], r["q99"])
        for r in read_percentile(
            spark, cat, 4 * 3600, key_cols=("event_type",)
        ).collect()
    }
    direct = H.hdr_quantiles(
        H.hdr_rebucket(
            H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h"),
            ["event_type"],
            4 * 3600,
        ),
        ["event_type"],
    )
    want = {
        (r["event_type"], r["bucket"]): (r["n"], r["q50"], r["q95"], r["q99"])
        for r in direct.collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="sub_bits"):
        read_percentile(
            spark, cat, 4 * 3600, key_cols=("event_type",), sub_bits=4
        )
    with pytest.raises(ValueError, match="hour-multiple"):
        read_percentile(spark, cat, 90, key_cols=("event_type",))


def test_tvd_drift_identical_zero_disjoint_one(spark):
    """TVD pins: a day repeating yesterday's distribution scores 0, a day
    whose values share no sketch bucket with yesterday scores 1, and a
    half-moved distribution scores 0.5 — with n_cur/n_prev carried."""
    import datetime as dt

    d0, d1, d2, d3 = (dt.datetime(2024, 1, 1 + i) for i in range(4))
    rows = (
        # day0 == day1 (same multiset, different sizes would still be 0
        # only for the same PROPORTIONS; keep identical here)
        [(d0, "a", 1.0)] * 4 + [(d0, "a", 100.0)] * 4
        + [(d1, "a", 1.0)] * 4 + [(d1, "a", 100.0)] * 4
        # day2: disjoint support vs day1
        + [(d2, "a", 10000.0)] * 8
        # day3: half stays at day2's bucket, half moves far away
        + [(d3, "a", 10000.0)] * 4 + [(d3, "a", 1.0)] * 4
    )
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    sk = H.hdr_rollup(df, "ts", ["event_type"], "value", "1d")
    got = {
        r["bucket"].day: (r["n_cur"], r["n_prev"], r["tvd"])
        for r in H.hdr_tvd_drift(sk, ["event_type"], 86400).collect()
    }
    assert got[2] == (8, 8, 0.0)
    assert got[3] == (8, 8, 1.0)
    assert got[4] == (8, 8, 0.5)
    assert 1 not in got  # first day has no predecessor


def test_tvd_drift_uneven_totals_exact_value(spark):
    """Hand-computed TVD with UNEQUAL day sizes: P = (3/4, 1/4) vs
    Q = (1/2, 1/2) → ½(|3/4−1/2| + |1/4−1/2|) = 1/4, exactly."""
    import datetime as dt

    d0, d1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    rows = (
        [(d0, "a", 1.0)] * 2 + [(d0, "a", 100.0)] * 2
        + [(d1, "a", 1.0)] * 6 + [(d1, "a", 100.0)] * 2
    )
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    sk = H.hdr_rollup(df, "ts", ["event_type"], "value", "1d")
    (r,) = H.hdr_tvd_drift(sk, ["event_type"], 86400).collect()
    assert (r["n_cur"], r["n_prev"], r["tvd"]) == (8, 4, 0.25)


def test_seasonal_phase_merge_hand_values(spark):
    """Hour-of-day band: two days' 14:00 sketches merge by phase, and the
    band is the nearest-rank quantile over the UNION of both days'
    values (hand-computed on sub-2⁵ singleton buckets, where the sketch
    is exact: cents < 32 map to one value per bucket)."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, d, 14, 0, s), "a", v / 100.0)
        for d in (1, 2)
        for s, v in enumerate(range(1, 11))  # cents 1..10 each day
    ] + [(dt.datetime(2024, 1, 1, 9, 0), "a", 0.25)]  # other phase
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    h1 = H.hdr_rollup(df, "ts", ["event_type"], "value", "1h")
    got = {
        r["hod"]: (r["n"], r["q10"], r["q90"])
        for r in H.hdr_seasonal_quantiles(h1, ["event_type"], (0.1, 0.9))
        .collect()
    }
    # 20 values at 14:00 → rank ceil(.1*20)=2 → 2nd of [1,1,2,2,…] = 1¢;
    # rank ceil(.9*20)=18 → 18th = 9¢
    assert got[14] == (20, 0.01, 0.09)
    assert got[9] == (1, 0.25, 0.25)


def test_seasonal_band_anomaly_flags(spark):
    """An hour whose mean sits far outside its phase's historical band is
    flagged; ordinary hours are not.  Three days of calm 14:00 values
    plus one wild day — only the wild day's 14:00 bucket pages."""
    import datetime as dt

    rows = []
    for d in (1, 2, 3, 4, 5, 6, 7, 8, 9):
        for s, v in enumerate([1.00, 1.02, 1.04, 0.98, 0.96, 1.01]):
            rows.append((dt.datetime(2024, 1, d, 14, 0, s), "a", v))
    for s in range(6):  # day 10: 14:00 explodes
        rows.append((dt.datetime(2024, 1, 10, 14, 0, s), "a", 99.0))
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    got = {
        r["bucket"].day: r["anomaly"]
        for r in H.seasonal_band_anomalies(
            df, "ts", ["event_type"], "value", 0.1, 0.9
        ).collect()
    }
    assert got[10] is True
    assert sum(got.values()) <= 2  # at most the wild day + one band-edge hour
    assert got[2] is False and got[5] is False


def test_hdr_sliding_equals_window_sketch_from_raw(spark):
    """Trailing counter-vector sums are lossless under overlap: the
    sliding sketch at every observed hour equals a sketch built directly
    from that window's raw rows (3h window, hand-sized data)."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, h, 0, s), "a", float(v))
        for h, vals in [(0, [1, 2]), (1, [3]), (4, [5, 6, 7])]
        for s, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    h1 = H.hdr_rollup(df, "ts", ["event_type"], "value", "1h")
    got = {
        (r["bucket"].hour, r["idx"]): r["cnt"]
        for r in H.hdr_sliding(h1, ["event_type"], 3, 3600).collect()
    }
    # hour 1's window covers hours 0-1 (counts merge); hour 4's window
    # covers hours 2-4 → only hour 4's own rows
    per_hour = {
        h: {r["idx"]: r["cnt"] for r in h1.collect() if r["bucket"].hour == h}
        for h in (0, 1, 4)
    }
    want = {}
    for idx, c in per_hour[0].items():
        want[(0, idx)] = c
        want[(1, idx)] = want.get((1, idx), 0) + c
    for idx, c in per_hour[1].items():
        want[(1, idx)] = want.get((1, idx), 0) + c
    for idx, c in per_hour[4].items():
        want[(4, idx)] = c
    assert got == want


def test_histogram_bars_tile_and_cover(spark):
    """Decoded bars: a singleton (sub-resolution) bucket gets its exact
    one-cent bar; a log-linear bucket spans [lb, next_lb); every stored
    value falls inside its own bar."""
    import datetime as dt

    vals = [0.05, 0.05, 5.0, 123.45, 9999.99]
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "a", v) for v in vals],
        ["ts", "event_type", "value"],
    )
    sk = H.hdr_rollup(df, "ts", ["event_type"], "value", "1d")
    bars = {
        r["idx"]: (r["lo"], r["hi"], r["cnt"])
        for r in H.hdr_histogram(sk, ["event_type"]).collect()
    }
    for b in bars.values():
        assert b[1] > b[0]  # never zero-width
    # 0.05 (5 cents, sub-resolution) → exact one-cent bar with count 2
    assert any(
        lo == 0.05 and hi == 0.06 and c == 2 for lo, hi, c in bars.values()
    )
    for v in vals:
        assert any(lo <= v < hi for lo, hi, _ in bars.values()), v
