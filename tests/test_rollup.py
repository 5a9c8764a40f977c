"""Rollup tier cascade: algebraic correctness (SURVEY.md A4)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import rollup as R


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy(*df.columns).collect()]


def test_cascade_1h_equals_direct(events):
    """Re-aggregating 1m partials into 1h must equal rolling up raw at 1h."""
    t1m = R.rollup(events, "ts", ["event_type"], "value", "1m")
    cascaded = R.cascade(t1m, ["event_type"], "1h")
    direct = R.rollup(events, "ts", ["event_type"], "value", "1h")
    a = _sorted_rows(cascaded.select("bucket", "event_type", "cnt", "min_v", "max_v"))
    b = _sorted_rows(direct.select("bucket", "event_type", "cnt", "min_v", "max_v"))
    assert a == b
    # sums agree to fp tolerance (different addition order)
    sa = {tuple(r[:2]): r[2] for r in cascaded.select("bucket", "event_type", "sum_v").collect()}
    sb = {tuple(r[:2]): r[2] for r in direct.select("bucket", "event_type", "sum_v").collect()}
    assert sa.keys() == sb.keys()
    for k in sa:
        assert abs(sa[k] - sb[k]) < 1e-9 * max(1.0, abs(sb[k]))


def test_cascade_1d_equals_direct(events):
    t1m = R.rollup(events, "ts", ["event_type"], "value", "1m")
    t1h = R.cascade(t1m, ["event_type"], "1h")
    t1d = R.cascade(t1h, ["event_type"], "1d")
    direct = R.rollup(events, "ts", ["event_type"], "value", "1d")
    a = _sorted_rows(t1d.select("bucket", "event_type", "cnt", "min_v", "max_v"))
    b = _sorted_rows(direct.select("bucket", "event_type", "cnt", "min_v", "max_v"))
    assert a == b


def test_salted_equals_plain(events):
    plain = R.rollup(events, "ts", ["event_type"], "value", "1m")
    salted = R.salted_rollup(events, "ts", ["event_type"], "value", "1m", salt_buckets=8)
    a = _sorted_rows(plain.select("bucket", "event_type", "cnt", "min_v", "max_v"))
    b = _sorted_rows(salted.select("bucket", "event_type", "cnt", "min_v", "max_v"))
    assert a == b


def test_mean_is_exact_not_mean_of_means(spark):
    # uneven buckets: minute A has 1 point (v=1), minute B has 3 points (v=2,3,4)
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 5), "k", 1.0),
        (dt.datetime(2024, 1, 1, 0, 1, 5), "k", 2.0),
        (dt.datetime(2024, 1, 1, 0, 1, 15), "k", 3.0),
        (dt.datetime(2024, 1, 1, 0, 1, 45), "k", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, key string, value double")
    t1m = R.rollup(df, "ts", ["key"], "value", "1m")
    t1h = R.with_mean(R.cascade(t1m, ["key"], "1h"))
    row = t1h.collect()[0]
    assert row["cnt"] == 4
    assert row["avg_v"] == pytest.approx(2.5)  # (1+2+3+4)/4, NOT (1 + 3)/2


def test_null_values_not_counted(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 5), "k", 1.0),
        (dt.datetime(2024, 1, 1, 0, 0, 6), "k", None),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, key string, value double")
    row = R.rollup(df, "ts", ["key"], "value", "1m").collect()[0]
    assert row["cnt"] == 1 and row["sum_v"] == 1.0


def test_rollup_plan_is_single_shuffle(events):
    """The 1m rollup must be partial agg → one exchange → final agg, no join."""
    plan = R.rollup(events, "ts", ["event_type"], "value", "1m")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 + plan.count("AQEShuffleRead")  # one logical shuffle
    assert "Join" not in plan


def test_unknown_tier_raises(events):
    with pytest.raises(ValueError):
        R.rollup(events, "ts", ["event_type"], "value", "5m")


def test_sumsq_cascade_equals_direct(events):
    """Power-sum tiers (Σc, Σc²) are exact BIGINTs, so the 1m→1h cascade
    must equal the direct 1h rollup BIT-FOR-BIT — no fp tolerance."""
    t1m = R.rollup_with_sumsq(events, "ts", ["event_type"], "value", "1m")
    cascaded = R.cascade_with_sumsq(t1m, ["event_type"], "1h")
    direct = R.rollup_with_sumsq(events, "ts", ["event_type"], "value", "1h")
    cols = ["bucket", "event_type", "cnt", "min_v", "max_v", "s1", "s2"]
    assert _sorted_rows(cascaded.select(*cols)) == _sorted_rows(direct.select(*cols))


def test_stddev_matches_builtin_on_quantized_values(spark):
    """with_stddev derived from the power sums equals stddev_samp over the
    cent-quantized values (same estimator, different computation path)."""
    import math

    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, s), "a", v)
        for s, v in enumerate([1.25, 2.5, 2.5, 7.75, 0.01, 3.33])
    ] + [(dt.datetime(2024, 1, 1, 0, 0, 30), "b", 9.99)]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    got = {
        r["event_type"]: (r["cnt"], r["avg_v"], r["var_v"], r["stddev_v"])
        for r in R.with_stddev(
            R.rollup_with_sumsq(df, "ts", ["event_type"], "value", "1h")
        ).collect()
    }
    want = {
        r["event_type"]: (r["cnt"], r["m"], r["v"], r["s"])
        for r in df.groupBy("event_type")
        .agg(
            F.count("value").alias("cnt"),
            F.mean(F.round(F.col("value") * 100, 0) / 100).alias("m"),
            F.var_samp(F.round(F.col("value") * 100, 0) / 100).alias("v"),
            F.stddev_samp(F.round(F.col("value") * 100, 0) / 100).alias("s"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k][0] == want[k][0]
        for a, b in zip(got[k][1:], want[k][1:]):
            if b is None:
                assert a is None  # n < 2 → sample stddev undefined
            else:
                assert math.isclose(a, b, rel_tol=1e-12)


def test_rollup_sliding_gap_aware_range_window(spark):
    """Trailing window is a RANGE (value) window, not a row window: a gap
    in the tier must not stretch the window.  Hours 0,1,5 with window 3h:
    hour 5's window covers hours 3-5 → only hour 5's own row."""
    rows = [
        (dt.datetime(2024, 1, 1, 0), "a", 1.0),
        (dt.datetime(2024, 1, 1, 1), "a", 2.0),
        (dt.datetime(2024, 1, 1, 5), "a", 10.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    t1h = R.rollup(df, "ts", ["event_type"], "value", "1h")
    got = {
        r["bucket"].hour: (r["cnt"], r["sum_v"], r["n_buckets"])
        for r in R.rollup_sliding(t1h, ["event_type"], 3, 3600).collect()
    }
    assert got[0] == (1, 1.0, 1)
    assert got[1] == (2, 3.0, 2)   # hours 0+1 in range
    assert got[5] == (1, 10.0, 1)  # hours 3-5: only hour 5 exists


def test_rollup_sliding_single_exchange(spark, events):
    """One exchange on the series key over TIER rows — the window sort
    rides it; no second raw-sized shuffle."""
    import re as _re

    t1h = R.rollup(events, "ts", ["event_type"], "value", "1h")
    plan = (
        R.rollup_sliding(t1h, ["event_type"], 24, 3600)
        ._jdf.queryExecution()
        .explainString(
            events.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")
        )
    )
    assert len(_re.findall(r"^\s*\(\d+\) Exchange", plan, _re.M)) == 2, plan


def test_slo_burn_multiwindow_pages_only_sustained(spark):
    """The SRE multiwindow contract: a single-bucket error burst trips the
    SHORT window but not the LONG one (no page); a sustained burn trips
    both (page); zero-traffic buckets have NULL burn and never page."""
    import datetime as dt

    from influxer_spark.operators.rollup import slo_burn_alerts

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # hours 0-11: healthy (1000 good, 1 bad -> burn 0.999/bucket at 0.1% budget... ~1)
    for i in range(12):
        rows.append(("svc", t0 + dt.timedelta(hours=i), 1000, 1))
    # hour 12: a one-hour 10% burst (short fires, 12h long stays low)
    rows.append(("svc", t0 + dt.timedelta(hours=12), 900, 100))
    # hours 13-14: healthy again
    for i in (13, 14):
        rows.append(("svc", t0 + dt.timedelta(hours=i), 1000, 1))
    # hours 15-26: sustained 10% burn -> long catches up, pages
    for i in range(15, 27):
        rows.append(("svc", t0 + dt.timedelta(hours=i), 900, 100))
    # hour 27: zero traffic
    rows.append(("svc", t0 + dt.timedelta(hours=27), 0, 0))
    df = spark.createDataFrame(rows, ["k", "bucket", "good", "bad"])
    out = {
        r["bucket"].hour + 24 * (r["bucket"].day - 1): r
        for r in slo_burn_alerts(
            df, ["k"], 3600, slo_good_fraction=0.999,
            long_buckets=12, short_buckets=1, burn_threshold=14.4,
        ).collect()
    }
    assert not out[12]["page"]          # burst: short > thr, long below
    assert out[12]["burn_short"] > 14.4
    assert out[12]["burn_long"] < 14.4
    assert any(out[h]["page"] for h in range(15, 27))   # sustained pages
    last = out[26]
    assert last["page"] and last["burn_long"] > 14.4 and last["burn_short"] > 14.4
    assert out[27]["burn_short"] is None and not out[27]["page"]  # no traffic


def test_topn_with_other_preserves_total_and_cut(spark):
    import datetime as dt

    from influxer_spark.operators.rollup import topn_with_other

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # series a..e with totals 50,40,30,20,10; two buckets
    for i, (k, v) in enumerate([("a", 25), ("b", 20), ("c", 15),
                                ("d", 10), ("e", 5)]):
        rows += [(k, t0, v), (k, t0 + dt.timedelta(hours=1), v)]
    df = spark.createDataFrame(rows, ["k", "bucket", "v"])
    out = topn_with_other(df, "k", "bucket", "v", 2).collect()
    kept = {(r["series"], r["bucket"].hour): r["value"]
            for r in out if not r["is_other"]}
    other = {r["bucket"].hour: r["value"] for r in out if r["is_other"]}
    assert set(s for s, _ in kept) == {"a", "b"}
    assert other == {0: 30, 1: 30}  # c+d+e per bucket
    # grand total preserved
    assert sum(r["value"] for r in out) == sum(v for _, _, v in rows)


def test_topn_with_other_tie_breaks_by_key(spark):
    import datetime as dt

    from influxer_spark.operators.rollup import topn_with_other

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("b", t0, 10), ("a", t0, 10), ("c", t0, 10)], ["k", "bucket", "v"]
    )
    out = topn_with_other(df, "k", "bucket", "v", 2).collect()
    assert {r["series"] for r in out if not r["is_other"]} == {"a", "b"}
    assert [r["value"] for r in out if r["is_other"]] == [10]


# ---------------------------------------------------------------------------
# OHLC candlestick tiers
# ---------------------------------------------------------------------------


def _ohlc_rows(spark, rows):
    return spark.createDataFrame(rows, ["k", "ts", "v"]).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_ohlc_basic_open_close_by_time(spark):
    df = _ohlc_rows(spark, [
        ("a", "2024-01-01T10:05:00", 5.0),
        ("a", "2024-01-01T10:01:00", 3.0),   # earliest → open
        ("a", "2024-01-01T10:59:00", 7.0),   # latest → close
        ("a", "2024-01-01T10:30:00", 1.0),   # low
    ])
    r = R.rollup_ohlc(df, "ts", ["k"], "v", "1h").collect()[0]
    assert (r["open_v"], r["high_v"], r["low_v"], r["close_v"], r["cnt"]) == (
        3.0, 7.0, 1.0, 7.0, 4)


def test_ohlc_equal_ts_tiebreak_deterministic(spark):
    # two points share the bucket-edge timestamps: open takes the SMALLER
    # value, close the LARGER — the documented total order
    df = _ohlc_rows(spark, [
        ("a", "2024-01-01T10:00:00", 9.0),
        ("a", "2024-01-01T10:00:00", 2.0),
        ("a", "2024-01-01T10:59:00", 4.0),
        ("a", "2024-01-01T10:59:00", 8.0),
    ])
    r = R.rollup_ohlc(df, "ts", ["k"], "v", "1h").collect()[0]
    assert r["open_v"] == 2.0 and r["close_v"] == 8.0


def test_ohlc_nulls_contribute_nothing(spark):
    df = _ohlc_rows(spark, [
        ("a", "2024-01-01T10:00:00", None),
        ("a", "2024-01-01T10:30:00", 5.0),
    ])
    r = R.rollup_ohlc(df, "ts", ["k"], "v", "1h").collect()[0]
    assert (r["open_v"], r["close_v"], r["cnt"]) == (5.0, 5.0, 1)


def test_ohlc_cascade_equals_direct(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    rows = []
    for k in ("a", "b"):
        for i in range(500):
            ts = f"2024-01-0{1 + i % 3}T{i % 24:02d}:{i % 60:02d}:{(7 * i) % 60:02d}"
            rows.append((k, ts, float(rng.integers(-50, 50))))
    df = _ohlc_rows(spark, rows)
    direct = R.rollup_ohlc(df, "ts", ["k"], "v", "1d")
    cascaded = R.cascade_ohlc(
        R.rollup_ohlc(df, "ts", ["k"], "v", "1m"), ["k"], "1d"
    )
    key = lambda r: (r["k"], r["bucket"])  # noqa: E731
    want = {key(r): (r["open_v"], r["high_v"], r["low_v"], r["close_v"],
                     r["cnt"]) for r in direct.collect()}
    got = {key(r): (r["open_v"], r["high_v"], r["low_v"], r["close_v"],
                    r["cnt"]) for r in cascaded.collect()}
    assert got == want and len(got) == 6


def test_read_candles_from_tiers_matches_direct(spark, tmp_path):
    """query.read_candles: manifest-pruned ohlc tier read re-bucketed to
    4h equals the direct raw computation bit-for-bit."""
    import datetime as dt

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.query import read_candles

    rows = []
    for d in (1, 2):
        for i in range(200):
            rows.append((
                "k%d" % (i % 3),
                dt.datetime(2024, 1, d, (i * 7) % 24, (i * 11) % 60,
                            (i * 13) % 60),
                float((i * 37) % 100),
            ))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    cat = TableCatalog(str(tmp_path / "c"))
    R.build_ohlc_tiers(spark, cat, df, "ts", ["k"], "v")
    got = {
        (r["bucket"], r["k"]): (r["open_t"], r["open_v"], r["high_v"],
                                r["low_v"], r["close_t"], r["close_v"],
                                r["cnt"])
        for r in read_candles(spark, cat, 4 * 3600, key_cols=("k",)).collect()
    }
    # ground truth: 4h candles computed straight from raw points
    from pyspark.sql import functions as _F

    raw4 = (
        df.groupBy(
            _F.timestamp_seconds(
                (_F.unix_timestamp("ts") - _F.unix_timestamp("ts") % 14400)
            ).alias("bucket"),
            "k",
        )
        .agg(
            _F.min(_F.struct(_F.col("ts").alias("t"),
                             _F.col("v").alias("v"))).alias("_o"),
            _F.max("v").alias("high_v"),
            _F.min("v").alias("low_v"),
            _F.max(_F.struct(_F.col("ts").alias("t"),
                             _F.col("v").alias("v"))).alias("_c"),
            _F.count("v").alias("cnt"),
        )
    )
    want = {
        (r["bucket"], r["k"]): (r["_o"]["t"], r["_o"]["v"], r["high_v"],
                                r["low_v"], r["_c"]["t"], r["_c"]["v"],
                                r["cnt"])
        for r in raw4.collect()
    }
    assert got == want and len(got) > 4


def test_ohlc_sliding_trailing_candles(spark):
    import datetime as dt

    # two hourly candles 3h apart: at the later hour a 24h window spans
    # both (open from the EARLIER hour's open), a 2h window only itself
    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 5.0),
        ("a", dt.datetime(2024, 1, 1, 0, 50), 9.0),
        ("a", dt.datetime(2024, 1, 1, 3, 20), 2.0),
        ("a", dt.datetime(2024, 1, 1, 3, 40), 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    t1h = R.rollup_ohlc(df, "ts", ["k"], "v", "1h")
    wide = {r["bucket"].hour: r for r in
            R.ohlc_sliding(t1h, ["k"], 24, 3600).collect()}
    assert wide[3]["open_v"] == 5.0 and wide[3]["close_v"] == 7.0
    assert wide[3]["high_v"] == 9.0 and wide[3]["low_v"] == 2.0
    assert wide[3]["n_buckets"] == 2 and wide[3]["cnt"] == 4
    narrow = {r["bucket"].hour: r for r in
              R.ohlc_sliding(t1h, ["k"], 2, 3600).collect()}
    assert narrow[3]["open_v"] == 2.0 and narrow[3]["n_buckets"] == 1
