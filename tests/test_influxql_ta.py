"""InfluxQL technical-analysis family (operators/influxql.py) vs plain-
Python mirrors of the pinned semantics (module docstring of influxql.py).

The mirrors run the recurrences in input order with ordinary Python floats,
so equality here is BIT-exact (`==`, not approx) — the same discipline the
DuckDB oracles rely on.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import influxql as Q

T0 = dt.datetime(2024, 1, 1)


def _series(spark, values, key="a"):
    rows = [
        (key, T0 + dt.timedelta(hours=i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


VALUES = [10.0, 12.5, 11.0, 11.0, 14.75, 13.0, 16.5, 15.25, 15.25, 18.0,
          17.5, 20.0, 19.25, 21.0, 22.5, 21.75]


# --- python mirrors -------------------------------------------------------

def py_ema(vals, n, warmup="exponential"):
    alpha = 2.0 / (n + 1)
    out, ema, s = [], 0.0, 0.0
    for i, v in enumerate(vals, start=1):
        if warmup == "exponential":
            a = 2.0 / (i + 1.0) if i <= n else alpha
            ema = a * v + (1.0 - a) * ema
            out.append(ema)
        elif warmup == "none":
            a = 1.0 if i == 1 else alpha
            ema = a * v + (1.0 - a) * ema
            out.append(ema)
        else:  # simple
            if i < n:
                s += v
                ema = 0.0
            elif i == n:
                s += v
                ema = s / float(n)
                out.append(ema)
            else:
                ema = alpha * v + (1.0 - alpha) * ema
                out.append(ema)
    return out


def py_rsi(vals, n):
    out, ag, al, prev = [], 0.0, 0.0, 0.0
    for i, v in enumerate(vals, start=1):
        if i == 1:
            prev = v
            continue
        d = v - prev
        g = d if d > 0 else 0.0
        ls = -d if d < 0 else 0.0
        if i <= n:
            ag, al = ag + g, al + ls
        elif i == n + 1:
            ag, al = (ag + g) / float(n), (al + ls) / float(n)
        else:
            ag = (ag * (n - 1.0) + g) / float(n)
            al = (al * (n - 1.0) + ls) / float(n)
        prev = v
        if i >= n + 1:
            if al == 0:
                out.append(50.0 if ag == 0 else 100.0)
            else:
                out.append(100.0 - 100.0 / (1.0 + ag / al))
    return out


def py_cmo(vals, n):
    out = []
    for i in range(n, len(vals)):
        up = down = 0.0
        for j in range(n - 1, -1, -1):
            d = vals[i - j] - vals[i - j - 1]
            up = up + (d if d > 0 else 0.0)
            down = down + (-d if d < 0 else 0.0)
        out.append(0.0 if up + down == 0 else 100.0 * (up - down) / (up + down))
    return out


def py_ker(vals, n):
    out = []
    for i in range(n, len(vals)):
        vol = 0.0
        for j in range(n - 1, -1, -1):
            vol = vol + abs(vals[i - j] - vals[i - j - 1])
        change = abs(vals[i] - vals[i - n])
        out.append(0.0 if vol == 0 else change / vol)
    return out


def py_kama(vals, n):
    c1 = 2.0 / (Q._KAMA_FAST + 1) - 2.0 / (Q._KAMA_SLOW + 1)
    c2 = 2.0 / (Q._KAMA_SLOW + 1)
    ers = py_ker(vals, n)
    out, kama = [], vals[n - 1]
    for i in range(n, len(vals)):
        t = ers[i - n] * c1 + c2
        kama = kama + t * t * (vals[i] - kama)
        out.append(kama)
    return out


# --- tests ----------------------------------------------------------------

def _got(df, name):
    return [r[name] for r in df.orderBy("ts").collect()]


@pytest.mark.parametrize("warmup,n", [("exponential", 4), ("simple", 4),
                                      ("none", 4), ("exponential", 1)])
def test_ema_matches_python(spark, warmup, n):
    df = _series(spark, VALUES)
    got = _got(
        Q.tr_exponential_moving_average(df, ["k"], "ts", "v", n, warmup=warmup),
        "exponential_moving_average",
    )
    assert got == py_ema(VALUES, n, warmup)


def test_ema_hold_suppresses_leading_points(spark):
    df = _series(spark, VALUES)
    got = _got(
        Q.tr_exponential_moving_average(df, ["k"], "ts", "v", 4, hold=6),
        "exponential_moving_average",
    )
    assert got == py_ema(VALUES, 4)[5:]  # emits from the 6th input point


def test_dema_tema_match_python(spark):
    n, df = 4, _series(spark, VALUES)
    e1 = py_ema(VALUES, n)
    e2 = py_ema(e1, n)
    e3 = py_ema(e2, n)
    dema = [2.0 * a - b for a, b in zip(e1, e2)]
    tema = [3.0 * a - 3.0 * b + c for a, b, c in zip(e1, e2, e3)]
    got_d = _got(
        Q.tr_double_exponential_moving_average(df, ["k"], "ts", "v", n),
        "double_exponential_moving_average",
    )
    got_t = _got(
        Q.tr_triple_exponential_moving_average(df, ["k"], "ts", "v", n),
        "triple_exponential_moving_average",
    )
    assert got_d == dema and got_t == tema


def test_dema_suffix_alignment_simple_warmup(spark):
    """With simple warmup e2 starts n−1 points after e1 — the suffix zip
    must pair e1[n−1:] with e2, not truncate from the front of e2."""
    n, df = 4, _series(spark, VALUES)
    e1 = py_ema(VALUES, n, "simple")
    e2 = py_ema(e1, n, "simple")
    dema = [2.0 * a - b for a, b in zip(e1[n - 1:], e2)]
    got = _got(
        Q.tr_double_exponential_moving_average(
            df, ["k"], "ts", "v", n, warmup="simple"
        ),
        "double_exponential_moving_average",
    )
    assert got == dema


def test_trix_matches_python(spark):
    n, df = 4, _series(spark, VALUES)
    e3 = py_ema(py_ema(py_ema(VALUES, n), n), n)
    trix = [
        100.0 * (e3[i] - e3[i - 1]) / e3[i - 1] for i in range(1, len(e3))
    ]
    got = _got(
        Q.tr_triple_exponential_derivative(df, ["k"], "ts", "v", n),
        "triple_exponential_derivative",
    )
    assert got == trix


def test_rsi_matches_python(spark):
    n, df = 5, _series(spark, VALUES)
    got = _got(
        Q.tr_relative_strength_index(df, ["k"], "ts", "v", n),
        "relative_strength_index",
    )
    assert got == py_rsi(VALUES, n)


def test_rsi_flat_and_rising_edges(spark):
    flat = [5.0] * 8          # all deltas 0 → avgLoss 0, avgGain 0 → 50
    rising = list(range(8))   # avgLoss 0, avgGain > 0 → 100
    assert _got(
        Q.tr_relative_strength_index(_series(spark, flat), ["k"], "ts", "v", 3),
        "relative_strength_index",
    ) == [50.0] * 5
    assert _got(
        Q.tr_relative_strength_index(
            _series(spark, [float(x) for x in rising]), ["k"], "ts", "v", 3
        ),
        "relative_strength_index",
    ) == [100.0] * 5


def test_cmo_ker_match_python(spark):
    n, df = 5, _series(spark, VALUES)
    w_cmo = Q.tr_chande_momentum_oscillator(df, ["k"], "ts", "v", n)
    w_ker = Q.tr_kaufmans_efficiency_ratio(df, ["k"], "ts", "v", n)
    out = df.select("ts", w_cmo.alias("cmo"), w_ker.alias("ker")).orderBy("ts")
    rows = out.collect()
    got_cmo = [r["cmo"] for r in rows if r["cmo"] is not None]
    got_ker = [r["ker"] for r in rows if r["ker"] is not None]
    assert got_cmo == py_cmo(VALUES, n)
    assert got_ker == py_ker(VALUES, n)
    # emits only once n deltas exist
    assert all(r["cmo"] is None for r in rows[:n])


def test_kama_matches_python(spark):
    n, df = 5, _series(spark, VALUES)
    got = _got(
        Q.tr_kaufmans_adaptive_moving_average(df, ["k"], "ts", "v", n),
        "kaufmans_adaptive_moving_average",
    )
    assert got == py_kama(VALUES, n)


def test_multi_series_isolation(spark):
    """Recurrences must not leak across series: two interleaved series give
    exactly the per-series mirrors."""
    a = _series(spark, VALUES, "a")
    b = _series(spark, [v * 3.0 + 1.0 for v in VALUES], "b")
    df = a.unionByName(b)
    out = Q.tr_exponential_moving_average(df, ["k"], "ts", "v", 4)
    got_a = [
        r["exponential_moving_average"]
        for r in out.filter(F.col("k") == "a").orderBy("ts").collect()
    ]
    got_b = [
        r["exponential_moving_average"]
        for r in out.filter(F.col("k") == "b").orderBy("ts").collect()
    ]
    assert got_a == py_ema(VALUES, 4)
    assert got_b == py_ema([v * 3.0 + 1.0 for v in VALUES], 4)


def test_fold_plan_stays_jvm_side(spark):
    """The recurrence path is collect_list + higher-order-function fold —
    no Python workers anywhere in the plan."""
    df = _series(spark, VALUES)
    plan = (
        Q.tr_relative_strength_index(df, ["k"], "ts", "v", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


# --- string front-end integration ------------------------------------------

def test_frontend_ema_raw_string(spark):
    from influxer_spark.influxql_frontend import influxql

    df = _series(spark, VALUES)
    out = influxql(
        "SELECT exponential_moving_average(v, 4) AS ema FROM m GROUP BY k",
        {"m": df}, ts_col="ts",
    )
    assert [r["ema"] for r in out.orderBy("time").collect()] == py_ema(VALUES, 4)


def test_frontend_ema_warmup_and_hold_args(spark):
    from influxer_spark.influxql_frontend import influxql

    df = _series(spark, VALUES)
    out = influxql(
        "SELECT exponential_moving_average(v, 4, 6, 'simple') AS ema"
        " FROM m GROUP BY k",
        {"m": df}, ts_col="ts",
    )
    mirror = py_ema(VALUES, 4, "simple")[2:]  # simple emits from pt 4; hold 6
    assert [r["ema"] for r in out.orderBy("time").collect()] == mirror


def test_frontend_rsi_of_aggregate_desugars(spark):
    from influxer_spark.influxql_frontend import influxql

    df = _series(spark, VALUES)
    out = influxql(
        "SELECT relative_strength_index(mean(v), 3) AS rsi"
        " FROM m GROUP BY time(2h), k",
        {"m": df}, ts_col="ts",
    )
    means = [
        (VALUES[i] + VALUES[i + 1]) / 2 for i in range(0, len(VALUES), 2)
    ]
    assert [r["rsi"] for r in out.orderBy("time").collect()] == py_rsi(means, 3)


def test_frontend_cmo_string_with_other_columns(spark):
    from influxer_spark.influxql_frontend import influxql

    df = _series(spark, VALUES)
    out = influxql(
        "SELECT chande_momentum_oscillator(v, 5) AS cmo,"
        " kaufmans_efficiency_ratio(v, 5) AS ker FROM m GROUP BY k",
        {"m": df}, ts_col="ts",
    )
    rows = out.orderBy("time").collect()
    assert [r["cmo"] for r in rows] == py_cmo(VALUES, 5)
    assert [r["ker"] for r in rows] == py_ker(VALUES, 5)


def test_frontend_fold_rejects_extra_projection(spark):
    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    df = _series(spark, VALUES)
    with pytest.raises(InfluxQLError, match="only projection"):
        influxql(
            "SELECT exponential_moving_average(v, 4), v FROM m GROUP BY k",
            {"m": df}, ts_col="ts",
        )


def test_frontend_fold_field_with_group_by_time_rejected(spark):
    from influxer_spark.influxql_frontend import InfluxQLError, influxql

    df = _series(spark, VALUES)
    with pytest.raises(InfluxQLError, match="aggregate argument"):
        influxql(
            "SELECT kaufmans_adaptive_moving_average(v, 4) FROM m"
            " GROUP BY time(2h), k",
            {"m": df}, ts_col="ts",
        )


def test_fold_chunk_boundaries_bit_exact(spark):
    """_fold_emit processes _FOLD_CHUNK(=64)-element chunks; a series
    spanning many chunks must thread state across boundaries with no
    element dropped, duplicated, or reordered — asserted bit-exactly vs
    the Python mirror at L=2500 for all three recurrence families."""
    vals = [float((i * 37) % 97) + 0.25 * (i % 7) for i in range(2500)]
    df = _series(spark, vals)
    assert _got(
        Q.tr_exponential_moving_average(df, ["k"], "ts", "v", 10),
        "exponential_moving_average",
    ) == py_ema(vals, 10)
    assert _got(
        Q.tr_exponential_moving_average(df, ["k"], "ts", "v", 10, warmup="simple"),
        "exponential_moving_average",
    ) == py_ema(vals, 10, "simple")
    assert _got(
        Q.tr_relative_strength_index(df, ["k"], "ts", "v", 14),
        "relative_strength_index",
    ) == py_rsi(vals, 14)
    assert _got(
        Q.tr_kaufmans_adaptive_moving_average(df, ["k"], "ts", "v", 10),
        "kaufmans_adaptive_moving_average",
    ) == py_kama(vals, 10)


def test_frontend_top_per_tag(spark):
    """top(v, k, 2): one point per tag value (its max; ties -> earlier ts),
    then the 2 greatest of those across tags."""
    from influxer_spark.influxql_frontend import influxql

    a = _series(spark, [1.0, 9.0, 3.0], "a")
    b = _series(spark, [8.0, 2.0, 8.0], "b")   # tie at 8.0 -> earlier ts
    c = _series(spark, [4.0, 4.0, 5.0], "c")
    df = a.unionByName(b).unionByName(c)
    rows = influxql(
        "SELECT top(v, k, 2) FROM m", {"m": df}, ts_col="ts"
    ).orderBy("rank").collect()
    assert [(r["k"], r["top"], r["rank"]) for r in rows] == [
        ("a", 9.0, 1), ("b", 8.0, 2)
    ]
    assert rows[1]["time"] == T0  # tie broke to the earlier point


def test_frontend_explain(spark):
    from influxer_spark.influxql_frontend import influxql

    df = _series(spark, VALUES)
    plan = influxql(
        "EXPLAIN SELECT mean(v) FROM m GROUP BY time(2h), k",
        {"m": df}, ts_col="ts",
    ).collect()
    text = "\n".join(r["plan"] for r in plan)
    assert "HashAggregate" in text
    analyzed = influxql(
        "EXPLAIN ANALYZE SELECT mean(v) FROM m GROUP BY time(2h), k",
        {"m": df}, ts_col="ts",
    ).collect()
    assert analyzed[-1]["plan"] == "rows: 8"


def test_counter_rate_reset_semantics(spark):
    """A counter drop is a restart: the post-reset VALUE is the delta."""
    df = _series(spark, [10.0, 14.0, 2.0, 8.0])
    out = df.select(
        "ts", Q.tr_counter_rate(df, ["k"], "ts", "v", 3600).alias("cr")
    ).orderBy("ts").collect()
    assert out[0]["cr"] is None
    assert [r["cr"] for r in out[1:]] == [4.0, 2.0, 6.0]


def test_counter_increase_and_resets(spark):
    """increase: reset-adjusted delta; resets: 0/1 indicator, NULL first."""
    df = _series(spark, [10.0, 14.0, 2.0, 8.0, 8.0])
    out = df.select(
        "ts",
        Q.tr_counter_increase(df, ["k"], "ts", "v").alias("inc"),
        Q.tr_counter_resets(df, ["k"], "ts", "v").alias("res"),
    ).orderBy("ts").collect()
    assert [r["inc"] for r in out] == [None, 4.0, 2.0, 6.0, 0.0]
    assert [r["res"] for r in out] == [None, 0, 1, 0, 0]


def test_counter_family_via_frontend_subquery(spark):
    """sum(counter_resets(v)) over a subquery: the composed plan counts
    the same resets as the Column transform does point-wise."""
    from influxer_spark.influxql_frontend import influxql

    df = _series(spark, [10.0, 14.0, 2.0, 8.0, 3.0, 9.0])
    out = influxql(
        "SELECT sum(res) AS n FROM "
        "(SELECT counter_resets(v) AS res FROM m GROUP BY k) "
        "GROUP BY time(1d), k",
        {"m": df}, ts_col="ts",
    ).collect()
    assert sum(r["n"] for r in out) == 2


def test_anomaly_mad_flags_outliers(spark):
    vals = [10.0, 10.5, 9.8, 10.2, 10.1, 50.0, 10.3, 9.9, 10.0, 10.4]
    df = _series(spark, vals)
    rows = Q.anomaly_mad(df, ["k"], "ts", "v", k=3.5).orderBy("ts").collect()
    flagged = [i for i, r in enumerate(rows) if r["anomaly"]]
    assert flagged == [5]
    # constant series: MAD 0, any deviation flags
    flat = [5.0] * 6 + [5.1]
    rows = Q.anomaly_mad(_series(spark, flat), ["k"], "ts", "v").orderBy("ts").collect()
    assert [r["anomaly"] for r in rows] == [False] * 6 + [True]


# --- property tests: random finite series must match the mirrors exactly ---

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=12, deadline=None)
@given(vals=st.lists(_finite, min_size=2, max_size=120),
       n=st.integers(min_value=1, max_value=8))
def test_property_ema_bit_exact(spark, vals, n):
    df = _series(spark, vals)
    got = _got(
        Q.tr_exponential_moving_average(df, ["k"], "ts", "v", n),
        "exponential_moving_average",
    )
    assert got == py_ema(vals, n)


@settings(max_examples=12, deadline=None)
@given(vals=st.lists(_finite, min_size=6, max_size=120),
       n=st.integers(min_value=2, max_value=5))
def test_property_rsi_kama_bit_exact(spark, vals, n):
    df = _series(spark, vals)
    got_rsi = _got(
        Q.tr_relative_strength_index(df, ["k"], "ts", "v", n),
        "relative_strength_index",
    )
    assert got_rsi == py_rsi(vals, n)
    got_kama = _got(
        Q.tr_kaufmans_adaptive_moving_average(df, ["k"], "ts", "v", n),
        "kaufmans_adaptive_moving_average",
    )
    assert got_kama == py_kama(vals, n)


def test_cusum_detects_level_shift(spark):
    """A sustained +2 shift that never trips a per-point MAD test must
    accumulate into a CUSUM alarm."""
    vals = [10.0 + 0.1 * ((i * 7) % 5) for i in range(30)]
    shifted = vals + [v + 2.0 for v in vals]
    df = _series(spark, shifted)
    rows = Q.cusum_changepoints(
        df, ["k"], "ts", "v", slack_mads=1.0, h_mads=8.0
    ).orderBy("ts").collect()
    # no alarms in the stable first half; alarms appear after the shift
    assert not any(r["alarm"] for r in rows[:30])
    assert any(r["alarm"] for r in rows[30:])
    first_alarm = next(i for i, r in enumerate(rows) if r["alarm"])
    assert 30 <= first_alarm <= 45  # fires within ~15 points of the shift
    # per-point MAD test at the same scale misses the 2.0 shift entirely
    mrows = Q.anomaly_mad(df, ["k"], "ts", "v", k=8.0).collect()
    assert not any(r["anomaly"] for r in mrows)


def test_cusum_matches_python_mirror(spark):
    vals = [float((i * 37) % 23) + 0.5 * (i % 3) for i in range(60)]
    df = _series(spark, vals)
    rows = Q.cusum_changepoints(df, ["k"], "ts", "v").orderBy("ts").collect()
    sv = sorted(vals)
    mu = sv[int(0.5 * len(vals) + 0.5) - 1]
    sad = sorted(abs(v - mu) for v in vals)
    mad = sad[int(0.5 * len(vals) + 0.5) - 1]
    sl, sp, sn = 0.5 * mad, 0.0, 0.0
    for r, v in zip(rows, vals):
        up, dn = sp + (v - mu - sl), sn + (mu - sl - v)
        sp = up if up > 0 else 0.0
        sn = dn if dn > 0 else 0.0
        assert (r["s_pos"], r["s_neg"]) == (sp, sn)


def test_null_points_are_skipped_like_influxdb(spark):
    rows = [("a", T0 + dt.timedelta(hours=i), v) for i, v in
            enumerate([10.0, None, 12.5, None, 11.0, 11.0, 14.75])]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    dense = [10.0, 12.5, 11.0, 11.0, 14.75]
    got = _got(
        Q.tr_exponential_moving_average(df, ["k"], "ts", "v", 3),
        "exponential_moving_average",
    )
    assert got == py_ema(dense, 3)


def test_frontend_ema_composes_with_fill_linear(spark):
    """fill(linear) interpolates the aggregate buckets BEFORE the fold —
    InfluxDB's evaluation order (values hand-checked)."""
    from influxer_spark.influxql_frontend import influxql

    rows = [("a", dt.datetime(2024, 1, 1, h), float(v)) for h, v in
            [(0, 2.0), (1, 4.0), (2, 6.0), (5, 12.0), (6, 14.0)]]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = influxql(
        "SELECT exponential_moving_average(mean(v), 3) AS ema FROM m"
        " GROUP BY time(1h), k fill(linear)",
        {"m": df}, ts_col="ts",
    ).orderBy("time").collect()
    assert [r["time"].hour for r in out] == list(range(7))
    assert out[3]["ema"] == pytest.approx(6.333333333333333)
    assert out[6]["ema"] == pytest.approx(12.041666666666666)


def test_kama_and_anomaly_skip_null_points(spark):
    """KAMA's smoothing constant is window-derived, so null handling must
    happen BEFORE the er/sc windows; medians must rank over non-null
    values only."""
    vals = [10.0, 12.5, None, 11.0, 14.75, 13.0, 16.5, 15.25, 15.25, 18.0]
    rows = [("a", T0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    dense = [v for v in vals if v is not None]
    got = _got(
        Q.tr_kaufmans_adaptive_moving_average(df, ["k"], "ts", "v", 3),
        "kaufmans_adaptive_moving_average",
    )
    assert got == py_kama(dense, 3)
    med_rows = Q.anomaly_mad(df, ["k"], "ts", "v").collect()
    assert len(med_rows) == len(dense)
    sv = sorted(dense)
    assert med_rows[0]["med"] == sv[int(0.5 * len(dense) + 0.5) - 1]


def test_deadman_pinned_window_alerts_dead_series(spark):
    """A series that stopped reporting before the watched window must alert
    in EVERY bucket of a pinned spine (the monitoring use), and a live
    series only in its actual gaps."""
    import datetime as dt

    from influxer_spark.operators.influxql import deadman

    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(minutes=10 * i), "live", 1.0) for i in range(18)]
    # live series misses minutes [60, 90): one empty 30m bucket
    rows = [r for r in rows if not (60 <= (r[0] - t0).total_seconds() / 60 < 90)]
    rows += [(t0 - dt.timedelta(hours=3), "dead", 1.0)]  # last report long ago
    df = spark.createDataFrame(rows, ["ts", "host", "value"])
    lo, hi = t0, t0 + dt.timedelta(hours=2, minutes=30)
    out = deadman(df, ["host"], "ts", 1800, spine_bounds=(lo, hi))
    got = {(r["host"], r["bucket"]) for r in out.collect()}
    dead_buckets = {(
        "dead", t0 + dt.timedelta(minutes=30 * i)) for i in range(6)}
    assert dead_buckets <= got
    assert ("live", t0 + dt.timedelta(hours=1)) in got
    assert not any(h == "live" and b != t0 + dt.timedelta(hours=1)
                   for h, b in got)


def test_series_fold_cap_fails_loudly(spark):
    """The fold family's memory precondition is ENFORCED: a series longer
    than max_points raises a counted, keyed error instead of OOMing an
    executor downstream (round-2 verdict ask #4)."""
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(i))
            for i in range(20)]
    df = spark.createDataFrame(rows, ["key", "ts", "v"])

    g = Q._collected(df, ["key"], "ts", "v", max_points=10)
    with pytest.raises(Exception, match=r"20 points > max_points=10"):
        g.collect()
    # at or under the cap the fold proceeds untouched
    assert Q._collected(df, ["key"], "ts", "v", max_points=20).count() == 1
    # the default cap is high enough for any tier-sized series and is shared
    # by the LTTB/ACF/decompose consumers via guard_series_points
    assert Q.DEFAULT_MAX_SERIES_POINTS == 4_000_000

    from influxer_spark.operators.decompose import acf
    out = acf(df, ["key"], "ts", "v", max_lag=3)
    assert out.count() == 4  # guard wired in, harmless under the cap


def test_ewma_chart_matches_python_mirror(spark):
    """z, ucl, lcl replay bit-for-bit against a plain-Python recurrence
    (including the fold-threaded (1-lam)^(2t) running product)."""
    import math

    vals = [float((i * 37) % 23) + 0.5 * (i % 3) for i in range(60)]
    df = _series(spark, vals)
    rows = Q.ewma_chart(df, ["k"], "ts", "v", lam=0.2, l_mads=3.0).orderBy("ts").collect()
    sv = sorted(vals)
    mu = sv[int(0.5 * len(vals) + 0.5) - 1]
    sad = sorted(abs(v - mu) for v in vals)
    mad = sad[int(0.5 * len(vals) + 0.5) - 1]
    lam, om, l = 0.2, 0.8, 3.0
    om2, cfac = om * om, 0.2 / 1.8
    z, f = None, 1.0
    for r, v in zip(rows, vals):
        z = lam * v + om * (mu if z is None else z)
        f = f * om2
        hw = l * mad * math.sqrt(cfac * (1.0 - f))
        assert r["ewma"] == z           # bit-exact
        assert r["ucl"] == mu + hw
        assert r["lcl"] == mu - hw
        assert r["alarm"] == (z > mu + hw or z < mu - hw)


def test_ewma_chart_catches_small_drift_sigma_misses(spark):
    """A slow +0.15/step drift: per-point MAD at k=8 never fires, the
    EWMA chart walks out of its band."""
    stable = [10.0 + 0.1 * ((i * 7) % 5) for i in range(40)]
    drift = [stable[-1] + 0.15 * i for i in range(1, 31)]
    df = _series(spark, stable + drift)
    rows = Q.ewma_chart(df, ["k"], "ts", "v", lam=0.2, l_mads=3.0).orderBy("ts").collect()
    assert not any(r["alarm"] for r in rows[:40])
    assert any(r["alarm"] for r in rows[40:])
    mrows = Q.anomaly_mad(df, ["k"], "ts", "v", k=8.0).collect()
    assert not any(r["anomaly"] for r in mrows[:55])  # per-point test lags far behind
