"""Classical seasonal decomposition (operators/decompose.py) vs a
plain-Python mirror of the same method (statsmodels-style additive
moving-average decomposition)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from influxer_spark.operators.decompose import classical_decompose

T0 = dt.datetime(2024, 1, 1)


def _series(gaps=True):
    rows = []
    for k in ("a", "b"):
        for i in range(24 * 14):  # 14 days hourly
            if gaps and k == "a" and i % 97 == 5:
                continue  # real gaps
            season = 10.0 * math.sin(2 * math.pi * (i % 24) / 24)
            trend = 0.05 * i + (5.0 if k == "b" else 0.0)
            noise = ((i * 2654435761) % 1000) / 1000.0 - 0.5
            rows.append((k, T0 + dt.timedelta(hours=i), trend + season + noise))
    return rows


def _mirror(rows, period=24):
    """Python replay: positional centered 2xP MA, calendar phase means,
    re-center."""
    out = {}
    by_key: dict[str, list] = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    for k, pts in by_key.items():
        pts.sort()
        n = len(pts)
        half = period // 2
        trend = [None] * n
        for i in range(n):
            if i - half < 0 or i + half >= n:
                continue
            s = 0.5 * pts[i - half][1] + 0.5 * pts[i + half][1]
            for j in range(i - half + 1, i + half):
                s += pts[j][1]
            trend[i] = s / period
        det = [
            None if trend[i] is None else pts[i][1] - trend[i]
            for i in range(n)
        ]
        phases = [
            int(pts[i][0].timestamp() // 3600) % period for i in range(n)
        ]
        s_raw = {}
        for p in set(phases):
            vals = [det[i] for i in range(n) if phases[i] == p and det[i] is not None]
            if vals:
                s_raw[p] = sum(vals) / len(vals)
        grand = sum(s_raw.values()) / len(s_raw)
        seas = {p: s - grand for p, s in s_raw.items()}
        for i in range(n):
            out[(k, pts[i][0])] = (
                trend[i],
                seas.get(phases[i]),
                None if det[i] is None else det[i] - seas[phases[i]],
            )
    return out


def test_decompose_matches_python_mirror(spark):
    rows = _series()
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {
        (r["k"], r["ts"]): (r["trend"], r["seasonal"], r["resid"])
        for r in classical_decompose(df, ["k"], "ts", "v", 24, 3600).collect()
    }
    want = _mirror(rows)
    assert got.keys() == want.keys()
    for key, (tr, se, re_) in want.items():
        gtr, gse, gre = got[key]
        if tr is None:
            assert gtr is None and gre is None
        else:
            assert gtr == pytest.approx(tr, rel=1e-9, abs=1e-12)
            assert gre == pytest.approx(re_, rel=1e-9, abs=1e-12)
        assert gse == pytest.approx(se, rel=1e-9, abs=1e-12)


def test_decompose_identity_and_seasonality_recovery(spark):
    rows = _series(gaps=False)
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = classical_decompose(df, ["k"], "ts", "v", 24, 3600).collect()
    by_phase = {}
    for r in out:
        if r["trend"] is not None:
            # exact identity by construction
            assert r["v"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["resid"], abs=1e-9
            )
        by_phase.setdefault(
            int(r["ts"].timestamp() // 3600) % 24, []
        ).append(r["seasonal"])
    # the injected 10·sin(2π·phase/24) seasonality is recovered within the
    # noise floor (±0.5 uniform noise, slope leakage ~0)
    for p, vals in by_phase.items():
        truth = 10.0 * math.sin(2 * math.pi * p / 24)
        assert vals[0] == pytest.approx(truth, abs=0.6)
    # seasonal components sum to ~zero over one period (re-centered)
    assert sum(v[0] for v in by_phase.values()) == pytest.approx(0.0, abs=1e-6)


def test_decompose_plan_no_python(spark):
    rows = _series()
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    plan = (
        classical_decompose(df, ["k"], "ts", "v", 24, 3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_acf_matches_numpy_mirror_and_finds_period(spark):
    import numpy as np

    from influxer_spark.operators.decompose import acf

    rows = _series(gaps=False)
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {
        (r["k"], r["lag"]): r["acf"]
        for r in acf(df, ["k"], "ts", "v", 30).collect()
    }
    by_key = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    for k, pts in by_key.items():
        x = np.array([v for _, v in sorted(pts)])
        m = x.mean()
        d = x - m
        den = float((d * d).sum())
        for lag in range(31):
            want = float((d[lag:] * d[: len(d) - lag]).sum()) / den
            assert got[(k, lag)] == pytest.approx(want, rel=1e-9, abs=1e-12)
        assert got[(k, 0)] == pytest.approx(1.0, abs=1e-12)
    # period detection composes with decomposition: on the DETRENDED series
    # (trend ACF decays slowly from lag 1 and would mask the season — the
    # standard reason ACF is run on detrended/differenced data), the daily
    # season shows as the dominant interior peak at lag 24
    det_rows = [
        (k, t, v - 0.05 * ((t - T0).total_seconds() / 3600))
        for k, t, v in rows
    ]
    det_df = spark.createDataFrame(det_rows, ["k", "ts", "v"])
    det_got = {
        (r["k"], r["lag"]): r["acf"]
        for r in acf(det_df, ["k"], "ts", "v", 30).collect()
    }
    interior = {lag: det_got[("a", lag)] for lag in range(2, 31)}
    assert max(interior, key=interior.get) == 24


def test_acf_edge_cases(spark):
    from influxer_spark.operators.decompose import acf

    df = spark.createDataFrame(
        [("c", T0 + dt.timedelta(hours=i), 5.0) for i in range(4)]
        + [("s", T0, 1.0), ("s", T0 + dt.timedelta(hours=1), 2.0)],
        ["k", "ts", "v"],
    )
    got = {(r["k"], r["lag"]): r["acf"] for r in acf(df, ["k"], "ts", "v", 5).collect()}
    assert all(got[("c", lag)] is None for lag in range(6))  # zero variance
    assert got[("s", 3)] is None  # lag >= n


def test_series_corr_matches_numpy(spark):
    import numpy as np

    from influxer_spark.operators.decompose import series_corr

    rows = []
    for i in range(300):
        x = ((i * 2654435761) % 1000) / 100.0
        rows.append(("p", T0 + dt.timedelta(hours=i), x, 3.0 * x + 1.0))   # r=1
        rows.append(("m", T0 + dt.timedelta(hours=i), x, -2.0 * x))        # r=-1
        rows.append(
            ("n", T0 + dt.timedelta(hours=i), x, ((i * 40503) % 997) / 99.7)
        )
        rows.append(("c", T0 + dt.timedelta(hours=i), x, 7.0))  # constant y
    rows.append(("n", T0 + dt.timedelta(hours=301), None, 1.0))  # null skipped
    df = spark.createDataFrame(rows, ["k", "ts", "x", "y"])
    got = {r["k"]: (r["n"], r["corr"]) for r in
           series_corr(df, ["k"], "ts", "x", "y").collect()}
    assert got["p"][1] == pytest.approx(1.0, abs=1e-12)
    assert got["m"][1] == pytest.approx(-1.0, abs=1e-12)
    assert got["c"][1] is None
    assert got["n"][0] == 300  # the null row is excluded
    xs = np.array([((i * 2654435761) % 1000) / 100.0 for i in range(300)])
    ys = np.array([((i * 40503) % 997) / 99.7 for i in range(300)])
    assert got["n"][1] == pytest.approx(float(np.corrcoef(xs, ys)[0, 1]),
                                        rel=1e-9)


def test_cross_corr_lag_discovery(spark):
    """y = x delayed by 2 hours → ccf peaks (=1) exactly at lag +2; the
    self-pair at lag 0 is the ACF anchor (=1); a timestamp gap drops
    pairs instead of mis-aligning the lag."""
    from influxer_spark.operators.decompose import cross_corr

    xs = [((i * 2654435761) % 1000) / 100.0 for i in range(120)]
    rows = []
    for i in range(120):
        ts = T0 + dt.timedelta(hours=i)
        rows.append(("self", ts, xs[i]))
        if i >= 2:
            rows.append(("delayed", ts, xs[i - 2]))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    ref = df.filter("k = 'self'").select("ts", "v")
    out = {(r["k"], r["lag"]): (r["n"], r["corr"]) for r in
           cross_corr(ref, df, ["k"], "ts", "v", "v",
                      [-2, -1, 0, 1, 2], 3600).collect()}
    assert out[("self", 0)][1] == pytest.approx(1.0, abs=1e-12)
    assert out[("delayed", 2)][1] == pytest.approx(1.0, abs=1e-12)
    # off-peak lags are far from 1 on pseudo-random data
    assert abs(out[("delayed", 0)][1]) < 0.5
    # every delayed row (hours 2..119) finds its x at b−2 → 118 pairs,
    # while lag 0 only aligns where both exist
    assert out[("delayed", 2)][0] == 118
    assert out[("delayed", 0)][0] == 118


def test_cross_corr_gap_drops_pairs(spark):
    from influxer_spark.operators.decompose import cross_corr

    rows = [("a", T0 + dt.timedelta(hours=h), float(h)) for h in (0, 1, 3, 4)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    ref = df.select("ts", "v")
    out = {r["lag"]: r["n"] for r in
           cross_corr(ref, df, ["k"], "ts", "v", "v", [0, 1], 3600).collect()}
    # lag 1 pairs: (0→1), (3→4) — the gap kills (1→2) and (2→3)
    assert out[0] == 4 and out[1] == 2


def test_resid_anomaly_catches_in_season_outlier(spark):
    """A trough-hour value at normal-peak LEVEL is invisible to raw
    MAD (it's inside the series' overall spread) but jumps out of the
    seasonal residual — the point of composing decompose → anomaly_mad."""
    from pyspark.sql import functions as F

    from influxer_spark.operators.influxql import anomaly_mad

    rows = []
    for i in range(24 * 14):
        season = 10.0 * math.sin(2 * math.pi * (i % 24) / 24)
        noise = ((i * 2654435761) % 1000) / 1000.0 - 0.5
        v = season + noise
        if i == 24 * 7 + 18:  # hour 18: seasonal trough ≈ -10
            v = 9.5  # peak-level value — in-range overall, wrong phase
        rows.append(("k", T0 + dt.timedelta(hours=i), v))
    df = spark.createDataFrame(rows, ["k", "ts", "v"])

    raw_flags = {
        r["ts"]
        for r in anomaly_mad(df, ["k"], "ts", "v", k=3.5).collect()
        if r["anomaly"]
    }
    dec = classical_decompose(df, ["k"], "ts", "v", 24, 3600)
    rr = dec.filter(F.col("resid").isNotNull()).select("k", "ts", "resid")
    resid_flags = {
        r["ts"]
        for r in anomaly_mad(rr, ["k"], "ts", "resid", k=3.5).collect()
        if r["anomaly"]
    }
    target = T0 + dt.timedelta(hours=24 * 7 + 18)
    assert target not in raw_flags
    assert target in resid_flags


def test_dominant_period_finds_planted_season(spark):
    import math

    from influxer_spark.operators.decompose import dominant_period

    rows = []
    for i in range(240):  # 10 cycles of a period-24 season + tiny trend
        rows.append(("s", i, 100.0 + 10.0 * math.sin(2 * math.pi * i / 24) + 0.01 * i))
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = dominant_period(df, ["k"], "t", "v", max_lag=48).collect()
    assert len(got) == 1
    assert got[0]["period"] == 24
    assert got[0]["acf_peak"] > 0.8


def test_dominant_period_constant_series_emits_nothing(spark):
    from influxer_spark.operators.decompose import dominant_period

    df = spark.createDataFrame([("s", i, 5.0) for i in range(50)], ["k", "t", "v"])
    assert dominant_period(df, ["k"], "t", "v", max_lag=10).count() == 0


def test_corr_matrix_hand_geometry(spark):
    """Perfect positive / negative correlation and zero-variance NULL on
    hand-aligned integer series, with the key_a < key_b output shape."""
    from influxer_spark.operators.decompose import corr_matrix

    rows = []
    for i in range(6):
        rows += [
            ("up", i, 10 + 2 * i),
            ("dn", i, 50 - 3 * i),
            ("flat", i, 7),
        ]
    df = spark.createDataFrame(rows, ["k", "b", "v"])
    got = {(r["key_a"], r["key_b"]): r for r in
           corr_matrix(df, "k", "b", "v").collect()}
    assert set(got) == {("dn", "up"), ("dn", "flat"), ("flat", "up")}
    assert got[("dn", "up")]["corr"] == pytest.approx(-1.0)
    assert got[("dn", "flat")]["corr"] is None  # zero variance side
    assert all(r["n"] == 6 for r in got.values())


def test_corr_matrix_partial_overlap_and_min_overlap(spark):
    from influxer_spark.operators.decompose import corr_matrix

    rows = [("a", 0, 1), ("a", 1, 2), ("a", 2, 3),
            ("b", 1, 5), ("b", 2, 7),          # overlaps a on buckets 1,2
            ("c", 9, 4)]                        # no shared bucket with a
    df = spark.createDataFrame(rows, ["k", "b", "v"])
    got = {(r["key_a"], r["key_b"]): r for r in
           corr_matrix(df, "k", "b", "v").collect()}
    assert ("a", "b") in got and got[("a", "b")]["n"] == 2
    assert got[("a", "b")]["corr"] == pytest.approx(1.0)
    assert ("a", "c") not in got  # inner alignment: no shared buckets, no row
    strict = {(r["key_a"], r["key_b"]): r["corr"] for r in
              corr_matrix(df, "k", "b", "v", min_overlap=3).collect()}
    assert strict[("a", "b")] is None  # below the overlap floor


def test_corr_matrix_overflow_guard(spark):
    from influxer_spark.operators.decompose import corr_matrix

    big = spark.createDataFrame(
        [("a", 0, 2**31), ("b", 0, 2**31)], ["k", "b", "v"]
    )
    with pytest.raises(ValueError, match="overflow"):
        corr_matrix(big, "k", "b", "v")
