"""Holt-Winters forecasting — InfluxQL's ``holt_winters(agg(f), N, S)`` and
``holt_winters_with_fit`` (reference users' prediction surface; the engine's
other InfluxQL functions live in operators/influxql.py).

Semantics: the STANDARD additive Holt-Winters method (Hyndman &
Athanasopoulos, "Forecasting: Principles and Practice" §7.3 — public
reference), parameters (alpha, beta, gamma) fitted per series by
Nelder-Mead on the one-step-ahead SSE, exactly like InfluxDB fits its
holt_winters() (influxdata/influxdb query/neldermead — same public
algorithm).  InfluxDB's fitted values are optimizer-trajectory-dependent
and not bit-replicable across implementations, so parity here is METHOD
parity, pinned by tests against a plain-Python mirror; there is no SQL
oracle (iterative optimization — the driver records a rows-only check).

- season_length S > 1: additive seasonal component, initialized from the
  first season (sᵢ = yᵢ − mean(first season)); level starts at that mean,
  trend at the average first-vs-second-season slope.
- S in (0, 1): Holt's linear method (level + trend, no season) — InfluxDB's
  holt_winters with seasonal_pattern 0.
- Forecast h steps: ŷ = l + h·b (+ s at the matching season phase).

Execution shape: one ``applyInPandas`` per series group — the fit is an
iterative optimization (the one place Python-side math is justified); each
SSE evaluation is an O(L) recurrence over numpy scalars.  Series are
GROUP BY time() buckets, so L is bounded by the queried range, and fits
parallelize per series across executors.  Deterministic: fixed initial
simplex, fixed iteration budget, no randomness.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hw_sse(y: np.ndarray, m: int, alpha: float, beta: float, gamma: float):
    """One-step-ahead SSE of additive Holt-Winters with the given params;
    returns (sse, level, trend, seasons) at the end of the series."""
    n = len(y)
    if m > 1:
        l = float(np.mean(y[:m]))
        if n >= 2 * m:
            b = float((np.mean(y[m:2 * m]) - np.mean(y[:m])) / m)
        else:
            b = 0.0
        s = [float(v) - l for v in y[:m]]
        start = m
    else:
        l, b = float(y[0]), float(y[1] - y[0]) if n > 1 else 0.0
        s = [0.0]
        start = 1
    sse = 0.0
    for t in range(start, n):
        si = s[t % m] if m > 1 else 0.0
        yhat = l + b + si
        e = float(y[t]) - yhat
        sse += e * e
        l_new = alpha * (float(y[t]) - si) + (1.0 - alpha) * (l + b)
        b = beta * (l_new - l) + (1.0 - beta) * b
        if m > 1:
            s[t % m] = gamma * (float(y[t]) - l_new) + (1.0 - gamma) * si
        l = l_new
    return sse, l, b, s


def _fit(y: np.ndarray, m: int, iters: int = 120):
    """Nelder-Mead over (alpha, beta, gamma) clamped to [0, 1] — fixed
    initial simplex and iteration budget, so the fit is deterministic."""
    dims = 3 if m > 1 else 2

    def f(p):
        a = min(max(p[0], 0.0), 1.0)
        b = min(max(p[1], 0.0), 1.0)
        g = min(max(p[2], 0.0), 1.0) if dims == 3 else 0.0
        return _hw_sse(y, m, a, b, g)[0]

    pts = [np.array([0.5, 0.1, 0.1])]
    for i in range(dims):
        q = pts[0].copy()
        q[i] += 0.4
        pts.append(q)
    vals = [f(p) for p in pts]
    for _ in range(iters):
        order = np.argsort(vals, kind="stable")
        pts = [pts[i] for i in order]
        vals = [vals[i] for i in order]
        centroid = np.mean(pts[:-1], axis=0)
        refl = centroid + (centroid - pts[-1])
        fr = f(refl)
        if fr < vals[0]:
            exp = centroid + 2.0 * (centroid - pts[-1])
            fe = f(exp)
            pts[-1], vals[-1] = (exp, fe) if fe < fr else (refl, fr)
        elif fr < vals[-2]:
            pts[-1], vals[-1] = refl, fr
        else:
            contr = centroid + 0.5 * (pts[-1] - centroid)
            fc = f(contr)
            if fc < vals[-1]:
                pts[-1], vals[-1] = contr, fc
            else:  # shrink toward the best point
                pts = [pts[0]] + [pts[0] + 0.5 * (p - pts[0]) for p in pts[1:]]
                vals = [vals[0]] + [f(p) for p in pts[1:]]
    best = pts[int(np.argmin(vals))]
    a = min(max(best[0], 0.0), 1.0)
    b = min(max(best[1], 0.0), 1.0)
    g = min(max(best[2], 0.0), 1.0) if dims == 3 else 0.0
    return a, b, g


def hw_forecast_series(
    ts_us: np.ndarray, y: np.ndarray, n_predict: int, season_length: int,
    interval_us: int, with_fit: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-python/numpy kernel (also the test mirror): returns (times,
    values) — fitted history when with_fit, then n_predict forecasts."""
    m = season_length if season_length and season_length > 1 else 1
    if len(y) < max(2, 2 * m if m > 1 else 2):
        return np.array([], dtype=np.int64), np.array([])
    a, b_, g = _fit(y, m)
    _, l, b, s = _hw_sse(y, m, a, b_, g)
    out_t, out_v = [], []
    if with_fit:
        # replay the one-step-ahead fitted values (same recurrence)
        n = len(y)
        if m > 1:
            lf = float(np.mean(y[:m]))
            bf = float((np.mean(y[m:2 * m]) - np.mean(y[:m])) / m) if n >= 2 * m else 0.0
            sf = [float(v) - lf for v in y[:m]]
            start = m
        else:
            lf, bf = float(y[0]), float(y[1] - y[0]) if n > 1 else 0.0
            sf = [0.0]
            start = 1
        for t in range(start, n):
            si = sf[t % m] if m > 1 else 0.0
            out_t.append(int(ts_us[t]))
            out_v.append(lf + bf + si)
            l_new = a * (float(y[t]) - si) + (1.0 - a) * (lf + bf)
            bf = b_ * (l_new - lf) + (1.0 - b_) * bf
            if m > 1:
                sf[t % m] = g * (float(y[t]) - l_new) + (1.0 - g) * si
            lf = l_new
    last = int(ts_us[-1])
    n_hist = len(y)
    for h in range(1, n_predict + 1):
        si = s[(n_hist + h - 1) % m] if m > 1 else 0.0
        out_t.append(last + h * interval_us)
        out_v.append(l + h * b + si)
    return np.asarray(out_t, dtype=np.int64), np.asarray(out_v)


def holt_winters(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    n_predict: int,
    season_length: int,
    interval_seconds: float,
    with_fit: bool = False,
) -> DataFrame:
    """Per-series Holt-Winters forecast: ``n_predict`` future points at
    ``interval_seconds`` spacing past each series' last point (plus the
    one-step-ahead fitted history when ``with_fit``).  Output:
    (keys…, ts_col, holt_winters: double)."""
    interval_us = int(round(interval_seconds * 1_000_000))
    keys = list(key_cols)
    key_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"`{k}` {key_types[k]}" for k in keys]
        + [f"`{ts_col}` timestamp", "`holt_winters` double"]
    )

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # skip null/NaN buckets (fill(null) produces them): one NaN fed to
        # the SSE would turn every forecast into NaN
        pdf = pdf[pdf[value_col].notna()].sort_values(ts_col)
        ts_us = pdf[ts_col].astype("int64").to_numpy()  # ns since epoch
        y = pdf[value_col].astype("float64").to_numpy()
        t_out, v_out = hw_forecast_series(
            ts_us // 1000, y, n_predict, season_length, interval_us, with_fit
        )
        out = pd.DataFrame({
            ts_col: pd.to_datetime(t_out * 1000),
            "holt_winters": v_out,
        })
        for k in keys:
            out[k] = pdf[k].iloc[0] if len(pdf) else None
        return out[keys + [ts_col, "holt_winters"]]

    src = df.select(*keys, F.col(ts_col).cast("timestamp"), F.col(value_col))
    return src.groupBy(*keys).applyInPandas(fit_group, schema)


def seasonal_naive_eval(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    period: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Seasonal-naive forecast baseline + MASE-style evaluation per series.

    The standard forecasting yardstick (Hyndman & Koehler 2006, public):
    the seasonal-naive model predicts ŷ_t = y_{t−period} over bucketed
    series; its mean absolute error is compared to the one-step naive
    ŷ_t = y_{t−1}.  ``mase < 1`` ⇒ the seasonal pattern carries signal —
    the cheap pre-check before paying for a fitted model (holt_winters),
    and the denominator any fitted model must beat.

    Emits per series: evaluation counts, scaled-integer absolute-error sums
    (each |error| is quantized to ``1/scale`` ONCE, so the per-series sums
    are order-free integer math — bit-exact against any SQL oracle), and
    ``mase = sum_err_snaive/n_s ÷ sum_err_naive1/n_1`` as IEEE ops over
    exact integers.  Two lag windows over one series sort; no shuffle
    beyond the rollup's own keying.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    v = F.col(value_col)
    err_s = F.abs(v - F.lag(v, period).over(w))
    err_1 = F.abs(v - F.lag(v, 1).over(w))
    q = lambda c: F.round(c * scale, 0).cast("long")  # noqa: E731
    per = df.select(
        *key_cols,
        q(err_s).alias("_qs"),
        q(err_1).alias("_q1"),
    )
    agg = per.groupBy(*key_cols).agg(
        F.count("_qs").alias("n_eval_snaive"),
        F.count("_q1").alias("n_eval_naive1"),
        F.sum("_qs").alias("sum_abs_err_snaive_q"),
        F.sum("_q1").alias("sum_abs_err_naive1_q"),
    )
    mase = (
        F.col("sum_abs_err_snaive_q") / F.col("n_eval_snaive")
    ) / (F.col("sum_abs_err_naive1_q") / F.col("n_eval_naive1"))
    return agg.withColumn("mase", mase)
