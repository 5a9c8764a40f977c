"""Theta-method forecasting (Assimakopoulos & Nikolopoulos 2000 — the
method that won the M3 competition and served as the M4 benchmark;
public algorithm, standard benchmark formulation).

The series decomposes into two "theta lines": θ=0 (the OLS linear trend,
all long-run signal) and θ=2 (2x − trend, doubled local curvature).  The
forecast averages the two lines' own natural forecasts — the trend line
extrapolates, the θ=2 line forecasts flat by simple exponential
smoothing (SES) — so the method carries the trend while damping it with
the smoothed level, which is exactly why it is so hard to beat on
M3/M4-style data.

SES α is chosen by a deterministic grid search (0.01…0.99 step 0.01,
one-step-ahead SSE, ties → smallest α) — no scipy, no randomness, same
answer every run.

Execution shape: per-series fold (``applyInPandas``, the
mk_theilsen/asap posture) with a loud ``max_points`` guard — run over a
rollup TIER; series parallelize across executors.  VALUE-ORACLED at the
gate since r4: ``theta_forecast_24h`` feeds and returns integer 1e-4
tick units, and the DuckDB oracle (``_THETA_SQL`` in
influxql_queries.py) replays the SES recurrence with a recursive CTE —
bit-exact at sf0.001 and sf0.01.  The kernel is additionally pinned in
tests/test_theta.py: the Hyndman–Billah half-drift identity on
pure-linear input (θ2 = 2x − trend IS the line itself, its SES level
lags it, so the blended forecast continues at half the drift),
hand-computed SES parity, α-grid determinism.

Completes the forecasting trio: holt_winters (iterative seasonal),
linear_forecast (closed-form, value-oracled), theta (benchmark hybrid).
The reference engine ships no forecasting (Program.cs:78-102).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _ses_level(y: np.ndarray, alpha: float) -> tuple[float, float]:
    """One-pass SES: returns (final level, one-step-ahead SSE).  Seeded
    with the first observation (the standard benchmark convention)."""
    level = float(y[0])
    sse = 0.0
    for v in y[1:]:
        err = float(v) - level
        sse += err * err
        level += alpha * err
    return level, sse


def _best_alpha(y: np.ndarray) -> float:
    """Deterministic α grid search: min one-step SSE, ties → smallest α.

    Grid points are ``i/100.0`` (NOT np.arange, whose ``start + i·step``
    doubles differ in the last ulp) and the comparison is strict ``<`` —
    both choices exist so a SQL oracle replaying the same grid with
    ``ORDER BY sse, alpha LIMIT 1`` lands on the identical α."""
    best_a, best_sse = 0.01, float("inf")
    for i in range(1, 100):
        a = i / 100.0
        _, sse = _ses_level(y, a)
        if sse < best_sse:
            best_a, best_sse = a, sse
    return best_a


def theta_forecast_1d(
    x: np.ndarray, horizon: int
) -> tuple[np.ndarray, float, float, float]:
    """Theta forecast of one series → (forecasts[h], alpha, a, b) with
    the OLS trend a + b·t fitted on t = 0..n−1."""
    n = len(x)
    t = np.arange(n, dtype=np.float64)
    xf = x.astype(np.float64)
    if n == 1:
        return np.full(horizon, xf[0]), 1.0, float(xf[0]), 0.0
    # OLS via explicit normal equations in a PINNED op order (replacing
    # np.polyfit's SVD path, whose last-ulp results no SQL engine can
    # replay).  St/Stt are exact integers; Sy/Sty use np.sum, which is
    # EXACT (hence order-independent) whenever the inputs are integers
    # below 2^53 — which the value-oracled gate query guarantees by
    # feeding 1e-4-tick integers.  Every double op below has one defined
    # shape on both engines: see _THETA_ORACLE in influxql_queries.py.
    fn = float(n)
    st = float(n * (n - 1) // 2)
    stt = float((n - 1) * n * (2 * n - 1) // 6)
    sy = float(np.sum(xf))
    sty = float(np.sum(t * xf))
    b = (fn * sty - st * sy) / (fn * stt - st * st)
    a = (sy - b * st) / fn
    theta2 = 2.0 * xf - (a + b * t)
    alpha = _best_alpha(theta2)
    level, _ = _ses_level(theta2, alpha)
    h = np.arange(1, horizon + 1, dtype=np.float64)
    trend_fc = a + b * (n - 1 + h)
    return 0.5 * (level + trend_fc), alpha, a, b


def theta_forecast(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    horizon: int,
    max_points: int = 100_000,
) -> DataFrame:
    """Per-series Theta forecast over time-sorted points.

    ``series`` rows are (keys…, order_col, value_col DOUBLE-castable);
    NULL values are absent points.  Emits ``horizon`` rows per series::

        (keys…, step, forecast, alpha, trend_slope)

    with ``step`` 1-based ahead of each series' last observation.
    """
    keys = list(key_cols)
    key_fields = [series.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["step long", "forecast double", "alpha double",
           "trend_slope double"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf = pdf[pdf[value_col].notna()]
        x = pdf[value_col].to_numpy(dtype=np.float64)
        if len(x) == 0:
            return pd.DataFrame(
                {
                    **{k: pd.Series(dtype=pdf[k].dtype) for k in keys},
                    "step": pd.Series(dtype="int64"),
                    "forecast": pd.Series(dtype="float64"),
                    "alpha": pd.Series(dtype="float64"),
                    "trend_slope": pd.Series(dtype="float64"),
                }
            )
        if len(x) > max_points:
            raise ValueError(
                f"theta_forecast: series "
                f"{tuple(pdf.iloc[0][k] for k in keys)!r} has {len(x)} "
                f"points > max_points={max_points}; forecast a coarser "
                f"rollup tier or raise max_points deliberately"
            )
        fc, alpha, _a, b = theta_forecast_1d(x, horizon)
        return pd.DataFrame(
            {
                **{k: np.repeat(pdf.iloc[0][k], horizon) for k in keys},
                "step": np.arange(1, horizon + 1, dtype=np.int64),
                "forecast": fc,
                "alpha": np.full(horizon, alpha),
                "trend_slope": np.full(horizon, b),
            }
        )

    return (
        series.select(*keys, order_col, value_col)
        .groupBy(*keys)
        .applyInPandas(run, out_schema)
    )
