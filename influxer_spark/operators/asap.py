"""ASAP: automatic smoothing for streaming/dashboard time series
(Rong & Bailis, "ASAP: Prioritizing Attention via Time Series Smoothing",
VLDB 2017 — public algorithm).

A dashboard rendering a raw high-frequency series buries the operator in
noise; a fixed moving average either under-smooths or flattens the spikes
that matter.  ASAP picks the moving-average window AUTOMATICALLY: among
candidate windows (autocorrelation peaks — smoothing at a seasonal period
removes the season's own oscillation), choose the one that MINIMIZES
roughness (std of first differences) while PRESERVING kurtosis (spikes
stay visible: kurtosis of the smoothed series must not drop below the
original's).  This is the third member of the visualization family beside
``lttb`` (shape-preserving point selection) and ``m4`` (pixel-exact
min/max envelopes): LTTB/M4 subsample, ASAP transforms.

Execution shape: per-series fold (``applyInPandas``, same posture as
``mk_theilsen``/``matrixprofile``): each series groups to one Arrow batch,
numpy computes the ACF via one FFT-free dot sweep over candidate lags,
then evaluates each candidate window with an O(n) rolling mean.  Series
length is bounded by ``max_points`` with a loud, counted error — run over
a rollup TIER.  One shuffle on the series key; series parallelize across
executors.

Determinism: pure numpy float64 kernels, fixed iteration order — the same
input always yields the same window and the same smoothed values.  There
is no SQL oracle for the ACF-peak search (the gate records this
rows-only); the kernel is pinned against a brute-force reference in
tests/test_asap.py.

The reference engine ships no visualization ops (Influxer is ingest-only,
Program.cs:78-102).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _acf(x: np.ndarray, max_lag: int) -> np.ndarray:
    """Autocorrelation for lags 1..max_lag (mean-removed, biased
    normalization — the paper's form)."""
    n = len(x)
    xc = x - x.mean()
    denom = float(np.dot(xc, xc))
    if denom == 0.0:
        return np.zeros(max_lag)
    return np.array(
        [float(np.dot(xc[: n - k], xc[k:])) / denom
         for k in range(1, max_lag + 1)]
    )


def _sma(x: np.ndarray, w: int) -> np.ndarray:
    """Rolling mean with window w (length n − w + 1), O(n) via cumsum."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    return (c[w:] - c[:-w]) / float(w)


def _roughness(x: np.ndarray) -> float:
    return float(np.std(np.diff(x))) if len(x) > 1 else 0.0


def _kurtosis(x: np.ndarray) -> float:
    """Population kurtosis (non-excess), the paper's spike metric."""
    m = x.mean()
    v = float(np.mean((x - m) ** 2))
    if v == 0.0:
        return 0.0
    return float(np.mean((x - m) ** 4)) / (v * v)


def asap_window(
    x: np.ndarray, max_window: int | None = None, corr_threshold: float = 0.2
) -> int:
    """The ASAP window choice for one series: among ACF-peak candidate
    windows (plus 1 = no smoothing), the window minimizing roughness
    subject to kurtosis(smoothed) ≥ kurtosis(original).  Returns 1 when
    no candidate passes the spike-preservation constraint."""
    n = len(x)
    if n < 4:
        return 1
    max_window = max_window or max(2, n // 10)
    max_lag = min(n - 2, max_window)
    acf = _acf(x, max_lag)
    # ACF peaks above the correlation floor, strongest first
    peaks = [
        k + 1
        for k in range(1, len(acf) - 1)
        if acf[k] > acf[k - 1] and acf[k] > acf[k + 1]
        and acf[k] >= corr_threshold
    ]
    # every candidate is evaluated and the global roughness minimum kept,
    # so no ordering of the (few) peaks is needed
    orig_kurt = _kurtosis(x)
    best_w, best_r = 1, _roughness(x)
    for w in peaks:
        if w < 2 or w > n - 1:
            continue
        s = _sma(x, w)
        if _kurtosis(s) >= orig_kurt and _roughness(s) < best_r:
            best_w, best_r = w, _roughness(s)
    return best_w


def asap_smooth(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    max_window: int | None = None,
    corr_threshold: float = 0.2,
    max_points: int = 100_000,
) -> DataFrame:
    """Per-series ASAP: choose the window, emit the smoothed series.

    ``series`` rows are (keys…, order_col, value_col DOUBLE-castable).
    Emits one row per smoothed point::

        (keys…, idx, window, smoothed)

    where ``idx`` is the 0-based position of the smoothing window's START
    in the time-sorted series (length n − window + 1 rows per series) and
    ``window`` the chosen ASAP window (1 = the constraint rejected every
    candidate; the series passes through unchanged).
    """
    keys = list(key_cols)
    key_fields = [series.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["idx long", "window long", "smoothed double"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        # NULL values are absent points (the engine-wide convention); a
        # NaN left in place would silently poison the ACF into "no
        # structure" and pass the series through unsmoothed
        pdf = pdf[pdf[value_col].notna()]
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(x)
        if n == 0:
            return pd.DataFrame(
                {
                    **{k: pd.Series(dtype=pdf[k].dtype) for k in keys},
                    "idx": pd.Series(dtype="int64"),
                    "window": pd.Series(dtype="int64"),
                    "smoothed": pd.Series(dtype="float64"),
                }
            )
        if n > max_points:
            raise ValueError(
                f"asap_smooth: series {tuple(pdf.iloc[0][k] for k in keys)!r}"
                f" has {n} points > max_points={max_points}; smooth a"
                f" coarser rollup tier or raise max_points deliberately"
            )
        w = asap_window(x, max_window=max_window,
                        corr_threshold=corr_threshold)
        s = _sma(x, w) if w > 1 else x
        return pd.DataFrame(
            {
                **{k: np.repeat(pdf.iloc[0][k], len(s)) for k in keys},
                "idx": np.arange(len(s), dtype=np.int64),
                "window": np.full(len(s), w, dtype=np.int64),
                "smoothed": s,
            }
        )

    return (
        series.select(*keys, order_col, value_col)
        .groupBy(*keys)
        .applyInPandas(run, out_schema)
    )
