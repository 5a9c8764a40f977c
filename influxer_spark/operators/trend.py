"""Robust monotonic-trend statistics per series: Mann-Kendall S / tau and
the Theil-Sen slope — the standard nonparametric "is this metric drifting,
and how fast?" pair for time series with outliers and non-normal noise
(Mann 1945, Kendall 1975, Sen 1968 — public formulas).

A least-squares slope over a crawl metric is wrecked by one hot day; the
rank-based S statistic and the median-of-pairwise-slopes estimator are
not, which is why monitoring systems reach for them to classify tier
series as rising / falling / flat.

Execution shape: both statistics need every pair of points of ONE series,
so each series groups to one Arrow batch (``applyInPandas``) and numpy
broadcasts the O(n²) pair differences — same posture as
``operators/matrixprofile.py``: quadratic in the SERIES length, designed
to run over a rollup TIER (a year of the 1d tier = 365 points → 66k
pairs), guarded by ``max_points`` with a counted, loud error.  One
shuffle on the series key; series parallelize across executors.

Exactness discipline: input values are integer ticks (quantize upstream,
e.g. the 1e-4-tick mean of ``matrixprofile.hourly_tick_series``).  S is
then a sum of integer signs (associative, oracle-exact); tau divides it
by n(n−1)/2 in one IEEE op; each pairwise slope is one IEEE division of
exact integers; and the median of an even pair count is (lo+hi)/2 —
verified bit-identical to DuckDB's ``median`` interpolation — so every
output column replays exactly on the oracle side.

Reference anchor: the reference engine ships no trend tests; this extends
the monitoring family (deadman / MAD anomaly / CUSUM) the engine builds
beside the reference's ingest scope (Influxer/GenericFile.cs:262-271).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def mk_theilsen(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tick_col: str,
    max_points: int = 3_000,
) -> DataFrame:
    """Mann-Kendall + Theil-Sen per series over integer-tick points.

    ``series`` rows are (keys…, order_col, tick_col BIGINT); points are
    ranked by ``order_col`` (index = 0-based rank of OBSERVED buckets, so
    gaps don't manufacture pairs).  Emits one row per series:

        (keys…, n_points, mk_s, mk_tau, sen_slope)

    - ``mk_s``   = Σ_{i<j} sign(x_j − x_i)  (exact BIGINT)
    - ``mk_tau`` = S / (n(n−1)/2)           (one IEEE division)
    - ``sen_slope`` = median over pairs of (x_j − x_i)/(j − i), ticks per
      index step (np.median == DuckDB median, bit-verified)

    Series with fewer than 2 points emit nothing (no pairs exist).
    """
    keys = list(key_cols)
    key_fields = [series.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["n_points long", "mk_s long", "mk_tau double", "sen_slope double"]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[tick_col].to_numpy(dtype=np.int64)
        n = len(x)
        empty = pd.DataFrame(
            {
                **{k: pd.Series(dtype=pdf[k].dtype) for k in keys},
                "n_points": pd.Series(dtype="int64"),
                "mk_s": pd.Series(dtype="int64"),
                "mk_tau": pd.Series(dtype="float64"),
                "sen_slope": pd.Series(dtype="float64"),
            }
        )
        if n < 2:
            return empty
        if n > max_points:
            raise ValueError(
                f"mk_theilsen: series {tuple(pdf.iloc[0][k] for k in keys)!r} "
                f"has {n} points > max_points={max_points}; the pair set is "
                f"quadratic — run over a coarser rollup tier or raise "
                f"max_points deliberately"
            )
        i, j = np.triu_indices(n, k=1)
        diff = x[j] - x[i]  # |tick| bounded far below 2⁶³ by max_points·ticks
        s = int(np.sign(diff).sum())
        npairs = n * (n - 1) // 2
        slopes = diff.astype(np.float64) / (j - i).astype(np.float64)
        return pd.DataFrame(
            {
                **{k: [pdf.iloc[0][k]] for k in keys},
                "n_points": np.asarray([n], dtype=np.int64),
                "mk_s": np.asarray([s], dtype=np.int64),
                "mk_tau": np.asarray([s / float(npairs)], dtype=np.float64),
                "sen_slope": np.asarray([np.median(slopes)], dtype=np.float64),
            }
        )

    return (
        series.select(*keys, order_col, tick_col)
        .groupBy(*keys)
        .applyInPandas(stats, out_schema)
    )
