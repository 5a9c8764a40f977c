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
from pyspark.sql import functions as F


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


def linear_forecast(
    series: DataFrame,
    key_cols: Sequence[str],
    idx_col: str,
    tick_col: str,
    forecast_idx: Sequence[int],
    tick_scale: int = 10_000,
) -> DataFrame:
    """Closed-form per-series OLS forecast over integer-tick points — the
    value-oracled forecasting primitive beside the rows-only iterative
    ``holtwinters`` fit (and the ``seasonal_naive_eval`` yardstick).

    ``series`` rows are (keys…, idx_col BIGINT, tick_col BIGINT): ``idx`` is
    the regressor (e.g. hours since the fit-window start — small, exact) and
    ``tick`` the quantized observation.  For each key and each requested
    ``forecast_idx`` i emits::

        (keys…, idx=i, n_fit, slope_num, slope_den, pred)

    Exactness discipline (why the oracle hash-matches bit-for-bit): every
    OLS moment (n, Σt, Σy, Σt², Σty) is an exact BIGINT, so the closed-form
    slope/intercept numerators

        slope_num = n·Σty − Σt·Σy
        inum      = Σy·Σt² − Σt·Σty          (intercept numerator)
        slope_den = n·Σt² − (Σt)²

    are exact BIGINTs too (magnitudes bounded: with idx ≤ ~10³ and ticks
    ≤ ~10⁷ everything stays far below 2⁵³, so even the DOUBLE cast is
    exact), and the prediction

        pred = (inum + slope_num·i) / (slope_den · tick_scale)

    is ONE IEEE-754 division of exactly-represented integers — the same
    single op in any engine, so Spark and the SQL oracle agree to the bit.
    Degenerate series (n < 2 or a zero denominator, i.e. a single distinct
    idx) emit nothing rather than NaNs.

    Plan shape: one partial-aggregated groupBy on the series key (map-side
    combine does the moment sums), then a broadcast-sized literal horizon
    exploded per key — no shuffle beyond the one aggregation, no UDF, whole
    plan stays in codegen.  At 100 TB the input is a rollup TIER (bounded
    points per series), and the output is |keys| × |horizon| rows.

    The reference engine ships no forecasting (Influxer is ingest-only;
    Program.cs:78-102); this extends the monitoring family like trend().
    OLS normal equations are public-domain mathematics.
    """
    keys = list(key_cols)
    t = F.col(idx_col).cast("long")
    y = F.col(tick_col).cast("long")
    g = (
        series.select(*keys, t.alias("_t"), y.alias("_y"))
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_fit"),
            F.sum("_t").alias("_st"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_t") * F.col("_t")).alias("_stt"),
            F.sum(F.col("_t") * F.col("_y")).alias("_sty"),
        )
        .withColumn(
            "slope_num",
            F.col("n_fit") * F.col("_sty") - F.col("_st") * F.col("_sy"),
        )
        .withColumn(
            "slope_den",
            F.col("n_fit") * F.col("_stt") - F.col("_st") * F.col("_st"),
        )
        .withColumn(
            "_inum",
            F.col("_sy") * F.col("_stt") - F.col("_st") * F.col("_sty"),
        )
        .filter((F.col("n_fit") >= 2) & (F.col("slope_den") != 0))
    )
    horizon = F.array(*[F.lit(int(i)).cast("long") for i in forecast_idx])
    return (
        g.withColumn(idx_col, F.explode(horizon))
        .withColumn(
            "pred",
            (F.col("_inum") + F.col("slope_num") * F.col(idx_col)).cast("double")
            / (F.col("slope_den") * F.lit(int(tick_scale))).cast("double"),
        )
        .select(*keys, idx_col, "n_fit", "slope_num", "slope_den", "pred")
    )


def linear_forecast_horizon(
    series: DataFrame,
    key_cols: Sequence[str],
    idx_col: str,
    tick_col: str,
    horizon: int,
    tick_scale: int = 10_000,
) -> DataFrame:
    """``linear_forecast`` with a PER-SERIES horizon: forecast ``horizon``
    index steps past each series' own last observed index (the
    holt_winters(…, N, S) convention — every series continues from where
    IT ends, not from a shared window edge).

    Exactness: the regressor is centered per series (idx − min(idx)) before
    the moments, which keeps every BIGINT product small no matter how large
    the absolute index (epoch-hours ~5·10⁵ would otherwise push
    n·Σty·idx past 2⁶³).  Centering is bit-transparent: the slope
    numerator/denominator are translation-invariant, and the prediction
    numerator ``inum' + num·(i − c)`` equals the uncentered ``inum + num·i``
    integer exactly — so an oracle computed WITHOUT centering (at small
    idx) still hash-matches.  Emitted rows carry the ABSOLUTE index back.

    Plan shape: one groupBy for the per-series min (shuffle on the series
    key), a same-key join back (co-partitioned, AQE-friendly), one moment
    groupBy, then a literal-sequence explode — no UDF, no collect.
    """
    keys = list(key_cols)
    t = F.col(idx_col).cast("long")
    y = F.col(tick_col).cast("long")
    base = series.select(*keys, t.alias("_ta"), y.alias("_y"))
    tmin = base.groupBy(*keys).agg(F.min("_ta").alias("_tmin"))
    centered = base.join(tmin, keys).select(
        *keys, "_tmin", (F.col("_ta") - F.col("_tmin")).alias("_t"), "_y"
    )
    g = (
        centered.groupBy(*keys)
        .agg(
            F.count("*").alias("n_fit"),
            F.first("_tmin").alias("_tmin"),
            F.max("_t").alias("_tmax"),
            F.sum("_t").alias("_st"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_t") * F.col("_t")).alias("_stt"),
            F.sum(F.col("_t") * F.col("_y")).alias("_sty"),
        )
        .withColumn(
            "slope_num",
            F.col("n_fit") * F.col("_sty") - F.col("_st") * F.col("_sy"),
        )
        .withColumn(
            "slope_den",
            F.col("n_fit") * F.col("_stt") - F.col("_st") * F.col("_st"),
        )
        .withColumn(
            "_inum",
            F.col("_sy") * F.col("_stt") - F.col("_st") * F.col("_sty"),
        )
        .filter((F.col("n_fit") >= 2) & (F.col("slope_den") != 0))
    )
    return (
        g.withColumn(
            "_i0",
            F.explode(
                F.sequence(
                    F.col("_tmax") + F.lit(1).cast("long"),
                    F.col("_tmax") + F.lit(int(horizon)).cast("long"),
                )
            ),
        )
        .withColumn(
            "pred",
            (F.col("_inum") + F.col("slope_num") * F.col("_i0")).cast("double")
            / (F.col("slope_den") * F.lit(int(tick_scale))).cast("double"),
        )
        .select(
            *keys,
            (F.col("_tmin") + F.col("_i0")).alias(idx_col),
            "n_fit",
            "slope_num",
            "slope_den",
            "pred",
        )
    )
