"""Classical seasonal decomposition (engine extension; the additive
moving-average decomposition of Kendall/Stuart as shipped by
``statsmodels.tsa.seasonal_decompose`` — public method, no code shared).

Per series: ``v = trend + seasonal + resid`` with

- ``trend``   = centered moving average over ``period`` POSITIONAL
  neighbors (the standard 2×p MA for even periods: half-weight end
  terms); NULL where the window is incomplete (series edges) — exactly
  statsmodels' boundary behavior;
- ``seasonal`` = per-phase mean of the detrended values, re-centered to
  sum to zero over the period (phase = calendar bucket index modulo
  ``period``, so gaps don't shift the phase);
- ``resid``   = detrended − seasonal.

Positional trend + calendar phase makes the semantics well-defined on
series WITH gaps; for textbook behavior gap-fill first
(``operators/gapfill.py``) — the two compose.

Execution shape: one window (single shuffle+sort per series key) for the
trend chain, one groupBy for the phase means, one for the re-centering,
two small broadcast-able joins back.  O(period) expression terms, all
whole-stage codegen except the two sequential folds (Catalyst HOFs).

Bit-exactness discipline (the DuckDB oracle replays this exactly):
- the trend MA is an explicit ordered add chain ``((0.0 + t₁) + t₂) + …``
  over lag/lead terms (frame SUMs are pairwise in DuckDB, folds are not);
- phase means and the re-centering grand mean are sequential folds over
  lists ordered by (ts) / (phase), seeded 0.0, divided once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from influxer_spark.operators.influxql import guard_series_points


def _fsum(arr: Column, get) -> Column:
    """Left fold ``((0.0 + x₁) + x₂) + …`` — replayable via
    list_prepend(0.0, …) + list_reduce in the oracle."""
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + get(x))


def classical_decompose(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    period: int,
    bucket_seconds: int,
) -> DataFrame:
    """Returns (*key_cols, ts_col, value_col, trend, seasonal, resid).

    ``period`` in buckets (24 for daily seasonality on an hourly series);
    ``bucket_seconds`` anchors the calendar phase
    (``(epoch // bucket_seconds) % period``).
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    keys = list(key_cols)
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(ts_col)

    # --- trend: centered MA, explicit ordered add chain ---
    half = period // 2
    terms: list[Column] = []
    if period % 2 == 0:
        terms.append(F.lag(v, half).over(w) * F.lit(0.5))
        for i in range(half - 1, 0, -1):
            terms.append(F.lag(v, i).over(w))
        terms.append(v)
        for i in range(1, half):
            terms.append(F.lead(v, i).over(w))
        terms.append(F.lead(v, half).over(w) * F.lit(0.5))
    else:
        for i in range(half, 0, -1):
            terms.append(F.lag(v, i).over(w))
        terms.append(v)
        for i in range(1, half + 1):
            terms.append(F.lead(v, i).over(w))
    acc: Column = F.lit(0.0)
    for t in terms:
        acc = acc + t  # any NULL term nulls the sum -> NULL trend at edges
    trend = acc / F.lit(float(period))

    phase = F.pmod(
        F.floor(
            F.unix_timestamp(F.col(ts_col).cast("timestamp"))
            / F.lit(bucket_seconds)
        ).cast("long"),
        F.lit(period),
    )
    base = (
        df.withColumn("_trend", trend)
        .withColumn("_det", v - F.col("_trend"))
        .withColumn("_phase", phase)
    )

    # --- per-phase mean of detrended (ordered fold, exact operand order) ---
    det_pairs = F.sort_array(
        F.collect_list(
            F.when(
                F.col("_det").isNotNull(),
                F.struct(F.col(ts_col).alias("t"), F.col("_det").alias("d")),
            )
        )
    )
    ph = (
        base.groupBy(*keys, "_phase")
        .agg(
            det_pairs.alias("_lst"),
            F.count("_det").alias("_n"),
        )
        .withColumn(
            "_s_raw",
            F.when(
                F.col("_n") > 0,
                _fsum(F.col("_lst"), lambda x: x.getField("d"))
                / F.col("_n").cast("double"),
            ),
        )
        .drop("_lst")
    )

    # --- re-center: subtract the grand mean of the phase means ---
    grand_pairs = F.sort_array(
        F.collect_list(
            F.when(
                F.col("_s_raw").isNotNull(),
                F.struct(F.col("_phase").alias("p"), F.col("_s_raw").alias("s")),
            )
        )
    )
    g = (
        ph.groupBy(*keys)
        .agg(grand_pairs.alias("_glst"), F.count("_s_raw").alias("_gn"))
        .withColumn(
            "_grand",
            F.when(
                F.col("_gn") > 0,
                _fsum(F.col("_glst"), lambda x: x.getField("s"))
                / F.col("_gn").cast("double"),
            ),
        )
        .select(*keys, "_grand")
    )
    seasonal_by_phase = ph.join(g, on=keys).select(
        *keys,
        "_phase",
        (F.col("_s_raw") - F.col("_grand")).alias("_seasonal"),
    )

    out = base.join(F.broadcast(seasonal_by_phase), on=[*keys, "_phase"])
    return out.select(
        *keys,
        ts_col,
        value_col,
        F.col("_trend").alias("trend"),
        F.col("_seasonal").alias("seasonal"),
        (F.col("_det") - F.col("_seasonal")).alias("resid"),
    )


def acf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    max_lag: int,
) -> DataFrame:
    """Per-series autocorrelation function (statsmodels ``acf`` definition):

        acf(k) = Σₜ (xₜ − x̄)(xₜ₋ₖ − x̄) / Σₜ (xₜ − x̄)²

    with the mean over the FULL series and the denominator shared across
    lags (so acf(0) = 1).  The period-detection primitive: a daily season
    on an hourly series shows as a peak at lag 24.

    Execution shape: one groupBy(series) collect (tier series — 60–3600×
    smaller than raw), then O(n·max_lag) fold arithmetic per series, all
    sequential (bit-reproducible, same fold discipline as the TA family).
    Returns (*key_cols, lag, acf) for lag ∈ [0, max_lag]; NULL acf for a
    constant series (zero variance) or lags ≥ series length.
    """
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    keys = list(key_cols)
    pairs = F.sort_array(
        F.collect_list(
            F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
        )
    )
    g = df.where(F.col(value_col).isNotNull()).groupBy(*keys).agg(
        pairs.alias("_lst"), F.count(value_col).alias("_n")
    )
    g = guard_series_points(g, "_lst", keys)
    arr = F.transform(F.col("_lst"), lambda x: x.getField("v"))
    n = F.col("_n")
    mean = _fsum(F.col("_lst"), lambda x: x.getField("v")) / n.cast("double")
    g = g.withColumn("_arr", arr).withColumn("_mean", mean).drop("_lst")

    # numerator per lag k: fold over positions k..n-1 of (x[i]-m)(x[i-k]-m)
    def num_k(k: Column) -> Column:
        idx = F.sequence(k + 1, n)  # 1-based element_at positions of x_t
        return F.aggregate(
            idx,
            F.lit(0.0),
            lambda a, i: a
            + (F.element_at(F.col("_arr"), i.cast("int")) - F.col("_mean"))
            * (
                F.element_at(F.col("_arr"), (i - k).cast("int"))
                - F.col("_mean")
            ),
        )

    den = num_k(F.lit(0))
    g = g.withColumn("_den", den)
    lags = g.select(
        *keys, "_arr", "_mean", "_n", "_den",
        F.explode(F.sequence(F.lit(0), F.lit(int(max_lag)))).alias("lag"),
    )
    out = lags.withColumn(
        "acf",
        F.when(
            (F.col("_den") > 0) & (F.col("lag") < F.col("_n")),
            num_k(F.col("lag")) / F.col("_den"),
        ),
    )
    return out.select(*keys, "lag", "acf")


def series_corr(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-series Pearson correlation between two aligned value columns
    (e.g. level vs volume of the same bucketed series, or two metrics
    joined on bucket):

        r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

    Rows where either side is NULL are excluded (pandas/SQL corr
    semantics).  All five sums are sequential folds over the ts-ordered
    pairs — bit-reproducible, same discipline as acf() — and √ is a
    correctly-rounded IEEE op, so an oracle replaying the folds matches
    exactly.  Returns (*key_cols, n, corr); corr NULL when either side is
    constant (zero variance) or n < 2.
    """
    keys = list(key_cols)
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    pairs = F.sort_array(
        F.collect_list(
            F.when(
                both,
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(x_col).alias("x"),
                    F.col(y_col).alias("y"),
                ),
            )
        )
    )
    g = df.groupBy(*keys).agg(
        pairs.alias("_lst"), F.sum(both.cast("long")).alias("n")
    )
    g = guard_series_points(g, "_lst", keys)
    nd = F.col("n").cast("double")
    sx = _fsum(F.col("_lst"), lambda p: p.getField("x"))
    sy = _fsum(F.col("_lst"), lambda p: p.getField("y"))
    sxy = _fsum(F.col("_lst"), lambda p: p.getField("x") * p.getField("y"))
    sxx = _fsum(F.col("_lst"), lambda p: p.getField("x") * p.getField("x"))
    syy = _fsum(F.col("_lst"), lambda p: p.getField("y") * p.getField("y"))
    g = (
        g.withColumn("_vx", nd * sxx - sx * sx)
        .withColumn("_vy", nd * syy - sy * sy)
        .withColumn("_cov", nd * sxy - sx * sy)
    )
    corr = F.when(
        (F.col("n") >= 2) & (F.col("_vx") > 0) & (F.col("_vy") > 0),
        F.col("_cov") / F.sqrt(F.col("_vx") * F.col("_vy")),
    )
    return g.select(*keys, "n", corr.alias("corr"))


def cross_corr(
    ref: DataFrame,
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    x_col: str,
    y_col: str,
    lags: Sequence[int],
    step_seconds: int,
) -> DataFrame:
    """Cross-correlation function: Pearson r between a REFERENCE series x
    and each series in ``df`` at every lag —

        ccf(series, l) = corr(x_t, y_{t+l·step})

    positive lag ⇒ y follows x (x leads).  The lead/lag-discovery
    primitive that completes the correlation family (``acf`` = this with
    y ≡ x per series; ``series_corr`` = lag 0 on pre-aligned columns).

    Time-shifted by TIMESTAMP, not row offset: missing buckets drop the
    pair (inner join) instead of silently mis-aligning the lag, so it is
    correct on gappy series.  Scale: ``ref`` is one bucketed series
    (tier-sized, broadcast); per lag the join is a narrow broadcast pass
    over ``df``, then one groupBy (series, lag) running the same
    bit-reproducible folds as ``series_corr``.
    """
    keys = list(key_cols)
    shifted = []
    for lag in lags:
        r = ref.select(
            # x at t must be visible at key t + l·step so a y row at bucket
            # b picks up x_{b−l} — i.e. corr(x_t, y_{t+l}) for positive l
            F.timestamp_seconds(
                F.unix_timestamp(F.col(ts_col)) + F.lit(lag * step_seconds)
            ).alias(ts_col),
            F.col(x_col).alias("_x"),
            F.lit(lag).alias("lag"),
        )
        shifted.append(
            df.select(*keys, ts_col, F.col(y_col).alias("_y")).join(
                F.broadcast(r), ts_col
            )
        )
    paired = shifted[0]
    for s in shifted[1:]:
        paired = paired.unionByName(s)
    return series_corr(paired, [*keys, "lag"], ts_col, "_x", "_y")


def dominant_period(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    max_lag: int,
    min_lag: int = 2,
) -> DataFrame:
    """Per-series season-length detection: the lag in [min_lag, max_lag]
    with the highest autocorrelation (ties → smallest lag) — the
    automatic input every seasonal operator here takes as a parameter
    (decompose's period, Holt-Winters' season, the phase bands' cycle).
    ``min_lag`` defaults to 2 because lag 1 is ordinary smoothness, not a
    season.  Pure window rank over :func:`acf`'s proven folds — the
    doubles are bit-identical in both engines, so the argmax is too.
    Output (keys…, period, acf_peak); series with no usable acf (constant
    or shorter than min_lag) emit nothing."""
    from pyspark.sql import Window

    a = acf(df, key_cols, ts_col, value_col, max_lag).filter(
        (F.col("lag") >= min_lag) & F.col("acf").isNotNull()
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc("acf"), F.asc("lag"))
    return (
        a.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            *key_cols,
            F.col("lag").alias("period"),
            F.col("acf").alias("acf_peak"),
        )
    )


def corr_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    min_overlap: int = 2,
) -> DataFrame:
    """All-pairs Pearson correlation between the series named by
    ``key_col``, aligned on shared ``ts_col`` buckets — the "which metrics
    move together?" monitoring primitive (series_corr answers it for ONE
    pre-joined pair; this answers it for the whole dashboard).

    Exactness: ``value_col`` must be an EXACT INTEGER per bucket (feed it
    `matrixprofile.hourly_tick_series` ticks or tier cents) so the five
    power sums (n, Σx, Σy, Σx², Σxy) aggregate as order-free BIGINTs;
    r then derives in a fixed float shape — casts, products, one √, one
    division, all correctly-rounded IEEE ops over exact integers — so a
    SQL oracle replays it bit-for-bit.  (Deriving from exact sums is the
    same discipline as rollup.with_stddev; a float corr() aggregate would
    drift with partial-agg order.)

    Plan: one self-equi-join on the bucket (a single shuffle on ts), then
    one (key_a, key_b) groupBy.  Per-bucket pair fan-out is S·(S−1)/2 for
    S series per bucket — the operator is for dashboard-scale series sets
    (S in the hundreds); at larger S, pre-filter keys or sample buckets.
    Overflow is guarded, not assumed: BIGINT sums of v·v fail loudly when
    n·max(v)² could pass 2⁶².

    Output: (key_a, key_b, n, corr) for key_a < key_b; corr NULL when
    either side is constant over the shared buckets or n < min_overlap.
    """
    bound = df.agg(
        F.max(F.abs(F.col(value_col).cast("long"))).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if bound["mx"] is not None and bound["n"] * bound["mx"] ** 2 >= 2**62:
        raise ValueError(
            f"corr_matrix: n·max(v)² = {bound['n']}·{bound['mx']}² may "
            "overflow BIGINT power sums — rescale the tick unit"
        )
    a = df.select(
        F.col(ts_col).alias("_b"),
        F.col(key_col).alias("key_a"),
        F.col(value_col).cast("long").alias("x"),
    )
    b = df.select(
        F.col(ts_col).alias("_b"),
        F.col(key_col).alias("key_b"),
        F.col(value_col).cast("long").alias("y"),
    )
    joined = a.join(b, on="_b").filter(F.col("key_a") < F.col("key_b"))
    sums = joined.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    denx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    deny = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    corr = F.when(
        (F.col("n") >= min_overlap) & (denx > 0.0) & (deny > 0.0),
        num / F.sqrt(denx * deny),
    )
    return sums.select("key_a", "key_b", "n", corr.alias("corr"))
