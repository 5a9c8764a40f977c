"""InfluxQL function library over series frames (bucket/ts, keys…, value).

The reference pushes points INTO InfluxDB; its users then query them with
InfluxQL's aggregate / selector / transform functions.  "A user of the
reference could switch and run every query they run today" therefore needs
these semantics natively (the rollup tiers already cover count/sum/min/max/
mean):

aggregates:   spread, stddev (sample), median, percentile (nearest-rank),
              mode (ties → smallest value), integral (trapezoidal)
selectors:    first, last (by timestamp), top(n), bottom(n)
transforms:   difference, derivative(unit), non_negative_derivative,
              elapsed, moving_average(n), cumulative_sum

All are Column/window expressions (no UDFs): per-series transforms share
ONE partitionBy(keys).orderBy(ts) sort; aggregates are single-shuffle
groupBys — the same physical shapes as the rollup tiers, so everything
scales identically.

Semantics notes (InfluxQL reference behavior):
- percentile(p) is NEAREST-RANK with InfluxDB's rounding: the element at
  1-based rank floor(n*p/100 + 0.5) of the sorted values — an actual data
  point, not an interpolation; no row when the rank rounds below 1.
- derivative yields (v-prev)/(t-prev) scaled to ``unit`` seconds; first row
  of each series yields nothing.
- moving_average(n) emits only once n points have accumulated.
- integral is the trapezoid area between consecutive points per unit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _series_window(key_cols: Sequence[str], ts_col: str) -> Window:
    return Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(ts_col)


def _vc(value: str | Column) -> Column:
    """Transforms accept a column NAME or a computed Column (the InfluxQL
    string front-end feeds staged aggregate expressions straight in)."""
    return F.col(value) if isinstance(value, str) else value


# ---------------------------------------------------------------------------
# aggregates (per (keys) or (keys, bucket) group — pass the full group key)
# ---------------------------------------------------------------------------

def agg_spread(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg((F.max(v) - F.min(v)).alias("spread"))


def agg_stddev(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.stddev_samp(value_col).alias("stddev")
    )


def agg_percentile(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: float
) -> DataFrame:
    """Nearest-rank percentile, InfluxDB's exact rounding: the value at
    1-based rank ``floor(n*p/100 + 0.5)`` of the sorted values — an actual
    data point, not an interpolation.  When the rank rounds below 1 the
    group emits NO row (InfluxDB returns nothing), unlike a clamped ceil."""
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(*group_cols))
    )
    target = F.floor(F.lit(p) / 100.0 * F.col("_n") + 0.5).cast("int")
    return (
        ranked.filter((target >= 1) & (F.col("_rn") == target))
        .select(*group_cols, F.col(value_col).alias(f"p{int(p)}"))
    )


def agg_median(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    """InfluxQL median = percentile(50) nearest-rank."""
    return agg_percentile(df, group_cols, value_col, 50.0).withColumnRenamed(
        "p50", "median"
    )


def agg_mode(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    """Most frequent value; ties break to the SMALLEST value."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("_c"))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("_c"), F.asc(value_col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, F.col(value_col).alias("mode"))
    )


def agg_integral(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    unit_seconds: int = 1,
) -> DataFrame:
    """Trapezoidal area under the series per group, per ``unit_seconds``."""
    w = _series_window(group_cols, ts_col)
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("double")
    pv, pt = F.lag(value_col).over(w), F.lag(t).over(w)
    area = (F.col(value_col) + pv) / 2.0 * (t - pt)
    return (
        df.withColumn("_a", area)
        .groupBy(*group_cols)
        .agg((F.sum("_a") / unit_seconds).alias("integral"))
    )


# ---------------------------------------------------------------------------
# selectors
# ---------------------------------------------------------------------------

def sel_first_last(
    df: DataFrame, group_cols: Sequence[str], ts_col: str, value_col: str
) -> DataFrame:
    """first()/last(): the value at the min/max timestamp per group (ties on
    equal timestamps break to the smaller value for determinism)."""
    v, t = F.col(value_col), F.col(ts_col)
    return df.groupBy(*group_cols).agg(
        F.min(F.struct(t, v)).getField(value_col).alias("first_v"),
        F.max(F.struct(t, v)).getField(value_col).alias("last_v"),
    )


def sel_top(
    df: DataFrame, group_cols: Sequence[str], value_col: str, n: int,
    ts_col: str = "ts", bottom: bool = False,
) -> DataFrame:
    """top(n)/bottom(n): n extreme points per group; ties break to the
    earlier timestamp (deterministic total order)."""
    order = [F.asc(value_col)] if bottom else [F.desc(value_col)]
    w = Window.partitionBy(*group_cols).orderBy(*order, F.asc(ts_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select(*group_cols, ts_col, value_col, F.col("_rn").alias("rank"))
    )


def sel_sample(
    df: DataFrame, group_cols: Sequence[str], ts_col: str, value_col: str, n: int
) -> DataFrame:
    """sample(n): n points per group.  InfluxQL samples randomly; here the
    choice is SEEDED-deterministic (md5 of the group+timestamp) so reruns,
    retries, and the correctness oracle all see the same sample — at
    pipeline scale a nondeterministic sample is a reproducibility bug."""
    key = F.md5(
        F.concat_ws(
            "|", *group_cols,
            F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("string"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select(*group_cols, ts_col, value_col)
    )


# ---------------------------------------------------------------------------
# per-series transforms (one shared sort)
# ---------------------------------------------------------------------------

def tr_difference(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, value_col: str | Column
) -> Column:
    w = _series_window(key_cols, ts_col)
    v = _vc(value_col)
    return v - F.lag(v).over(w)


def tr_non_negative_difference(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, value_col: str | Column
) -> Column:
    """InfluxQL non_negative_difference(): like difference() but negative
    results are dropped (NULL here; the frontend's transform-NULL filter
    removes the rows, matching InfluxDB emitting nothing for them)."""
    d = tr_difference(df, key_cols, ts_col, value_col)
    return F.when(d >= 0, d)


def tr_derivative(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str | Column,
    unit_seconds: int = 1,
) -> Column:
    w = _series_window(key_cols, ts_col)
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("double")
    v = _vc(value_col)
    dv = v - F.lag(v).over(w)
    dt = t - F.lag(t).over(w)
    return F.when(dt > 0, dv / dt * unit_seconds)


def tr_non_negative_derivative(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str | Column,
    unit_seconds: int = 1,
) -> Column:
    d = tr_derivative(df, key_cols, ts_col, value_col, unit_seconds)
    return F.when(d >= 0, d)


def tr_elapsed(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, unit_seconds: int = 1
) -> Column:
    """InfluxQL elapsed(): integer count of whole units between consecutive
    points (InfluxDB divides the ns delta by the unit with integer
    truncation — fractional units are floored away)."""
    w = _series_window(key_cols, ts_col)
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    return F.floor((t - F.lag(t).over(w)) / unit_seconds).cast("long")


def tr_moving_average(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, value_col: str | Column, n: int
) -> Column:
    """Average of the trailing n points; NULL until n points accumulated."""
    w = _series_window(key_cols, ts_col).rowsBetween(-(n - 1), 0)
    v = _vc(value_col)
    return F.when(F.count(v).over(w) == n, F.avg(v).over(w))


def tr_cumulative_sum(
    df: DataFrame, key_cols: Sequence[str], ts_col: str, value_col: str | Column
) -> Column:
    w = _series_window(key_cols, ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return F.sum(_vc(value_col)).over(w)
