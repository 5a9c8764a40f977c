"""Largest-Triangle-Three-Buckets downsampling (engine extension; the
visualization downsample TimescaleDB ships as ``lttb()`` — Steinarsson,
"Downsampling Time Series for Visual Representation", 2013, public).

Given a series of L points and a threshold T, keep the first and last
points and, for each of T−2 equal middle buckets, the point forming the
largest triangle with the PREVIOUSLY SELECTED point and the average of the
NEXT bucket — the selection that preserves visual shape (peaks, slopes)
far better than bucket means.

Execution shape: one groupBy(series) → time-sorted collect → a fold over
the T−2 bucket indices (each bucket's average and arg-max-area are
sequential folds over its slice, so every double is reproducible) →
explode.  Selection is sequentially dependent (each bucket needs the
previous CHOICE), which is why this is a fold, not a window.  O(L) work
per series, single shuffle, all JVM expressions.

Bit-exactness discipline (the DuckDB oracle replays this exactly):
- bucket bounds: ``1 + floor(i · (L−2)/(T−2))`` in double arithmetic;
- bucket averages: left fold seeded with 0.0, then one division;
- area: ``|(px−ax)·(y−py) − (px−x)·(ay−py)|`` (the /2 is argmax-invariant
  and dropped on BOTH sides); ties → first position
  (array_position of array_max);
- x coordinates are whole epoch seconds as doubles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from influxer_spark.operators.influxql import _collected, _explode_series

_TV2 = "array<struct<t:timestamp,v:double>>"


def _fsum(arr_slice: Column, get) -> Column:
    """Left fold ``((0.0 + x₁) + x₂) + …`` — the one float-summation order
    the oracle can replay (list_prepend(0.0, …) + list_reduce)."""
    return F.aggregate(arr_slice, F.lit(0.0), lambda a, x: a + get(x))


def lttb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    threshold: int,
    out_col: str = "lttb",
) -> DataFrame:
    """Downsample each series to ``threshold`` points (all points when the
    series is already that short).  Output: (keys…, ts_col, out_col)."""
    if threshold < 3:
        raise ValueError("lttb threshold must be >= 3")
    t_int = threshold
    g = _collected(df, key_cols, ts_col, value_col)
    arr = F.col("_arr")
    size = F.size(arr)
    nb = t_int - 2  # middle buckets
    every = (size.cast("double") - 2.0) / F.lit(float(nb))

    def tsec(p: Column) -> Column:
        return F.unix_timestamp(p["t"]).cast("double")

    def bound(i: Column) -> Column:
        """0-based start index of middle bucket i."""
        return (F.lit(1) + F.floor(i.cast("double") * every)).cast("int")

    def bucket_slice(s: Column, e: Column) -> Column:
        return F.slice(arr, s + 1, e - s)  # [s, e) 0-based → 1-based slice

    def merge(acc: Column, i: Column) -> Column:
        s, e = bound(i), bound(i + 1)
        e2 = bound(i + 2)
        prev = F.element_at(arr, (acc["prev"] + 1).cast("int"))
        px, py = tsec(prev), prev["v"]
        # average of the NEXT bucket (the last point for the final bucket)
        last = F.element_at(arr, size)
        nxt = bucket_slice(e, e2)
        cnt = (e2 - e).cast("double")
        ax = F.when(i == nb - 1, tsec(last)).otherwise(
            _fsum(nxt, tsec) / cnt
        )
        ay = F.when(i == nb - 1, last["v"]).otherwise(
            _fsum(nxt, lambda p: p["v"]) / cnt
        )
        cur = bucket_slice(s, e)
        areas = F.transform(
            cur,
            lambda p: F.abs(
                (px - ax) * (p["v"] - py) - (px - tsec(p)) * (ay - py)
            ),
        )
        sel = s + (F.array_position(areas, F.array_max(areas)) - 1).cast("int")
        chosen = F.element_at(arr, sel + 1)
        return F.struct(
            sel.cast("int").alias("prev"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(chosen["t"].alias("t"), chosen["v"].alias("v"))
                ),
            ).alias("out"),
        )

    init = F.struct(
        F.lit(0).cast("int").alias("prev"), F.array().cast(_TV2).alias("out")
    )
    first = F.element_at(arr, 1)
    last = F.element_at(arr, size)
    middle = F.aggregate(
        F.sequence(F.lit(0), F.lit(nb - 1)), init, merge, lambda a: a["out"]
    )
    picked = F.concat(
        F.array(F.struct(first["t"].alias("t"), first["v"].alias("v"))),
        middle,
        F.array(F.struct(last["t"].alias("t"), last["v"].alias("v"))),
    )
    out = F.when(size <= t_int, arr).otherwise(picked)
    return _explode_series(g, key_cols, ts_col, out, out_col)
