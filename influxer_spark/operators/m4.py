"""M4 downsampling (engine extension; Jugel et al., "M4: A
Visualization-Oriented Time Series Data Aggregation", VLDB 2014, public).

For each (series, pixel-column time bucket), keep the SET of up to four
actual points — first, last, min, max — which is exactly the set a
pixel-perfect line rendering of the bucket needs.  The companion to LTTB
(`operators/lttb.py`): M4 is error-free for line charts at a fixed pixel
width and, unlike LTTB, is a plain algebraic aggregation.

Execution shape (100 TB posture): ONE groupBy shuffle on
(series, bucket) — the four selectors are min/max over lexicographic
(primary, tie-break) structs, so Spark computes them map-side-partially
like any min/max; no sort, no window, no UDF, whole-stage codegen.
Contrast with the naive 4-window formulation (4 full sorts of raw data).

Determinism contract (what the DuckDB oracle replays): every selector is a
total order —
  first = min (ts, v)    last = max (ts, v)
  min   = min (v, ts)    max   = max (v, ts)
so duplicate timestamps or duplicate values cannot flip the choice.  NULL
values are not drawable and are skipped.  The output is the distinct union
of the four points per bucket (a point can hold several roles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    width_seconds: int,
) -> DataFrame:
    """Downsample to ≤4 real points per (key, ``width_seconds`` bucket).

    Returns (*key_cols, bucket, ts_col, value_col) — one row per distinct
    selected point, epoch-aligned buckets (same alignment as
    ``rollup.rollup_width``).
    """
    if width_seconds <= 0:
        raise ValueError("width_seconds must be positive")
    t, v = F.col(ts_col), F.col(value_col)
    secs = F.unix_timestamp(t.cast("timestamp"))
    bucket = F.timestamp_seconds(
        (secs - (secs % width_seconds)).cast("long")
    ).alias("bucket")
    ts_first = F.struct(t.alias("ts"), v.alias("v"))
    v_first = F.struct(v.alias("v"), t.alias("ts"))
    agg = (
        df.where(v.isNotNull())
        .groupBy(bucket, *[F.col(k) for k in key_cols])
        .agg(
            F.min(ts_first).alias("_first"),
            F.max(ts_first).alias("_last"),
            F.min(v_first).alias("_min"),
            F.max(v_first).alias("_max"),
        )
    )
    pt = lambda c: F.struct(  # noqa: E731
        F.col(f"{c}.ts").alias("ts"), F.col(f"{c}.v").alias("v")
    )
    four = F.array_distinct(
        F.array(pt("_first"), pt("_last"), pt("_min"), pt("_max"))
    )
    return (
        agg.select(*key_cols, "bucket", F.explode(four).alias("_p"))
        .select(
            *key_cols,
            "bucket",
            F.col("_p.ts").alias(ts_col),
            F.col("_p.v").alias(value_col),
        )
    )
