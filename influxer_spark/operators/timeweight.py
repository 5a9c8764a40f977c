"""Time-weighted average (TWA) continuous-aggregate tiers.

The count/sum/min/max tiers in ``rollup.py`` weight every point equally —
correct for regular sampling, wrong for irregular series (a sensor that
reports 1 Hz while failing and 0.001 Hz while healthy would dominate the
plain mean with failure readings).  The fix used by TimescaleDB
(``time_weight('LOCF')``) and InfluxDB (``INTEGRAL``) is to weight each
value by how long it was current.  The reference pushes raw points to
InfluxDB and leans on its INTEGRAL (Influxer/GenericFile.cs:54 precision
handling feeds it); here the operator is native Spark AND mergeable, so it
cascades through the 1m → 1h → 1d tiers like the algebraic aggregates.

Semantics (LOCF step function):
- points are pre-aggregated to one value per (series, second) — ties on the
  wire carry no duration, so the dedup rule (max) is a deterministic
  tie-break, not an approximation;
- between consecutive points the series holds the LEFT point's value;
- a bucket's summary is ``(first_t, first_v, last_t, last_v, area)`` where
  ``area`` = Σ v·Δt over segments with BOTH endpoints in the bucket
  (integer cent·seconds — exact);
- ``twa = area / (last_t - first_t)``, NULL for 1-point buckets (a point
  with no duration has no time-weighted mean).

Why this cascades exactly: the summary is a monoid under time-ordered
merge —

    merge(a, b) = (a.first_t, a.first_v, b.last_t, b.last_v,
                   a.area + b.area + a.last_v · (b.first_t − a.last_t))

The bridge term is precisely the LOCF segment between the last point of
the finer bucket ``a`` and the first point of ``b``, so cascading 1m
summaries to 1h yields bit-identical area/twa to computing the 1h summary
from raw points directly (the driver oracle checks exactly this: the
Spark side cascades, the DuckDB side computes the coarse bucket from raw).

Scale notes (100 TB posture):
- pre-agg + in-bucket ``lead`` + groupBy all share one (series, bucket)
  shuffle key; window partitions are single-bucket sized (≤ bucket span
  seconds), never whole-series — no unbounded sort partition.
- the cascade re-shuffles only tier rows (like rollup.cascade), with a
  per-coarse-bucket window over ≤ 60 child summaries.
- area is BIGINT cent·seconds: associative, overflow-safe to ~3·10¹⁴
  cent·years, and hash-exact against the oracle (no float summation
  order issues).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TIER_SECONDS: dict[str, int] = {"1m": 60, "5m": 300, "1h": 3600, "1d": 86400}

SUMMARY_COLS = ["first_t", "first_v", "last_t", "last_v", "area"]


def _bucket(t, tier: str):
    width = TIER_SECONDS[tier]
    return F.timestamp_seconds((t - (t % width)).cast("long")).alias("bucket")


def twa_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    tier: str = "1m",
) -> DataFrame:
    """Raw points → per (bucket, series) mergeable TWA summary.

    Values are quantized to integer cents (the engine's storage precision,
    matching the rollup tiers) so ``area`` is exact integer math.
    """
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}; expected one of {sorted(TIER_SECONDS)}")
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long")
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    pts = df.select(
        *key_cols, _bucket(t, tier), t.alias("t"), cents.alias("v")
    )
    # Per-second dedup (max v) INSIDE the (series, bucket) partitioning:
    # hashpartitioning(keys, bucket) satisfies the (keys, bucket, t)
    # clustering, so the dedup window, the lead window, and the final
    # groupBy all ride ONE raw-data exchange — a (series, second) pre-agg
    # would add a second raw-sized shuffle for nothing.  The repartition
    # is explicit because EnsureRequirements would otherwise insert a
    # full-key (keys, bucket, t) exchange for the dedup window and then a
    # second (keys, bucket) one for the lead window.
    w_tie = Window.partitionBy(*key_cols, "bucket", "t").orderBy(F.desc("v"))
    w = Window.partitionBy(*key_cols, "bucket").orderBy("t")
    seg = (
        pts.repartition(*key_cols, "bucket")
        .withColumn("_rn", F.row_number().over(w_tie))
        .filter(F.col("_rn") == 1)
        .withColumn("nt", F.lead("t").over(w))
    )
    return seg.groupBy(*key_cols, "bucket").agg(
        F.min("t").alias("first_t"),
        F.min_by("v", "t").alias("first_v"),
        F.max("t").alias("last_t"),
        F.max_by("v", "t").alias("last_v"),
        F.coalesce(F.sum(F.col("v") * (F.col("nt") - F.col("t"))), F.lit(0)).alias(
            "area"
        ),
    )


def twa_cascade(summary: DataFrame, key_cols: Sequence[str], tier: str) -> DataFrame:
    """Merge a finer tier's TWA summaries into coarser ``tier`` buckets.

    Time-ordered monoid merge: child areas sum, plus one LOCF bridge
    segment between each adjacent pair of child summaries.
    """
    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}; expected one of {sorted(TIER_SECONDS)}")
    parent = summary.withColumn(
        "_pb", _bucket(F.unix_timestamp(F.col("bucket")).cast("long"), tier)
    )
    w = Window.partitionBy(*key_cols, "_pb").orderBy("first_t")
    bridged = parent.withColumn(
        "_bridge",
        F.col("last_v") * (F.lead("first_t").over(w) - F.col("last_t")),
    )
    return (
        bridged.groupBy(*key_cols, F.col("_pb").alias("bucket"))
        .agg(
            F.min("first_t").alias("first_t"),
            F.min_by("first_v", "first_t").alias("first_v"),
            F.max("last_t").alias("last_t"),
            F.max_by("last_v", "last_t").alias("last_v"),
            (
                F.sum("area") + F.coalesce(F.sum("_bridge"), F.lit(0))
            ).alias("area"),
        )
    )


def twa_value(summary: DataFrame) -> DataFrame:
    """Attach ``dur`` (seconds) and ``twa`` (cents, IEEE division of two
    exact integers — bit-stable across engines).  Derived at read time,
    never stored — like the mean in ``rollup.with_mean``."""
    dur = F.col("last_t") - F.col("first_t")
    return summary.withColumn("dur", dur).withColumn(
        "twa",
        F.when(dur > 0, F.col("area").cast("double") / dur / 100.0),
    )
