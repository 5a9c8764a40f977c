"""Heavy-hitter (top-k) summaries as mergeable rollup tiers.

"Which urls / users dominated each hour, day, …?" at 100 TB cannot keep
exact per-item counts in every tier — the 1d tier would carry the full item
cardinality per bucket.  The standard answer (Misra-Gries / SpaceSaving,
made mergeable by Agarwal et al., "Mergeable Summaries", PODS 2012) is a
bounded summary of ``capacity`` (item, count) pairs per bucket whose merge
is: union-sum the counts, subtract the (capacity+1)-th largest, drop
non-positives.  Stored counts are UNDERestimates with per-summary
undercount ≤ n/(capacity+1); the subtracted amounts accumulate in ``err``,
so every readout carries its own error bound (no silent approximation).
With ``capacity`` ≥ the bucket's distinct-item count nothing is ever
subtracted and the summary is exact — which is how the driver oracle
value-checks it at gate scale while the stress test pins the error bound
at pathological capacity.

This is the counted analogue of the HLL sketch tiers in ``rollup.py``
(distinct counts) — same design: bounded, mergeable state per bucket,
cascaded 1h → 1d without touching raw data.

Scale notes (100 TB posture):
- the only raw-data shuffle is the exact (bucket, series, item) groupBy
  with map-side combine; compression to MG runs per (bucket, series) group
  whose input is the bucket's distinct-item count (bounded by the bucket,
  not the corpus; for unbounded-cardinality buckets pre-salt the count
  stage exactly like rollup.salted_rollup).
- the cascade explodes only summaries (≤ capacity rows each), groupBy on
  the coarse bucket, re-trims per group — state O(capacity) everywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from influxer_spark.operators.rollup import TIERS


def _trunc(tier: str):
    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}; expected one of {sorted(TIERS)}")
    return TIERS[tier][0]


def _mg_trim(counts: pd.Series, capacity: int) -> tuple[pd.Series, int]:
    """Misra-Gries reduction of an exact/partial count vector: subtract the
    (capacity+1)-th largest count, drop non-positives.  Returns (kept,
    subtracted amount — the undercount added to every surviving item)."""
    if len(counts) <= capacity:
        return counts, 0
    sub = int(counts.sort_values(ascending=False).iloc[capacity])
    kept = counts - sub
    return kept[kept > 0], sub


def topk_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    item_col: str,
    tier: str = "1h",
    capacity: int = 256,
) -> DataFrame:
    """Raw points → one MG summary row per (bucket, *key_cols):
    ``items: array<struct<item,cnt>>`` (cnt descending, item ascending) and
    ``err`` (max undercount of any stored/absent item's true bucket count).
    """
    bucket = F.date_trunc(_trunc(tier), F.col(ts_col)).alias("bucket")
    counted = (
        df.groupBy(bucket, *[F.col(k) for k in key_cols],
                   F.col(item_col).cast("long").alias("item"))
        .agg(F.count("*").alias("cnt"))
    )
    return _compress(counted, key_cols, capacity)


def topk_cascade(
    summary: DataFrame,
    key_cols: Sequence[str],
    tier: str,
    capacity: int = 256,
) -> DataFrame:
    """Merge finer MG summaries into coarser ``tier`` buckets.  Union-sum
    per item, one MG trim per coarse bucket; child ``err`` accumulates.

    Single-pass design: the child frame is consumed ONCE (explode_outer so
    an all-trimmed child still contributes its err), with the union-sum,
    trim, and inherited-error accounting all inside one
    (coarse bucket, series) group — group size ≤ capacity × children, so
    the pandas step is bounded.  Referencing ``summary`` twice (items +
    errors) would re-run the whole upstream subtree including the raw
    scan — the plan-regression test pins the single-scan shape.
    """
    keys = list(key_cols)
    exploded = summary.select(
        F.date_trunc(_trunc(tier), F.col("bucket")).alias("bucket"),
        *[F.col(k) for k in keys],
        F.col("bucket").alias("_cb"),
        F.explode_outer("items").alias("ic"),
        F.col("err").alias("_child_err"),
    ).select(
        "bucket", *keys, "_cb",
        F.col("ic.item").alias("item"), F.col("ic.cnt").alias("cnt"),
        "_child_err",
    )
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in exploded.select("bucket", *keys).schema.fields]
        + ["items array<struct<item: bigint, cnt: bigint>>", "err bigint"]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        inherited = int(
            pdf.drop_duplicates(subset=["_cb"])["_child_err"].sum()
        )
        with_items = pdf[pdf["item"].notna()]
        counts = with_items.groupby("item")["cnt"].sum()
        kept, sub = _mg_trim(counts, capacity)
        kept = kept.sort_index().sort_values(ascending=False, kind="stable")
        head = pdf.iloc[:1][["bucket", *keys]].reset_index(drop=True)
        head["items"] = [
            [{"item": int(i), "cnt": int(c)} for i, c in kept.items()]
        ]
        head["err"] = inherited + sub
        return head

    return exploded.groupBy("bucket", *keys).applyInPandas(merge, out_schema)


def _compress(
    counted: DataFrame,
    key_cols: Sequence[str],
    capacity: int,
) -> DataFrame:
    keys = list(key_cols)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in counted.select("bucket", *keys).schema.fields]
        + ["items array<struct<item: bigint, cnt: bigint>>", "err bigint"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.set_index("item")["cnt"]
        kept, sub = _mg_trim(s, capacity)
        kept = kept.sort_index().sort_values(ascending=False, kind="stable")
        head = pdf.iloc[:1][["bucket", *keys]].reset_index(drop=True)
        head["items"] = [
            [{"item": int(i), "cnt": int(c)} for i, c in kept.items()]
        ]
        head["err"] = sub
        return head

    return counted.groupBy("bucket", *keys).applyInPandas(fn, out_schema)


def topk_query(summary: DataFrame, key_cols: Sequence[str], k: int) -> DataFrame:
    """Read the top-k items per (bucket, series) with their (lower-bound)
    counts and the summary's undercount bound.  Ties break to the smaller
    item — deterministic output."""
    from pyspark.sql import Window

    exploded = summary.select(
        "bucket", *key_cols, F.explode("items").alias("ic"), "err"
    ).select(
        "bucket", *key_cols,
        F.col("ic.item").alias("item"), F.col("ic.cnt").alias("cnt"), "err",
    )
    w = Window.partitionBy("bucket", *key_cols).orderBy(
        F.desc("cnt"), F.asc("item")
    )
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("bucket", *key_cols, "item", "cnt", "err", F.col("_rn").alias("rank"))
    )
