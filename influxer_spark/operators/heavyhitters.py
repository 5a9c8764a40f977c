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


def topk_exact(
    df: DataFrame,
    key_cols: Sequence[str],
    item_col: str,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """PROVABLY exact top-k per series without shuffling the full item
    cardinality — the candidate-then-verify pattern (MG candidates +
    exact recount, cf. the two-phase heavy-hitter readouts in Agarwal et
    al. 2012).

    ``topk_query`` reads lower-bound counts from the MG tiers; this is
    the complementary EXACT answer for when "probably the top users" is
    not enough:

    1. Each input partition builds its own Misra-Gries summary of
       ``capacity`` items per series (``mapInPandas`` — NO shuffle; the
       trimmed amount is that partition's undercount bound errₚ).
    2. Any item absent from every partition summary has true count
       ≤ Σₚ errₚ, so the union of summaries is a candidate superset of
       the true top-k whenever the k-th true count exceeds that bound.
    3. Candidates (≤ capacity · partitions rows) are exact-counted with
       one broadcast semi-join — only matching rows shuffle.
    4. The proof obligation is CHECKED AT RUNTIME: if the k-th exact
       candidate count is not strictly greater than Σₚ errₚ (strict,
       because an uncounted item could tie and win the deterministic
       item-ascending tie-break), the job fails with a counted message —
       raise ``capacity``; never a silently wrong answer.

    Output: (*keys, rank, item, cnt) with cnt EXACT — deterministic and
    partitioning-independent whenever it returns at all.  Memory:
    O(capacity) per (partition, series) in stage 1, candidate-set-sized
    frames after.
    """
    from pyspark import TaskContext
    from pyspark.sql import Window
    from pyspark.sql.types import StructType

    keys = list(key_cols)
    src = df.select(*keys, F.col(item_col).alias("item"))
    part_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "pid", "type": "integer", "nullable": False,
                 "metadata": {}},
                *[
                    {"name": f.name, "type": f.dataType.jsonValue(),
                     "nullable": True, "metadata": {}}
                    for f in src.schema.fields
                ],
                {"name": "cnt", "type": "long", "nullable": False,
                 "metadata": {}},
                {"name": "err", "type": "long", "nullable": False,
                 "metadata": {}},
            ],
        }
    )

    def partial(it):
        counts: dict[tuple, dict] = {}
        errs: dict[tuple, int] = {}

        def trim(kv: dict, kk: tuple) -> None:
            if len(kv) <= capacity:
                return
            cut = sorted(kv.values(), reverse=True)[capacity]
            errs[kk] = errs.get(kk, 0) + cut
            for item in [i for i, c in kv.items() if c - cut <= 0]:
                del kv[item]
            for item in kv:
                kv[item] -= cut

        for pdf in it:
            grouped = pdf.groupby([*keys, "item"], dropna=False).size()
            for idx, c in grouped.items():
                kk = idx[:-1] if keys else ()
                kv = counts.setdefault(kk, {})
                kv[idx[-1] if keys else idx] = (
                    kv.get(idx[-1] if keys else idx, 0) + int(c)
                )
            for kk in list(counts):
                # amortized bound: trim only when 4x over capacity
                if len(counts[kk]) > 4 * capacity:
                    trim(counts[kk], kk)
        for kk in list(counts):
            trim(counts[kk], kk)
        pid = TaskContext.get().partitionId()
        rows = [
            (pid, *kk, item, c, errs.get(kk, 0))
            for kk, kv in counts.items()
            for item, c in kv.items()
        ]
        if rows:  # empty partitions yield nothing (Arrow-safe)
            yield pd.DataFrame(
                rows, columns=["pid", *keys, "item", "cnt", "err"]
            )

    partials = src.mapInPandas(partial, part_schema)
    total_err = (
        partials.select("pid", *keys, "err")
        .distinct()
        .groupBy(*keys)
        .agg(F.sum("err").alias("_terr"))
    )
    cands = partials.select(*keys, "item").distinct()
    exact = (
        src.join(F.broadcast(cands), on=[*keys, "item"])
        .groupBy(*keys, "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*[F.col(c) for c in keys] or [F.lit(1)]).orderBy(
        F.desc("cnt"), F.asc("item")
    )
    ranked = exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    topk = (
        ranked.join(F.broadcast(total_err), on=keys, how="left")
        if keys
        else ranked.crossJoin(F.broadcast(total_err))
    )
    guard = F.when(
        (F.col("rank") == k) & (F.col("cnt") <= F.col("_terr")),
        F.raise_error(
            F.concat(
                F.lit("topk_exact: k-th count "), F.col("cnt").cast("string"),
                F.lit(" does not exceed the MG undercount bound "),
                F.col("_terr").cast("string"),
                F.lit(f"; raise capacity (={capacity}) for a provable answer"),
            )
        ),
    ).otherwise(F.col("cnt"))
    return topk.select(
        *keys, "rank", "item", guard.alias("cnt")
    )
