"""As-of join — attach to each left row the LATEST right row with
``right.ts <= left.ts`` within the same series key (the time-series lookup
join of kdb/QuestDB/DuckDB; the reference has no joins at all, SURVEY.md
§2.5, so this is engine-added capability for metric-vs-state lookups).

Implementation is the union-and-window formulation, NOT a range join:

1. tag right rows side=0, left rows side=1; union on (keys, ts, payload);
2. one window per key ordered by (ts, side) carries the last non-null right
   payload forward (``last(ignorenulls)``);
3. keep only left rows.

Scale shape: ONE shuffle on the series key + ONE sort — the same exchange
every keyed rollup already does.  A range-condition join would rewrite to a
broadcast-nested-loop or an O(n·m) range explode; the window formulation is
linear in rows after the sort and never fans out.  Ties (equal ts) match the
right row (side 0 sorts first), i.e. inclusive <= — identical to DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``, which the correctness gate uses as the
oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left rows + ``{prefix}<col>`` columns from the latest right row at or
    before the left timestamp (NULL when no earlier right row exists).

    ``tolerance_seconds`` bounds the lookback (pandas merge_asof /
    QuestDB ``ASOF JOIN TOLERANCE`` semantics): a match older than the
    tolerance is nulled out — a stale state row should not annotate events
    from hours later.  Applied as a post-window predicate on the matched
    timestamp, so the plan shape (one exchange + one sort) is unchanged."""
    by = list(by)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by and c != right_ts
        ]
    value_cols = list(value_cols)

    payload = F.struct(
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    passthrough = [c for c in left.columns if c not in by and c != left_ts]
    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough],
    )
    l = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c) for c in passthrough],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        age = (
            F.unix_timestamp(F.col("_ts").cast("timestamp"))
            - F.unix_timestamp(
                F.col(f"_match.{prefix}{right_ts}").cast("timestamp")
            )
        ).cast("double")
        u = u.withColumn(
            "_match",
            F.when(age <= tolerance_seconds, F.col("_match")),
        )
    out_cols = (
        [F.col(c) for c in left.columns]
        + [F.col(f"_match.{prefix}{right_ts}").alias(f"{prefix}{right_ts}")]
        + [F.col(f"_match.{prefix}{c}").alias(f"{prefix}{c}") for c in value_cols]
    )
    return (
        u.filter(F.col("_side") == 1)
        .withColumnRenamed("_ts", left_ts)
        .select(*out_cols)
    )
