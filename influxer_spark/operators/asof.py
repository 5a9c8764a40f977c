"""As-of join — attach to each left row the nearest right row within the
same series key (the time-series lookup join of kdb/QuestDB/DuckDB; the
reference has no joins at all, SURVEY.md §2.5, so this is engine-added
capability for metric-vs-state lookups).

Directions (pandas ``merge_asof`` parity):

- ``backward`` (default): latest right with ``right.ts <= left.ts``;
- ``forward``: earliest right with ``right.ts >= left.ts``;
- ``nearest``: whichever of the two is closer in time (ties → backward,
  like pandas).

Implementation is the union-and-window formulation, NOT a range join:

1. tag right rows side=0, left rows side=1; union on (keys, ts, payload);
2. one window per key ordered by ts carries the last (backward) or first
   (forward) non-null right payload across the frame; tie order on equal
   timestamps puts the right row INSIDE the frame, so both bounds are
   inclusive — identical to DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` /
   ``<=``, which the correctness gate uses as the oracle;
3. keep only left rows.

Scale shape: ONE shuffle on the series key — the same exchange every keyed
rollup already does — plus one sort per needed direction (two for
``nearest``; Spark shares the exchange between them).  A range-condition
join would rewrite to a broadcast-nested-loop or an O(n·m) range explode;
the window formulation is linear in rows after the sort and never fans out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _age_seconds(later: Column, earlier: Column) -> Column:
    return (
        F.unix_timestamp(later.cast("timestamp"))
        - F.unix_timestamp(earlier.cast("timestamp"))
    ).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + ``{prefix}<col>`` columns from the matched right row
    (NULL when none exists in the chosen direction).

    ``tolerance_seconds`` bounds the time distance (pandas merge_asof /
    QuestDB ``ASOF JOIN TOLERANCE`` semantics): a match farther than the
    tolerance is nulled out — a stale state row should not annotate events
    from hours later.  For ``nearest`` the tolerance is applied to each
    candidate BEFORE choosing, exactly as pandas does.  Applied as a
    post-window predicate on the matched timestamp, so the plan shape is
    unchanged."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
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
    u = r.unionByName(l)

    mts = f"_m.{prefix}{right_ts}"

    def bounded(match: Column, age: Column) -> Column:
        if tolerance_seconds is None:
            return match
        return F.when(age <= tolerance_seconds, match)

    if direction in ("backward", "nearest"):
        # right rows sort BEFORE left at equal ts (side 0 < 1) → inclusive <=
        w_back = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_mb", F.last("_rp", ignorenulls=True).over(w_back))
        back_age = _age_seconds(F.col("_ts"), F.col(f"_mb.{prefix}{right_ts}"))
        u = u.withColumn("_mb", bounded(F.col("_mb"), back_age))
    if direction in ("forward", "nearest"):
        # left rows sort BEFORE right at equal ts → the frame starting at the
        # left row still contains an equal-ts right row → inclusive >=
        w_fwd = (
            Window.partitionBy(*by)
            .orderBy(F.col("_ts").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        u = u.withColumn("_mf", F.first("_rp", ignorenulls=True).over(w_fwd))
        fwd_age = _age_seconds(F.col(f"_mf.{prefix}{right_ts}"), F.col("_ts"))
        u = u.withColumn("_mf", bounded(F.col("_mf"), fwd_age))

    if direction == "backward":
        u = u.withColumn("_m", F.col("_mb"))
    elif direction == "forward":
        u = u.withColumn("_m", F.col("_mf"))
    else:
        back_age = _age_seconds(F.col("_ts"), F.col(f"_mb.{prefix}{right_ts}"))
        fwd_age = _age_seconds(F.col(f"_mf.{prefix}{right_ts}"), F.col("_ts"))
        u = u.withColumn(
            "_m",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(fwd_age < back_age, F.col("_mf"))
            .otherwise(F.col("_mb")),  # ties → backward, like pandas
        )

    out_cols = (
        [F.col(c) for c in left.columns]
        + [F.col(mts).alias(f"{prefix}{right_ts}")]
        + [F.col(f"_m.{prefix}{c}").alias(f"{prefix}{c}") for c in value_cols]
    )
    return (
        u.filter(F.col("_side") == 1)
        .withColumnRenamed("_ts", left_ts)
        .select(*out_cols)
    )
