"""Funnel analysis: ordered step conversion within a time window.

"Of the users who VIEWED, how many CLICKED within an hour, and of those
how many PURCHASED within another hour?" — the product-analytics query
that motivates keeping raw event streams next to the rollup tiers.  The
reference's InfluxQL surface cannot express ordered cross-event
sequencing (no joins); on Spark it is a short chain of user-keyed
joins, one per funnel step.

Semantics (the standard strict-order funnel):
- a user ENTERS at their FIRST occurrence of step 1;
- they reach step k+1 at their first occurrence of it STRICTLY AFTER
  their step-k time and within ``within_seconds`` of it;
- "first occurrence" makes the result a pure function of the data
  (no per-row nondeterminism), and per-user times are monotone by
  construction.

Scale notes (100 TB posture):
- one filter + groupBy(user) per step, then a user-keyed join per step —
  len(steps) bounded shuffles, all on the same key (AQE reuses the
  exchange); no window over unbounded event lists, no per-row Python.
- the per-step frames shrink monotonically (funnels only lose users),
  so later joins are broadcast-able in practice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: int,
) -> DataFrame:
    """Per-user funnel progress: (user, t1, t2, …, tN) with tk the time
    the user reached step k (NULL once the funnel broke).  tk is the
    first ``steps[k]`` event strictly after t(k-1) and within
    ``within_seconds`` of it."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    t = F.col(ts_col).cast("timestamp")
    cur = (
        df.filter(F.col(event_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(t).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = df.filter(F.col(event_col) == step).select(
            F.col(user_col).alias("user"), t.alias("_ts")
        )
        prev = f"t{k - 1}"
        cond = (
            (F.col("_ts") > F.col(prev))
            & (
                F.unix_timestamp("_ts")
                <= F.unix_timestamp(prev) + within_seconds
            )
        )
        reached = (
            cur.join(nxt, "user")
            .filter(cond)
            .groupBy("user", *[f"t{i}" for i in range(1, k)])
            .agg(F.min("_ts").alias(f"t{k}"))
        )
        cur = cur.join(
            reached.select("user", f"t{k}"), "user", "left"
        )
    return cur


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: int,
) -> DataFrame:
    """The funnel report: one row per step with the user count that
    reached it and the conversion rate vs step 1 (exact integer ratio —
    one float division, bit-stable).  Output: (step_idx, step, users,
    conversion)."""
    times = funnel_times(
        df, user_col, ts_col, event_col, steps, within_seconds
    )
    aggs = [
        F.count(F.col(f"t{k}")).alias(f"_n{k}")
        for k in range(1, len(steps) + 1)
    ]
    row = times.agg(*aggs)
    parts = None
    for k, step in enumerate(steps, start=1):
        p = row.select(
            F.lit(k).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"_n{k}").alias("users"),
            (
                F.col(f"_n{k}").cast("double") / F.col("_n1")
            ).alias("conversion"),
        )
        parts = p if parts is None else parts.unionByName(p)
    return parts


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Cohort retention matrix — the analytics staple next to the funnel:
    users cohort by their FIRST-SEEN day, and cell (cohort_day, k) is the
    fraction of that cohort active exactly k days later.  k = 0 is the
    cohort itself (retention 1.0 by construction — kept as the sanity
    row).

    Execution: one (user → first day) aggregate, one distinct
    (user, day) projection, one user-keyed join, one (cohort, k) count —
    all shuffles on user or on the tiny (cohort_day, k) grid; no windows
    over unbounded series.  Output: (cohort_day, k, cohort_size, active,
    retention) with retention an exact integer ratio (one float
    division)."""
    day = F.date_trunc("day", F.col(ts_col).cast("timestamp"))
    actives = df.select(
        F.col(user_col).alias("user"), day.alias("day")
    ).distinct()
    firsts = actives.groupBy("user").agg(F.min("day").alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        actives.join(firsts, "user")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "k"
            ),
        )
        .agg(F.count(F.lit(1)).alias("active"))
    )
    return cells.join(sizes, "cohort_day").select(
        "cohort_day",
        "k",
        "cohort_size",
        "active",
        (F.col("active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Next-event transition matrix — P(next = b | current = a) over each
    user's event sequence: the Markov view of user behavior that funnels
    sample one path of.  ``order_cols`` breaks timestamp ties
    deterministically (pass the event id; two same-second events would
    otherwise make lead() nondeterministic).

    One lag window per user + one (a, b) count — the window partitions by
    user (bounded sequences), the matrix is |event types|² rows.  Counts
    are exact integers; probability is one float division.  Output:
    (cur, nxt, n, p)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).cast("timestamp"), *[F.col(c) for c in order_cols]
    )
    pairs = (
        df.withColumn("_nxt", F.lead(event_col).over(w))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(
            F.col(event_col).alias("cur"), F.col("_nxt").alias("nxt")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("cur").agg(F.sum("n").alias("_t"))
    return pairs.join(totals, "cur").select(
        "cur", "nxt", "n",
        (F.col("n").cast("double") / F.col("_t")).alias("p"),
    )


def funnel_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: Sequence[str],
    within_seconds: int,
    ps: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert distribution per funnel step: for every step
    transition k−1 → k, the nearest-rank percentiles of the per-user
    delay (seconds), computed through an HDR SKETCH of the delays — the
    scale-safe formulation: a collect-and-sort percentile would hold
    every converting user in one list, while the sketch is a bounded
    counter vector per step (rel error ≤ 2⁻⁵), mergeable across any
    partitioning.  Delays are exact integer seconds.

    Output: (step_idx, step, n, q<pp>…) for steps 2..N.
    """
    from influxer_spark.operators.hdrsketch import hdr_quantiles

    times = funnel_times(
        df, user_col, ts_col, event_col, steps, within_seconds
    )
    sub_bits = 5
    s = 1 << sub_bits
    parts = None
    for k, step in enumerate(steps[1:], start=2):
        # delay in integer SECONDS → HDR index via the sketch's integer
        # math (clamped ≥ 1 like hdrsketch; instant conversions land in
        # the 1-second bucket).  The "value" here is already integer, so
        # no cents scaling: quantiles come out in whole seconds.
        delta = (
            F.unix_timestamp(F.col(f"t{k}"))
            - F.unix_timestamp(F.col(f"t{k - 1}"))
        )
        p = (
            times.filter(F.col(f"t{k}").isNotNull())
            .select(F.greatest(delta, F.lit(1)).cast("long").alias("_v"))
            .withColumn("_e", (F.length(F.bin(F.col("_v"))) - 1).cast("long"))
            .withColumn("_m", F.expr(f"shiftright(_v * {s}, cast(_e as int))"))
            .select(
                F.lit(k).alias("step_idx"),
                F.lit(step).alias("step"),
                (F.col("_e") * s + F.col("_m") - s).alias("idx"),
            )
            .groupBy("step_idx", "step", "idx")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        parts = p if parts is None else parts.unionByName(p)
    sk = parts.withColumnRenamed("step_idx", "bucket")
    out = hdr_quantiles(sk, ["step"], ps, sub_bits)
    # hdr_quantiles emits values as cents/100; these are plain seconds —
    # undo the unit convention (×100 restores the integer lower bound)
    qcols = [f"q{int(round(p * 100))}" for p in ps]
    sel = [
        F.col("bucket").alias("step_idx"), "step", "n",
        *[(F.col(c) * 100.0).alias(c) for c in qcols],
    ]
    return out.select(*sel)
