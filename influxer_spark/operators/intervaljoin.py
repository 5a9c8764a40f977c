"""Interval (range-overlap) join: points × time windows without a
nested-loop plan.

The reference's monitoring story reads points inside ad-hoc time windows
(Influxer batches by timestamp ranges per retention policy,
Influxer/GenericFile.cs:250-280); joining a point stream to an interval
table (maintenance windows, incidents, deploy windows) is the natural
query on top.  Spark has no native range join: ``p.ts BETWEEN i.lo AND
i.hi`` with no equi-key compiles to BroadcastNestedLoopJoin — O(|p|·|i|)
work, a guaranteed non-starter at 100 TB.

Design (the standard chunked range join, cf. Databricks' RANGE_JOIN hint
semantics — reimplemented on open Spark): pick a chunk width C, explode
each interval into the integer chunks it overlaps (``sequence(floor(lo/C),
floor((hi-1)/C))`` — bounded by duration/C rows per interval), bucket each
point into its single chunk ``floor(ts/C)``, then equi-join on
(*series keys, chunk) with the exact range predicate as a residual
filter.  Because a point owns exactly ONE chunk, every (point, interval)
overlap pair appears exactly once — no post-join dedup.

Scale notes (100 TB posture):
- One shuffle per side, keyed on (keys, chunk) — Catalyst plans a
  SortMergeJoin (or broadcasts a small interval side); the plan test pins
  the absence of BroadcastNestedLoopJoin/CartesianProduct.
- Chunk width trades interval fan-out (long intervals → many chunk rows)
  against residual selectivity (wide chunks → more filtered pairs).  Both
  are linear, never quadratic; pick C ≈ median interval length.
- Hot chunks (many concurrent intervals) are ordinary join skew — AQE
  skew-join splits them; the exploded interval side stays small because
  it is |intervals| × (duration/C), not |points|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    lo_col: str = "w_start",
    hi_col: str = "w_end",
    chunk_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same ``key_cols``) that contains
    its timestamp: ``lo <= ts < hi``.  Returns points columns + interval
    bounds; aggregate downstream as needed.

    ``how="inner"`` keeps only in-window points.  Interval rows must be
    distinct (duplicates would legitimately duplicate matches — callers
    wanting set semantics should ``.distinct()`` the interval frame).
    """
    keys = list(key_cols)
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long")
    lo = F.unix_timestamp(F.col(lo_col).cast("timestamp")).cast("long")
    hi = F.unix_timestamp(F.col(hi_col).cast("timestamp")).cast("long")

    p = points.withColumn("_chunk", F.floor(t / chunk_seconds))
    iv = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                F.floor(lo / chunk_seconds), F.floor((hi - 1) / chunk_seconds)
            )
        ),
    )
    cond = [p["_chunk"] == iv["_chunk"]] + [p[k] == iv[k] for k in keys]
    pt = F.unix_timestamp(p[ts_col].cast("timestamp")).cast("long")
    ilo = F.unix_timestamp(iv[lo_col].cast("timestamp")).cast("long")
    ihi = F.unix_timestamp(iv[hi_col].cast("timestamp")).cast("long")
    joined = p.join(iv, cond, how).filter((pt >= ilo) & (pt < ihi))
    return joined.select(
        *[p[c] for c in points.columns],
        *[iv[c] for c in intervals.columns if c not in (*keys, "_chunk")],
    )
