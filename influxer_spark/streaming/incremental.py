"""Incremental 1m tier via Structured Streaming (SURVEY.md §2.7 — optional
extension; the north rule's resumability is satisfied by the batch
checkpoint table, this adds the streaming-native route).

The reference is a bounded batch job with a hand-rolled micro-batcher
(Influxer/GenericFile.cs:298-326: buffer 10k points → POST → retry queue).
Structured Streaming IS that loop, made durable: source offsets + sink
commits live in the checkpoint, late data is bounded by the watermark, and
each micro-batch lands ALGEBRAIC PARTIALS (cnt/sum/min/max) that merge by
the same cascade algebra as the batch tiers — so readers always see exact
aggregates regardless of how many batches a bucket was spread across.

Exactly-once: ``foreachBatch`` is at-least-once on retry, so each batch
writes to its own ``_batch=<id>`` subdirectory and SKIPS if that directory
is already committed — idempotent replay without a transactional sink.
(On a real cluster the same flow targets an Iceberg MERGE; the directory
protocol is the dependency-free stand-in with identical semantics.)

Scale notes:
- shuffle per micro-batch is keyed (window, series) — identical shape to
  the batch 1m rollup; watermark bounds state size for update-mode sinks.
- the merged read (``read_tier``) re-aggregates partials; compaction =
  rewriting N batch dirs into one, same algebra, any time.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.operators.rollup import AGG_COLS


def stream_rollup_1m(
    stream_df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    watermark: str = "1 hour",
    distinct_col: str | None = None,
    lg_k: int = 12,
    hist_bounds: Sequence[float] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window 1m partial aggregate over a stream.

    Returns (bucket, *key_cols, cnt, sum_v, min_v, max_v[, uu_sketch]
    [, hist]) — same schema as the batch ``rollup()`` /
    ``rollup_with_distinct()`` / ``rollup_with_histogram()`` so downstream
    cascade/gap-fill/sketch-union/quantile serving are shared.
    """
    v = F.col(value_col)
    win = F.window(F.col(ts_col), "1 minute")
    aggs = [
        F.count(v).alias("cnt"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    ]
    out_cols = list(AGG_COLS)
    if distinct_col is not None:
        # mergeable HLL sketch per bucket (rollup.py rollup_with_distinct's
        # streaming twin) — update-mode re-emission carries the refreshed
        # sketch, so read_tier's last-emission merge stays correct
        aggs.append(
            F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias(
                "uu_sketch"
            )
        )
        out_cols.append("uu_sketch")
    if hist_bounds is not None:
        # quantile-histogram cells (rollup.py rollup_with_histogram's
        # streaming twin): plain conditional sums, so update-mode
        # re-emission replaces the cell vector wholesale and read_tier's
        # last-emission merge stays correct
        from influxer_spark.operators.rollup import (
            _bucket_index,
            hist_cells_agg,
        )

        stream_df = stream_df.withColumn(
            "_hidx", F.when(v.isNotNull(), _bucket_index(v, hist_bounds))
        )
        aggs.append(
            hist_cells_agg(F.col("_hidx"), len(hist_bounds) + 1).alias("hist")
        )
        out_cols.append("hist")
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win, *[F.col(k) for k in key_cols])
        .agg(*aggs)
        .select(F.col("window.start").alias("bucket"), *key_cols, *out_cols)
    )


def run_incremental_rollup(
    spark: SparkSession,
    input_dir: str,
    schema,
    tier_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    watermark: str = "1 hour",
    distinct_col: str | None = None,
    hist_bounds: Sequence[float] | None = None,
) -> None:
    """File-source stream → 1m partials, one idempotent dir per micro-batch.

    ``availableNow`` trigger: drains everything currently in ``input_dir``
    then stops — rerunning after new files arrive processes ONLY the new
    files (source offsets in the checkpoint), i.e. checkpoint/resume with
    no reprocessing, the streaming analogue of pipeline.py's day manifest.
    """
    key_cols = list(key_cols)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    # watermarks require TIMESTAMP (LTZ); NTZ sources cast losslessly under
    # the engine's fixed UTC session timezone (session.py)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    rolled = stream_rollup_1m(
        stream, ts_col, key_cols, value_col, watermark,
        distinct_col=distinct_col, hist_bounds=hist_bounds,
    )

    _drain_to_tier(rolled, tier_dir, checkpoint_dir)


def _drain_to_tier(rolled: DataFrame, tier_dir: str, checkpoint_dir: str) -> None:
    """availableNow update-mode drain into idempotent per-batch dirs — the
    commit protocol shared by every streaming tier source."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(tier_dir, f"_batch={batch_id}")
        marker = os.path.join(out, "_COMMITTED")
        if os.path.exists(marker):
            # at-least-once replay → don't rewrite, but still run the batch
            # plan: the state stores must execute + commit or the engine
            # fails commit validation (Spark 4 STATE_STORE_COMMIT_VALIDATION)
            batch_df.count()
            return
        batch_df.write.mode("overwrite").parquet(out)
        open(marker, "w").close()

    (
        rolled.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_incremental_lineprotocol_rollup(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    measurement: str,
    field: str,
    key_tags: Sequence[str] = ("event_type",),
    watermark: str = "1 hour",
    precision: str = "ns",
    hist_bounds: Sequence[float] | None = None,
) -> None:
    """Live line-protocol ingestion → the 1m tier: tail a directory of
    InfluxDB line-protocol text files (what telegraf & friends write — the
    reference's own wire format, Influxer/GenericFile.cs:303) and maintain
    the same watermarked 1m partials as the parquet source, with the same
    checkpoint/resume and idempotent-batch commit protocol.

    The parse (sinks.parse_line_protocol) is pure Column work, so the whole
    stream stays JVM-side codegen — no Python in the per-line hot path.
    Tag keys become series key columns; ``fields[field]`` is cast to double
    (non-numeric or absent field values roll up as NULL, i.e. not at all).
    """
    from influxer_spark.sinks import parse_line_protocol

    key_tags = list(key_tags)
    lines = spark.readStream.text(input_dir)
    pts = parse_line_protocol(lines, precision=precision)
    pts = pts.where(F.col("measurement") == measurement).select(
        F.col("ts").cast("timestamp").alias("ts"),
        *[F.col("tags").getItem(t).alias(t) for t in key_tags],
        F.col("fields").getItem(field).cast("double").alias("value"),
    )
    rolled = stream_rollup_1m(
        pts, "ts", key_tags, "value", watermark, hist_bounds=hist_bounds
    )
    _drain_to_tier(rolled, tier_dir, checkpoint_dir)


def _committed_batches(tier_dir: str) -> list[tuple[str, int]]:
    """Committed data dirs as (dirname, batch_id) — regular ``_batch=N``
    sink outputs plus any committed ``.compact-N`` consolidation that has
    not been renamed into place yet (crash recovery: its content is the
    exact last-emission merge at bid N, so reading it alongside leftovers
    is consistent)."""
    out = []
    for d in os.listdir(tier_dir):
        if d.startswith("_batch="):
            bid = int(d.split("=", 1)[1])
        elif d.startswith(".compact-"):
            bid = int(d.split("-", 1)[1])
        else:
            continue
        if os.path.exists(os.path.join(tier_dir, d, "_COMMITTED")):
            out.append((d, bid))
    return sorted(out)


def compact_tier(
    spark: SparkSession, tier_dir: str, key_cols: Sequence[str] = ("event_type",)
) -> int:
    """Fold all committed batch dirs into one (at the max batch id),
    preserving read_tier's last-emission-wins result exactly.

    Unbounded streams accrete one dir per micro-batch; compaction keeps the
    read-side merge O(1) dirs.  Crash-safe: the consolidation stages as a
    committed ``.compact-<maxbid>`` dir that read_tier ALSO accepts — at
    every step the visible set of committed dirs merges to the same result,
    and a rerun finishes any pending rename.  Returns dirs removed.
    """
    import shutil

    # finish a previously crashed compaction first
    for d, bid in _committed_batches(tier_dir):
        if d.startswith(".compact-"):
            target = os.path.join(tier_dir, f"_batch={bid}")
            if os.path.exists(target):
                shutil.rmtree(target)
            os.replace(os.path.join(tier_dir, d), target)

    batches = _committed_batches(tier_dir)
    if len(batches) <= 1:
        return 0
    merged = read_tier(spark, tier_dir, key_cols)
    max_bid = max(bid for _, bid in batches)
    staging = os.path.join(tier_dir, f".compact-{max_bid}")
    merged.write.mode("overwrite").parquet(staging)
    open(os.path.join(staging, "_COMMITTED"), "w").close()
    # from here on the staged dir is authoritative for bid=max_bid; removing
    # the old dirs in any order keeps the merged view identical
    for d, _bid in batches:
        shutil.rmtree(os.path.join(tier_dir, d))
    os.replace(staging, os.path.join(tier_dir, f"_batch={max_bid}"))
    return len(batches) - 1


def read_tier(
    spark: SparkSession, tier_dir: str, key_cols: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Merge all committed batch partials into the exact 1m tier.

    A bucket updated across several micro-batches (late data within the
    watermark) has one partial row per batch in update mode; the algebraic
    merge makes the read exact — but note update-mode re-emits the FULL
    updated aggregate, so the merge takes the LAST emission per key
    (max batch id), not a sum of emissions.
    """
    batches = _committed_batches(tier_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {tier_dir}")
    dfs = []
    for d, bid in batches:
        dfs.append(
            spark.read.parquet(os.path.join(tier_dir, d)).withColumn(
                "_bid", F.lit(bid)
            )
        )
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    keys = ["bucket", *key_cols]
    # last emission per (bucket, keys) wins: update mode emits the full
    # refreshed aggregate each time a bucket changes.  All non-key data
    # columns ride the same max_by (incl. uu_sketch when present).
    data_cols = [c for c in allb.columns if c not in keys and c != "_bid"]
    return (
        allb.groupBy(*keys)
        .agg(
            F.max_by(F.struct(*data_cols), "_bid").alias("_s"),
        )
        .select(*keys, *[F.col(f"_s.{c}").alias(c) for c in data_cols])
    )


def run_incremental_sessions(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> None:
    """File-source stream → stateful sessionizer → idempotent per-batch
    dirs.  Same availableNow/checkpoint contract as the 1m tier: rerunning
    after new files land processes only the new files, with open-session
    state restored from the checkpoint (a session can SPAN the restart)."""
    from influxer_spark.streaming.stateful import sessionize_stream

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    _drain_to_tier(
        sessionize_stream(stream, key_col, ts_col, gap_seconds),
        out_dir,
        checkpoint_dir,
    )


def read_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge committed session partials: update mode re-emits the full
    running (n_sessions, n_events) per key, so the LAST emission per key
    (max batch id) is the current value — same merge rule as read_tier."""
    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [
        spark.read.parquet(os.path.join(out_dir, d)).withColumn("_bid", F.lit(bid))
        for d, bid in batches
    ]
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    data_cols = [c for c in allb.columns if c not in ("key", "_bid")]
    return (
        allb.groupBy("key")
        .agg(F.max_by(F.struct(*data_cols), "_bid").alias("_s"))
        .select("key", *[F.col(f"_s.{c}").alias(c) for c in data_cols])
    )


def run_incremental_heavy_hitters(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    item_col: str = "user_id",
    capacity: int = 256,
) -> None:
    """File-source stream → stateful Misra-Gries summaries → idempotent
    per-batch dirs (same availableNow/checkpoint contract as sessions;
    read back with ``read_sessions`` — last emission per key wins)."""
    from influxer_spark.streaming.stateful import heavy_hitters_stream

    stream = spark.readStream.schema(schema).parquet(input_dir)
    _drain_to_tier(
        heavy_hitters_stream(stream, key_col, item_col, capacity),
        out_dir,
        checkpoint_dir,
    )


def run_incremental_kmv(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    item_col: str = "user_id",
    tier: str = "1h",
    k: int = 64,
) -> None:
    """File-source stream → per-batch KMV distinct sketches → idempotent
    per-batch dirs (same availableNow/checkpoint contract as the tiers).

    No streaming state store at all: a KMV union is associative,
    commutative, AND idempotent (duplicate hashes collapse in the
    distinct), so each micro-batch sketches only its own rows and the
    merge happens at read time (:func:`read_kmv`) — the merged result is
    bit-identical to a batch sketch of all the data, however the rows were
    split across batches or restarts."""
    from influxer_spark.operators.kmv import kmv_sketch

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(out_dir, f"_batch={batch_id}")
        marker = os.path.join(out, "_COMMITTED")
        if os.path.exists(marker):  # stateless replay: nothing to re-run
            return
        kmv_sketch(batch_df, ts_col, keys, item_col, tier, k).write.mode(
            "overwrite"
        ).parquet(out)
        open(marker, "w").close()

    (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_kmv(
    spark: SparkSession,
    out_dir: str,
    key_cols: Sequence[str] = ("event_type",),
    tier: str = "1h",
    k: int = 64,
) -> DataFrame:
    """Merge committed per-batch KMV sketches into the exact sketch of the
    union (k-min of the k-mins; date_trunc at the SAME tier is the
    identity, so this reuses the cascade merge)."""
    from influxer_spark.operators.kmv import kmv_cascade

    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [spark.read.parquet(os.path.join(out_dir, d)) for d, _ in batches]
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    return kmv_cascade(allb, list(key_cols), tier, k)


def run_incremental_hdr(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    tier: str = "1h",
    sub_bits: int = 5,
) -> None:
    """File-source stream → per-batch log-linear quantile sketches →
    idempotent per-batch dirs (same availableNow/checkpoint contract as
    the KMV twin).

    Like KMV, there is NO streaming state store: an HDR sketch is a
    counter vector, so each micro-batch sketches only its own rows and
    the merge (SUM per bucket index) happens at read time.  Unlike KMV
    the merge is not idempotent under row replays — exactly-once comes
    from the ``_COMMITTED`` per-batch protocol, which skips already-
    committed batch dirs on restart."""
    from influxer_spark.operators.hdrsketch import hdr_rollup

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(out_dir, f"_batch={batch_id}")
        marker = os.path.join(out, "_COMMITTED")
        if os.path.exists(marker):  # stateless replay: nothing to re-run
            return
        hdr_rollup(batch_df, ts_col, keys, value_col, tier, sub_bits).write.mode(
            "overwrite"
        ).parquet(out)
        open(marker, "w").close()

    (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_hdr(
    spark: SparkSession,
    out_dir: str,
    key_cols: Sequence[str] = ("event_type",),
    tier: str = "1h",
) -> DataFrame:
    """Merge committed per-batch HDR sketches into the exact sketch of the
    union (counter-vector sum; re-bucketing at the SAME tier is the
    identity, so this reuses the cascade merge)."""
    from influxer_spark.operators.hdrsketch import hdr_cascade

    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [spark.read.parquet(os.path.join(out_dir, d)) for d, _ in batches]
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    return hdr_cascade(allb, list(key_cols), tier)


def run_incremental_sumsq(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    tier: str = "1h",
) -> None:
    """File-source stream → per-batch power-sum partials → idempotent
    per-batch dirs (same availableNow/checkpoint contract as the KMV/HDR
    twins).  No streaming state store: (cnt, min, max, Σc, Σc²) is a
    commutative monoid over exact integers, so each micro-batch
    summarizes only its own rows and the merge (plain SUM/MIN/MAX) happens
    at read time — bit-identical to a batch build however the rows were
    split, with none of the TWA twin's order sensitivity."""
    from influxer_spark.operators.rollup import rollup_with_sumsq

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(out_dir, f"_batch={batch_id}")
        marker = os.path.join(out, "_COMMITTED")
        if os.path.exists(marker):  # stateless replay: nothing to re-run
            return
        rollup_with_sumsq(batch_df, ts_col, keys, value_col, tier).write.mode(
            "overwrite"
        ).parquet(out)
        open(marker, "w").close()

    (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_sumsq(
    spark: SparkSession,
    out_dir: str,
    key_cols: Sequence[str] = ("event_type",),
    tier: str = "1h",
) -> DataFrame:
    """Merge committed per-batch power sums into the exact summary of the
    union (integer sum-of-sums; re-bucketing at the SAME tier is the
    identity, so this reuses the cascade merge)."""
    from influxer_spark.operators.rollup import cascade_with_sumsq

    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [spark.read.parquet(os.path.join(out_dir, d)) for d, _ in batches]
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    return cascade_with_sumsq(allb, list(key_cols), tier)


def run_incremental_ohlc(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    tier: str = "1h",
) -> None:
    """File-source stream → per-batch candlestick partials → idempotent
    per-batch dirs (availableNow/checkpoint contract of the sumsq/KMV/HDR
    twins).  No streaming state store: OHLC with ORIGINAL open/close
    timestamps is a commutative monoid (struct min/max over (t, v) pairs
    plus count sums), so each micro-batch summarizes only its own rows and
    the read-time merge is bit-identical to a batch build however the rows
    were split — late or out-of-order points land in whichever batch
    carries them and merge by true time, never by arrival order."""
    from influxer_spark.operators.rollup import rollup_ohlc

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(out_dir, f"_batch={batch_id}")
        marker = os.path.join(out, "_COMMITTED")
        if os.path.exists(marker):  # stateless replay: nothing to re-run
            return
        rollup_ohlc(
            batch_df.filter(F.col(value_col).isNotNull()),
            ts_col, keys, value_col, tier,
        ).write.mode("overwrite").parquet(out)
        open(marker, "w").close()

    (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_ohlc(
    spark: SparkSession,
    out_dir: str,
    key_cols: Sequence[str] = ("event_type",),
    tier: str = "1h",
) -> DataFrame:
    """Merge committed per-batch candlesticks into the exact summary of
    the union (re-bucketing at the SAME tier is the identity, so this
    reuses the cascade's struct-ordered merge)."""
    from influxer_spark.operators.rollup import cascade_ohlc

    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [spark.read.parquet(os.path.join(out_dir, d)) for d, _ in batches]
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    return cascade_ohlc(allb, list(key_cols), tier)


def run_incremental_twa(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    tier: str = "1h",
) -> None:
    """File-source stream → per-batch time-weighted-average summaries →
    idempotent per-batch dirs (same availableNow/checkpoint contract as
    the KMV/HDR twins).

    No streaming state store: a TWA summary ``(first_t, first_v, last_t,
    last_v, area)`` is a monoid under TIME-ORDERED merge
    (operators/timeweight.py), so each micro-batch summarizes only its
    own rows and the merge happens at read time (:func:`read_twa`).

    Unlike KMV/HDR the merge is order-sensitive, which imposes the live
    tailing contract explicitly: per series, each batch's rows must be a
    time slice disjoint from every other batch's (append-only in event
    time — exactly what a tailed line-protocol source delivers, and what
    the _COMMITTED replay protocol preserves).  Batches may split a
    bucket anywhere; the read-time merge bridges the LOCF segment across
    the split, so the merged summary is bit-identical to a batch summary
    of all the data.  Overlapping-time batches would interleave samples
    that the per-batch per-second dedup can no longer see — callers with
    out-of-order sources must slice upstream at second boundaries."""
    from influxer_spark.operators.timeweight import twa_rollup

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(out_dir, f"_batch={batch_id}")
        marker = os.path.join(out, "_COMMITTED")
        if os.path.exists(marker):  # stateless replay: nothing to re-run
            return
        twa_rollup(batch_df, ts_col, keys, value_col, tier).write.mode(
            "overwrite"
        ).parquet(out)
        open(marker, "w").close()

    (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_twa(
    spark: SparkSession,
    out_dir: str,
    key_cols: Sequence[str] = ("event_type",),
    tier: str = "1h",
) -> DataFrame:
    """Merge committed per-batch TWA summaries into the exact summary of
    the union.  Re-bucketing at the SAME tier is the identity, so this
    reuses the cascade's time-ordered monoid merge: adjacent batch
    summaries inside a bucket are bridged by the LOCF segment between
    them, exactly as if the data had never been split."""
    from influxer_spark.operators.timeweight import twa_cascade

    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [spark.read.parquet(os.path.join(out_dir, d)) for d, _ in batches]
    allb = dfs[0]
    for d in dfs[1:]:
        allb = allb.unionByName(d)
    return twa_cascade(allb, list(key_cols), tier)


def run_alert_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    warn: float,
    crit: float,
) -> None:
    """File-source stream → stateful threshold-alert edges → idempotent
    per-batch dirs.  Same availableNow/checkpoint contract as the 1m tier;
    the per-key ``last_level`` state is restored on resume, so an alert
    level persisting across the restart is NOT re-paged."""
    from influxer_spark.streaming.stateful import alert_stream

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    _drain_to_tier(
        alert_stream(stream, key_col, ts_col, value_col, warn, crit),
        out_dir,
        checkpoint_dir,
    )


def run_gap_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    ts_col: str,
    width_seconds: int,
) -> None:
    """File-source stream → stateful deadman gap detection → idempotent
    per-batch dirs.  Same availableNow/checkpoint contract as the alert
    stream; the per-key ``last_bucket`` state is restored on resume, so a
    gap spanning the restart is emitted exactly once, by the reviving
    batch.  Read back with :func:`read_alerts` — every missing bucket
    appears in exactly one committed batch, so the union is the gap log."""
    from influxer_spark.streaming.stateful import gap_stream

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    _drain_to_tier(
        gap_stream(stream, key_col, ts_col, width_seconds),
        out_dir,
        checkpoint_dir,
    )


def read_alerts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union committed alert-edge batches: every transition is emitted in
    exactly one micro-batch (state dedups repeats), so no last-emission
    merge is needed — the union IS the edge log."""
    batches = _committed_batches(out_dir)
    if not batches:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    dfs = [spark.read.parquet(os.path.join(out_dir, d)) for d, _ in batches]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def run_incremental_ivfpq(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Streaming ANN index maintenance: each micro-batch of newly arrived
    vectors is encoded with the STORED geometry (build the index first —
    possibly over an empty corpus, which persists only centroids/books)
    and appended via :func:`similarity.extend_ivfpq_index` — an
    affected-list partition rewrite and one catalog snapshot per batch,
    so the index history is a time-travelable snapshot chain.

    Idempotency: extend is an append, so replay protection is the same
    per-batch marker contract as the tier sinks (a marker lands after the
    snapshot commit; a crash BETWEEN commit and marker re-appends that
    one batch on restart — the documented at-least-once edge every
    foreachBatch sink here shares, closed on a real cluster by an Iceberg
    MERGE on vec_id).  After the final drain, a search over the index is
    bit-equal to a from-scratch build — the gate query proves it against
    the unpartitioned in-memory oracle."""
    from influxer_spark.operators.similarity import extend_ivfpq_index

    stream = spark.readStream.schema(schema).parquet(input_dir)
    markers = os.path.join(checkpoint_dir, "_ivfpq_batches")
    os.makedirs(markers, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, f"_batch={batch_id}")
        if os.path.exists(marker):
            return
        extend_ivfpq_index(spark, catalog, batch_df, id_col, vec_col)
        open(marker, "w").close()

    (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
