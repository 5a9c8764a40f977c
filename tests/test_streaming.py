"""Structured Streaming incremental 1m tier: exactness vs batch rollup,
checkpoint/resume (second run processes only new files), idempotent replay.

The resume test splits by TIME, not arbitrarily: the watermark persists in
the checkpoint, so a resumed stream drops rows older than
max(seen event time) − watermark — data must arrive in (roughly) time order,
exactly as it would from a live source.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from influxer_spark.operators import rollup as R
from influxer_spark.streaming import read_tier, run_incremental_rollup


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _dirs(tmp_path):
    d = {n: str(tmp_path / n) for n in ("input", "tier", "ckpt", "stage")}
    os.makedirs(d["input"], exist_ok=True)
    return d


def _add_file(df, input_dir: str, stage_dir: str, name: str) -> None:
    """Land df as one flat parquet file in the streaming source dir."""
    staging = os.path.join(stage_dir, name)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.copy(src, os.path.join(input_dir, f"{name}.parquet"))


def _assert_tier_matches_batch(merged, batch_src):
    want = (
        R.rollup(batch_src, "ts", ["event_type"], "value", "1m")
        .withColumn("sum_c", F.round(F.col("sum_v") * 100).cast("long"))
        .drop("sum_v")
    )
    got = merged.withColumn(
        "sum_c", F.round(F.col("sum_v") * 100).cast("long")
    ).drop("sum_v")
    n_want = want.count()
    assert got.count() == n_want
    joined = got.join(
        want, on=["bucket", "event_type", "cnt", "sum_c", "min_v", "max_v"],
        how="inner",
    )
    assert joined.count() == n_want, "streamed tier != batch rollup"


def test_incremental_rollup_resume(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    d = _dirs(tmp_path)

    first = ev.filter(F.col("ts") < F.lit(mid))
    _add_file(first, d["input"], d["stage"], "part1")
    run_incremental_rollup(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _assert_tier_matches_batch(read_tier(spark, d["tier"]), first)

    # later data arrives; rerun — checkpoint offsets mean ONLY the new file
    # is read, and its windows merge with persisted aggregation state
    _add_file(
        ev.filter(F.col("ts") >= F.lit(mid)), d["input"], d["stage"], "part2"
    )
    run_incremental_rollup(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _assert_tier_matches_batch(read_tier(spark, d["tier"]), ev)

    batches = [x for x in os.listdir(d["tier"]) if x.startswith("_batch=")]
    assert len(batches) >= 2


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    d = _dirs(tmp_path)
    _add_file(ev.limit(500), d["input"], d["stage"], "part1")
    run_incremental_rollup(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    n1 = read_tier(spark, d["tier"]).count()
    # simulate a foreachBatch replay of the same batch id: fresh checkpoint,
    # same tier dir — the committed batch dir is skipped, not double-written
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], str(tmp_path / "ckpt2")
    )
    n2 = read_tier(spark, d["tier"]).count()
    assert n1 == n2


def test_compact_tier_preserves_merge(spark, sf_dir, tmp_path):
    import os as _os

    from influxer_spark.streaming.incremental import compact_tier

    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    d = _dirs(tmp_path)
    _add_file(ev.filter(F.col("ts") < F.lit(mid)), d["input"], d["stage"], "p1")
    run_incremental_rollup(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _add_file(ev.filter(F.col("ts") >= F.lit(mid)), d["input"], d["stage"], "p2")
    run_incremental_rollup(spark, d["input"], ev.schema, d["tier"], d["ckpt"])

    before = {
        (r["bucket"], r["event_type"]): (r["cnt"], r["min_v"], r["max_v"])
        for r in read_tier(spark, d["tier"]).collect()
    }
    removed = compact_tier(spark, d["tier"])
    assert removed >= 1
    dirs = [x for x in _os.listdir(d["tier"]) if x.startswith("_batch=")]
    assert len(dirs) == 1
    after = {
        (r["bucket"], r["event_type"]): (r["cnt"], r["min_v"], r["max_v"])
        for r in read_tier(spark, d["tier"]).collect()
    }
    assert after == before
    # post-compaction the stream continues cleanly
    assert compact_tier(spark, d["tier"]) == 0


def test_streamed_sketch_matches_batch_estimate(spark, sf_dir, tmp_path):
    """distinct_col: the streamed tier's HLL sketches — merged across two
    micro-batch runs with a re-aggregated bucket — give the same 1h
    cascaded distinct estimates as a batch rollup_with_distinct over the
    full input."""
    ev = _events(spark, sf_dir).orderBy("ts")
    d = _dirs(tmp_path)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    _add_file(ev.filter(F.col("ts") <= cut), d["input"], d["stage"], "a")
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], d["ckpt"],
        distinct_col="user_id",
    )
    _add_file(ev.filter(F.col("ts") > cut), d["input"], d["stage"], "b")
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], d["ckpt"],
        distinct_col="user_id",
    )
    merged = read_tier(spark, d["tier"])
    got = {
        (r["bucket"], r["event_type"]): r["uu"]
        for r in R.with_distinct_count(
            R.cascade_with_distinct(merged, ["event_type"], "1h")
        ).collect()
    }
    want = {
        (r["bucket"], r["event_type"]): r["uu"]
        for r in R.with_distinct_count(
            R.cascade_with_distinct(
                R.rollup_with_distinct(
                    ev, "ts", ["event_type"], "value", "user_id"
                ),
                ["event_type"],
                "1h",
            )
        ).collect()
    }
    assert got == want
    _assert_tier_matches_batch(merged.drop("uu_sketch"), ev)


def test_streamed_hist_matches_batch_histogram(spark, sf_dir, tmp_path):
    """hist_bounds: the streamed tier's quantile-histogram cells — merged
    across two micro-batch runs with update-mode re-emission — cascade to
    the same 1h cell counts (and thus identical quantiles) as a batch
    rollup_with_histogram over the full input.  Integer cells, so equality
    is exact, not approximate."""
    bounds = R.log2_bounds(0.5, 512.0)
    ev = _events(spark, sf_dir).orderBy("ts")
    d = _dirs(tmp_path)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    _add_file(ev.filter(F.col("ts") <= cut), d["input"], d["stage"], "a")
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], d["ckpt"],
        hist_bounds=bounds,
    )
    _add_file(ev.filter(F.col("ts") > cut), d["input"], d["stage"], "b")
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], d["ckpt"],
        hist_bounds=bounds,
    )
    merged = read_tier(spark, d["tier"])
    ncells = len(bounds) + 1
    got = {
        (r["bucket"], r["event_type"]): (tuple(r["hist"]), r["p95"])
        for r in R.histogram_quantile(
            R.cascade_with_histogram(merged, ["event_type"], "1h", ncells),
            0.95, bounds, "p95",
        ).collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (tuple(r["hist"]), r["p95"])
        for r in R.histogram_quantile(
            R.cascade_with_histogram(
                R.rollup_with_histogram(
                    ev, "ts", ["event_type"], "value", bounds
                ),
                ["event_type"], "1h", ncells,
            ),
            0.95, bounds, "p95",
        ).collect()
    }
    assert got == want
    _assert_tier_matches_batch(merged.drop("hist"), ev)


def test_lineprotocol_stream_matches_batch(spark, sf_dir, tmp_path):
    """Live line-protocol ingestion (the reference's own wire format,
    GenericFile.cs:303): two file-drops drained with checkpoint/resume
    produce a 1m tier identical to the batch rollup of the same events."""
    from influxer_spark.sinks import write_line_protocol
    from influxer_spark.streaming import run_incremental_lineprotocol_rollup

    ev = _events(spark, sf_dir).orderBy("ts")
    d = _dirs(tmp_path)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2

    def land(df, name):
        staging = os.path.join(d["stage"], name)
        write_line_protocol(
            df, staging, measurement="events",
            tags=["event_type"], fields=["value"], ts_col="ts",
        )
        for i, src in enumerate(glob.glob(os.path.join(staging, "part-*"))):
            shutil.copy(src, os.path.join(d["input"], f"{name}_{i}.txt"))

    land(ev.filter(F.col("ts") <= cut), "a")
    run_incremental_lineprotocol_rollup(
        spark, d["input"], d["tier"], d["ckpt"], "events", "value",
        key_tags=("event_type",),
    )
    land(ev.filter(F.col("ts") > cut), "b")
    run_incremental_lineprotocol_rollup(
        spark, d["input"], d["tier"], d["ckpt"], "events", "value",
        key_tags=("event_type",),
    )
    merged = read_tier(spark, d["tier"])
    # value rows whose event_type tag is NULL don't exist in line protocol;
    # the events table has none, so the tiers must match the batch exactly
    _assert_tier_matches_batch(merged, ev)


def test_streamed_kmv_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Per-batch KMV sketches merged at read time are BIT-identical to a
    batch sketch of all the data, across a stop/resume restart (k-min
    union is associative + idempotent; no streaming state store)."""
    from influxer_spark.operators import kmv as KMV
    from influxer_spark.streaming import read_kmv, run_incremental_kmv

    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    d = _dirs(tmp_path)
    _add_file(ev.filter(F.col("ts") <= cut), d["input"], d["stage"], "a")
    run_incremental_kmv(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _add_file(ev.filter(F.col("ts") > cut), d["input"], d["stage"], "b")
    run_incremental_kmv(spark, d["input"], ev.schema, d["tier"], d["ckpt"])

    got = {
        (r["bucket"], r["event_type"]): tuple(r["hashes"])
        for r in read_kmv(spark, d["tier"], ["event_type"], "1h").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): tuple(r["hashes"])
        for r in KMV.kmv_sketch(
            ev, "ts", ["event_type"], "user_id", "1h"
        ).collect()
    }
    assert got == want


def test_streamed_twa_matches_batch_summary(spark, sf_dir, tmp_path):
    """Per-batch TWA summaries merged in time order at read time are
    BIT-identical to a batch summary of all the data, across a stop/resume
    restart — including the LOCF bridge segment across the batch split.
    The cut is second-aligned (TWA's per-second max-dedup must see every
    sample of a second in ONE batch)."""
    from influxer_spark.operators import timeweight as TW
    from influxer_spark.streaming import read_twa, run_incremental_twa

    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut_s = int((lo + (hi - lo) / 2).timestamp())
    t = F.unix_timestamp(F.col("ts")).cast("long")
    d = _dirs(tmp_path)
    _add_file(ev.filter(t <= cut_s), d["input"], d["stage"], "a")
    run_incremental_twa(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _add_file(ev.filter(t > cut_s), d["input"], d["stage"], "b")
    run_incremental_twa(spark, d["input"], ev.schema, d["tier"], d["ckpt"])

    cols = ["first_t", "first_v", "last_t", "last_v", "area"]
    got = {
        (r["bucket"], r["event_type"]): tuple(r[c] for c in cols)
        for r in read_twa(spark, d["tier"], ["event_type"], "1h").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): tuple(r[c] for c in cols)
        for r in TW.twa_rollup(ev, "ts", ["event_type"], "value", "1h").collect()
    }
    assert got == want


def test_streamed_hdr_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Per-batch log-linear quantile sketches merged at read time are
    identical to a batch sketch of all the data, across a stop/resume
    restart (counter-vector sum; exactly-once via _COMMITTED dirs)."""
    from influxer_spark.operators import hdrsketch as H
    from influxer_spark.streaming import read_hdr, run_incremental_hdr

    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    d = _dirs(tmp_path)
    _add_file(ev.filter(F.col("ts") <= cut), d["input"], d["stage"], "a")
    run_incremental_hdr(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _add_file(ev.filter(F.col("ts") > cut), d["input"], d["stage"], "b")
    run_incremental_hdr(spark, d["input"], ev.schema, d["tier"], d["ckpt"])

    got = {
        (r["bucket"], r["event_type"], r["idx"]): r["cnt"]
        for r in read_hdr(spark, d["tier"], ["event_type"], "1h").collect()
    }
    want = {
        (r["bucket"], r["event_type"], r["idx"]): r["cnt"]
        for r in H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h").collect()
    }
    assert got == want


def test_streamed_sumsq_matches_batch_tier(spark, sf_dir, tmp_path):
    """Per-batch power-sum partials merged at read time are BIT-identical
    to a batch build of all the data, across a stop/resume restart
    (integer sums commute — no order sensitivity)."""
    from influxer_spark.operators import rollup as R
    from influxer_spark.streaming import read_sumsq, run_incremental_sumsq

    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    d = _dirs(tmp_path)
    _add_file(ev.filter(F.col("ts") <= cut), d["input"], d["stage"], "a")
    run_incremental_sumsq(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _add_file(ev.filter(F.col("ts") > cut), d["input"], d["stage"], "b")
    run_incremental_sumsq(spark, d["input"], ev.schema, d["tier"], d["ckpt"])

    cols = ["cnt", "min_v", "max_v", "s1", "s2"]
    got = {
        (r["bucket"], r["event_type"]): tuple(r[c] for c in cols)
        for r in read_sumsq(spark, d["tier"], ["event_type"], "1h").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): tuple(r[c] for c in cols)
        for r in R.rollup_with_sumsq(
            ev, "ts", ["event_type"], "value", "1h"
        ).collect()
    }
    assert got == want


def test_streamed_ohlc_matches_batch_tier(spark, sf_dir, tmp_path):
    """Per-batch candlestick partials merged at read time are BIT-identical
    to a batch build of all the data, across a stop/resume restart —
    open/close carry original timestamps, so the struct-ordered monoid
    commutes regardless of how the rows were split into batches."""
    from influxer_spark.operators import rollup as R
    from influxer_spark.streaming import read_ohlc, run_incremental_ohlc

    ev = _events(spark, sf_dir)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    d = _dirs(tmp_path)
    _add_file(ev.filter(F.col("ts") <= cut), d["input"], d["stage"], "a")
    run_incremental_ohlc(spark, d["input"], ev.schema, d["tier"], d["ckpt"])
    _add_file(ev.filter(F.col("ts") > cut), d["input"], d["stage"], "b")
    run_incremental_ohlc(spark, d["input"], ev.schema, d["tier"], d["ckpt"])

    cols = ["open_t", "open_v", "high_v", "low_v", "close_t", "close_v",
            "cnt"]
    got = {
        (r["bucket"], r["event_type"]): tuple(r[c] for c in cols)
        for r in read_ohlc(spark, d["tier"], ["event_type"], "1h").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): tuple(r[c] for c in cols)
        for r in R.rollup_ohlc(
            ev.filter(F.col("value").isNotNull()),
            "ts", ["event_type"], "value", "1h",
        ).collect()
    }
    assert got == want
