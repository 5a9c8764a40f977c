"""applyInPandasWithState: per-key running totals survive a restart —
checkpointed state continues across availableNow runs."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from influxer_spark.streaming.stateful import running_totals_stream


def _add_file(df, input_dir: str, stage_dir: str, name: str) -> None:
    staging = os.path.join(stage_dir, name)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.copy(src, os.path.join(input_dir, f"{name}.parquet"))


def _drain(spark, input_dir, schema, out_dir, ckpt):
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    totals = running_totals_stream(stream, "event_type", "value")

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )

    (
        totals.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _latest_totals(spark, out_dir):
    latest = {}
    for b in sorted(
        os.listdir(out_dir), key=lambda s: int(s[1:])
    ):
        for r in spark.read.parquet(os.path.join(out_dir, b)).collect():
            latest[r["key"]] = r["cnt"]
    return latest


def test_running_totals_resume(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    d = {n: str(tmp_path / n) for n in ("input", "stage", "out", "ckpt")}
    os.makedirs(d["input"], exist_ok=True)
    os.makedirs(d["out"], exist_ok=True)

    first = ev.filter(F.col("ts") < F.lit(mid))
    _add_file(first, d["input"], d["stage"], "p1")
    _drain(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    got1 = _latest_totals(spark, d["out"])
    want1 = {
        r["event_type"]: r["n"]
        for r in first.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got1 == want1

    # second drop: state continues from the checkpoint (cumulative totals)
    _add_file(ev.filter(F.col("ts") >= F.lit(mid)), d["input"], d["stage"], "p2")
    _drain(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    got2 = _latest_totals(spark, d["out"])
    want2 = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got2 == want2


def _drain_dedup(spark, input_dir, schema, out_dir, ckpt):
    from influxer_spark.streaming.stateful import dedup_stream

    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn(
        "fp", F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    )
    out = dedup_stream(stream, "doc_id", "fp")

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )

    (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_dedup_stream_first_seen_across_restarts(spark, tmp_path):
    d = {n: str(tmp_path / n) for n in ("input", "stage", "out", "ckpt")}
    os.makedirs(d["input"], exist_ok=True)
    os.makedirs(d["out"], exist_ok=True)
    schema = "doc_id long, text string"

    p1 = spark.createDataFrame(
        [(7, "alpha beta"), (3, "ALPHA   beta"), (5, "gamma")], schema
    )
    _add_file(p1, d["input"], d["stage"], "p1")
    _drain_dedup(spark, d["input"], schema, d["out"], d["ckpt"])
    rows1 = spark.read.parquet(os.path.join(d["out"], "b0")).collect()
    kept1 = {r["id"] for r in rows1 if r["id"] is not None}
    assert kept1 == {"3", "5"}  # normalized dup of alpha-beta: min id wins
    dups1 = {r["fingerprint"]: r["n_dups"] for r in rows1}
    assert sorted(dups1.values()) == [0, 1]

    # second drop AFTER a full stop: checkpointed seen-set continues
    p2 = spark.createDataFrame(
        [(9, "alpha beta"), (1, "delta")], schema
    )
    _add_file(p2, d["input"], d["stage"], "p2")
    _drain_dedup(spark, d["input"], schema, d["out"], d["ckpt"])
    batches = sorted(os.listdir(d["out"]), key=lambda s: int(s[1:]))
    rows2 = spark.read.parquet(os.path.join(d["out"], batches[-1])).collect()
    kept2 = {r["id"] for r in rows2 if r["id"] is not None}
    assert kept2 == {"1"}  # doc 9 is a dup of the fingerprint seen in run 1
    alpha_fp = [r["fingerprint"] for r in rows1 if r["n_dups"] == 1][0]
    dups2 = {r["fingerprint"]: r["n_dups"] for r in rows2}
    assert dups2[alpha_fp] == 2  # cumulative across the restart


def test_sessionize_stream_session_spans_restart(spark, tmp_path):
    """A session whose events straddle the stop/resume boundary must MERGE
    (state restored from the checkpoint), and a post-restart gap must still
    open a new session."""
    import datetime as dt

    from influxer_spark.streaming import read_sessions, run_incremental_sessions

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda s: t0 + dt.timedelta(seconds=s)
    # user 1: events at 0s, 600s | restart | 1200s (same session: gaps 10min)
    #         then 60min later → second session
    # user 2: single event before the restart only
    file_a = [(1, mk(0)), (1, mk(600)), (2, mk(0))]
    file_b = [(1, mk(1200)), (1, mk(1200 + 4800))]
    d = {n: str(tmp_path / n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])

    def land(rows, name):
        df = spark.createDataFrame(rows, ["user_id", "ts"]).coalesce(1)
        df.write.mode("overwrite").parquet(os.path.join(d["stage"], name))
        src = glob.glob(os.path.join(d["stage"], name, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(d["input"], f"{name}.parquet"))
        return df

    schema = land(file_a, "a").schema
    run_incremental_sessions(spark, d["input"], schema, d["out"], d["ckpt"],
                             key_col="user_id", ts_col="ts")
    land(file_b, "b")
    run_incremental_sessions(spark, d["input"], schema, d["out"], d["ckpt"],
                             key_col="user_id", ts_col="ts")

    got = {r["key"]: (r["n_sessions"], r["n_events"])
           for r in read_sessions(spark, d["out"]).collect()}
    assert got == {1: (2, 4), 2: (1, 1)}


def test_heavy_hitters_stream_trim_across_restart(spark, tmp_path):
    """MG state with a trimming capacity survives a restart: counts stay
    lower bounds, true ≤ cnt + err, and the dominant item is retained.
    (The exact-capacity regime is value-oracled in the driver gate via
    stream_heavy_hitters_replay.)"""
    from influxer_spark.streaming import (
        read_sessions,
        run_incremental_heavy_hitters,
    )

    d = {n: str(tmp_path / n) for n in ("input", "stage", "out", "ckpt")}
    os.makedirs(d["input"])
    # 10 items, zipf-ish; item 1 dominates
    rows1 = [("k", 1)] * 50 + [("k", i) for i in range(2, 7) for _ in range(6)]
    rows2 = [("k", 1)] * 40 + [("k", i) for i in range(5, 11) for _ in range(5)]
    df1 = spark.createDataFrame(rows1, ["event_type", "user_id"])
    df2 = spark.createDataFrame(rows2, ["event_type", "user_id"])
    _add_file(df1, d["input"], d["stage"], "a")
    run_incremental_heavy_hitters(
        spark, d["input"], df1.schema, d["out"], d["ckpt"], capacity=4
    )
    _add_file(df2, d["input"], d["stage"], "b")
    run_incremental_heavy_hitters(
        spark, d["input"], df1.schema, d["out"], d["ckpt"], capacity=4
    )
    final = read_sessions(spark, d["out"]).collect()[0]
    got = dict(zip(final["items"], final["cnts"]))
    err = final["err"]
    truth = {}
    for _, i in rows1 + rows2:
        truth[i] = truth.get(i, 0) + 1
    assert len(got) <= 4 and err > 0
    for item, cnt in got.items():
        assert cnt <= truth[item] <= cnt + err, (item, cnt, truth[item], err)
    top = max(got, key=got.get)
    assert top == 1 and got[1] + err >= truth[1]


def test_alert_stream_stop_resume_dedups_levels(spark, tmp_path):
    """A level persisting across the restart is NOT re-emitted (the pager
    contract); a genuine edge after resume is.  Matches the batch
    alert_states output exactly."""
    import datetime as dt

    from influxer_spark.operators.influxql import alert_states
    from influxer_spark.streaming import read_alerts, run_alert_stream

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 120.0, 130.0, 125.0, 160.0, 90.0]  # WARN spans the restart
    rows = [("s", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])

    d = {n: str(tmp_path / n) for n in ("input", "out", "ckpt", "stage")}
    import glob
    import os
    import shutil as _sh

    os.makedirs(d["input"])
    first = df.filter(F.col("v") != 160.0).filter(F.col("ts") < t0 + dt.timedelta(hours=4))
    second = df.filter(F.col("ts") >= t0 + dt.timedelta(hours=4))
    for name, part in (("a", first), ("b", second)):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
    _sh.copy(glob.glob(os.path.join(d["stage"], "a", "part-*.parquet"))[0],
             os.path.join(d["input"], "a.parquet"))
    args = (d["input"], df.schema, d["out"], d["ckpt"], "k", "ts", "v", 100.0, 150.0)
    run_alert_stream(spark, *args)
    _sh.copy(glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
             os.path.join(d["input"], "b.parquet"))
    run_alert_stream(spark, *args)

    got = sorted(
        (r["time"], r["level"], r["prev_level"])
        for r in read_alerts(spark, d["out"]).collect()
    )
    want = sorted(
        (r["ts"], r["level"], r["prev_level"])
        for r in alert_states(df, ["k"], "ts", "v", 100.0, 150.0).collect()
    )
    assert got == want
    # the WARN at hour 3 (125.0, same level, post-restart batch boundary
    # inside file a) and the WARN continuing into file b were deduped:
    levels = [lv for _, lv, _ in got]
    assert levels == ["OK", "WARN", "CRIT", "OK"]


def test_gap_stream_gap_spanning_restart_emitted_once(spark, tmp_path):
    """A series silent across the stop/resume boundary must page exactly
    once, from the reviving batch: hours 0,1 arrive before the restart,
    hour 5 after → gaps {2,3,4} emitted by run 2 only; a second key dead
    only INSIDE run 1 pages from run 1; no duplicates anywhere."""
    import datetime as dt

    from influxer_spark.streaming import read_alerts, run_gap_stream

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    first = [("a", t(0)), ("a", t(1)), ("b", t(0)), ("b", t(3))]
    second = [("a", t(5)), ("b", t(4))]
    d = {n: str(tmp_path / n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    df1 = spark.createDataFrame(first, ["event_type", "ts"])
    df2 = spark.createDataFrame(second, ["event_type", "ts"])
    _add_file(df1, d["input"], d["stage"], "a")
    run_gap_stream(
        spark, d["input"], df1.schema, d["out"], d["ckpt"],
        "event_type", "ts", 3600,
    )
    mid = sorted(
        (r["key"], r["bucket"].hour)
        for r in read_alerts(spark, d["out"]).collect()
    )
    assert mid == [("b", 1), ("b", 2)]  # b's interior gap pages in run 1
    _add_file(df2, d["input"], d["stage"], "b")
    run_gap_stream(
        spark, d["input"], df2.schema, d["out"], d["ckpt"],
        "event_type", "ts", 3600,
    )
    got = sorted(
        (r["key"], r["bucket"].hour)
        for r in read_alerts(spark, d["out"]).collect()
    )
    assert got == [("a", 2), ("a", 3), ("a", 4), ("b", 1), ("b", 2)]
    assert all(r["alert"] == "deadman" for r in read_alerts(spark, d["out"]).collect())
