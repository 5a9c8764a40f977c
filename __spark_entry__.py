"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full 1m→1h→1d rollup cascade on sf0.001 events.
``queries()``   — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (same column names).

Float-output discipline: aggregated doubles are quantized to integer cents
(``round(sum*100)`` — the fp error of a sum is orders of magnitude below half
a cent) and then re-derived by IEEE division of identical operands, so Spark
and the DuckDB oracle produce bit-identical doubles with no decimal-boundary
rounding flips.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from influxer_spark.influxql_queries import (  # noqa: E402
    _DEADMAN_SQL,
    influxql_oracle_sql,
    influxql_queries,
)
from influxer_spark.ingest_queries import (  # noqa: E402
    ingest_oracle_sql,
    ingest_queries,
)
from influxer_spark.operators import rollup as R  # noqa: E402
from influxer_spark.operators.gapfill import gapfill_interpolate  # noqa: E402
from influxer_spark.training_queries import (  # noqa: E402
    training_oracle_sql,
    training_queries,
)
from influxer_spark.webclean_queries import (  # noqa: E402
    webclean_oracle_sql,
    webclean_queries,
)


def _q2(col):  # quantize a double to integer cents (deterministic across engines)
    return F.round(col * 100, 0).cast("long")


def _rollup_out(rolled):
    """Emit (cnt, sum_v, min_v, max_v, avg_v) with bit-deterministic doubles.

    Sums are quantized to integer cents (fp error of the sum is orders of
    magnitude below half a cent), then sum/avg are derived by IEEE division of
    identical operands — so Spark and any ANSI oracle produce the same bits,
    with no decimal-boundary rounding flips.
    """
    cents = _q2(F.col("sum_v"))
    return rolled.select(
        "bucket",
        "event_type",
        "cnt",
        (cents / 100.0).alias("sum_v"),
        "min_v",
        "max_v",
        (cents / (F.col("cnt") * 100.0)).alias("avg_v"),
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: raw events → 1m → 1h → 1d cascade, return the 1d tier."""
    sf_dir = "/root/testdata/sf0.001"
    events = _t(spark, sf_dir, "events")
    tiers = R.rollup_cascade_all(events, "ts", ["event_type"], "value")
    return _rollup_out(tiers["1d"])


# ---------------------------------------------------------------------------
# queries — time-series core (events table)
# ---------------------------------------------------------------------------

def _q_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    r = R.rollup(ev, "ts", ["event_type"], "value", "1m")
    return _rollup_out(r)


def _q_rollup_1h_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup(ev, "ts", ["event_type"], "value", "1m")
    t1h = R.cascade(t1m, ["event_type"], "1h")
    return _rollup_out(t1h)


def _q_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick tier VALUE-oracled (rollup.rollup_ohlc): open/close
    are argmin/argmax by time with a value tie-break (one total order both
    engines can replay), high/low plain extremes — all existing values, no
    arithmetic, so every column hash-matches bit-for-bit."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    import influxer_spark.operators.rollup as R

    return R.rollup_ohlc(ev, "ts", ["event_type"], "value", "1h")


def _q_ohlc_1d_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC cascade exactness VALUE-oracled: raw→1m candlesticks cascaded
    to 1d (rollup.cascade_ohlc — coarse open/close taken from the
    earliest/latest finer bucket) must equal the direct raw→1d
    computation, which is what the oracle replays."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    import influxer_spark.operators.rollup as R

    t1m = R.rollup_ohlc(ev, "ts", ["event_type"], "value", "1m")
    return R.cascade_ohlc(t1m, ["event_type"], "1d")


def _ohlc_oracle(unit: str) -> str:
    return f"""
WITH x AS (
  SELECT event_type, date_trunc('{unit}', ts) AS bucket, ts, value
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT event_type, bucket, ts, value,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, value) AS rn_a,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, value DESC) AS rn_z
  FROM x
)
SELECT event_type, bucket,
  max(CASE WHEN rn_a = 1 THEN ts END) AS open_t,
  max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
  max(value) AS high_v, min(value) AS low_v,
  max(CASE WHEN rn_z = 1 THEN ts END) AS close_t,
  max(CASE WHEN rn_z = 1 THEN value END) AS close_v,
  count(*) AS cnt
FROM r GROUP BY 1, 2
"""


def _q_rollup_1d_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tiers = R.rollup_cascade_all(ev, "ts", ["event_type"], "value")
    return _rollup_out(tiers["1d"])


def _q_rollup_1m_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    r = R.salted_rollup(ev, "ts", ["event_type"], "value", "1m", salt_buckets=8)
    return _rollup_out(r)


def _q_gorilla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla codec VALUE-oracled end-to-end (upgrades A6 from
    pytest-only): encode each event_type's 1m mean series to XOR +
    delta-of-delta blobs, decode back, return the points.  The oracle is
    the plain SQL rollup — a hash match proves the round trip is lossless
    bit-for-bit on real data."""
    from influxer_spark.operators.gorilla import (
        decode_series_df,
        encode_series_df,
    )

    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup(ev, "ts", ["event_type"], "value", "1m").withColumn(
        "avg_v", _q2(F.col("sum_v")) / (F.col("cnt") * 100.0)
    )
    enc = encode_series_df(t1m, ["event_type"], "bucket", "avg_v")
    dec = decode_series_df(enc)
    return dec.select(
        F.element_at("series_keys", 1).alias("event_type"),
        F.col("ts").cast("timestamp").alias("bucket"),
        F.col("value").alias("avg_v"),
    )


def _q_simple8b_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer codec (operators/intcodec.py: zigzag deltas + simple8b +
    RLE) VALUE-oracled end-to-end, same pattern as gorilla_roundtrip_1m:
    encode each event_type's 1m COUNT series, decode back, hash-match
    the plain SQL count rollup — proof the integer path is lossless on
    real tier data, not just on the property-test domain."""
    from influxer_spark.operators.intcodec import (
        decode_int_series_df,
        encode_int_series_df,
    )

    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup(ev, "ts", ["event_type"], "value", "1m")
    enc = encode_int_series_df(t1m, ["event_type"], "bucket", "cnt")
    dec = decode_int_series_df(enc)
    return dec.select(
        F.element_at("series_keys", 1).alias("event_type"),
        F.col("ts").cast("timestamp").alias("bucket"),
        F.col("value").alias("cnt"),
    )


def _q_stream_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming 1m tier VALUE-oracled (upgrades §2.7 from
    pytest-only): land events as two time-ordered files, drain them with
    TWO availableNow runs against one checkpoint (a real stop/resume), and
    merge the committed micro-batch partials.  The oracle is the plain
    batch rollup SQL — a hash match proves watermarked streaming partials
    + last-emission merge reproduce the batch tier exactly.  Sums are
    quantized to cents (streaming aggregation order differs)."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.streaming import read_tier, run_incremental_rollup

    ev = _t(spark, sf_dir, "events").orderBy("ts")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "tier", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        if name == "a":  # second file lands between the two runs
            shutil.copy(src, os.path.join(d["input"], "a.parquet"))
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], d["ckpt"]
    )
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_rollup(
        spark, d["input"], ev.schema, d["tier"], d["ckpt"]
    )
    merged = read_tier(spark, d["tier"]).select(
        "bucket", "event_type", "cnt",
        (_q2(F.col("sum_v")) / 100.0).alias("sum_v"),
        "min_v", "max_v",
    )
    # materialize before removing the scratch dirs (the merged frame reads
    # them lazily); the tier is small at gate scale, and without the
    # cleanup every gate run leaks two parquet copies of events to /tmp
    rows = merged.collect()
    out = spark.createDataFrame(rows, merged.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization VALUE-oracled via replay (the
    applyInPandasWithState analogue of stream_rollup_replay_1m): land events
    as two time-ordered files, drain with TWO availableNow runs against one
    checkpoint — open-session state is restored from the checkpoint, so
    sessions spanning the stop/resume boundary must merge, not split — and
    take the last emission per user.  The oracle is the plain batch
    sessionizer SQL: a hash match proves the streaming session state machine
    reproduces the batch window exactly across a restart."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.streaming import read_sessions, run_incremental_sessions

    ev = _t(spark, sf_dir, "events").orderBy("ts")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_sess_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        src = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        if name == "a":  # second file lands between the two runs
            shutil.copy(src, os.path.join(d["input"], "a.parquet"))
    run_incremental_sessions(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_sessions(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    merged = read_sessions(spark, d["out"]).select(
        F.col("key").alias("user_id"), "n_sessions", "n_events"
    )
    rows = merged.collect()  # materialize before removing the scratch dirs
    out = spark.createDataFrame(rows, merged.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _q_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Misra-Gries summaries VALUE-oracled via stop/resume
    replay: land events as two time-ordered files, drain with TWO
    availableNow runs against one checkpoint (MG state restored between
    them), take the LAST emission per event_type and read its top-5.  At
    capacity 256 ≥ the 150-user cardinality the summary is exact, so the
    oracle is the plain batch top-5 SQL — a hash match proves the resumed
    stream reproduces exact batch counts across the restart."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.streaming import (
        read_sessions,
        run_incremental_heavy_hitters,
    )

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_hh_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_incremental_heavy_hitters(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_heavy_hitters(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    merged = read_sessions(spark, d["out"])
    from pyspark.sql import Window

    exploded = merged.select(
        F.col("key").alias("event_type"),
        F.explode(F.arrays_zip("items", "cnts")).alias("z"),
    ).select(
        "event_type",
        F.col("z.items").alias("item"),
        F.col("z.cnts").alias("cnt"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("item"))
    top = (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("event_type", "item", "cnt", "rank")
    )
    rows = top.collect()  # materialize before removing the scratch dirs
    out = spark.createDataFrame(rows, top.schema)
    shutil.rmtree(root, ignore_errors=True)
    return out


_STREAM_HH_ORACLE = """
WITH c AS (
  SELECT event_type, user_id AS item, count(*) AS cnt
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY cnt DESC, item ASC) AS rank
  FROM c
)
SELECT event_type, item, cnt, rank FROM r WHERE rank <= 5
"""


def _q_sketch_distinct_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user counts served from tiers: 1m sketches HLL-union up the
    cascade to 1d (rollup.py rollup_with_distinct/cascade_with_distinct).
    Rows-only contract entry — DataSketches HLL internals have no DuckDB
    equivalent; the strong checks are in tests/test_rollup_sketch.py
    (cascaded estimate ≡ direct coarse rollup, ≤5%% error vs exact)."""
    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup_with_distinct(
        ev, "ts", ["event_type"], "value", "user_id", "1m"
    )
    t1d = R.cascade_with_distinct(
        R.cascade_with_distinct(t1m, ["event_type"], "1h"), ["event_type"], "1d"
    )
    return R.with_distinct_count(t1d).select(
        "bucket", "event_type", "cnt", F.col("uu").cast("long").alias("uu")
    )


# explicit half-octave bounds covering the events.value range (0, 512];
# every bound is an exact binary double so the identical literal list
# reproduces bit-for-bit in the DuckDB oracle
_HIST_BOUNDS = R.log2_bounds(0.5, 512.0)


def _q_hist_quantile_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles served from tiers: 1m bucket-count histograms cascade
    (element-wise integer sum — exact) to 1h, then p50/p95/p99 by rank
    interpolation (rollup.py rollup_with_histogram/histogram_quantile).
    The oracle rebuilds the same histogram directly at 1h and replays the
    identical interpolation chain — a hash match proves BOTH the cascade
    exactness and the quantile arithmetic."""
    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup_with_histogram(
        ev, "ts", ["event_type"], "value", _HIST_BOUNDS, "1m"
    )
    t1h = R.cascade_with_histogram(
        t1m, ["event_type"], "1h", len(_HIST_BOUNDS) + 1
    )
    out = t1h
    for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        out = R.histogram_quantile(out, q, _HIST_BOUNDS, name)
    return out.select("bucket", "event_type", "cnt", "p50", "p95", "p99")


def _hist_quantile_oracle() -> str:
    """DuckDB replica of _q_hist_quantile_1h: same bounds as literals, same
    CASE-chain bucket index, same lowest-first cumulative interpolation with
    the identical IEEE operand order."""
    bounds = _HIST_BOUNDS
    n = len(bounds)
    d = lambda x: f"CAST('{x!r}' AS DOUBLE)"  # noqa: E731
    idx = " + ".join(
        f"(CASE WHEN value > {d(b)} THEN 1 ELSE 0 END)" for b in bounds
    )
    cells = ", ".join(
        f"sum(CASE WHEN hidx = {i} THEN 1 ELSE 0 END) AS h{i}"
        for i in range(n + 1)
    )

    def qcase(q: float) -> str:
        rank = f"({d(q)} * CAST(cnt AS DOUBLE))"
        lowers = [0.0] + list(bounds[:-1])
        whens, cum_terms = [], []
        for i in range(n + 1):
            cumb = " + ".join(cum_terms) if cum_terms else "0"
            cum_terms.append(f"h{i}")
            cum = " + ".join(cum_terms)
            if i < n:
                lo, hi = lowers[i], bounds[i]
                est = (
                    f"({d(lo)} + ({d(hi)} - {d(lo)}) * "
                    f"(({rank} - CAST({cumb} AS DOUBLE)) "
                    f"/ CAST(h{i} AS DOUBLE)))"
                )
            else:
                est = d(bounds[-1])
            whens.append(f"WHEN {rank} <= CAST({cum} AS DOUBLE) THEN {est}")
        return "CASE " + " ".join(whens) + " END"

    return (
        "WITH h AS ("
        "  SELECT date_trunc('hour', ts) AS bucket, event_type, value,"
        f"    CASE WHEN value IS NOT NULL THEN {idx} END AS hidx"
        "  FROM events), "
        "g AS ("
        "  SELECT bucket, event_type, count(value) AS cnt, "
        f"   {cells}"
        "  FROM h GROUP BY 1, 2) "
        f"SELECT bucket, event_type, cnt, {qcase(0.5)} AS p50,"
        f" {qcase(0.95)} AS p95, {qcase(0.99)} AS p99 FROM g"
    )


def _q_gapfill_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t1h = R.rollup(ev, "ts", ["event_type"], "value", "1h").withColumn(
        "avg_v", _q2(F.col("sum_v")) / (F.col("cnt") * 100.0)
    )
    filled = gapfill_interpolate(
        t1h.select("event_type", "bucket", "avg_v"),
        ["event_type"], "avg_v", "1h",
    )
    return filled.select("event_type", "bucket", "avg_v", "filled")


def _q_rollup_5m_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary bucket width (InfluxDB GROUP BY time(5m) parity)."""
    ev = _t(spark, sf_dir, "events")
    r = R.rollup_width(ev, "ts", ["event_type"], "value", 300)
    return _rollup_out(r)


def _q_tier_refresh_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalidation-driven tier refresh VALUE-oracled (operators/refresh.py):
    build a tier catalog over a biased SUBSET of events (the last day missing
    entirely, a deterministic third of a mid day missing), then 'the
    re-crawl lands' — refresh against the full table.  Count-based
    invalidation must flag exactly the changed days, region-recompute them,
    and the refreshed 1h tier must hash-match the plain rollup SQL over ALL
    events — proving late appends + new days converge to the from-scratch
    answer through the catalog's atomic snapshot commits."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators.refresh import (
        build_point_tiers,
        refresh_point_tiers,
        source_day_counts,
    )

    ev = _t(spark, sf_dir, "events")
    days = sorted(source_day_counts(ev, "ts"))
    last, mid = days[-1], days[len(days) // 2]
    day = F.date_format("ts", "yyyy-MM-dd")
    initial = ev.filter(
        (day != last)
        & ~((day == mid) & (F.pmod(F.crc32(F.col("ts").cast("string")), F.lit(3)) == 0))
    )
    root = tempfile.mkdtemp(prefix="refresh_gate_")
    try:
        cat = TableCatalog(root)
        build_point_tiers(spark, cat, initial, "ts", ["event_type"], "value")
        res = refresh_point_tiers(spark, cat, ev, "ts", ["event_type"], "value")
        assert res["recomputed"] == sorted([mid, last]), res
        out = _rollup_out(cat.read(spark, "rollup_1h"))
        # materialize before the scratch catalog disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_concurrent_wave_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-concurrency proof (catalog._commit_apply + per-table lock):
    8 threads each commit a different day's 1m-rollup partition of ONE
    catalog table simultaneously — lock serializes the pointer flips,
    conflict retry rebases and reapplies.  The read-back table must
    hash-match the plain 1m rollup over raw events: a lost snapshot
    (pre-fix last-writer-wins) would drop whole days from the result."""
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup(ev, "ts", ["event_type"], "value", "1m").withColumn(
        "day", F.date_format("bucket", "yyyy-MM-dd")
    )
    t1m.persist()
    root = tempfile.mkdtemp(prefix="cc_gate_")
    try:
        days = sorted(
            r["day"] for r in t1m.select("day").distinct().collect()
        )
        cat = TableCatalog(root)

        def commit(d: str) -> None:
            cat.write_partitions(
                t1m.filter(F.col("day") == d), "rollup_1m", [d]
            )

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(commit, days))
        assert len(cat.snapshots("rollup_1m")) == len(days)
        assert sorted(cat.committed_partitions("rollup_1m")) == days
        out = _rollup_out(cat.read(spark, "rollup_1m"))
        rows = out.collect()  # materialize before the scratch dir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        t1m.unpersist()
        shutil.rmtree(root, ignore_errors=True)


def _q_stitched_rollup_90m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-granularity stitched tier read VALUE-oracled
    (query.read_rollup_stitched): 90m divides no coarse tier, so the
    aligned fast path would fall back to scanning the whole 1m tier.  The
    stitched read serves each 90m bucket from whole 1h blocks plus 1m
    edge rows (whole 1d blocks at wider widths) and must hash-match the
    plain epoch-floor rollup over raw events — proving the union of tier
    partials covers every minute exactly once."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators.refresh import build_point_tiers
    from influxer_spark.query import read_rollup_stitched

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="stitched_gate_")
    try:
        cat = TableCatalog(root)
        build_point_tiers(spark, cat, ev, "ts", ["event_type"], "value")
        out = _rollup_out(
            read_rollup_stitched(spark, cat, 5400, key_cols=["event_type"])
        )
        rows = out.collect()  # materialize before the scratch catalog goes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_realtime_rollup_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-style REAL-TIME continuous aggregate VALUE-oracled:
    materialize tiers for all but the last 3 days (simulating pipeline
    lag), then read 4h buckets via query.read_realtime — committed 1h tier
    up to the watermark, on-the-fly raw rollup for the tail, partials
    merged.  The oracle is the plain 4h rollup over ALL events, so a hash
    match proves the tier+tail union is exactly the full answer (including
    any bucket straddling the watermark)."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators.refresh import (
        build_point_tiers,
        source_day_counts,
    )
    from influxer_spark.query import read_realtime

    ev = _t(spark, sf_dir, "events")
    days = sorted(source_day_counts(ev, "ts"))
    committed = days[:-3]
    root = tempfile.mkdtemp(prefix="realtime_gate_")
    try:
        cat = TableCatalog(root)
        build_point_tiers(
            spark, cat, ev, "ts", ["event_type"], "value", days=committed
        )
        out = read_realtime(
            spark, cat, ev, 14400, "ts", "value", ["event_type"]
        )
        out = _rollup_out(out)
        rows = out.collect()  # materialize before the scratch catalog goes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_heavy_hitters_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 users per (day, event_type) read from CASCADED Misra-Gries
    summaries (1h capacity-256 sketches merged to 1d).  Capacity exceeds the
    per-bucket item cardinality at gate scale, so counts are exact and the
    oracle is the exact SQL top-k; the error-bound path is pinned by the
    pathological-capacity pytest (operators/heavyhitters.py)."""
    from influxer_spark.operators import heavyhitters as HH

    ev = _t(spark, sf_dir, "events")
    h1 = HH.topk_rollup(ev, "ts", ["event_type"], "user_id", "1h", capacity=256)
    d1 = HH.topk_cascade(h1, ["event_type"], "1d", capacity=256)
    return HH.topk_query(d1, ["event_type"], 5)


_HEAVY_HITTERS_ORACLE = """
WITH c AS (
  SELECT date_trunc('day', ts) AS bucket, event_type,
         user_id AS item, count(*) AS cnt
  FROM events GROUP BY 1, 2, 3
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY bucket, event_type ORDER BY cnt DESC, item ASC) AS rank
  FROM c
)
SELECT bucket, event_type, item, cnt, CAST(0 AS BIGINT) AS err, rank
FROM r WHERE rank <= 5
"""


def _q_interval_join_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked range join: per-event_type 2h incident windows (opened by
    every ~1%-of-users event) × the raw point stream; count + sum of the
    points inside each window.  The naive BETWEEN join is a
    BroadcastNestedLoopJoin — the chunked equi-join plan is pinned in
    tests/test_intervaljoin.py."""
    from influxer_spark.operators.intervaljoin import interval_join

    ev = _t(spark, sf_dir, "events")
    iv = (
        ev.filter(F.col("user_id") % 97 == 0)
        .select(
            "event_type",
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
        )
        .distinct()
    )
    j = interval_join(ev, iv, "ts", ["event_type"], chunk_seconds=3600)
    return j.groupBy("event_type", "w_start", "w_end").agg(
        F.count("*").alias("n_events"),
        (_q2(F.sum("value")) / 100.0).alias("sum_v"),
    )


_INTERVAL_JOIN_ORACLE = """
WITH iv AS (
  SELECT DISTINCT event_type, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
  FROM events WHERE user_id % 97 = 0
)
SELECT e.event_type, i.w_start, i.w_end, count(*) AS n_events,
       CAST(round(sum(e.value) * 100, 0) AS BIGINT) / 100.0 AS sum_v
FROM events e JOIN iv i
  ON e.event_type = i.event_type
 AND e.ts >= i.w_start AND e.ts < i.w_end
GROUP BY 1, 2, 3
"""


def _q_kmv_distinct_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per (day, event_type) from CASCADED KMV sketches
    (1h k=64 sketches merged to 1d).  KMV merge is lossless (k smallest of
    the union == union of children's k-mins), so the cascaded estimate is
    value-identical to a sketch built directly from raw — which is what the
    oracle computes in SQL (same 60-bit md5 hash, same (k-1)/U(k)
    estimator).  The HLL twin (`sketch_distinct_tiers`) stays rows-only;
    this is the value-checkable mergeable-distinct path."""
    from influxer_spark.operators import kmv as KMV

    ev = _t(spark, sf_dir, "events")
    h1 = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h", k=64)
    d1 = KMV.kmv_cascade(h1, ["event_type"], "1d", k=64)
    return KMV.kmv_estimate(d1, ["event_type"], k=64)


def _q_kmv_tier_read_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tier-served distinct: materialize kmv_1h/kmv_1d tables
    in a scratch catalog (per-day wave commits, k pinned as a table
    property), then answer a 4h unique-users panel from the 1h sketch tier
    via query.read_distinct — manifest-pruned, lossless k-min re-bucket.
    The oracle computes the same 4h KMV directly from raw in SQL, so a
    hash match proves the whole materialize→commit→read path is exact."""
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators import kmv as KMV
    from influxer_spark.query import read_distinct

    ev = _t(spark, sf_dir, "events")
    cat = TableCatalog(tempfile.mkdtemp(prefix="kmv_tier_gate_"))
    KMV.build_kmv_tiers(spark, cat, ev, "ts", ["event_type"], "user_id", k=64)
    return read_distinct(spark, cat, 4 * 3600, key_cols=("event_type",))


_KMV_TIER_4H_ORACLE = """
WITH h AS (
  SELECT DISTINCT
         make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
            - CAST(floor(epoch(ts)) AS BIGINT) % 14400) * 1000000) AS bucket,
         event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
), r AS (
  SELECT bucket, event_type, hv,
         row_number() OVER (PARTITION BY bucket, event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY bucket, event_type) AS n
  FROM h
)
SELECT bucket, event_type,
  CAST(LEAST(max(n), 64) AS BIGINT) AS sketch_size,
  CAST(round(
    (CASE WHEN max(n) < 64 THEN CAST(max(n) AS DOUBLE)
          ELSE 63.0 * 1152921504606846976.0
               / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END)
    * 10000, 0) AS BIGINT) / 10000.0 AS est_distinct
FROM r GROUP BY 1, 2
"""


def _q_stream_kmv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KMV sketches VALUE-oracled via stop/resume replay: land
    events as two time-ordered files, drain with TWO availableNow runs
    against one checkpoint, merge the per-batch sketches (k-min union is
    associative + idempotent, so no streaming state store exists to
    restore), cascade 1h→1d and estimate.  The oracle is the DIRECT batch
    KMV SQL — a hash match proves the restarted stream's merged sketches
    are bit-identical to a single batch sketch of all the data."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.operators import kmv as KMV
    from influxer_spark.streaming import read_kmv, run_incremental_kmv

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_kmv_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_incremental_kmv(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_kmv(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    h1 = read_kmv(spark, d["out"], ["event_type"], "1h", 64)
    d1 = KMV.kmv_cascade(h1, ["event_type"], "1d", k=64)
    return KMV.kmv_estimate(d1, ["event_type"], k=64)


def _q_stream_hdr_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming log-linear quantile sketches VALUE-oracled via stop/resume
    replay: land events as two time-ordered files, drain with TWO
    availableNow runs against one checkpoint (the second run must skip the
    committed batch), merge the per-batch counter vectors and read
    p50/p95/p99.  The oracle is the DIRECT batch hour-sketch SQL — a hash
    match proves the restarted stream's merged sketches are bit-identical
    to sketching all the data at once."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.operators import hdrsketch as H
    from influxer_spark.streaming import read_hdr, run_incremental_hdr

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_hdr_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_incremental_hdr(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_hdr(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    t1h = read_hdr(spark, d["out"], ["event_type"], "1h")
    return H.hdr_quantiles(t1h, ["event_type"], (0.5, 0.95, 0.99)).select(
        "event_type", "bucket", "n", "q50", "q95", "q99"
    )


_KMV_DISTINCT_ORACLE = """
WITH h AS (
  SELECT DISTINCT date_trunc('day', ts) AS bucket, event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
), r AS (
  SELECT bucket, event_type, hv,
         row_number() OVER (PARTITION BY bucket, event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY bucket, event_type) AS n
  FROM h
)
SELECT bucket, event_type,
  CAST(LEAST(max(n), 64) AS BIGINT) AS sketch_size,
  CAST(round(
    (CASE WHEN max(n) < 64 THEN CAST(max(n) AS DOUBLE)
          ELSE 63.0 * 1152921504606846976.0
               / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END)
    * 10000, 0) AS BIGINT) / 10000.0 AS est_distinct
FROM r GROUP BY 1, 2
"""


def _q_hdr_tier_read_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tier-served percentiles: materialize hdr_1h/hdr_1d
    tables in a scratch catalog (per-day wave commits, sub_bits pinned as
    a table property), then answer a 4h p50/p95/p99 panel from the 1h
    sketch tier via query.read_percentile — manifest-pruned, lossless
    counter-vector re-bucket, NO hist_bounds config anywhere.  The oracle
    computes the same 4h sketch directly from raw in SQL, so a hash match
    proves the whole materialize→commit→read path is exact."""
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators import hdrsketch as H
    from influxer_spark.query import read_percentile

    ev = _t(spark, sf_dir, "events")
    cat = TableCatalog(tempfile.mkdtemp(prefix="hdr_tier_gate_"))
    H.build_hdr_tiers(spark, cat, ev, "ts", ["event_type"], "value")
    return read_percentile(
        spark, cat, 4 * 3600, (0.5, 0.95, 0.99), key_cols=("event_type",)
    ).select("event_type", "bucket", "n", "q50", "q95", "q99")


def _q_ohlc_tier_read_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tier-served candlesticks: materialize ohlc_1m/1h/1d in a
    scratch catalog (rollup.build_ohlc_tiers), register the measurement
    tiered with ohlc=True, and answer a 4h first/max/min/last/count panel
    through the string front-end — served from the 1h candlestick tier
    (plan-asserted in tests/test_influxql_tiered.py).  The oracle computes
    the same 4h OHLC directly from raw in SQL; every output is an existing
    value (argmin/argmax by time, value tie-break), so the whole
    materialize→commit→tier-read path hash-matches bit-for-bit."""
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.influxql_frontend import InfluxQLEngine
    from influxer_spark.operators import rollup as _R

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cat = TableCatalog(tempfile.mkdtemp(prefix="ohlc_tier_gate_"))
    _R.build_ohlc_tiers(spark, cat, ev, "ts", ["event_type"], "value")
    eng = InfluxQLEngine({"events": ev}, ts_col="ts")
    eng.register_tiered(
        "events", cat, key_cols=("event_type",), value_field="value",
        ohlc=True,
    )
    out = eng.execute(
        "SELECT first(value) AS open_v, max(value) AS high_v,"
        " min(value) AS low_v, last(value) AS close_v,"
        " count(value) AS cnt"
        " FROM events GROUP BY time(4h), event_type"
    )
    return out.withColumnRenamed("time", "bucket")


_OHLC_TIER_4H_ORACLE = """
WITH x AS (
  SELECT event_type,
         make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 14400) * 1000000) AS bucket,
         ts, value
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT event_type, bucket, value,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, value) AS rn_a,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, value DESC) AS rn_z
  FROM x
)
SELECT bucket, event_type,
  max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
  max(value) AS high_v, min(value) AS low_v,
  max(CASE WHEN rn_z = 1 THEN value END) AS close_v,
  count(*) AS cnt
FROM r GROUP BY 1, 2
"""


def _q_twa_1h_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average 1h tier built by CASCADING 1m TWA summaries
    (mergeable monoid with LOCF bridge segments) — the oracle computes the
    hour directly from raw points, so a green row proves cascade-exactness,
    not just the bucket math (operators/timeweight.py)."""
    from influxer_spark.operators import timeweight as TW

    ev = _t(spark, sf_dir, "events")
    t1m = TW.twa_rollup(ev, "ts", ["event_type"], "value", "1m")
    t1h = TW.twa_cascade(t1m, ["event_type"], "1h")
    return TW.twa_value(t1h).select("event_type", "bucket", "area", "dur", "twa")


def _q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set ALGEBRA from sketches alone (Beyer et al. 2007): for
    every pair of event types per day, |A∪B|, |A∩B| and Jaccard of their
    user sets, computed purely from the per-series k=64 KMV sketches —
    CASCADED from hourly sketches, so the oracle (which builds the daily
    k-min sets directly from raw and replays the same estimators in SQL)
    proves lossless merge AND bit-exact set arithmetic in one row."""
    from influxer_spark.operators import kmv as KMV

    ev = _t(spark, sf_dir, "events")
    h1 = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h", k=64)
    d1 = KMV.kmv_cascade(h1, ["event_type"], "1d", k=64)
    return KMV.kmv_set_estimates(d1, "event_type", k=64)


_KMV_SET_OPS_ORACLE = """
WITH h AS (
  SELECT DISTINCT date_trunc('day', ts) AS bucket, event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
), s AS (
  SELECT bucket, event_type, hv FROM (
    SELECT *, row_number() OVER (
      PARTITION BY bucket, event_type ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= 64
), pairs AS (
  SELECT s1.bucket, s1.event_type AS g1, s2.event_type AS g2
  FROM (SELECT DISTINCT bucket, event_type FROM s) s1
  JOIN (SELECT DISTINCT bucket, event_type FROM s) s2
    ON s1.bucket = s2.bucket AND s1.event_type < s2.event_type
), u AS (
  SELECT p.bucket, p.g1, p.g2, s.hv,
         max(CASE WHEN s.event_type = p.g1 THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = p.g2 THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN s
    ON s.bucket = p.bucket AND s.event_type IN (p.g1, p.g2)
  GROUP BY 1, 2, 3, 4
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY bucket, g1, g2 ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY bucket, g1, g2) AS n_cand
  FROM u
), agg AS (
  SELECT bucket, g1, g2,
    LEAST(max(n_cand), 64) AS union_size,
    CASE WHEN max(n_cand) < 64 THEN CAST(max(n_cand) AS DOUBLE)
         ELSE 63.0 * 1152921504606846976.0
              / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE)
    END AS est_u,
    CAST(sum(CASE WHEN rn <= 64 AND in_a = 1 AND in_b = 1
                  THEN 1 ELSE 0 END) AS DOUBLE)
      / LEAST(max(n_cand), 64) AS rho
  FROM r GROUP BY 1, 2, 3
)
SELECT bucket, g1, g2,
  CAST(union_size AS BIGINT) AS union_sketch_size,
  CAST(round(est_u * 10000, 0) AS BIGINT) / 10000.0 AS est_union,
  CAST(round(rho * est_u * 10000, 0) AS BIGINT) / 10000.0 AS est_intersection,
  CAST(round(rho * 10000, 0) AS BIGINT) / 10000.0 AS jaccard
FROM agg
"""


def _q_hdr_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plottable value-distribution bars from the daily HDR sketch tier
    (hdrsketch.hdr_histogram): exact integer [lo, hi) bounds per occupied
    bucket, singletons floored to their one-cent bar.  The oracle replays
    the integer bound math — every bar edge bit-exact."""
    from influxer_spark.operators import hdrsketch as H

    ev = _t(spark, sf_dir, "events")
    d1 = H.hdr_cascade(
        H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h"),
        ["event_type"], "1d",
    )
    return H.hdr_histogram(d1, ["event_type"])


_HDR_HISTOGRAM_ORACLE = """
WITH p AS (
  SELECT event_type,
         make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 86400) * 1000000) AS bucket,
         greatest(CAST(round(value*100,0) AS BIGINT), 1) AS v
  FROM events
), i AS (
  SELECT event_type, bucket,
         (CAST(length(bin(v))-1 AS BIGINT))*32
           + ((v*32) >> CAST(length(bin(v))-1 AS BIGINT)) - 32 AS idx
  FROM p
), s AS (
  SELECT event_type, bucket, idx, count(*) AS cnt FROM i GROUP BY 1,2,3
)
SELECT event_type, bucket, idx,
  ((((idx % 32) + 32) << (idx // 32)) >> 5) / 100.0 AS lo,
  greatest(((((idx + 1) % 32) + 32) << ((idx + 1) // 32)) >> 5,
           (((((idx % 32) + 32) << (idx // 32)) >> 5) + 1)) / 100.0 AS hi,
  cnt
FROM s
"""


def _q_hdr_seasonal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day p10/p90 bands from the HDR sketch tiers: hourly
    sketches merge BY CALENDAR PHASE (counter-vector sum keyed on
    hour-of-day — the cascade's merge pointed at a different key), then
    nearest-rank quantiles per phase.  The oracle computes each phase's
    sketch directly from raw, so a hash match proves the phase merge is
    as lossless as the time cascade.  This is the 'typical band' used by
    in-season anomaly monitors (resid_anomaly_24h's simpler cousin)."""
    from influxer_spark.operators import hdrsketch as H

    ev = _t(spark, sf_dir, "events")
    h1 = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h")
    return H.hdr_seasonal_quantiles(h1, ["event_type"], (0.1, 0.9)).select(
        "event_type", "hod", "n", "q10", "q90"
    )


_HDR_SEASONAL_ORACLE = """
WITH p AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         greatest(CAST(round(value*100,0) AS BIGINT), 1) AS v
  FROM events
), i AS (
  SELECT event_type, hod,
         (CAST(length(bin(v))-1 AS BIGINT))*32
           + ((v*32) >> CAST(length(bin(v))-1 AS BIGINT)) - 32 AS idx
  FROM p
), s AS (
  SELECT event_type, hod, idx, count(*) AS cnt FROM i GROUP BY 1,2,3
), r AS (
  SELECT event_type, hod, idx, cnt,
         sum(cnt) OVER (PARTITION BY event_type, hod ORDER BY idx) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, hod) AS n,
         ((((idx % 32) + 32) << (idx // 32)) >> 5) AS lb
  FROM s
)
SELECT event_type, hod, CAST(max(n) AS BIGINT) AS n,
  min(CASE WHEN cum >= ceil(0.1*n) THEN lb END)/100.0 AS q10,
  min(CASE WHEN cum >= ceil(0.9*n) THEN lb END)/100.0 AS q90
FROM r GROUP BY 1, 2
"""


def _q_seasonal_band_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-season anomalies: hourly means outside their own hour-of-day's
    [p10, p90] sketch band (hdrsketch.seasonal_band_anomalies) — catches
    'unusual for 3 a.m.' events a global threshold misses.  Hourly means
    are exact integer cents and band edges identical integer sketch math
    on both engines, so the flag itself is bit-deterministic."""
    from influxer_spark.operators import hdrsketch as H

    ev = _t(spark, sf_dir, "events")
    return H.seasonal_band_anomalies(
        ev, "ts", ["event_type"], "value", 0.1, 0.9
    )


_SEASONAL_ANOMALY_ORACLE = """
WITH p AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         greatest(CAST(round(value*100,0) AS BIGINT), 1) AS vq
  FROM events
), i AS (
  SELECT event_type, hod,
         (CAST(length(bin(vq))-1 AS BIGINT))*32
           + ((vq*32) >> CAST(length(bin(vq))-1 AS BIGINT)) - 32 AS idx
  FROM p
), s AS (
  SELECT event_type, hod, idx, count(*) AS cnt FROM i GROUP BY 1,2,3
), r AS (
  SELECT event_type, hod, idx, cnt,
         sum(cnt) OVER (PARTITION BY event_type, hod ORDER BY idx) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, hod) AS n,
         ((((idx % 32) + 32) << (idx // 32)) >> 5) AS lb
  FROM s
), band AS (
  SELECT event_type, hod,
    min(CASE WHEN cum >= ceil(0.1*n) THEN lb END)/100.0 AS lo,
    min(CASE WHEN cum >= ceil(0.9*n) THEN lb END)/100.0 AS hi
  FROM r GROUP BY 1, 2
), hourly AS (
  SELECT event_type,
    make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
      - CAST(floor(epoch(ts)) AS BIGINT) % 3600) * 1000000) AS bucket,
    CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT)
      AS s_c,
    count(value) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT h.event_type, h.bucket, CAST(hour(h.bucket) AS BIGINT) AS hod,
  CAST(h.s_c AS DOUBLE) / h.cnt / 100.0 AS v,
  b.lo, b.hi,
  (CAST(h.s_c AS DOUBLE) / h.cnt / 100.0 < b.lo
   OR CAST(h.s_c AS DOUBLE) / h.cnt / 100.0 > b.hi) AS anomaly
FROM hourly h JOIN band b
  ON b.event_type = h.event_type AND b.hod = hour(h.bucket)
"""


def _q_stream_deadman_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deadman VALUE-oracled via stop/resume replay: land events
    as two time-ordered files, drain with TWO availableNow runs against
    one checkpoint, union the committed gap batches.  The per-key
    last-bucket state survives the restart, so a gap spanning the cut is
    emitted exactly once by the reviving batch — and the union must equal
    the BATCH deadman's interior-gap log (same oracle as ``deadman_1h``:
    215 real hourly gaps at sf0.01, per-series observed-range spine)."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.streaming import read_alerts, run_gap_stream

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_deadman_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_gap_stream(
        spark, d["input"], ev.schema, d["out"], d["ckpt"],
        "event_type", "ts", 3600,
    )
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_gap_stream(
        spark, d["input"], ev.schema, d["out"], d["ckpt"],
        "event_type", "ts", 3600,
    )
    return read_alerts(spark, d["out"]).select(
        F.col("key").alias("event_type"), "bucket", "alert"
    )


def _q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning (curation.mixture_plan): per-source epoch
    weights from target shares + a char budget, with the max-epochs clamp
    surfaced as a flag (no silent caps).  src0 gets a share big enough to
    trip the clamp, src1/src2 normal shares, everything else share 0 —
    all arithmetic deterministic and replayed by the oracle's CASE
    chain."""
    from influxer_spark.operators.curation import mixture_plan

    docs = _t(spark, sf_dir, "documents")
    return mixture_plan(
        docs, "source", "n_chars",
        {"src0": 0.6, "src1": 0.3, "src2": 0.1},
        budget=200_000, max_epochs=10.0,
    )


_MIXTURE_PLAN_ORACLE = """
WITH a AS (
  SELECT source AS "group", CAST(sum(n_chars) AS BIGINT) AS available
  FROM documents GROUP BY 1
), s AS (
  SELECT "group", available,
    CASE WHEN "group" = 'src0' THEN 0.6
         WHEN "group" = 'src1' THEN 0.3
         WHEN "group" = 'src2' THEN 0.1 ELSE 0.0 END AS share
  FROM a
)
SELECT "group", available, share,
  share * 200000.0 AS target_size,
  LEAST(share * 200000.0 / available, 10.0) AS weight,
  (share * 200000.0 / available > 10.0) AS capped
FROM s
"""


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlong-document chunking (operators/curation.py:chunk_documents):
    fixed-stride token windows with overlap and stable (doc, chunk_idx)
    ids — the step between cleaning and packing.  Chunk counts are pure
    integer ceil-division and chunk text a deterministic slice+join, so
    the DuckDB replay is bit-exact; window params (32/8) make the
    word-soup docs span 1–4 chunks each."""
    from influxer_spark.operators.curation import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", max_tokens=32, overlap=8)


_CHUNK_DOCS_ORACLE = """
WITH d AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
), b AS (
  SELECT id, w, CAST(len(w) AS BIGINT) AS n,
         CASE WHEN len(w) <= 32 THEN CAST(1 AS BIGINT)
              ELSE 1 + (CAST(len(w) AS BIGINT) - 32 + 23) // 24 END AS n_chunks
  FROM d
), c AS (
  SELECT id, n, n_chunks, unnest(range(0, n_chunks)) AS chunk_idx, w FROM b
)
SELECT id, chunk_idx, n_chunks,
  LEAST(32, n - chunk_idx * 24) AS n_tokens,
  array_to_string(
    list_slice(w, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' '
  ) AS chunk_text
FROM c
"""


def _q_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space segment map: cosine between every pair of label
    centroids (operators/similarity.py:centroid_cosine).  Components are
    quantized to integer ticks so the per-(label, position) sums are
    exact BIGINTs, and the cosine is an ordered fold over positions —
    the DuckDB oracle replays the identical integer sums and fold, so
    the row is bit-exact.  With crawl-day groups this is the embedding
    twin of tvd_drift_daily (corpus drift in representation space)."""
    from influxer_spark.operators.similarity import centroid_cosine

    emb = _t(spark, sf_dir, "embeddings")
    return centroid_cosine(emb, "label", "embedding")


_CENTROID_COSINE_ORACLE = """
WITH pos AS (SELECT unnest(range(1, 65)) AS p),
e AS (
  SELECT label, p,
         CAST(round(CAST(embedding[p] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, pos
), s AS (
  SELECT label, p, CAST(sum(q) AS BIGINT) AS s FROM e GROUP BY 1, 2
), a AS (
  SELECT label, list(s ORDER BY p) AS v FROM s GROUP BY label
), n AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
), sides AS (
  SELECT a.label, a.v, n.n FROM a JOIN n ON a.label = n.label
)
SELECT x.label AS g1, y.label AS g2, x.n AS n1, y.n AS n2,
  list_reduce(list_transform(list_zip(x.v, y.v),
      t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), (acc, v) -> acc + v)
  / (sqrt(list_reduce(list_transform(list_zip(x.v, x.v),
      t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), (acc, v) -> acc + v))
   * sqrt(list_reduce(list_transform(list_zip(y.v, y.v),
      t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), (acc, v) -> acc + v)))
  AS cos
FROM sides x JOIN sides y ON x.label < y.label
"""


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view→click→purchase, each step within 6h of
    the previous (operators/funnel.py): per-user first-occurrence times
    chained by user-keyed joins — the ordered cross-event sequencing
    InfluxQL cannot express.  The oracle replays the sequential CTE chain
    with the same floor-to-second window arithmetic — counts and
    conversion ratios bit-exact."""
    from influxer_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], 21600,
    )


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/funnel.py:cohort_retention):
    users cohort by first-seen day; cell (cohort, k) = fraction active
    exactly k days later.  Counts are exact integers and the ratio one
    float division — the oracle's identical arithmetic is bit-exact."""
    from influxer_spark.operators.funnel import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-event transition matrix per user
    (operators/funnel.py:event_transitions), event_id as the
    deterministic timestamp tie-break.  Exact integer counts + one float
    division — oracle bit-exact."""
    from influxer_spark.operators.funnel import event_transitions

    ev = _t(spark, sf_dir, "events")
    return event_transitions(ev, "user_id", "ts", "event_type", ["event_id"])


_TRANSITIONS_ORACLE = """
WITH s AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), c AS (
  SELECT cur, nxt, count(*) AS n FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT cur, sum(n) AS tt FROM c GROUP BY 1
)
SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / t.tt AS p
FROM c JOIN t ON t.cur = c.cur
"""


def _q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles per funnel step (funnel.funnel_latency):
    per-user step delays sketched through the HDR counter vectors — the
    bounded-memory percentile (a collect-and-sort would hold every
    converting user).  The oracle chains the funnel CTEs into the same
    integer sketch math; the /100·×100 unit round-trip is mirrored
    op-for-op so the row is bit-exact."""
    from influxer_spark.operators.funnel import funnel_latency

    ev = _t(spark, sf_dir, "events")
    return funnel_latency(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], 21600, (0.5, 0.9),
    )


_FUNNEL_LATENCY_ORACLE = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.u = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND CAST(floor(epoch(e.ts)) AS BIGINT)
        <= CAST(floor(epoch(s1.t1)) AS BIGINT) + 21600
  GROUP BY 1
), s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.u = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND CAST(floor(epoch(e.ts)) AS BIGINT)
        <= CAST(floor(epoch(s2.t2)) AS BIGINT) + 21600
  GROUP BY 1
), d AS (
  SELECT 2 AS step_idx, 'click' AS step,
         greatest(CAST(floor(epoch(s2.t2)) AS BIGINT)
                  - CAST(floor(epoch(s1.t1)) AS BIGINT), 1) AS v
  FROM s2 JOIN s1 ON s1.u = s2.u
  UNION ALL
  SELECT 3, 'purchase',
         greatest(CAST(floor(epoch(s3.t3)) AS BIGINT)
                  - CAST(floor(epoch(s2.t2)) AS BIGINT), 1)
  FROM s3 JOIN s2 ON s2.u = s3.u
), i AS (
  SELECT step_idx, step,
         (CAST(length(bin(v))-1 AS BIGINT))*32
           + ((v*32) >> CAST(length(bin(v))-1 AS BIGINT)) - 32 AS idx
  FROM d
), s AS (
  SELECT step_idx, step, idx, count(*) AS cnt FROM i GROUP BY 1,2,3
), r AS (
  SELECT step_idx, step, idx, cnt,
         sum(cnt) OVER (PARTITION BY step_idx ORDER BY idx) AS cum,
         sum(cnt) OVER (PARTITION BY step_idx) AS n,
         ((((idx % 32) + 32) << (idx // 32)) >> 5) AS lb
  FROM s
)
SELECT step_idx, step, CAST(max(n) AS BIGINT) AS n,
  (min(CASE WHEN cum >= ceil(0.5*n) THEN lb END) / 100.0) * 100.0 AS q50,
  (min(CASE WHEN cum >= ceil(0.9*n) THEN lb END) / 100.0) * 100.0 AS q90
FROM r GROUP BY 1, 2
"""


_COHORT_ORACLE = """
WITH a AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day FROM events
), f AS (
  SELECT u, min(day) AS cohort_day FROM a GROUP BY 1
), s AS (
  SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1
), c AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS k,
         count(*) AS active
  FROM a JOIN f ON a.u = f.u GROUP BY 1, 2
)
SELECT c.cohort_day, c.k, CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(c.active AS BIGINT) AS active,
       CAST(c.active AS DOUBLE) / s.cohort_size AS retention
FROM c JOIN s ON s.cohort_day = c.cohort_day
"""


_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.u = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND CAST(floor(epoch(e.ts)) AS BIGINT)
        <= CAST(floor(epoch(s1.t1)) AS BIGINT) + 21600
  GROUP BY 1
), s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.u = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND CAST(floor(epoch(e.ts)) AS BIGINT)
        <= CAST(floor(epoch(s2.t2)) AS BIGINT) + 21600
  GROUP BY 1
), n AS (
  SELECT (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
)
SELECT 1 AS step_idx, 'view' AS step, CAST(n1 AS BIGINT) AS users,
       CAST(n1 AS DOUBLE) / n1 AS conversion FROM n
UNION ALL SELECT 2, 'click', CAST(n2 AS BIGINT),
       CAST(n2 AS DOUBLE) / n1 FROM n
UNION ALL SELECT 3, 'purchase', CAST(n3 AS BIGINT),
       CAST(n3 AS DOUBLE) / n1 FROM n
"""


def _q_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROVABLY exact top-5 users per event type via the candidate-then-
    verify pattern (operators/heavyhitters.py:topk_exact): per-partition
    Misra-Gries summaries (no full-cardinality shuffle) nominate
    candidates, one broadcast semi-join recounts only those exactly, and
    the k-th-count-exceeds-undercount-bound proof is asserted at runtime
    — the answer is either exact or a loud failure, never silently
    approximate.  The oracle is the plain exact top-k SQL, so the gate
    row proves the two-pass answer IS the exact answer."""
    from influxer_spark.operators.heavyhitters import topk_exact

    ev = _t(spark, sf_dir, "events")
    return topk_exact(ev, ["event_type"], "user_id", 5, capacity=8192)


_TOPK_EXACT_ORACLE = """
SELECT event_type, rank, item, cnt FROM (
  SELECT event_type, user_id AS item, count(*) AS cnt,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY count(*) DESC, user_id ASC) AS rank
  FROM events GROUP BY event_type, user_id
) WHERE rank <= 5
"""


def _q_sumsq_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h volatility at every observed hour from the power-sum
    tier (rollup.sumsq_sliding + with_stddev) — the second-moment member
    of the sliding family.  Integer S1/S2 window sums commute, so the
    oracle's RANGE window replays them bit-for-bit."""
    from influxer_spark.operators import rollup as R

    ev = _t(spark, sf_dir, "events")
    t1h = R.rollup_with_sumsq(ev, "ts", ["event_type"], "value", "1h")
    slid = R.sumsq_sliding(t1h, ["event_type"], 24, 3600)
    return R.with_stddev(slid).select(
        "event_type", "bucket", "cnt", "avg_v", "var_v", "stddev_v"
    )


_SUMSQ_SLIDING_ORACLE = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(value) AS cnt,
         sum(CAST(round(value * 100, 0) AS BIGINT)) AS s1,
         sum(CAST(round(value * 100, 0) AS BIGINT)
             * CAST(round(value * 100, 0) AS BIGINT)) AS s2
  FROM events GROUP BY 1, 2
), w AS (
  SELECT bucket, event_type,
    CAST(sum(cnt) OVER win AS BIGINT) AS cnt,
    CAST(sum(s1) OVER win AS BIGINT) AS s1,
    CAST(sum(s2) OVER win AS BIGINT) AS s2
  FROM h
  WINDOW win AS (PARTITION BY event_type ORDER BY epoch(bucket)
                 RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket, cnt,
  CAST(s1 AS DOUBLE) / cnt / 100.0 AS avg_v,
  CASE WHEN cnt > 1
       THEN (CAST(cnt * s2 - s1 * s1 AS DOUBLE) / (cnt * (cnt - 1))) / 10000.0
  END AS var_v,
  CASE WHEN cnt > 1
       THEN sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE) / (cnt * (cnt - 1))) / 100.0
  END AS stddev_v
FROM w
"""


def _q_hdr_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving percentiles from sketch tiers: trailing-24h p50/p95 at
    every observed hour (hdrsketch.hdr_sliding + hdr_quantiles) — the
    latency-dashboard primitive a tumbling re-bucket cannot answer.
    Counter vectors SUM losslessly under overlap, so the oracle — which
    sketches each trailing window directly from raw — matches
    bit-for-bit."""
    from influxer_spark.operators import hdrsketch as H

    ev = _t(spark, sf_dir, "events")
    h1 = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h")
    slid = H.hdr_sliding(h1, ["event_type"], 24, 3600)
    return H.hdr_quantiles(slid, ["event_type"], (0.5, 0.95)).select(
        "event_type", "bucket", "n", "q50", "q95"
    )


_HDR_SLIDING_ORACLE = """
WITH p AS (
  SELECT event_type,
         make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600) * 1000000) AS b,
         greatest(CAST(round(value*100,0) AS BIGINT), 1) AS v
  FROM events
), i AS (
  SELECT event_type, b,
         (CAST(length(bin(v))-1 AS BIGINT))*32
           + ((v*32) >> CAST(length(bin(v))-1 AS BIGINT)) - 32 AS idx
  FROM p
), obs AS (
  SELECT DISTINCT b, event_type FROM i
), win AS (
  SELECT o.b AS bucket, o.event_type, x.idx, count(*) AS cnt
  FROM obs o JOIN i x ON x.event_type = o.event_type
   AND x.b <= o.b AND x.b > o.b - INTERVAL 24 HOUR
  GROUP BY 1, 2, 3
), r AS (
  SELECT bucket, event_type, idx, cnt,
         sum(cnt) OVER (PARTITION BY bucket, event_type ORDER BY idx) AS cum,
         sum(cnt) OVER (PARTITION BY bucket, event_type) AS n,
         ((((idx % 32) + 32) << (idx // 32)) >> 5) AS lb
  FROM win
)
SELECT event_type, bucket, CAST(max(n) AS BIGINT) AS n,
  min(CASE WHEN cum >= ceil(0.5*n) THEN lb END)/100.0 AS q50,
  min(CASE WHEN cum >= ceil(0.95*n) THEN lb END)/100.0 AS q95
FROM r GROUP BY 1, 2
"""


def _q_ohlc_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h candlestick at every observed hour from the 1h OHLC
    tier (operators/rollup.py:ohlc_sliding) — one RANGE window per
    series, open/close merged by ORIGINAL timestamps inside the window,
    so every output is an existing (timestamp, value) pair and the
    oracle's windowed struct min/max replays it bit-for-bit."""
    from influxer_spark.operators import rollup as R

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t1h = R.rollup_ohlc(ev, "ts", ["event_type"], "value", "1h")
    return R.ohlc_sliding(t1h, ["event_type"], 24, 3600)


_OHLC_SLIDING_ORACLE = """
WITH x AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, value
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT event_type, bucket, ts, value,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, value) AS rn_a,
    row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, value DESC) AS rn_z
  FROM x
), h AS (
  SELECT event_type, bucket,
    max(CASE WHEN rn_a = 1 THEN ts END) AS open_t,
    max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
    max(value) AS high_v, min(value) AS low_v,
    max(CASE WHEN rn_z = 1 THEN ts END) AS close_t,
    max(CASE WHEN rn_z = 1 THEN value END) AS close_v,
    count(*) AS cnt
  FROM r GROUP BY 1, 2
)
SELECT bucket, event_type,
  (min({t: open_t, v: open_v}) OVER w).t AS open_t,
  (min({t: open_t, v: open_v}) OVER w).v AS open_v,
  max(high_v) OVER w AS high_v,
  min(low_v) OVER w AS low_v,
  (max({t: close_t, v: close_v}) OVER w).t AS close_t,
  (max({t: close_t, v: close_v}) OVER w).v AS close_v,
  CAST(sum(cnt) OVER w AS BIGINT) AS cnt,
  CAST(count(*) OVER w AS BIGINT) AS n_buckets
FROM h
WINDOW w AS (PARTITION BY event_type ORDER BY epoch(bucket)
             RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
"""


def _q_rollup_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h algebraic aggregates at every observed hour from the
    1h tier (operators/rollup.py:rollup_sliding) — one RANGE window per
    series over TIER rows, epoch-keyed so tier gaps are handled by value
    range.  The tier's sums are quantized to integer cents before the
    window, so the trailing sums are exact BIGINTs (a float trailing sum
    would depend on the window implementation's summation order) and the
    oracle's RANGE window replays them bit-for-bit."""
    from influxer_spark.operators import rollup as R

    ev = _t(spark, sf_dir, "events")
    t1h = R.rollup(ev, "ts", ["event_type"], "value", "1h").withColumn(
        "sum_v", F.round(F.col("sum_v") * 100, 0).cast("long")
    )
    slid = R.rollup_sliding(t1h, ["event_type"], 24, 3600)
    return slid.select(
        "bucket",
        "event_type",
        "cnt",
        (F.col("sum_v") / F.lit(100.0)).alias("sum_v"),
        "min_v",
        "max_v",
        (F.col("sum_v") / (F.col("cnt") * F.lit(100.0))).alias("avg_v"),
        "n_buckets",
    )


_ROLLUP_SLIDING_ORACLE = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(value) AS cnt,
         CAST(round(sum(value) * 100, 0) AS BIGINT) AS s_c,
         min(value) AS min_v, max(value) AS max_v
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type,
  CAST(sum(cnt) OVER w AS BIGINT) AS cnt,
  CAST(sum(s_c) OVER w AS BIGINT) / 100.0 AS sum_v,
  min(min_v) OVER w AS min_v,
  max(max_v) OVER w AS max_v,
  CAST(sum(s_c) OVER w AS BIGINT)
    / (CAST(sum(cnt) OVER w AS BIGINT) * 100.0) AS avg_v,
  CAST(count(*) OVER w AS BIGINT) AS n_buckets
FROM h
WINDOW w AS (PARTITION BY event_type ORDER BY epoch(bucket)
             RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
"""


def _q_kmv_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct users at every observed hour, from the
    hourly KMV sketch tier alone (operators/kmv.py:kmv_sliding) — the
    DAU/WAU primitive a tumbling re-bucket cannot answer because
    trailing windows overlap.  The k-min union stays lossless under
    overlap, so the oracle — which computes each window's k-min set
    directly from raw — matches bit-for-bit."""
    from influxer_spark.operators import kmv as KMV

    ev = _t(spark, sf_dir, "events")
    h1 = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h", k=64)
    slid = KMV.kmv_sliding(h1, ["event_type"], 24, 3600, k=64)
    return KMV.kmv_estimate(slid, ["event_type"], k=64)


_KMV_SLIDING_ORACLE = """
WITH h AS (
  SELECT DISTINCT date_trunc('hour', ts) AS b, event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
), obs AS (
  SELECT DISTINCT b, event_type FROM h
), win AS (
  SELECT DISTINCT o.b AS bucket, o.event_type, x.hv
  FROM obs o JOIN h x ON x.event_type = o.event_type
   AND x.b <= o.b AND x.b > o.b - INTERVAL 24 HOUR
), r AS (
  SELECT bucket, event_type, hv,
         row_number() OVER (PARTITION BY bucket, event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY bucket, event_type) AS n
  FROM win
)
SELECT bucket, event_type,
  CAST(LEAST(max(n), 64) AS BIGINT) AS sketch_size,
  CAST(round(
    (CASE WHEN max(n) < 64 THEN CAST(max(n) AS DOUBLE)
          ELSE 63.0 * 1152921504606846976.0
               / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE) END)
    * 10000, 0) AS BIGINT) / 10000.0 AS est_distinct
FROM r GROUP BY 1, 2
"""


def _q_tvd_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day distribution drift per series from the HDR sketch
    tiers alone: total-variation distance between consecutive days'
    counter vectors (operators/hdrsketch.py:hdr_tvd_drift).  The 1d
    sketches are CASCADED from hourly ones, and the numerator
    Σ|oᵢ·m − qᵢ·n| is exact BIGINT math, so the oracle — which rebuilds
    the daily vectors from raw and replays the same integer arithmetic —
    is bit-exact, proving cascade and drift statistic together.  TVD is
    chosen over PSI/KL precisely because it NEEDS no per-bucket ln."""
    from influxer_spark.operators import hdrsketch as H

    ev = _t(spark, sf_dir, "events")
    h1 = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1h")
    d1 = H.hdr_cascade(h1, ["event_type"], "1d")
    return H.hdr_tvd_drift(d1, ["event_type"], 86400)


_TVD_DRIFT_ORACLE = """
WITH p AS (
  SELECT event_type,
         make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 86400) * 1000000) AS bucket,
         greatest(CAST(round(value*100,0) AS BIGINT), 1) AS v
  FROM events
), i AS (
  SELECT event_type, bucket,
         (CAST(length(bin(v))-1 AS BIGINT))*32
           + ((v*32) >> CAST(length(bin(v))-1 AS BIGINT)) - 32 AS idx
  FROM p
), s AS (
  SELECT event_type, bucket, idx, count(*) AS cnt FROM i GROUP BY 1,2,3
), t AS (
  SELECT event_type, bucket, CAST(sum(cnt) AS BIGINT) AS n
  FROM s GROUP BY 1,2
), pair AS (
  SELECT c.event_type, c.bucket, c.n, pv.n AS m
  FROM t c JOIN t pv
    ON pv.event_type = c.event_type
   AND pv.bucket + INTERVAL 1 DAY = c.bucket
), f AS (
  SELECT coalesce(c.event_type, q.event_type) AS event_type,
         coalesce(c.bucket, q.bucket) AS bucket,
         coalesce(c.cnt, 0) AS o, coalesce(q.cnt, 0) AS q
  FROM s c FULL JOIN (
    SELECT event_type, bucket + INTERVAL 1 DAY AS bucket, idx, cnt FROM s
  ) q ON c.event_type = q.event_type AND c.bucket = q.bucket
     AND c.idx = q.idx
), g AS (
  SELECT f.event_type, f.bucket, pair.n, pair.m,
         CAST(sum(abs(o*m - q*n)) AS BIGINT) AS num
  FROM f JOIN pair
    ON pair.event_type = f.event_type AND pair.bucket = f.bucket
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, bucket, n AS n_cur, m AS n_prev,
       CAST(num AS DOUBLE) / (2.0 * n * m) AS tvd
FROM g
"""


def _q_tier_stddev_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable variance/stddev tiers: the 1m tier carries the two exact
    power sums (Σ cents, Σ cents²) and the 1h tier is their integer
    sum-of-sums; mean/var/stddev are derived at read time.  The oracle
    computes the hour's power sums DIRECTLY from raw, so a hash match
    proves the cascade lossless — the classic failure this design avoids
    is a stored float stddev (not mergeable) or float Σv² (drifts with
    partial-agg order).  Completes the tier-servable InfluxQL aggregate
    set: stddev() joins count/sum/mean/min/max/spread/percentile/
    approx_count_distinct."""
    from influxer_spark.operators import rollup as R

    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup_with_sumsq(ev, "ts", ["event_type"], "value", "1m")
    t1h = R.cascade_with_sumsq(t1m, ["event_type"], "1h")
    return R.with_stddev(t1h).select(
        "event_type", "bucket", "cnt", "avg_v", "var_v", "stddev_v"
    )


_TIER_STDDEV_ORACLE = """
WITH p AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
), a AS (
  SELECT event_type, bucket, count(c) AS cnt,
         sum(c) AS s1, sum(c * c) AS s2
  FROM p GROUP BY 1, 2
)
SELECT event_type, bucket, cnt,
  CAST(s1 AS DOUBLE) / cnt / 100.0 AS avg_v,
  CASE WHEN cnt > 1
       THEN (CAST(cnt * s2 - s1 * s1 AS DOUBLE) / (cnt * (cnt - 1))) / 10000.0
  END AS var_v,
  CASE WHEN cnt > 1
       THEN sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE) / (cnt * (cnt - 1))) / 100.0
  END AS stddev_v
FROM a
"""


def _q_stream_sumsq_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming power-sum twin VALUE-oracled via stop/resume replay:
    per-batch (cnt, min, max, Σc, Σc²) partials merged at read time must
    equal the batch hour tier BIT-FOR-BIT — integer sums commute, so
    unlike the TWA twin there is no order sensitivity to document.  Same
    oracle as ``tier_stddev_1h``: the stream-merged sums must reproduce
    the from-raw hour stddev exactly."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.operators import rollup as R
    from influxer_spark.streaming import read_sumsq, run_incremental_sumsq

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_sumsq_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_incremental_sumsq(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_sumsq(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    t1h = read_sumsq(spark, d["out"], ["event_type"], "1h")
    return R.with_stddev(t1h).select(
        "event_type", "bucket", "cnt", "avg_v", "var_v", "stddev_v"
    )


def _q_stream_ohlc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming candlestick twin VALUE-oracled via stop/resume replay:
    per-batch OHLC partials (open/close with ORIGINAL timestamps) merged
    at read time must equal the batch hour candlesticks BIT-FOR-BIT —
    the struct-ordered monoid commutes, so the mid-table split (and the
    second availableNow run skipping the committed batch) cannot change
    any output.  Same oracle as ``ohlc_1h``."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.streaming import read_ohlc, run_incremental_ohlc

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="stream_ohlc_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    for name, part in (
        ("a", ev.filter(F.col("ts") <= cut)),
        ("b", ev.filter(F.col("ts") > cut)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_incremental_ohlc(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_ohlc(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    return read_ohlc(spark, d["out"], ["event_type"], "1h")


def _q_stream_twa_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming time-weighted-average summaries VALUE-oracled via
    stop/resume replay: land events as two time-ordered files, drain with
    TWO availableNow runs against one checkpoint (the second run must skip
    the committed batch), merge the per-batch monoid summaries in time
    order and derive the TWA.  The oracle is the DIRECT batch hour-TWA SQL
    (same as ``twa_1h_cascade``) — a hash match proves the restarted
    stream's merged summaries, INCLUDING the LOCF bridge across the batch
    split, are bit-identical to computing the hour from all the raw data
    at once.  The cut is second-aligned: TWA quantizes to (series,
    second) with a max-value tie-break, and a second split across batches
    would hide the loser from the per-batch dedup."""
    import glob
    import os
    import shutil
    import tempfile

    from influxer_spark.operators import timeweight as TW
    from influxer_spark.streaming import read_twa, run_incremental_twa

    ev = _t(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut_s = int((lo + (hi - lo) / 2).timestamp())
    root = tempfile.mkdtemp(prefix="stream_twa_gate_")
    d = {n: os.path.join(root, n) for n in ("input", "out", "ckpt", "stage")}
    os.makedirs(d["input"])
    t = F.unix_timestamp(F.col("ts")).cast("long")
    for name, part in (
        ("a", ev.filter(t <= cut_s)),
        ("b", ev.filter(t > cut_s)),
    ):
        staging = os.path.join(d["stage"], name)
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        if name == "a":
            shutil.copy(
                glob.glob(os.path.join(staging, "part-*.parquet"))[0],
                os.path.join(d["input"], "a.parquet"),
            )
    run_incremental_twa(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    shutil.copy(
        glob.glob(os.path.join(d["stage"], "b", "part-*.parquet"))[0],
        os.path.join(d["input"], "b.parquet"),
    )
    run_incremental_twa(spark, d["input"], ev.schema, d["out"], d["ckpt"])
    t1h = read_twa(spark, d["out"], ["event_type"], "1h")
    return TW.twa_value(t1h).select("event_type", "bucket", "area", "dur", "twa")


_TWA_1H_ORACLE = """
WITH p AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         max(CAST(round(value * 100, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, t, v,
         make_timestamp((t - t % 3600) * 1000000) AS bucket,
         lead(t) OVER (PARTITION BY event_type, t - t % 3600 ORDER BY t) AS nt
  FROM p
)
SELECT event_type, bucket,
       CAST(coalesce(sum(v * (nt - t)), 0) AS BIGINT) AS area,
       max(t) - min(t) AS dur,
       CASE WHEN max(t) > min(t)
            THEN CAST(coalesce(sum(v * (nt - t)), 0) AS DOUBLE)
                 / (max(t) - min(t)) / 100.0
       END AS twa
FROM s GROUP BY 1, 2
"""


def _q_hdr_quantile_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-linear (HDR-style) quantile sketch: 1m sketches CASCADED to 1h,
    then p50/p95/p99 nearest-rank reads.  The oracle builds the hour sketch
    directly from raw points, so a green row proves both the integer bucket
    math (bit-identical across engines — no float log anywhere) and the
    lossless cascade (operators/hdrsketch.py)."""
    from influxer_spark.operators import hdrsketch as H

    ev = _t(spark, sf_dir, "events")
    t1m = H.hdr_rollup(ev, "ts", ["event_type"], "value", "1m")
    t1h = H.hdr_cascade(t1m, ["event_type"], "1h")
    return H.hdr_quantiles(t1h, ["event_type"], (0.5, 0.95, 0.99)).select(
        "event_type", "bucket", "n", "q50", "q95", "q99"
    )


# DuckDB replay of the identical integer bucket math: e = len(bin(v))-1,
# m = (v*2^s) >> e, idx = e*2^s + m - 2^s, lb = (m << e) >> s — all exact
# BIGINT ops, so the hash match is bit-for-bit, not approximate.
_HDR_QUANTILE_ORACLE = """
WITH p AS (
  SELECT event_type,
         make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600) * 1000000) AS bucket,
         greatest(CAST(round(value*100,0) AS BIGINT), 1) AS v
  FROM events
), b AS (
  SELECT event_type, bucket, v, CAST(length(bin(v))-1 AS BIGINT) AS e FROM p
), i AS (
  SELECT event_type, bucket, e*32 + ((v*32) >> e) - 32 AS idx FROM b
), s AS (
  SELECT event_type, bucket, idx, count(*) AS cnt FROM i GROUP BY 1,2,3
), r AS (
  SELECT event_type, bucket, idx, cnt,
         sum(cnt) OVER (PARTITION BY event_type, bucket ORDER BY idx) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket) AS n,
         ((((idx % 32) + 32) << (idx // 32)) >> 5) AS lb
  FROM s
)
SELECT event_type, bucket, CAST(max(n) AS BIGINT) AS n,
  min(CASE WHEN cum >= ceil(0.5*n) THEN lb END)/100.0 AS q50,
  min(CASE WHEN cum >= ceil(0.95*n) THEN lb END)/100.0 AS q95,
  min(CASE WHEN cum >= ceil(0.99*n) THEN lb END)/100.0 AS q99
FROM r GROUP BY 1, 2
"""

# the 4h tier read shares the hour oracle's integer bucket math — only the
# time-bucket modulus differs
_HDR_TIER_4H_ORACLE = _HDR_QUANTILE_ORACLE.replace("% 3600", "% 14400")


def _q_asof_6h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the latest 6h bucket at or before its
    timestamp for its event_type (union+window formulation; oracle is
    DuckDB's native ASOF JOIN)."""
    from influxer_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    r6h = R.rollup_width(ev, "ts", ["event_type"], "value", 21600).select(
        "event_type",
        F.col("bucket").alias("ts"),
        "cnt",
        (_q2(F.col("sum_v")) / 100.0).alias("sum6h"),
    )
    left = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", "event_type", "ts"
    )
    joined = asof_join(left, r6h, by=["event_type"], value_cols=["cnt", "sum6h"])
    return joined.select(
        "event_id", "event_type",
        F.col("asof_ts").alias("asof_bucket"),
        F.col("asof_cnt").alias("asof_cnt"),
        F.col("asof_sum6h").alias("asof_sum6h"),
    )


def _q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 2h lookback tolerance (pandas merge_asof /
    QuestDB TOLERANCE semantics): a 6h bucket older than 2h must NOT
    annotate the event — the match is nulled, not carried."""
    from influxer_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    r6h = R.rollup_width(ev, "ts", ["event_type"], "value", 21600).select(
        "event_type",
        F.col("bucket").alias("ts"),
        "cnt",
    )
    left = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", "event_type", "ts"
    )
    joined = asof_join(
        left, r6h, by=["event_type"], value_cols=["cnt"],
        tolerance_seconds=7200,
    )
    return joined.select(
        "event_id", "event_type",
        F.col("asof_ts").alias("asof_bucket"),
        F.col("asof_cnt").alias("asof_cnt"),
    )


def _q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest' (pandas merge_asof parity): each
    event annotates with whichever 6h bucket start is CLOSER in time —
    behind or ahead — ties to backward.  Oracle = backward ASOF + forward
    ASOF + the same distance CASE in DuckDB."""
    from influxer_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    r6h = R.rollup_width(ev, "ts", ["event_type"], "value", 21600).select(
        "event_type",
        F.col("bucket").alias("ts"),
        "cnt",
    )
    left = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", "event_type", "ts"
    )
    joined = asof_join(
        left, r6h, by=["event_type"], value_cols=["cnt"],
        direction="nearest",
    )
    return joined.select(
        "event_id", "event_type",
        F.col("asof_ts").alias("near_bucket"),
        F.col("asof_cnt").alias("near_cnt"),
    )


def _q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with last-observation-carried-forward (InfluxDB
    fill(previous))."""
    from influxer_spark.operators.gapfill import gapfill_locf

    ev = _t(spark, sf_dir, "events")
    t1h = R.rollup(ev, "ts", ["event_type"], "value", "1h").withColumn(
        "avg_v", _q2(F.col("sum_v")) / (F.col("cnt") * 100.0)
    )
    filled = gapfill_locf(
        t1h.select("event_type", "bucket", "avg_v"), ["event_type"], "avg_v", "1h"
    )
    return filled.select("event_type", "bucket", "avg_v", "filled")


def _q_topk_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count("*").alias("cnt"), (_q2(F.sum("value")) / 100.0).alias("sum_v")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("rank", "user_id", "cnt", "sum_v")
    )


def _q_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24h-window matrix profile over the hourly mean tick series: per
    window, the nearest other window's index and exact integer distance
    (motif/discord primitive).  Integer math end to end — the oracle
    replays the same BIGINT sums in any order."""
    from influxer_spark.operators import matrixprofile as MP

    ev = _t(spark, sf_dir, "events")
    series = MP.hourly_tick_series(ev)
    return MP.matrix_profile(series, ["event_type"], "bucket", "v", m=24)


def _q_matrix_profile_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path stated in operators/matrixprofile.py, proven end to
    end: commit rollup_1m/1h/1d day partitions to a scratch catalog, read
    the 1h tier back through the manifest (read_rollup), derive the exact
    tick series from the TIER's (sum, cnt) — never touching raw again —
    and profile it.  Shares the raw-series oracle: a hash match proves the
    materialize→commit→read→profile path loses nothing."""
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators import matrixprofile as MP
    from influxer_spark.operators.refresh import build_point_tiers
    from influxer_spark.query import read_rollup

    ev = _t(spark, sf_dir, "events")
    cat = TableCatalog(tempfile.mkdtemp(prefix="mp_tier_gate_"))
    build_point_tiers(spark, cat, ev, "ts", ["event_type"], "value")
    t1h = read_rollup(spark, cat, 3600, key_cols=("event_type",))
    series = t1h.select(
        "event_type",
        "bucket",
        F.expr(
            "(100 * CAST(round(sum_v * 100, 0) AS BIGINT)) DIV cnt"
        ).alias("v"),
    )
    return MP.matrix_profile(series, ["event_type"], "bucket", "v", m=24)


_MATRIX_PROFILE_ORACLE = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         (100 * CAST(round(sum(value) * 100, 0) AS BIGINT)) // count(value) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS INT) AS i,
         v
  FROM h
), a AS (
  SELECT event_type, list(v ORDER BY i) AS arr, count(*) AS n FROM s GROUP BY 1
), iw AS (
  SELECT event_type, arr, CAST(n - 24 + 1 AS INT) AS nw FROM a WHERE n - 24 + 1 >= 13
), ii AS (
  SELECT event_type, arr, i
  FROM iw, LATERAL (SELECT CAST(unnest(range(nw)) AS INT) AS i)
), pairs AS (
  SELECT x.event_type, x.i,
         y.j,
         list_reduce(
           list_transform(range(24),
             t -> (x.arr[x.i + t + 1] - x.arr[y.j + t + 1])
                * (x.arr[x.i + t + 1] - x.arr[y.j + t + 1])),
           (p, q) -> p + q) AS d2
  FROM ii x
  JOIN (SELECT event_type, i AS j FROM ii) y USING (event_type)
  WHERE abs(x.i - y.j) >= 12
)
SELECT event_type, i AS idx, j AS nn_idx, d2 AS nn_dist2
FROM pairs
QUALIFY row_number() OVER (PARTITION BY event_type, i ORDER BY d2, j) = 1
"""


def _q_trend_mk_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S / tau + Theil-Sen slope per event_type over the daily
    mean tick series (operators/trend.py): the robust 'is this metric
    drifting?' classifier.  S is an exact integer sign sum, tau and each
    pairwise slope are single IEEE ops on exact integers, and the Theil-Sen
    median replays DuckDB's interpolation bit-exactly — every column
    hash-matches a pair self-join oracle."""
    from influxer_spark.operators.trend import mk_theilsen

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.round(F.sum("value") * 100, 0).cast("long").alias("_cents"),
            F.count("value").alias("_cnt"),
        )
        .withColumn(
            "v",
            F.expr(
                "(100 * _cents) DIV _cnt"
                " - CASE WHEN (100 * _cents) % _cnt < 0 THEN 1 ELSE 0 END"
            ),
        )
    )
    return mk_theilsen(daily, ["event_type"], "bucket", "v")


_TREND_MK_ORACLE = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS bucket,
         (100 * CAST(round(sum(value) * 100, 0) AS BIGINT)) // count(value) AS x
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1
              AS BIGINT) AS i
  FROM d
), p AS (
  SELECT a.event_type,
         CAST(sign(b.x - a.x) AS BIGINT) AS s,
         CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
  FROM r a JOIN r b ON a.event_type = b.event_type AND b.i > a.i
), n AS (
  SELECT event_type, count(*) AS n_points FROM r GROUP BY 1
)
SELECT n.event_type, n.n_points,
       CAST(sum(p.s) AS BIGINT) AS mk_s,
       CAST(sum(p.s) AS DOUBLE) / (n.n_points * (n.n_points - 1) / 2.0) AS mk_tau,
       median(p.slope) AS sen_slope
FROM p JOIN n ON p.event_type = n.event_type
GROUP BY n.event_type, n.n_points
"""


def _q_delete_where_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level COPY-ON-WRITE delete VALUE-oracled (catalog.delete_where):
    land events as a day-partitioned catalog table, serve a takedown for a
    'url list' (user_id % 13 = 0 stands in for the request set) in ONE
    atomic snapshot, and roll up the surviving table.  The oracle is the
    same rollup over events minus the matching rows — a hash match proves
    the COW rewrite deleted exactly the requested ROWS (not partitions)
    and nothing else, through the manifest-pruned rewrite wave."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="delete_gate_")
    try:
        cat = TableCatalog(root)
        days = sorted(
            r["day"]
            for r in ev.select(
                F.date_format("ts", "yyyy-MM-dd").alias("day")
            ).distinct().collect()
        )
        cat.write_partitions(
            ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")),
            "pages_t", days,
        )
        cat.delete_where(spark, "pages_t", "user_id % 13 = 0", reason="takedown")
        back = cat.read_committed(spark, "pages_t")
        out = back.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.countDistinct("user_id").alias("users"),
        )
        # materialize before removing the scratch catalog (lazy reads)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DELETE_TAKEDOWN_ORACLE = """
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,
       min(value) AS min_v, max(value) AS max_v,
       count(DISTINCT user_id) AS users
FROM events
WHERE COALESCE(user_id % 13 = 0, FALSE) = FALSE
GROUP BY 1
"""


def _q_update_where_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level COPY-ON-WRITE update VALUE-oracled (catalog.update_where):
    land events day-partitioned, then redact one user cohort in place —
    SET value = value * 2, props = '[redacted]' WHERE user_id % 13 = 0 —
    in one atomic snapshot, and roll up the result.  The oracle applies
    the same CASE algebra over raw events; a hash match proves the
    rewrite updated exactly the matching rows and passed every other row
    through byte-equal."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="update_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        cat.write_partitions(withday, "pages_t", days)
        cat.update_where(
            spark, "pages_t", "user_id % 13 = 0",
            {"value": "value * 2", "props": "'[redacted]'"},
            reason="redact cohort",
        )
        back = cat.read_committed(spark, "pages_t")
        out = back.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
            F.sum((F.col("props") == "[redacted]").cast("long")).alias("redacted"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_UPDATE_REDACT_ORACLE = """
WITH u AS (
  SELECT event_type,
         CASE WHEN COALESCE(user_id % 13 = 0, FALSE)
              THEN value * 2 ELSE value END AS value,
         CASE WHEN COALESCE(user_id % 13 = 0, FALSE)
              THEN '[redacted]' ELSE props END AS props
  FROM events
)
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,
       CAST(count(*) FILTER (WHERE props = '[redacted]') AS BIGINT) AS redacted
FROM u GROUP BY 1
"""


def _q_wap_publish_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish VALUE-oracled (catalog.stage_partitions /
    read_staged / publish_staged): stage the full events table invisibly,
    AUDIT the staged wave through the token (row count must match the
    source — the validation a training-data pipeline runs before a
    snapshot goes live), publish in one snapshot, and roll up the now-
    visible table.  The oracle is the plain rollup over events; a hash
    match proves stage→audit→publish is byte-lossless."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="wap_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        tok = cat.stage_partitions(withday, "pages_t", days)
        audited = cat.read_staged(spark, tok).count()
        if audited != ev.count():  # the audit gate itself
            raise AssertionError(f"WAP audit failed: {audited} staged rows")
        cat.publish_staged(tok, reason="gate audit passed")
        back = cat.read_committed(spark, "pages_t")
        out = back.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_WAP_ORACLE = """
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY 1
"""


def _q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg schema evolution VALUE-oracled (catalog snapshot-recorded
    schemas; tests/test_pipeline.py:511 pins the full contract): wave 1
    commits the first half of the days WITHOUT the ``vq`` column, wave 2
    adds it, and the current read PROJECTS the evolved schema — old
    partitions return NULL for the added column, no parquet rewrite.  The
    query also asserts the time-travel shape (the pre-evolution snapshot
    must NOT show ``vq``) before aggregating.  The oracle recomputes the
    same per-type counts/sums treating pre-cutoff rows as NULL ``vq``; a
    hash match proves the projection fed exactly the evolved values."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    cutoff = "2024-01-16"
    root = tempfile.mkdtemp(prefix="evo_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        old_days = [d for d in days if d < cutoff]
        new_days = [d for d in days if d >= cutoff]
        cat.write_partitions(
            withday.filter(F.col("day").isin(old_days)), "pages_t", old_days
        )
        s1 = cat.current_snapshot("pages_t")
        cat.write_partitions(
            withday.filter(F.col("day").isin(new_days)).withColumn(
                "vq", F.round(F.col("value") * 100, 0).cast("long")
            ),
            "pages_t",
            new_days,
        )
        if "vq" in cat.read_committed(spark, "pages_t", as_of=s1).columns:
            raise AssertionError(
                "time-travel leaked the evolved column into snapshot s1"
            )
        cur = cat.read_committed(spark, "pages_t")
        out = cur.groupBy("event_type").agg(
            F.count("*").alias("cnt_total"),
            F.count("vq").alias("cnt_vq"),
            F.sum("vq").alias("sum_vq_c"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SCHEMA_EVOLUTION_ORACLE = """
SELECT event_type, count(*) AS cnt_total,
       count(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 END)
         AS cnt_vq,
       CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                     THEN CAST(round(value * 100, 0) AS BIGINT) END)
            AS BIGINT) AS sum_vq_c
FROM events GROUP BY 1
"""


def _q_incremental_read_new_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg incremental read VALUE-oracled (catalog.read_increment):
    commit all but the last two days, snapshot, land the remaining days,
    then read ONLY what changed since the snapshot — the poll an
    incremental training-data exporter runs instead of rescanning the
    table.  The oracle aggregates events of exactly those two days; a
    hash match proves the metadata diff selected precisely the new
    partitions and the scan read them at the target snapshot."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="inc_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        head, tail = days[:-2], days[-2:]
        cat.write_partitions(
            withday.filter(F.col("day").isin(head)), "pages_t", head
        )
        s1 = cat.current_snapshot("pages_t")
        cat.write_partitions(
            withday.filter(F.col("day").isin(tail)), "pages_t", tail
        )
        inc = cat.read_increment(spark, "pages_t", s1)
        out = inc.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_INCREMENT_ORACLE = """
WITH dd AS (
  SELECT DISTINCT date_trunc('day', ts) AS day FROM events
  ORDER BY day DESC LIMIT 2
)
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v
FROM events
WHERE date_trunc('day', ts) IN (SELECT day FROM dd)
GROUP BY 1
"""


def _q_stats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest column-stats data skipping VALUE-oracled (catalog.
    write_partitions(stats_cols=) → read_where): commit events as a
    day-partitioned catalog table recording per-partition (min, max) for
    ``ts``, then answer a 3-day range query through the zone maps — the
    read opens only the partitions whose recorded range can intersect
    (asserted: the prune must drop most of the month) and the residual
    filter makes the answer exact.  Oracle = the same filter over the raw
    table; a hash match proves skipping never changed the answer."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    lo, hi = "2024-01-10 00:00:00", "2024-01-12 23:59:59.999999"
    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="stats_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        cat.write_partitions(withday, "pages_t", days, stats_cols=["ts"])
        pruned = cat.pruned_partitions("pages_t", "ts", lo, hi)
        if not pruned or len(pruned) >= len(days):  # the skip must be real
            raise AssertionError(
                f"zone maps pruned nothing: {len(pruned)}/{len(days)} kept"
            )
        out = (
            cat.read_where(spark, "pages_t", "ts", lo, hi)
            .groupBy("event_type")
            .agg(
                F.count("value").alias("cnt"),
                (_q2(F.sum("value")) / 100.0).alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_STATS_PRUNED_ORACLE = """
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,
       min(value) AS min_v, max(value) AS max_v
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-12 23:59:59.999999'
GROUP BY 1
"""


def _q_partition_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg partition-spec evolution VALUE-oracled: the table starts
    day-partitioned, then the LAST day lands at hour granularity (the spec
    change a hot table makes when daily partitions grow too coarse — old
    data is never rewritten; Iceberg v2 keeps both specs side by side).
    Partition values are opaque manifest keys and pruning works off
    recorded column stats, so a ts-range read spanning the boundary must
    (a) prune at BOTH granularities — asserted: at most one day partition
    plus the covered hour partitions survive — and (b) stay exact.  Oracle
    = the same filter over the raw table."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    lo, hi = "2024-01-29 12:00:00", "2024-01-30 11:59:59.999999"
    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="pevo_gate_")
    try:
        cat = TableCatalog(root)
        old = ev.filter(F.col("ts") < "2024-01-30").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        days = sorted(r["day"] for r in old.select("day").distinct().collect())
        cat.write_partitions(old, "pages_t", days, stats_cols=["ts"])
        hot = ev.filter(F.col("ts") >= "2024-01-30").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd-'H'HH")
        )
        hours = sorted(r["day"] for r in hot.select("day").distinct().collect())
        cat.write_partitions(hot, "pages_t", hours, stats_cols=["ts"])
        pruned = cat.pruned_partitions("pages_t", "ts", lo, hi)
        # the range covers one day partition + at most 12 hour partitions;
        # keeping more means pruning failed at one of the granularities
        if not pruned or len(pruned) > 13:
            raise AssertionError(
                f"mixed-spec prune kept {len(pruned)} of "
                f"{len(days) + len(hours)} partitions"
            )
        out = (
            cat.read_where(spark, "pages_t", "ts", lo, hi)
            .groupBy("event_type")
            .agg(
                F.count("value").alias("cnt"),
                (_q2(F.sum("value")) / 100.0).alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PARTITION_EVOLUTION_ORACLE = """
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,
       min(value) AS min_v, max(value) AS max_v
FROM events
WHERE ts >= TIMESTAMP '2024-01-29 12:00:00'
  AND ts <= TIMESTAMP '2024-01-30 11:59:59.999999'
GROUP BY 1
"""


def _q_archive_exact_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-mean integer archive VALUE-oracled (intcodec
    encode_dual_series_df int_col2= → query.read_exact_rollup): the 1m
    tier's (cnt, sum_cents) series encode as two zigzag-delta+simple8b
    blobs in ONE table row, land as day partitions, and re-aggregate to
    5m buckets EXACTLY from the decoded archive — integer sums end to
    end, mean derived in one float shape at read time.  This is what
    lets retention expire the plain 1m tier while any-width re-rollup
    stays exact (the float Gorilla path can only replay its own width).
    Oracle replays the same cents quantization and re-bucket in SQL."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators.intcodec import encode_dual_series_df
    from influxer_spark.query import read_exact_rollup

    ev = _t(spark, sf_dir, "events")
    t1m = R.rollup(ev, "ts", ["event_type"], "value", "1m")
    src = (
        t1m.withColumn("day", F.date_format("bucket", "yyyy-MM-dd"))
        .withColumn("v", F.col("sum_v") / F.col("cnt"))
        .withColumn("sum_cents", F.round(F.col("sum_v") * 100, 0).cast("long"))
    )
    enc = (
        encode_dual_series_df(
            src, ["day", "event_type"], "bucket", "v", "cnt",
            int_col2="sum_cents",
        )
        .withColumn("day", F.element_at("series_keys", 1))
        .select(
            "series_keys", "n_points",
            F.col("int_blob").alias("blob"), "raw_bytes",
            F.col("int_bytes").alias("encoded_bytes"),
            F.col("int2_blob").alias("sum_blob"),
            F.col("int2_bytes").alias("sum_bytes"), "day",
        )
    )
    days = sorted(r["day"] for r in src.select("day").distinct().collect())
    root = tempfile.mkdtemp(prefix="arch_gate_")
    try:
        cat = TableCatalog(root)
        cat.write_partitions(enc, "rollup_1m_counts", days)
        out = read_exact_rollup(
            spark, cat, 300, key_cols=("event_type",)
        ).orderBy("event_type", "bucket")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_ARCHIVE_EXACT_ORACLE = """
WITH m AS (
  SELECT event_type, date_trunc('minute', ts) AS b1m,
         count(value) AS cnt,
         CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       make_timestamp((CAST(floor(epoch(b1m)) AS BIGINT)
         - CAST(floor(epoch(b1m)) AS BIGINT) % 300) * 1000000) AS bucket,
       CAST(sum(cnt) AS BIGINT) AS cnt,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / CAST(100.0 AS DOUBLE)
         / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) AS mean_v
FROM m GROUP BY 1, 2
"""


def _q_branch_publish_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch refs VALUE-oracled (catalog.create_branch → branch= wave
    commits → fast_forward): half the month lands on main, the rest lands
    on an 'audit' branch in TWO separate wave commits (the multi-commit
    isolation single-snapshot WAP cannot express), main is verified
    unchanged between them, then fast_forward publishes the branch head
    atomically.  Oracle = the plain rollup over ALL events; a hash match
    proves the branch line carried both waves byte-losslessly into main."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="branch_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        head_days, mid_days, tail_days = days[:-10], days[-10:-5], days[-5:]
        cat.write_partitions(
            withday.filter(F.col("day").isin(head_days)), "pages_t", head_days
        )
        main_before = cat.current_snapshot("pages_t")
        cat.create_branch("pages_t", "audit")
        cat.write_partitions(
            withday.filter(F.col("day").isin(mid_days)), "pages_t", mid_days,
            branch="audit",
        )
        cat.write_partitions(
            withday.filter(F.col("day").isin(tail_days)), "pages_t", tail_days,
            branch="audit",
        )
        if cat.current_snapshot("pages_t") != main_before:  # isolation gate
            raise AssertionError("branch commits moved the main pointer")
        cat.fast_forward("pages_t", "audit")
        back = cat.read_committed(spark, "pages_t")
        out = back.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_tagged_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot tags VALUE-oracled (catalog.create_tag → as_of=tag reads →
    tag-aware expire_snapshots): commit events as day partitions, tag the
    snapshot 'release', then corrupt every day (value + 1000 — a botched
    refresh) and run maintenance with keep_last=1.  The tagged snapshot
    must survive expiry AND answer by name: the rollup over
    ``as_of='release'`` hash-matches the oracle over the ORIGINAL events,
    proving the pinned release is byte-stable through later bad writes
    and routine maintenance."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="tag_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        cat.write_partitions(withday, "pages_t", days)
        cat.create_tag("pages_t", "release")
        corrupted = withday.withColumn("value", F.col("value") + 1000.0)
        cat.write_partitions(corrupted, "pages_t", days)
        cat.expire_snapshots("pages_t", keep_last=1)
        back = cat.read_committed(spark, "pages_t", as_of="release")
        out = back.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_merge_into_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE INTO VALUE-oracled (catalog.merge_into): land
    events as a day-partitioned catalog table, then 'the re-crawl lands' —
    every 11th event's row is REPLACED (value + 1.0) and every 17th event
    re-appears under a new id (INSERT) — in one atomic snapshot.  The
    oracle applies the same matched-replace/unmatched-insert algebra in
    SQL; a hash match proves the anti-join + wave rewrite upserted exactly
    the source rows and left every other row untouched."""
    import shutil
    import tempfile

    from influxer_spark.catalog import TableCatalog

    ev = _t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="merge_gate_")
    try:
        cat = TableCatalog(root)
        withday = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        days = sorted(
            r["day"] for r in withday.select("day").distinct().collect()
        )
        cat.write_partitions(withday, "pages_t", days)
        updates = withday.filter("event_id % 11 = 0").withColumn(
            "value", F.col("value") + F.lit(1.0)
        )
        inserts = withday.filter("event_id % 17 = 0").withColumn(
            "event_id", F.col("event_id") + F.lit(1_000_000_000)
        )
        cat.merge_into(
            spark, "pages_t", updates.unionByName(inserts), ["event_id"],
            reason="recrawl",
        )
        back = cat.read_committed(spark, "pages_t")
        out = back.groupBy("event_type").agg(
            F.count("value").alias("cnt"),
            (_q2(F.sum("value")) / 100.0).alias("sum_v"),
            F.countDistinct("event_id").alias("ids"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MERGE_RECRAWL_ORACLE = """
WITH up AS (
  SELECT event_id, ts, user_id, event_type, value + 1.0 AS value, props
  FROM events WHERE event_id % 11 = 0
), ins AS (
  SELECT event_id + 1000000000 AS event_id, ts, user_id, event_type, value, props
  FROM events WHERE event_id % 17 = 0
), keep AS (
  SELECT event_id, ts, user_id, event_type, value, props
  FROM events WHERE event_id % 11 <> 0 OR event_id IS NULL
), merged AS (
  SELECT * FROM keep UNION ALL SELECT * FROM up UNION ALL SELECT * FROM ins
)
SELECT event_type, count(value) AS cnt,
       CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,
       count(DISTINCT event_id) AS ids
FROM merged GROUP BY 1
"""


def _q_matrix_profile_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AB-join profile: every 12h window of the FINAL 9 days vs the first
    21 days of the same series — "did this shape occur in the reference
    period?" (novelty detection between two time ranges)."""
    from influxer_spark.operators import matrixprofile as MP

    ev = _t(spark, sf_dir, "events")
    series = MP.hourly_tick_series(ev)
    cut = F.lit("2024-01-22 00:00:00").cast("timestamp")
    recent = series.filter(F.col("bucket") >= cut)
    reference = series.filter(F.col("bucket") < cut)
    return MP.matrix_profile_ab(
        recent, reference, ["event_type"], "bucket", "v", m=12
    )


_MATRIX_PROFILE_AB_ORACLE = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         (100 * CAST(round(sum(value) * 100, 0) AS BIGINT)) // count(value) AS v
  FROM events GROUP BY 1, 2
), sa AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS INT) AS i,
         v
  FROM h WHERE bucket >= TIMESTAMP '2024-01-22 00:00:00'
), sb AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS INT) AS i,
         v
  FROM h WHERE bucket < TIMESTAMP '2024-01-22 00:00:00'
), aa AS (
  SELECT event_type, list(v ORDER BY i) AS arr, count(*) AS n FROM sa GROUP BY 1
), ab AS (
  SELECT event_type, list(v ORDER BY i) AS arr, count(*) AS n FROM sb GROUP BY 1
), ia AS (
  SELECT event_type, arr, i
  FROM (SELECT event_type, arr, CAST(n - 12 + 1 AS INT) AS nw FROM aa WHERE n >= 12),
       LATERAL (SELECT CAST(unnest(range(nw)) AS INT) AS i)
), ib AS (
  SELECT event_type, arr, i AS j
  FROM (SELECT event_type, arr, CAST(n - 12 + 1 AS INT) AS nw FROM ab WHERE n >= 12),
       LATERAL (SELECT CAST(unnest(range(nw)) AS INT) AS i)
), pairs AS (
  SELECT x.event_type, x.i, y.j,
         list_reduce(
           list_transform(range(12),
             t -> (x.arr[x.i + t + 1] - y.arr[y.j + t + 1])
                * (x.arr[x.i + t + 1] - y.arr[y.j + t + 1])),
           (p, q) -> p + q) AS d2
  FROM ia x JOIN ib y USING (event_type)
)
SELECT event_type, i AS idx, j AS nn_idx, d2 AS nn_dist2
FROM pairs
QUALIFY row_number() OVER (PARTITION BY event_type, i ORDER BY d2, j) = 1
"""


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session; count per user."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("_new", new_sess)
        .groupBy("user_id")
        .agg(F.sum("_new").cast("long").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function parity (F1 regex extract): pull k out of the props JSON."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("cnt"),
            F.sum("k").alias("sum_k"),
            (F.sum("k") / F.count("k")).alias("avg_k"),
        )
    )


def _q_pivot_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perfmon wide reshape (SURVEY A1): pivot event_type counts per hour."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    p = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(t), F.lit(0)).alias(f"cnt_{t}") for t in types]
    return p.select("bucket", *cols)


def _q_retention_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-DAG anti-join (SURVEY §2.5): raw minutes NOT yet covered by a
    rollup built only through 2024-01-15 → candidates that must block expiry."""
    ev = _t(spark, sf_dir, "events")
    rolled = R.rollup(
        ev.filter(F.col("ts") < F.lit("2024-01-15")), "ts", ["event_type"], "value", "1m"
    )
    raw_buckets = ev.select(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).distinct()
    return (
        raw_buckets.join(
            rolled.select("bucket", "event_type"), on=["bucket", "event_type"], how="left_anti"
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("pending_buckets"))
    )


# ---------------------------------------------------------------------------
# queries — relational coverage (lineitem / orders / customer / nation)
# ---------------------------------------------------------------------------

def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _q2(F.sum("l_quantity")).alias("_q"),
            _q2(F.sum("l_extendedprice")).alias("_p"),
            (_q2(F.sum(disc_price)) / 100.0).alias("sum_disc_price"),
            (_q2(F.sum(charge)) / 100.0).alias("sum_charge"),
            _q2(F.sum("l_discount")).alias("_d"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            (F.col("_q") / 100.0).alias("sum_qty"),
            (F.col("_p") / 100.0).alias("sum_base_price"),
            "sum_disc_price", "sum_charge",
            (F.col("_q") / (F.col("count_order") * 100.0)).alias("avg_qty"),
            (F.col("_p") / (F.col("count_order") * 100.0)).alias("avg_price"),
            (F.col("_d") / (F.col("count_order") * 100.0)).alias("avg_disc"),
            "count_order",
        )
    )


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join chain with explicit broadcast of the small dims (SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            (_q2(F.sum("o_totalprice")) / 100.0).alias("revenue"),
        )
    )


def _q_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perfmon narrow reshape (SURVEY A1 narrow mode): wide metric columns →
    long (metric, value) points, then per-metric stats."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
        "'discount', l_discount, 'tax', l_tax) as (metric, value)"
    )
    return long.groupBy("metric").agg(
        F.count("value").alias("cnt"),
        (_q2(F.sum("value")) / 100.0).alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# The driver's correctness gate records the FIRST 50 entries of queries() in
# declaration order.  Rounds 1-2 proved 59 distinct queries (50 in r02 + 9
# r01-only ingest-parity); round 3 front-loads the never-driver-checked,
# value-oracled queries — including every round-3 addition — into positions
# 1-50.  59 such queries exist and only 50 fit, so positions 51-59 hold the
# nine deferred ones: each is a close sibling of a query that IS in the window
# or was driver-proven in r01/r02 (noted inline), all are green in the local
# replica gate (tools/compare_oracle.py) and pytest, and they are first in
# line for the round-4 window.  Already-proven queries follow, and the
# rows-only entries (no SQL oracle by nature) sit at the very tail so they
# never burn a hard-signal slot.
_WINDOW_PRIORITY = [
    # ---- positions 1-50: never driver-checked, all value-oracled ----
    "stratified_sample_lang",
    "upsample_epochs_mixture",
    "global_shuffle_documents",
    "embedding_quantize_int8",
    "dedup_cluster_keep",
    "line_protocol_roundtrip",
    "influxql_math_6h",
    "influxql_fill_linear_6h",
    "influxql_deriv_sum_6h",
    "influxql_subquery_6h_max",
    "influxql_multi_measurement",
    "influxql_ema_series",
    "influxql_rsi_series",
    "influxql_cmo_ker_series",
    "influxql_kama_series",
    "influxql_trix_series",
    "influxql_counter_rate",
    "lttb_downsample_50",
    "m4_downsample_1h",
    "seasonal_decompose_24h",
    "acf_48_hourly",
    "series_corr_hourly",
    "deadman_1h",
    "anomaly_mad_hourly",
    "cusum_changepoints_hourly",
    "line_dedup_corpus",
    "url_canonicalize",
    "pii_scrub_counts",
    # -- round-3 additions (value-oracled) fill the rest of the window --
    "twa_1h_cascade",
    "influxql_moving_median",
    "incremental_dedup_shard",
    "bloom_decontam",
    "heavy_hitters_1d",
    "cross_corr_lags",
    "curation_funnel",
    "stream_heavy_hitters_replay",
    "gopher_quality_flags",
    "containment_dedup",
    "bigram_logprob_scores",
    "snaive_mase_24h",
    "kmv_distinct_1d",
    "stream_kmv_replay_1d",
    "kmv_tier_read_4h",
    "interval_join_2h",
    "weighted_sample_quality",
    "dsir_resample_en",
    "influxql_counter_family",
    "influxql_approx_distinct",
    "resid_anomaly_24h",
    "sax_daily_motifs",
    # ---- positions 51-59: deferred to the round-4 window (each has a
    # driver-proven or in-window sibling; all replica-gate + pytest green) ----
    "line_protocol_events",        # sibling: line_protocol_roundtrip (in window)
    "influxql_nnd_6h",             # derivative path: influxql_deriv_sum_6h + counter_rate
    "influxql_count_distinct_1d",  # distinct path: influxql_approx_distinct (in window)
    "influxql_slimit_series",      # series pagination garnish on proven GROUP BY machinery
    "influxql_show_tag_values",    # metadata query; SHOW family shares one code path
    "influxql_top_per_tag",        # sibling: influxql_top3_hours (r01-proven)
    "influxql_fill_previous_6h",   # LOCF: gapfill_1h_locf (r01) + fill_linear (in window)
    "influxql_mode_median_6h",     # median: influxql_selectors_1h (r01) + moving_median
                                   # (in window); mode shares the selector rank path
    "stream_sessionize_replay",    # siblings: sessionize_30m (r01) + stream replay
                                   # harness proven by stream_rollup_replay_1m (r02)
                                   # and stream_heavy_hitters/kmv_replay (in window)
    "dotnet_round2_parity",        # r01-proven; re-prove when a slot frees up
    # ---- added after the round-3 window froze (value-oracled in the local
    # replica gate; next in line with the deferrals above) ----
    "tier_refresh_1h",
    "influxql_show_cardinality",
    "influxql_wildcard_agg",
    "alert_transitions_1h",
    "stream_alert_replay",
    "realtime_rollup_4h",
    "hdr_quantile_1h",
    "influxql_sigma_1h",
    "c4_quality_flags",
    "rrf_hybrid_topk",
    "exact_substr_dedup",
    "stream_hdr_replay_1h",
    "hdr_tier_read_4h",
    "stream_twa_replay_1h",
    "tier_stddev_1h",
    "kmv_set_ops_1d",
    "tvd_drift_daily",
    "topk_exact_users",
    "centroid_cosine_labels",
    "stream_deadman_replay",
    "incremental_minhash_shard",
    "hdr_seasonal_band",
    "stream_stddev_replay_1h",
    "chunk_documents_32_8",
    "kmv_sliding_24h",
    "rollup_sliding_24h",
    "seasonal_band_anomaly_1h",
    "hdr_sliding_p95_24h",
    "sumsq_sliding_24h",
    "mixture_plan_sources",
    "hdr_histogram_1d",
    "funnel_view_click_purchase",
    "cohort_retention_daily",
    "event_transition_matrix",
    "funnel_latency_quantiles",
    "ann_ivf_index_topk",
    "matrix_profile_24h",
    "matrix_profile_ab_recent",
    "influxql_matrix_profile",
    "matrix_profile_tier_read",
    "export_train_shards",
    "dominant_period_48",
    "ngram_novelty_scores",
    "ivf_pq_index_topk",
    "ivf_pq_index_extend_topk",
    "stream_ivfpq_extend_replay",
    "trend_mk_theilsen_daily",
    "delete_where_takedown",
    "merge_into_recrawl",
    "update_where_redact",
    "influxql_trend_hourly",
    "incremental_read_new_days",
    "wap_publish_rollup",
    "forecast_linear_24h",
    "influxql_forecast_linear",
    "schema_evolution_read",
    "partition_evolution_read",
    "ohlc_1h",
    "ohlc_1d_cascade",
    "ohlc_tier_read_4h",
    "stream_ohlc_replay_1h",
    "ohlc_sliding_24h",
    "influxql_offset_6h1h",
    # ---- round-4 additions: rows-only queries converted to value oracles
    # (recursive-CTE replays of the exact kernel op order) ----
    "theta_forecast_24h",
    "dtw_pairs_hourly",
    "pelt_segments_hourly",
    "influxql_tz_tier_1d",
    "kmv_tz_tier_1d",
    # ---- round-5 additions ----
    "decode_image_meta",
    "influxql_tz_fill_tier_6h",
    "decode_av_meta",
    "influxql_tz_offset_tier_6h1h",
    "kmv_offset_tier_4h1h",
    "hdr_offset_tier_6h1h",
]

# Rows-only queries (genuinely non-SQL-expressible internals) — always last.
_WINDOW_TAIL = [
    # rows-only entries (no SQL oracle exists): keep them out of the
    # driver's 50-slot value-check window so oracled queries fill it
    "sketch_distinct_tiers",       # Spark-builtin DataSketches HLL — no
                                   # DuckDB equivalent exists
    "holt_winters_forecast_24h",   # Nelder-Mead trajectory — gate output
                                   # pinned bit-for-bit vs the Python
                                   # mirror on the identical series
                                   # (test_holtwinters.py::*mirror*)
    "bpe_train_merges",    # iterative argmax — pytest-pinned vs reference
    "bpe_encode_tokens",   # rank-greedy loop — pytest-pinned vs reference
    "asap_smooth_hourly",  # ACF-peak search — gate output pinned
                           # bit-for-bit vs the kernel over an
                           # independently-built DuckDB series
                           # (test_asap.py::*independent*)
]


def _driver_proven(records_dir: str | None = None) -> set[str]:
    """Query names with a green (hash-matched) row in ANY recorded
    CORRECTNESS_r*.json next to this file.

    The driver value-checks only the FIRST 50 ``queries()`` entries per
    round, so with >50 oracled queries the window must rotate.  Reading the
    recorded results makes the rotation automatic and deterministic: every
    round, queries that have never earned a green row sort ahead of ones
    that already have, so successive rounds' windows tile the whole set
    with no manual reordering (and a query whose check FAILED stays in the
    window until it passes)."""
    import glob as _glob
    import json as _json

    here = records_dir or os.path.dirname(os.path.abspath(__file__))
    proven: set[str] = set()
    for path in sorted(_glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rec = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rec.items():
            if isinstance(row, dict) and row.get("hash_match"):
                proven.add(name)
    return proven


def _reorder_for_gate(
    q: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    proven = _driver_proven()
    # stable base order: explicit priority list first, then declaration order
    base = [k for k in _WINDOW_PRIORITY if k in q]
    base += [k for k in q if k not in base and k not in _WINDOW_TAIL]
    ordered = {k: q[k] for k in base if k not in proven}
    ordered.update({k: q[k] for k in base if k in proven})
    ordered.update({k: q[k] for k in _WINDOW_TAIL if k in q})
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reorder_for_gate(_queries_unordered())


def _queries_unordered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": _q_rollup_1m,
        "rollup_1h_cascade": _q_rollup_1h_cascade,
        "rollup_1d_cascade": _q_rollup_1d_cascade,
        "ohlc_1h": _q_ohlc_1h,
        "ohlc_1d_cascade": _q_ohlc_1d_cascade,
        "ohlc_tier_read_4h": _q_ohlc_tier_read_4h,
        "stream_ohlc_replay_1h": _q_stream_ohlc_replay,
        "ohlc_sliding_24h": _q_ohlc_sliding,
        "rollup_1m_salted": _q_rollup_1m_salted,
        "sketch_distinct_tiers": _q_sketch_distinct_tiers,
        "hist_quantile_1h": _q_hist_quantile_1h,
        "gorilla_roundtrip_1m": _q_gorilla_roundtrip,
        "simple8b_roundtrip_1m": _q_simple8b_roundtrip,
        "stream_rollup_replay_1m": _q_stream_rollup_replay,
        "rollup_5m_width": _q_rollup_5m_width,
        "tier_refresh_1h": _q_tier_refresh_1h,
        "concurrent_wave_commits": _q_concurrent_wave_commits,
        "realtime_rollup_4h": _q_realtime_rollup_4h,
        "stitched_rollup_90m": _q_stitched_rollup_90m,
        "twa_1h_cascade": _q_twa_1h_cascade,
        "stream_twa_replay_1h": _q_stream_twa_replay,
        "tier_stddev_1h": _q_tier_stddev_1h,
        "kmv_set_ops_1d": _q_kmv_set_ops,
        "tvd_drift_daily": _q_tvd_drift_daily,
        "topk_exact_users": _q_topk_exact,
        "centroid_cosine_labels": _q_centroid_cosine,
        "stream_deadman_replay": _q_stream_deadman_replay,
        "hdr_seasonal_band": _q_hdr_seasonal_band,
        "stream_stddev_replay_1h": _q_stream_sumsq_replay,
        "chunk_documents_32_8": _q_chunk_documents,
        "kmv_sliding_24h": _q_kmv_sliding,
        "rollup_sliding_24h": _q_rollup_sliding,
        "seasonal_band_anomaly_1h": _q_seasonal_band_anomaly,
        "hdr_sliding_p95_24h": _q_hdr_sliding,
        "sumsq_sliding_24h": _q_sumsq_sliding,
        "mixture_plan_sources": _q_mixture_plan,
        "hdr_histogram_1d": _q_hdr_histogram,
        "funnel_view_click_purchase": _q_funnel,
        "cohort_retention_daily": _q_cohort_retention,
        "event_transition_matrix": _q_event_transitions,
        "funnel_latency_quantiles": _q_funnel_latency,
        "hdr_quantile_1h": _q_hdr_quantile_1h,
        "stream_hdr_replay_1h": _q_stream_hdr_replay,
        "hdr_tier_read_4h": _q_hdr_tier_read_4h,
        "heavy_hitters_1d": _q_heavy_hitters_1d,
        "kmv_distinct_1d": _q_kmv_distinct_1d,
        "stream_kmv_replay_1d": _q_stream_kmv_replay,
        "kmv_tier_read_4h": _q_kmv_tier_read_4h,
        "interval_join_2h": _q_interval_join_2h,
        "asof_join_6h_stats": _q_asof_6h_stats,
        "asof_join_tolerance_2h": _q_asof_tolerance,
        "asof_join_nearest_6h": _q_asof_nearest,
        "gapfill_1h_interpolate": _q_gapfill_1h,
        "gapfill_1h_locf": _q_gapfill_locf,
        "topk_hot_users": _q_topk_hot_users,
        "sessionize_30m": _q_sessionize,
        "matrix_profile_24h": _q_matrix_profile,
        "trend_mk_theilsen_daily": _q_trend_mk_theilsen,
        "delete_where_takedown": _q_delete_where_takedown,
        "merge_into_recrawl": _q_merge_into_recrawl,
        "update_where_redact": _q_update_where_redact,
        "incremental_read_new_days": _q_incremental_read_new_days,
        "schema_evolution_read": _q_schema_evolution_read,
        "partition_evolution_read": _q_partition_evolution_read,
        "wap_publish_rollup": _q_wap_publish_rollup,
        "stats_pruned_read": _q_stats_pruned_read,
        "tagged_snapshot_read": _q_tagged_snapshot_read,
        "branch_publish_rollup": _q_branch_publish_rollup,
        "archive_exact_rollup_5m": _q_archive_exact_rollup,
        "matrix_profile_ab_recent": _q_matrix_profile_ab,
        "matrix_profile_tier_read": _q_matrix_profile_tier,
        "stream_sessionize_replay": _q_stream_sessionize,
        "stream_heavy_hitters_replay": _q_stream_heavy_hitters,
        "json_props_extract": _q_json_props,
        "pivot_event_counts_hourly": _q_pivot_hourly,
        "retention_candidates": _q_retention_candidates,
        "tpch_q1_pricing_summary": _q_tpch_q1,
        "revenue_by_nation": _q_revenue_by_nation,
        "unpivot_lineitem_metrics": _q_unpivot_lineitem,
        **training_queries(),
        **ingest_queries(),
        **influxql_queries(),
        **webclean_queries(),
    }


_ROLLUP_SELECT = (
    "SELECT date_trunc('{unit}', ts) AS bucket, event_type, "
    "count(value) AS cnt, "
    "CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v, "
    "min(value) AS min_v, max(value) AS max_v, "
    "CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0) AS avg_v "
    "FROM events GROUP BY 1, 2"
)

_GAPFILL_SQL = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0) AS obs
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type,
         unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
  FROM h GROUP BY event_type
), j AS (
  SELECT s.event_type, s.bucket, h.obs, CAST(epoch(s.bucket) AS DOUBLE) AS t
  FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.bucket = s.bucket
), w AS (
  SELECT *,
    last_value(obs IGNORE NULLS) OVER wb AS pv,
    last_value(CASE WHEN obs IS NOT NULL THEN t END IGNORE NULLS) OVER wb AS pt,
    first_value(obs IGNORE NULLS) OVER wf AS nv,
    first_value(CASE WHEN obs IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS nt
  FROM j
  WINDOW
    wb AS (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
  CASE WHEN obs IS NOT NULL THEN obs
       ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END AS avg_v,
  (obs IS NULL) AS filled
FROM w
"""


def oracle_sql() -> dict[str, str]:
    pivot_cols = ", ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS cnt_{t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    return {
        "rollup_1m": _ROLLUP_SELECT.format(unit="minute"),
        "concurrent_wave_commits": _ROLLUP_SELECT.format(unit="minute"),
        # a resumed stream's merged partials must equal the batch rollup
        "stream_rollup_replay_1m": (
            "SELECT date_trunc('minute', ts) AS bucket, event_type, "
            "count(value) AS cnt, "
            "CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v, "
            "min(value) AS min_v, max(value) AS max_v "
            "FROM events GROUP BY 1, 2"
        ),
        # the Gorilla round trip must reproduce the plain rollup exactly
        # the simple8b integer round trip must reproduce the count rollup
        "simple8b_roundtrip_1m": (
            "SELECT date_trunc('minute', ts) AS bucket, event_type, "
            "count(value) AS cnt FROM events GROUP BY 1, 2"
        ),
        "gorilla_roundtrip_1m": (
            "SELECT date_trunc('minute', ts) AS bucket, event_type, "
            "CAST(round(sum(value) * 100, 0) AS BIGINT) "
            "/ (count(value) * 100.0) AS avg_v "
            "FROM events GROUP BY 1, 2"
        ),
        "hist_quantile_1h": _hist_quantile_oracle(),
        "twa_1h_cascade": _TWA_1H_ORACLE,
        "stream_twa_replay_1h": _TWA_1H_ORACLE,
        "tier_stddev_1h": _TIER_STDDEV_ORACLE,
        "kmv_set_ops_1d": _KMV_SET_OPS_ORACLE,
        "tvd_drift_daily": _TVD_DRIFT_ORACLE,
        "topk_exact_users": _TOPK_EXACT_ORACLE,
        "centroid_cosine_labels": _CENTROID_COSINE_ORACLE,
        # streaming replay must reproduce the batch deadman's gap log
        "stream_deadman_replay": _DEADMAN_SQL,
        "hdr_seasonal_band": _HDR_SEASONAL_ORACLE,
        "stream_stddev_replay_1h": _TIER_STDDEV_ORACLE,
        "chunk_documents_32_8": _CHUNK_DOCS_ORACLE,
        "kmv_sliding_24h": _KMV_SLIDING_ORACLE,
        "rollup_sliding_24h": _ROLLUP_SLIDING_ORACLE,
        "seasonal_band_anomaly_1h": _SEASONAL_ANOMALY_ORACLE,
        "hdr_sliding_p95_24h": _HDR_SLIDING_ORACLE,
        "sumsq_sliding_24h": _SUMSQ_SLIDING_ORACLE,
        "mixture_plan_sources": _MIXTURE_PLAN_ORACLE,
        "hdr_histogram_1d": _HDR_HISTOGRAM_ORACLE,
        "funnel_view_click_purchase": _FUNNEL_ORACLE,
        "cohort_retention_daily": _COHORT_ORACLE,
        "event_transition_matrix": _TRANSITIONS_ORACLE,
        "funnel_latency_quantiles": _FUNNEL_LATENCY_ORACLE,
        "hdr_quantile_1h": _HDR_QUANTILE_ORACLE,
        "stream_hdr_replay_1h": _HDR_QUANTILE_ORACLE,
        "hdr_tier_read_4h": _HDR_TIER_4H_ORACLE,
        "stream_heavy_hitters_replay": _STREAM_HH_ORACLE,
        "matrix_profile_24h": _MATRIX_PROFILE_ORACLE,
        "trend_mk_theilsen_daily": _TREND_MK_ORACLE,
        "delete_where_takedown": _DELETE_TAKEDOWN_ORACLE,
        "merge_into_recrawl": _MERGE_RECRAWL_ORACLE,
        "update_where_redact": _UPDATE_REDACT_ORACLE,
        "incremental_read_new_days": _INCREMENT_ORACLE,
        "schema_evolution_read": _SCHEMA_EVOLUTION_ORACLE,
        "partition_evolution_read": _PARTITION_EVOLUTION_ORACLE,
        "wap_publish_rollup": _WAP_ORACLE,
        "stats_pruned_read": _STATS_PRUNED_ORACLE,
        "tagged_snapshot_read": _WAP_ORACLE,
        "branch_publish_rollup": _WAP_ORACLE,
        "archive_exact_rollup_5m": _ARCHIVE_EXACT_ORACLE,
        "matrix_profile_ab_recent": _MATRIX_PROFILE_AB_ORACLE,
        "matrix_profile_tier_read": _MATRIX_PROFILE_ORACLE,
        "heavy_hitters_1d": _HEAVY_HITTERS_ORACLE,
        "kmv_distinct_1d": _KMV_DISTINCT_ORACLE,
        "stream_kmv_replay_1d": _KMV_DISTINCT_ORACLE,
        "kmv_tier_read_4h": _KMV_TIER_4H_ORACLE,
        "interval_join_2h": _INTERVAL_JOIN_ORACLE,
        "rollup_1h_cascade": _ROLLUP_SELECT.format(unit="hour"),
        # a refreshed catalog (subset build + late-data refresh) must equal
        # the from-scratch rollup over the full table
        "tier_refresh_1h": _ROLLUP_SELECT.format(unit="hour"),
        # real-time continuous aggregate: tier-to-watermark + raw tail must
        # equal the full 4h rollup over all events
        "realtime_rollup_4h": (
            "SELECT make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) "
            " - CAST(floor(epoch(ts)) AS BIGINT) % 14400) * 1000000) AS bucket,"
            " event_type, count(value) AS cnt,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,"
            " min(value) AS min_v, max(value) AS max_v,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0)"
            "   AS avg_v "
            "FROM events GROUP BY 1, 2"
        ),
        "rollup_1d_cascade": _ROLLUP_SELECT.format(unit="day"),
        "ohlc_1h": _ohlc_oracle("hour"),
        "ohlc_1d_cascade": _ohlc_oracle("day"),
        "ohlc_tier_read_4h": _OHLC_TIER_4H_ORACLE,
        "stream_ohlc_replay_1h": _ohlc_oracle("hour"),
        "ohlc_sliding_24h": _OHLC_SLIDING_ORACLE,
        "rollup_1m_salted": _ROLLUP_SELECT.format(unit="minute"),
        # the stitched mixed-tier union must equal the raw 90m rollup
        "stitched_rollup_90m": (
            "SELECT make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) "
            " - CAST(floor(epoch(ts)) AS BIGINT) % 5400) * 1000000) AS bucket,"
            " event_type, count(value) AS cnt,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,"
            " min(value) AS min_v, max(value) AS max_v,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0)"
            "   AS avg_v "
            "FROM events GROUP BY 1, 2"
        ),
        "rollup_5m_width": (
            "SELECT make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) "
            " - CAST(floor(epoch(ts)) AS BIGINT) % 300) * 1000000) AS bucket,"
            " event_type, count(value) AS cnt,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,"
            " min(value) AS min_v, max(value) AS max_v,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0)"
            "   AS avg_v "
            "FROM events GROUP BY 1, 2"
        ),
        "asof_join_6h_stats": (
            "WITH r6h AS ("
            "  SELECT event_type,"
            "    make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)"
            "      - CAST(floor(epoch(ts)) AS BIGINT) % 21600) * 1000000) AS bucket,"
            "    count(value) AS cnt,"
            "    CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum6h"
            "  FROM events GROUP BY 1, 2),"
            "l AS (SELECT event_id, event_type, ts FROM events WHERE event_id % 7 = 0)"
            "SELECT l.event_id, l.event_type, r.bucket AS asof_bucket,"
            "       r.cnt AS asof_cnt, r.sum6h AS asof_sum6h "
            "FROM l ASOF LEFT JOIN r6h r"
            "  ON l.event_type = r.event_type AND l.ts >= r.bucket"
        ),
        "asof_join_tolerance_2h": (
            "WITH r6h AS ("
            "  SELECT event_type,"
            "    make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)"
            "      - CAST(floor(epoch(ts)) AS BIGINT) % 21600) * 1000000) AS bucket,"
            "    count(value) AS cnt"
            "  FROM events GROUP BY 1, 2),"
            "l AS (SELECT event_id, event_type, ts FROM events WHERE event_id % 7 = 0),"
            "j AS ("
            "  SELECT l.event_id, l.event_type, l.ts, r.bucket, r.cnt"
            "  FROM l ASOF LEFT JOIN r6h r"
            "    ON l.event_type = r.event_type AND l.ts >= r.bucket)"
            "SELECT event_id, event_type,"
            "  CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)"
            "            - CAST(floor(epoch(bucket)) AS BIGINT) <= 7200"
            "       THEN bucket END AS asof_bucket,"
            "  CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)"
            "            - CAST(floor(epoch(bucket)) AS BIGINT) <= 7200"
            "       THEN cnt END AS asof_cnt "
            "FROM j"
        ),
        "asof_join_nearest_6h": (
            "WITH r6h AS ("
            "  SELECT event_type,"
            "    make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)"
            "      - CAST(floor(epoch(ts)) AS BIGINT) % 21600) * 1000000) AS bucket,"
            "    count(value) AS cnt"
            "  FROM events GROUP BY 1, 2),"
            "l AS (SELECT event_id, event_type, ts FROM events WHERE event_id % 7 = 0),"
            "b AS ("
            "  SELECT l.event_id, l.ts, r.bucket, r.cnt"
            "  FROM l ASOF LEFT JOIN r6h r"
            "    ON l.event_type = r.event_type AND l.ts >= r.bucket),"
            "f AS ("
            "  SELECT l.event_id, r.bucket, r.cnt"
            "  FROM l ASOF LEFT JOIN r6h r"
            "    ON l.event_type = r.event_type AND l.ts <= r.bucket)"
            "SELECT l.event_id, l.event_type,"
            "  CASE WHEN b.bucket IS NULL THEN f.bucket"
            "       WHEN f.bucket IS NULL THEN b.bucket"
            "       WHEN CAST(floor(epoch(f.bucket)) AS BIGINT)"
            "              - CAST(floor(epoch(l.ts)) AS BIGINT)"
            "            < CAST(floor(epoch(l.ts)) AS BIGINT)"
            "              - CAST(floor(epoch(b.bucket)) AS BIGINT)"
            "       THEN f.bucket ELSE b.bucket END AS near_bucket,"
            "  CASE WHEN b.bucket IS NULL THEN f.cnt"
            "       WHEN f.bucket IS NULL THEN b.cnt"
            "       WHEN CAST(floor(epoch(f.bucket)) AS BIGINT)"
            "              - CAST(floor(epoch(l.ts)) AS BIGINT)"
            "            < CAST(floor(epoch(l.ts)) AS BIGINT)"
            "              - CAST(floor(epoch(b.bucket)) AS BIGINT)"
            "       THEN f.cnt ELSE b.cnt END AS near_cnt "
            "FROM l JOIN b ON l.event_id = b.event_id"
            "       JOIN f ON l.event_id = f.event_id"
        ),
        "gapfill_1h_interpolate": _GAPFILL_SQL,
        "gapfill_1h_locf": """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0) AS obs
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type,
         unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
  FROM h GROUP BY event_type
), j AS (
  SELECT s.event_type, s.bucket, h.obs
  FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.bucket = s.bucket
)
SELECT event_type, bucket,
  last_value(obs IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v,
  (obs IS NULL) AS filled
FROM j
""",
        "topk_hot_users": (
            "SELECT * FROM ("
            "  SELECT row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank,"
            "         user_id, count(*) AS cnt,"
            "         CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v"
            "  FROM events GROUP BY user_id"
            ") WHERE rank <= 10"
        ),
        # streaming replay must reproduce the batch sessionizer exactly
        "stream_sessionize_replay": (
            "WITH g AS ("
            "  SELECT user_id,"
            "    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800"
            "         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL"
            "         THEN 1 ELSE 0 END AS new_sess"
            "  FROM events)"
            "SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,"
            "       count(*) AS n_events FROM g GROUP BY user_id"
        ),
        "sessionize_30m": (
            "WITH g AS ("
            "  SELECT user_id,"
            "    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800"
            "         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL"
            "         THEN 1 ELSE 0 END AS new_sess"
            "  FROM events)"
            "SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,"
            "       count(*) AS n_events FROM g GROUP BY user_id"
        ),
        "json_props_extract": (
            "SELECT event_type, count(k) AS cnt, CAST(sum(k) AS BIGINT) AS sum_k,"
            "       CAST(sum(k) AS BIGINT) / count(k) AS avg_k FROM ("
            "  SELECT event_type,"
            "         CAST(regexp_extract(props, '\"k\":\\s*([0-9]+)', 1) AS BIGINT) AS k"
            "  FROM events) GROUP BY event_type"
        ),
        "pivot_event_counts_hourly": (
            f"SELECT date_trunc('hour', ts) AS bucket, {pivot_cols} "
            "FROM events GROUP BY 1"
        ),
        "retention_candidates": (
            "WITH rolled AS ("
            "  SELECT date_trunc('minute', ts) AS bucket, event_type"
            "  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1, 2),"
            "raw AS ("
            "  SELECT DISTINCT date_trunc('minute', ts) AS bucket, event_type FROM events)"
            "SELECT event_type, count(*) AS pending_buckets FROM raw r "
            "WHERE NOT EXISTS (SELECT 1 FROM rolled d "
            "  WHERE d.bucket = r.bucket AND d.event_type = r.event_type) "
            "GROUP BY event_type"
        ),
        "tpch_q1_pricing_summary": (
            "WITH a AS (SELECT l_returnflag, l_linestatus,"
            " CAST(round(sum(l_quantity) * 100, 0) AS BIGINT) AS _q,"
            " CAST(round(sum(l_extendedprice) * 100, 0) AS BIGINT) AS _p,"
            " CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT)"
            "   / 100.0 AS sum_disc_price,"
            " CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100, 0)"
            "   AS BIGINT) / 100.0 AS sum_charge,"
            " CAST(round(sum(l_discount) * 100, 0) AS BIGINT) AS _d,"
            " count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus) "
            "SELECT l_returnflag, l_linestatus, _q / 100.0 AS sum_qty,"
            " _p / 100.0 AS sum_base_price, sum_disc_price, sum_charge,"
            " _q / (count_order * 100.0) AS avg_qty,"
            " _p / (count_order * 100.0) AS avg_price,"
            " _d / (count_order * 100.0) AS avg_disc, count_order FROM a"
        ),
        "revenue_by_nation": (
            "SELECT n_name, count(*) AS n_orders,"
            " CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) / 100.0 AS revenue "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "unpivot_lineitem_metrics": (
            "SELECT metric, count(value) AS cnt,"
            " CAST(round(sum(value) * 100, 0) AS BIGINT) / 100.0 AS sum_v,"
            " min(value) AS min_v, max(value) AS max_v FROM ("
            "  SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem"
            "  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem"
            "  UNION ALL SELECT 'discount', l_discount FROM lineitem"
            "  UNION ALL SELECT 'tax', l_tax FROM lineitem"
            ") GROUP BY metric"
        ),
        **training_oracle_sql(),
        **ingest_oracle_sql(),
        **influxql_oracle_sql(),
        **webclean_oracle_sql(),
    }
