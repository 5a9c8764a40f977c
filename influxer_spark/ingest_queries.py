"""Driver-contract queries + DuckDB oracles for the ingest-parity scalar
operators (SURVEY.md §2.3), run over the driver's fixed tables so the
correctness gate exercises them independently of the pytest fixtures:

- F8  epoch µs→ms truncation        (epoch_us_truncation)
- F10 .NET binary-scaled round(2)   (dotnet_round2_parity)
- F12 reserved-char scrub           (reserved_scrub_texts)
- F7  .NET→Java time format parse   (dotnet_timeformat_roundtrip)

Every oracle replicates the engine expression IEEE-op-for-op (same operand
order), so equality is bit-level, no tolerance.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.ingest.config import RESERVED_CHARS, TimePrecision
from influxer_spark.ingest.scrub import scrub_col
from influxer_spark.ingest.timestamps import (
    dotnet_to_java_format,
    parse_ts_epoch_col,
    parse_ts_string_col,
)
from influxer_spark.ingest.transforms import dotnet_round2_col


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# F8: epoch at Microseconds precision truncates to milliseconds (toward zero)
# ---------------------------------------------------------------------------

def _q_epoch_us_truncation(spark, sf_dir):
    ev = _events(spark, sf_dir)
    us = (
        F.unix_timestamp(F.col("ts").cast("timestamp")) * 1_000_000
        + F.date_format("ts", "SSSSSS").cast("long")
    ).alias("us")
    out = ev.select("event_id", us)
    return out.select(
        "event_id",
        "us",
        parse_ts_epoch_col(F.col("us"), TimePrecision.MICROSECONDS).alias("ts_ms"),
    )


_EPOCH_US_SQL = """
SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
       make_timestamp((epoch_us(ts) // 1000) * 1000) AS ts_ms
FROM events
"""


# ---------------------------------------------------------------------------
# F10: .NET Math.Round(v, 2) — binary scaling, half-to-even
# ---------------------------------------------------------------------------

def _q_dotnet_round2(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    v = F.col("l_extendedprice") * F.col("l_discount")
    rounded = dotnet_round2_col(v)
    return (
        li.select((F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
                  rounded.alias("r2"))
    )


_ROUND2_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS id,
  CASE
    WHEN (l_extendedprice * l_discount) * 100 - floor((l_extendedprice * l_discount) * 100) > 0.5
      THEN floor((l_extendedprice * l_discount) * 100) + 1
    WHEN (l_extendedprice * l_discount) * 100 - floor((l_extendedprice * l_discount) * 100) < 0.5
      THEN floor((l_extendedprice * l_discount) * 100)
    ELSE floor((l_extendedprice * l_discount) * 100)
         + CAST(CAST(floor((l_extendedprice * l_discount) * 100) AS BIGINT) % 2 <> 0 AS INT)
  END / 100.0 AS r2
FROM lineitem
"""


# ---------------------------------------------------------------------------
# F12: reserved-identifier scrub over free text
# ---------------------------------------------------------------------------

def _q_reserved_scrub(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    prefix = F.substring("text", 1, 40)
    return docs.select(
        F.col("doc_id").alias("id"), scrub_col(prefix).alias("scrubbed")
    )


def _scrub_sql() -> str:
    # RE2 (DuckDB) rejects escaped-space etc. from re.escape; build an
    # RE2-safe class instead: only ] and [ need escaping, rest are literal
    assert set(RESERVED_CHARS) == set('" ;_()%#./*[]{},')
    cls = '[\\]\\[" ;_()%#./*{},]'
    return (
        "SELECT doc_id AS id, "
        f"regexp_replace(regexp_replace(substr(text, 1, 40), '^{cls}+|{cls}+$', '', 'g'), "
        f"'{cls}+', '_', 'g') AS scrubbed FROM documents"
    )


# ---------------------------------------------------------------------------
# F7: .NET custom time format → parse round-trip
# ---------------------------------------------------------------------------

_DOTNET_FMT = "MM/dd/yyyy HH:mm:ss.fff"


def _q_timeformat_roundtrip(spark, sf_dir):
    ev = _events(spark, sf_dir)
    # format with the translated Java pattern, then re-parse with the engine's
    # .NET-format path (+90 min offset) — F7 end-to-end
    java_fmt = dotnet_to_java_format(_DOTNET_FMT)
    s = F.date_format(F.col("ts").cast("timestamp"), java_fmt)
    parsed = parse_ts_string_col(s, _DOTNET_FMT, utc_offset_min=90)
    return ev.select("event_id", s.alias("formatted"), parsed.alias("parsed_utc"))


_TIMEFMT_SQL = """
SELECT event_id,
       strftime(ts, '%m/%d/%Y %H:%M:%S.%g') AS formatted,
       strptime(strftime(ts, '%m/%d/%Y %H:%M:%S.%g'), '%m/%d/%Y %H:%M:%S.%g')
         + INTERVAL 90 MINUTE AS parsed_utc
FROM events
"""


# ---------------------------------------------------------------------------
# Line-protocol sink (the reference's wire output, sinks.py): format events
# as InfluxDB line protocol — tags sorted + escaped, string/int/decimal field
# values, ns timestamps.  The oracle replicates the escaping with chained
# replace() (inserted backslashes never contain further escapables, so the
# chain equals the engine's single-pass class replace).
# ---------------------------------------------------------------------------

def _q_line_protocol(spark, sf_dir):
    from influxer_spark.sinks import to_line_protocol

    ev = _events(spark, sf_dir)
    pts = ev.select(
        "ts",
        F.col("event_type").alias("etype"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("user"),
        "props",
        (F.round(F.col("value") * 100, 0).cast("long") / 100.0)
        .cast("decimal(12,2)")
        .alias("value"),
        F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long").alias("k"),
    )
    return to_line_protocol(
        pts,
        measurement="events",
        tags=["etype", "user", "props"],
        fields=["value", "k", "props"],
        ts_col="ts",
        precision="ns",
    )


def _lp_sql() -> str:
    esc_tag = (
        "replace(replace(replace({0}, ',', '\\,'), '=', '\\='), ' ', '\\ ')"
    )
    esc_str = "replace(replace({0}, '\\', '\\\\'), '\"', '\\\"')"
    return (
        "SELECT concat("
        "  'events',"
        "  ',etype=', " + esc_tag.format("event_type") + ","
        "  ',props=', " + esc_tag.format("props") + ","
        "  ',user=', " + esc_tag.format("concat('u', CAST(user_id AS VARCHAR))") + ","
        "  ' value=', CAST(CAST(CAST(round(value * 100, 0) AS BIGINT) / 100.0"
        "                        AS DECIMAL(12,2)) AS VARCHAR),"
        "  ',k=', CAST(CAST(regexp_extract(props, '\"k\":\\s*([0-9]+)', 1)"
        "                   AS BIGINT) AS VARCHAR), 'i',"
        "  ',props=\"', " + esc_str.format("props") + ", '\"',"
        "  ' ', CAST(epoch_ns(ts) AS VARCHAR)"
        ") AS line FROM events"
    )


# ---------------------------------------------------------------------------
# Line-protocol READ path (sinks.parse_line_protocol): write∘parse must be
# the identity — format events as lines, parse back, project the typed
# values; the oracle is the identity SELECT over events.
# ---------------------------------------------------------------------------

def _q_line_protocol_roundtrip(spark, sf_dir):
    from influxer_spark.sinks import parse_line_protocol, to_line_protocol

    ev = _events(spark, sf_dir)
    pts = ev.select(
        "ts",
        F.col("event_type").alias("etype"),
        "props",
        F.col("user_id").alias("uid"),
        F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long").alias("k"),
    )
    lines = to_line_protocol(
        pts,
        measurement="events",
        tags=["etype", "props"],
        fields=["uid", "k"],
        ts_col="ts",
        precision="ns",
    ).withColumnRenamed("line", "value")
    parsed = parse_line_protocol(lines, precision="ns")
    return parsed.select(
        F.col("tags")["etype"].alias("etype"),
        F.col("tags")["props"].alias("props"),
        F.col("fields")["uid"].cast("long").alias("uid"),
        F.col("fields")["k"].cast("long").alias("k"),
        F.col("ts").alias("ts"),
    )


_LP_ROUNDTRIP_SQL = (
    "SELECT event_type AS etype, props, user_id AS uid,"
    "       CAST(regexp_extract(props, '\"k\":\\s*([0-9]+)', 1) AS BIGINT) AS k,"
    "       ts FROM events"
)


def ingest_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "epoch_us_truncation": _q_epoch_us_truncation,
        "dotnet_round2_parity": _q_dotnet_round2,
        "reserved_scrub_texts": _q_reserved_scrub,
        "dotnet_timeformat_roundtrip": _q_timeformat_roundtrip,
        "line_protocol_events": _q_line_protocol,
        "line_protocol_roundtrip": _q_line_protocol_roundtrip,
    }


def ingest_oracle_sql() -> dict[str, str]:
    return {
        "epoch_us_truncation": _EPOCH_US_SQL,
        "dotnet_round2_parity": _ROUND2_SQL,
        "reserved_scrub_texts": _scrub_sql(),
        "dotnet_timeformat_roundtrip": _TIMEFMT_SQL,
        "line_protocol_events": _lp_sql(),
        "line_protocol_roundtrip": _LP_ROUNDTRIP_SQL,
    }
