"""Perfmon CSV ingest (SURVEY.md §3.3, Influxer/PerfmonFile.cs).

Reference flow: PDH header check + UTC-offset extraction (driver-side, one
line) → counter-path parse ``\\\\HOST\\Object(Instance)\\Counter``
(PerfmonFile.cs:43-70) → per-line: strip ALL quotes, split, parse ts
(column 0), then either one narrow point per counter or one wide point per
(PerformanceObject, Host) with counter→value fields, duplicate counter
columns last-wins (PerfmonFile.cs:83-147).

Spark-first mapping: the header is one driver-side line; the body compiles
to a single narrow ``stack()`` projection — (ts, host, object, instance,
counter, value, col_idx) — which is the reference's narrow mode verbatim
and the algebraic base for wide mode (a groupBy().pivot() per object,
SURVEY A1). Blank/unparseable values are silently dropped exactly as
``Double.TryParse`` failures are skipped (PerfmonFile.cs:107,123); a bad
timestamp fails the LINE (PerfmonFile.cs:77-79).

Scale: the scan+stack stage is narrow (no shuffle); wide mode shuffles once
per object on (ts, host) — the same partial-agg shape as the rollup tiers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.ingest.config import (
    DEFAULT_TIME_FORMAT,
    PerfmonFileConfig,
)
from influxer_spark.ingest.scrub import scrub_name
from influxer_spark.ingest.timestamps import parse_ts_string_col

_INSTANCE_RE = re.compile(r"(?P<object>.+?)\((?P<instance>.*)\)")


@dataclass
class PerfmonCounter:
    column_index: int
    host: str
    performance_object: str
    counter_name: str
    counter_instance: str = ""


def _scrub_trim(s: str) -> str:
    # scrub + Trim('_'), PerfmonFile.cs:57-65
    return scrub_name(s).strip("_")


def parse_pdh_header(first_line: str) -> tuple[int, list[PerfmonCounter]]:
    """PDH check + UTC offset + counter paths (PerfmonFile.cs:176-198).

    Offset = int of the 4TH match of ``([-0-9]+)`` in the first cell — the
    hyphen in "PDH-CSV" is match #1, then "4", "0", then the minutes, e.g.
    '"(PDH-CSV 4.0) (India Standard Time)(-330)"' → -330.
    """
    first_col = first_line[: first_line.index(",")]
    if "PDH-CSV" not in first_col:
        raise ValueError("not a standard Perfmon csv file")
    nums = re.findall(r"([-0-9]+)", first_col)
    min_offset = int(nums[3]) if len(nums) > 3 else 0

    cells = re.split(r',(?=(?:[^"]*"[^"]*")*[^"]*$)', first_line)
    counters: list[PerfmonCounter] = []
    column = 1
    for c in cells[1:]:
        if not c.startswith('"\\'):
            continue
        p = c.split("\\")
        pc = PerfmonCounter(
            column_index=column,
            host=p[2],
            performance_object="",
            counter_name=_scrub_trim(p[4]),
        )
        m = _INSTANCE_RE.match(p[3])
        if m:
            pc.performance_object = _scrub_trim(m.group("object"))
            pc.counter_instance = _scrub_trim(m.group("instance"))
        else:
            pc.performance_object = _scrub_trim(p[3])
        counters.append(pc)
        column += 1
    return min_offset, counters


def ingest_perfmon_file(
    spark: SparkSession, path: str, cfg: PerfmonFileConfig | None = None
) -> "PerfmonResult":
    cfg = cfg or PerfmonFileConfig()
    with open(path, encoding="utf-8", errors="replace") as f:
        first_line = f.readline().rstrip("\r\n")
    min_offset, counters = parse_pdh_header(first_line)

    raw = spark.read.text(path).filter(~F.col("value").contains("PDH-CSV"))
    # reference strips ALL quotes BEFORE splitting (PerfmonFile.cs:74), which
    # reduces the quote-aware splitter to a plain comma split
    cells = F.split(F.replace(F.col("value"), F.lit('"'), F.lit("")), ",")
    body = raw.select(cells.alias("_cells"))

    ts = parse_ts_string_col(
        F.get(F.col("_cells"), 0), cfg.time_format or DEFAULT_TIME_FORMAT, min_offset
    )
    body = body.withColumn("ts", ts)
    bad = body.filter(F.col("ts").isNull())
    body = body.filter(F.col("ts").isNotNull())

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    # narrow projection: stack one entry per counter column
    stack_args: list[str] = []
    for pc in counters:
        stack_args.append(
            f"{q(pc.host)}, {q(pc.performance_object)}, {q(pc.counter_instance)}, "
            f"{q(pc.counter_name)}, {pc.column_index}, "
            f"try_cast(_cells[{pc.column_index}] as double)"
        )
    n = len(counters)
    narrow = body.selectExpr(
        "ts",
        f"stack({n}, {', '.join(stack_args)}) as "
        "(host, object, instance, counter, col_idx, value)",
    ).filter(F.col("value").isNotNull())

    for tag in cfg.default_tags:
        k, v = tag.split("=", 1)
        narrow = narrow.withColumn(k, F.lit(v))

    return PerfmonResult(
        narrow=narrow, counters=counters, utc_offset_min=min_offset,
        bad_lines=bad, cfg=cfg,
    )


@dataclass
class PerfmonResult:
    narrow: DataFrame  # (ts, host, object, instance, counter, col_idx, value)
    counters: list[PerfmonCounter]
    utc_offset_min: int
    bad_lines: DataFrame  # lines whose timestamp failed to parse (lazy)
    cfg: PerfmonFileConfig

    def points_narrow(self) -> DataFrame:
        """Single-measurement mode (PerfmonFile.cs:119-142): one point per
        counter sample, tags = Host/PerformanceObject/PerformanceCounter/
        CounterInstance, field = CounterValue."""
        return self.narrow.select(
            "ts",
            F.col("host").alias("Host"),
            F.col("object").alias("PerformanceObject"),
            F.col("counter").alias("PerformanceCounter"),
            F.when(F.col("instance") != "", F.col("instance")).alias(
                "CounterInstance"
            ),
            F.col("value").alias("CounterValue"),
        )

    def points_wide(self, performance_object: str) -> DataFrame:
        """MultiMeasurements mode (PerfmonFile.cs:87-117): one point per
        (object, host, ts); duplicate counter names last-wins among PARSED
        values (max col_idx, PerfmonFile.cs:107-113).

        CounterInstance is HEADER metadata, not row data: the reference tags
        the point from the first counter in column order whose header
        instance is non-blank, before and regardless of any value parse
        (PerfmonFile.cs:104-105) — so it is a constant per (object, host),
        computed here from the counters list and attached as a literal map
        (no join, and rows whose values failed to parse can't change it)."""
        grp = self.narrow.filter(F.col("object") == performance_object)
        names = sorted(
            {c.counter_name for c in self.counters
             if c.performance_object == performance_object}
        )
        inst_by_host: dict[str, str] = {}
        for c in sorted(self.counters, key=lambda c: c.column_index):
            if c.performance_object == performance_object and c.counter_instance.strip():
                inst_by_host.setdefault(c.host, c.counter_instance)
        if inst_by_host:
            mapping = F.create_map(
                *[F.lit(x) for kv in inst_by_host.items() for x in kv]
            )
            inst = mapping[F.col("Host")]
        else:
            inst = F.lit(None).cast("string")
        return (
            grp.groupBy("ts", F.col("host").alias("Host"))
            .pivot("counter", names)
            .agg(F.max_by("value", "col_idx"))
            .withColumn("CounterInstance", inst)
        )

    def objects(self) -> list[str]:
        return sorted({c.performance_object for c in self.counters})
