"""Column-level filters + failure budget (SURVEY.md P4, P5, §4 abort-early).

P4 — ``-filter Columns`` (Influxer/GenericFile.cs:33-34,
Influxer/PerfmonFile.cs:37-38): keep only columns named in the ``-columns``
list (Perfmon matches on object + counter).

P5 — ``-filter Measurement/Field`` (Influxer/GenericFile.cs:25-31, fetch at
:241): keep only columns whose measurement/field already exists in the
target catalog — a driver-side semi-join of the header against the catalog
schema (the degenerate left-semi join of SURVEY §2.2).

Failure budget — the reference aborts when failures exceed 3 batches' worth
unless -ignoreerrors (Influxer/GenericFile.cs:321-322,346-351).  The engine
analogue checks the errors DataFrame count against the budget after a run —
an accumulator-style post-hoc gate, not a per-row abort (aborting a
distributed job mid-flight is a cancel, not a control-flow path).
"""

from __future__ import annotations

from collections.abc import Iterable

from influxer_spark.ingest.config import ColumnDataType, GenericFileConfig
from influxer_spark.ingest.generic import IngestResult
from influxer_spark.ingest.perfmon import PerfmonCounter
from influxer_spark.ingest.refmodel import Layout

DEFAULT_BATCH_SIZE = 10_000  # PointsInSingleBatch default, InfluxDBConfig.cs:37-42


def filter_columns(layout: Layout, wanted: Iterable[str], time_column: int) -> Layout:
    """P4: keep only configured/wanted columns (+ the time column)."""
    want = set(wanted)
    return Layout(
        [
            (i, c)
            for i, c in layout.columns
            if c.influx_name in want or i == time_column - 1
        ]
    )


def filter_columns_to_catalog(
    layout: Layout,
    existing_fields: Iterable[str],
    existing_tags: Iterable[str],
    time_column: int,
) -> Layout:
    """P5: semi-join of the layout against an existing catalog schema —
    fields keep only known field names, tags only known tag names
    (GenericFile.cs:25-31 filters by dbStructure measurement/field sets)."""
    fields, tags = set(existing_fields), set(existing_tags)
    out = []
    for i, c in layout.columns:
        if i == time_column - 1:
            out.append((i, c))
        elif c.data_type == ColumnDataType.TAG:
            if c.influx_name in tags:
                out.append((i, c))
        elif c.influx_name in fields:
            out.append((i, c))
    return Layout(out)


def filter_perfmon_counters(
    counters: list[PerfmonCounter], wanted: Iterable[str]
) -> list[PerfmonCounter]:
    """P4 for Perfmon: match on (PerformanceObject, CounterName)
    (Influxer/PerfmonFile.cs:37-38)."""
    want = {w.strip() for w in wanted}
    return [
        c
        for c in counters
        if c.performance_object in want or c.counter_name in want
        or f"{c.performance_object}\\{c.counter_name}" in want
    ]


class FailureBudgetExceeded(RuntimeError):
    pass


def enforce_failure_budget(
    result: IngestResult,
    cfg: GenericFileConfig,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict[str, int]:
    """Abort-early analogue: raise when failed points exceed 3 batches'
    worth and errors are not ignored (GenericFile.cs:346-351)."""
    status = result.status()
    if not cfg.ignore_errors and status["points_failed"] > 3 * batch_size:
        raise FailureBudgetExceeded(
            f"{status['points_failed']} failed points exceed the budget of "
            f"{3 * batch_size}; pass ignore_errors=True to continue anyway"
        )
    return status
