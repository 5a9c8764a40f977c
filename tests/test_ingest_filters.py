"""P4/P5 column filters + failure budget (Influxer -filter Columns /
Measurement/Field, abort-early)."""

from __future__ import annotations

import pytest

from influxer_spark.ingest.filters import (
    FailureBudgetExceeded,
    enforce_failure_budget,
    filter_columns,
    filter_columns_to_catalog,
    filter_perfmon_counters,
    DEFAULT_BATCH_SIZE,
)
from influxer_spark.ingest.generic import ingest_generic_file, resolve_layout
from influxer_spark.ingest.perfmon import parse_pdh_header
from tests.ingest_fixtures import write_perfmon, write_simple_metrics, write_tagged_metrics


def test_filter_columns_keeps_time_column(spark, tmp_path):
    path, cfg, exp = write_simple_metrics(str(tmp_path))
    layout = resolve_layout(cfg, path)
    keep = filter_columns(layout, ["Metric_01_ops_s", "Metric_02_ops_s"], cfg.time_column)
    assert len(keep.columns) == 3  # 2 metrics + Time
    res = ingest_generic_file(spark, path, cfg, layout=keep)
    assert set(res.points.columns) == {"ts", "Metric_01_ops_s", "Metric_02_ops_s"}
    # the malformed cell sat in metric 05, which is filtered out → no failures
    assert res.status() == {"points_found": exp.points_found + 1, "points_failed": 0}


def test_filter_to_catalog_semijoin(spark, tmp_path):
    path, cfg, _exp = write_tagged_metrics(str(tmp_path))
    layout = resolve_layout(cfg, path)
    keep = filter_columns_to_catalog(
        layout,
        existing_fields=["TxnCount", "TPS"],
        existing_tags=["ServerName"],
        time_column=cfg.time_column,
    )
    names = {c.influx_name for _, c in keep.columns}
    assert names == {"DateTime", "ServerName", "TxnCount", "TPS"}


def test_filter_perfmon_counters(tmp_path):
    path, _exp, _ = write_perfmon(str(tmp_path), n_rows=2)
    first = open(path, encoding="utf-8").readline().rstrip("\n")
    _off, counters = parse_pdh_header(first)
    only_mem = filter_perfmon_counters(counters, ["Memory"])
    assert only_mem and all(c.performance_object == "Memory" for c in only_mem)
    one = filter_perfmon_counters(counters, ["Processor\\Idle_Time"])
    assert {c.counter_name for c in one} == {"Idle_Time"}


def test_failure_budget(spark, tmp_path):
    path, cfg, exp = write_simple_metrics(str(tmp_path))
    res = ingest_generic_file(spark, path, cfg)
    # 1 failed row is far below 3 batches' worth → passes
    assert enforce_failure_budget(res, cfg)["points_failed"] == exp.points_failed
    with pytest.raises(FailureBudgetExceeded):
        enforce_failure_budget(res, cfg, batch_size=0)
    cfg.ignore_errors = True
    assert enforce_failure_budget(res, cfg, batch_size=0)
    assert DEFAULT_BATCH_SIZE == 10_000