"""Golden-count fixture tests (SURVEY.md §5) — synthesized equivalents of the
reference's 8 end-to-end tests (Influxer.Test/InfluxerTests.cs), verified
three ways:

1. refmodel counts == by-construction expectations (the golden counts);
2. Spark pipeline counts == refmodel counts;
3. point-for-point value equality Spark vs refmodel (ts, tags, fields) —
   this is the stand-in for the reference's live-InfluxDB assertions.
"""

from __future__ import annotations

import copy
import math

import pytest

from influxer_spark.ingest import refmodel
from influxer_spark.ingest.config import export_config, load_config
from influxer_spark.ingest.generic import ingest_generic_file, to_narrow_points
from tests.ingest_fixtures import (
    write_binary_ts,
    write_epoch_micros,
    write_epoch_seconds,
    write_headerless,
    write_microsec,
    write_simple_metrics,
    write_tagged_metrics,
)

FIXTURES = {
    "simple_metrics": write_simple_metrics,
    "tagged_metrics": write_tagged_metrics,
    "headerless": write_headerless,
    "microsec_semicolon": write_microsec,
    "epoch_seconds": write_epoch_seconds,
    "epoch_micros": write_epoch_micros,
    "binary_ts": write_binary_ts,
}


def _ref_dicts(ref: refmodel.RefRunResult) -> list[dict]:
    out = []
    for p in ref.points:
        d = {"ts": p.ts}
        d.update({k: v for k, v in p.tags.items() if v not in (None, "")})
        d.update(p.fields)
        out.append(d)
    return out


def _spark_dicts(points_df) -> list[dict]:
    out = []
    for row in points_df.collect():
        d = {k: v for k, v in row.asDict().items() if v is not None and v != ""}
        if "ts" not in d:
            d["ts"] = None
        out.append(d)
    return out


def _key(d: dict) -> str:
    return "|".join(f"{k}={d[k]}" for k in sorted(d))


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_fixture_parity(spark, tmp_path, name):
    path, cfg, exp = FIXTURES[name](str(tmp_path))

    lines = open(path, encoding="utf-8").read().splitlines()
    ref = refmodel.run_file(copy.deepcopy(cfg), lines)
    assert len(ref.points) == exp.points_found, (
        f"{name}: refmodel found {len(ref.points)} != expected {exp.points_found}; "
        f"failures={ref.failures[:5]}"
    )
    assert len(ref.failures) == exp.points_failed, ref.failures[:5]

    res = ingest_generic_file(spark, path, copy.deepcopy(cfg))
    status = res.status()
    assert status["points_found"] == exp.points_found, (
        name, status, res.errors.limit(5).collect()
    )
    assert status["points_failed"] == exp.points_failed, (
        name, status, res.errors.limit(5).collect()
    )

    ref_rows = sorted(_ref_dicts(ref), key=_key)
    got_rows = sorted(_spark_dicts(res.points), key=_key)
    assert len(ref_rows) == len(got_rows)
    for a, b in zip(ref_rows, got_rows):
        assert set(a) == set(b), (name, a, b)
        for k in a:
            if isinstance(a[k], float):
                assert a[k] == b[k] or (
                    math.isnan(a[k]) and math.isnan(b[k])
                ), (name, k, a, b)
            else:
                assert a[k] == b[k], (name, k, a, b)


def test_failure_report_shape(spark, tmp_path):
    path, cfg, exp = write_headerless(str(tmp_path))
    res = ingest_generic_file(spark, path, cfg)
    rep = {r["error"]: r for r in res.failure_report().collect()}
    assert sum(r["n"] for r in rep.values()) == exp.points_failed
    for r in rep.values():  # first-5 line numbers per reason (FailureTracker)
        assert 1 <= len(r["sample_lines"]) <= 5


def test_narrow_points_feed_rollup(spark, tmp_path):
    """Ingest → narrow point model → 1m rollup tier: the reference's full
    delegation path (parse → InfluxDB CQ) end-to-end in one engine."""
    from influxer_spark.operators import rollup as R

    path, cfg, exp = write_simple_metrics(str(tmp_path))
    res = ingest_generic_file(spark, path, cfg)
    narrow = to_narrow_points(res)
    assert narrow.columns == ["ts", "metric", "value"]
    t1m = R.rollup(narrow, "ts", ["metric"], "value", "1m")
    rolled = t1m.agg({"cnt": "sum"}).collect()[0][0]
    assert rolled == narrow.count()  # every point lands in exactly one bucket


def test_config_export_roundtrip(tmp_path):
    """S9: '-export /autolayout' analogue — JSON round-trip preserves layout."""
    from tests.ingest_fixtures import headerless_config

    cfg = headerless_config()
    text = export_config(cfg)
    cfg2 = load_config(text)
    assert export_config(cfg2) == text
    assert cfg2.column_layout[4].split_config.split_columns[1].influx_name == "state"


def test_inferred_layout_exportable(spark, tmp_path):
    """Inference fills Unknown types; exported config reloads cleanly."""
    from influxer_spark.ingest.config import ColumnDataType
    from influxer_spark.ingest.generic import resolve_layout

    path, cfg, _ = write_tagged_metrics(str(tmp_path))
    layout = resolve_layout(cfg, path)
    types = {c.influx_name: c.data_type for _, c in layout.columns}
    assert types["ServerName"] == ColumnDataType.TAG
    assert types["TxnCount"] == ColumnDataType.NUMERICAL_FIELD
    assert types["IsHealthy"] == ColumnDataType.BOOLEAN_FIELD


def test_config_header_mismatch_is_hard_error(tmp_path):
    """Config layout naming a column that doesn't match the header is a hard
    error (GenericFile.cs:174-180)."""
    from influxer_spark.ingest.config import ColumnConfig, ColumnDataType

    path, cfg, _exp = write_simple_metrics(str(tmp_path))
    cfg.column_layout = [
        ColumnConfig(name_in_file="WRONG", influx_name="ts",
                     data_type=ColumnDataType.TIMESTAMP)
    ] + [
        ColumnConfig(influx_name=f"m{i}", data_type=ColumnDataType.NUMERICAL_FIELD)
        for i in range(12)
    ]
    lines = open(path, encoding="utf-8").read().splitlines()
    with pytest.raises(ValueError, match="mismatch"):
        refmodel.run_file(cfg, lines)


def test_multi_defect_row_attribution_order(spark, tmp_path):
    """Reference order (GenericFile.cs:75-110): errors raise in pointData
    ENTRY order, each entry's filter error before its parse error — a row
    with a numeric defect in an EARLY column and a filter hit in a LATER
    column reports 'not a number', not 'filtered' (ADVICE r1; totals were
    already right, per-reason counts were not)."""
    from influxer_spark.ingest.config import (
        ColumnConfig,
        ColumnDataType,
        FilterTransformation,
        GenericFileConfig,
    )

    path = str(tmp_path / "m.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("ts,val,txn\n")
        f.write("01/01/2024 00:00:00.000,1.5,OK_Load\n")
        # BOTH defects: val unparseable (col 2) AND txn filtered (col 3)
        f.write("01/01/2024 00:00:01.000,not-a-num,DEBUG_Beat\n")
        # filter-only defect
        f.write("01/01/2024 00:00:02.000,2.5,DEBUG_Beat\n")
    cfg = GenericFileConfig(
        time_format="MM/dd/yyyy HH:mm:ss.fff",
        column_layout=[
            ColumnConfig("ts", "ts", ColumnDataType.UNKNOWN, skip=True),
            ColumnConfig("val", "val", ColumnDataType.NUMERICAL_FIELD),
            ColumnConfig(
                "txn", "txn", ColumnDataType.TAG,
                filter_transformations=[FilterTransformation(regex="^DEBUG_")],
            ),
        ],
    )
    res = ingest_generic_file(spark, path, cfg)
    errs = {r["line_no"]: r["error"] for r in res.errors.collect()}
    assert errs[3] == "val: not a number"   # early parse beats later filter
    assert errs[4] == "txn: filtered"
    assert res.points.count() == 1
