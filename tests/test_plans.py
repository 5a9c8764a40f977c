"""Physical-plan regression tests (SURVEY.md §4): the properties that make
the engine scale must be visible in the plan, not just hoped for —
column pruning at the scan, predicate pushdown for partition/row-group
pruning, broadcast (not sort-merge) dim joins, and window frames sharing
one sort/exchange.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as E
from influxer_spark.datagen import generate_pages
from influxer_spark.pipeline import _pending_filter


def _fmt(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = E.queries()
    return {
        name: _fmt(spark, qs[name](spark, sf_dir))
        for name in [
            "rollup_1m", "revenue_by_nation", "retention_candidates",
            "gapfill_1h_interpolate",
        ]
    }


def test_rollup_scan_prunes_columns(plans):
    m = re.search(r"ReadSchema: struct<([^>]*)>", plans["rollup_1m"])
    assert m, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "event_type", "value"}, cols


def test_dim_joins_broadcast_not_sortmerge(plans):
    p = plans["revenue_by_nation"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_retention_uses_anti_join(plans):
    assert "LeftAnti" in plans["retention_candidates"]


def test_gapfill_windows_share_one_sort(plans):
    """Both interpolation windows partition+order identically — Catalyst must
    stack them on ONE sort with no exchange in between."""
    p = plans["gapfill_1h_interpolate"]
    ops = [
        m.group(1)
        for m in re.finditer(r"^\s*\(\d+\) (Exchange|Sort|Window)", p, re.M)
    ]
    first_w = ops.index("Window")
    between = ops[first_w : len(ops) - ops[::-1].index("Window")]
    assert "Exchange" not in between, ops
    assert between.count("Window") >= 2


def test_day_filter_pushes_to_scan(spark, tmp_path):
    path = generate_pages(str(tmp_path), n_rows=2000, seed=42, days=3)
    pages = spark.read.parquet(path)
    day = sorted(
        r[0]
        for r in pages.selectExpr("date_format(warc_ts, 'yyyy-MM-dd')")
        .distinct().collect()
    )[1]
    df = pages.filter(_pending_filter(pages, [day])).select("url")
    p = _fmt(spark, df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m, "no PushedFilters in scan"
    assert "GreaterThanOrEqual(warc_ts" in m.group(1), m.group(1)
    assert "LessThan(warc_ts" in m.group(1), m.group(1)
