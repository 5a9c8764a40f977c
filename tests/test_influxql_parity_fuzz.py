"""Property-based tier-vs-raw parity: ANY statement the tiered engine
accepts must answer exactly like the raw engine, whichever path routing
picks.  The round-2 `GROUP BY time(), *` silent wrong answer was exactly
this bug class — a hand-written sweep can only pin the shapes someone
thought of; hypothesis explores the cross product (aggregate subsets ×
widths incl. non-divisors × tag groupings × fills × where × order/limit
× SLIMIT) and shrinks any divergence to a minimal statement."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from influxer_spark.catalog import TableCatalog
from influxer_spark.datagen import generate_pages
from influxer_spark.extract import pages_to_points, with_crawl_metrics, with_extracted
from influxer_spark.influxql_frontend import InfluxQLEngine
from influxer_spark.pipeline import run_pipeline

_AGGS = ["count", "sum", "mean", "min", "max", "spread"]
_WIDTHS = ["30m", "1h", "90m", "2h", "4h", "7h", "12h", "1d", "49h"]
_METRICS = ["n_tokens", "html_bytes", "text_bytes"]


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    pages = generate_pages(str(d / "pg"), n_rows=2400, seed=7, days=3)
    root = str(d / "cat")
    run_pipeline(spark, pages, root, encode_gorilla=False)
    points = pages_to_points(
        with_crawl_metrics(with_extracted(spark.read.parquet(pages)))
    ).cache()
    points.count()
    raw = InfluxQLEngine({"pages": points}, ts_col="warc_ts")
    tiered = InfluxQLEngine({"pages": points}, ts_col="warc_ts")
    tiered.register_tiered("pages", TableCatalog(root), key_cols=("url", "metric"))
    return raw, tiered


@st.composite
def statements(draw):
    aggs = draw(
        st.lists(st.sampled_from(_AGGS), min_size=1, max_size=3, unique=True)
    )
    tr = draw(
        st.sampled_from(
            ["", "derivative", "difference", "cumulative_sum",
             "moving_average:3"]
        )
    )
    if tr and len(aggs) == 1:
        # chain-window transforms over the (possibly tier-served) aggregate
        name, _, arg = tr.partition(":")
        inner = f"{aggs[0]}(value)"
        call = f"{name}({inner}, {arg})" if arg else f"{name}({inner})"
        proj = f"{call} AS t_{name}"
    else:
        proj = ", ".join(f"{a}(value) AS a_{a}" for a in aggs)
    width = draw(st.sampled_from(_WIDTHS))
    tags = draw(st.sampled_from(["", ", metric", ", metric, url", ", *"]))
    where = draw(
        st.sampled_from(
            ["", f" WHERE metric = '{draw(st.sampled_from(_METRICS))}'"]
        )
    )
    fill = draw(st.sampled_from(["", " fill(none)", " fill(0)", " fill(previous)"]))
    order = draw(st.sampled_from(["", " ORDER BY time DESC"]))
    limit = draw(st.sampled_from(["", " LIMIT 5", " LIMIT 7 OFFSET 2"]))
    slimit = draw(st.sampled_from(["", " SLIMIT 3"])) if tags else ""
    return (
        f"SELECT {proj} FROM pages{where} "
        f"GROUP BY time({width}){tags}{fill}{order}{limit}{slimit}"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=statements())
def test_any_tiered_statement_matches_raw(engines, q):
    raw, tiered = engines
    want = raw.execute(q)
    got = tiered.execute(q)
    assert got.columns == want.columns, q
    a = sorted(map(tuple, want.collect()))
    b = sorted(map(tuple, got.collect()))
    assert len(a) == len(b), q
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and va is not None and vb is not None:
                assert vb == pytest.approx(va, rel=1e-9, abs=1e-9), q
            else:
                assert va == vb, q
