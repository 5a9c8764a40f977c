"""CLI surface (python -m influxer_spark) — the reference's console contract:
arg parsing, export mode, exit codes (0 Success / 2 ProcessedWithErrors)."""

from __future__ import annotations

import json

import pytest

from influxer_spark.__main__ import main
from influxer_spark.ingest.config import load_config
from tests.ingest_fixtures import write_perfmon, write_simple_metrics


def test_cli_generic_run_and_exit_code(spark, tmp_path, capsys):
    path, _cfg, exp = write_simple_metrics(str(tmp_path))
    out = str(tmp_path / "out")
    rc = main([
        "-input", path, "-format", "Generic",
        "-timeformat", "yyyy-MM-dd m:ss", "-table", "simple",
        "-output", out, "-cores", "8",
    ])
    assert rc == 2  # ProcessedWithErrors (1 malformed row)
    printed = capsys.readouterr().out
    assert f"Processed {exp.points_found} points, 1 failed" in printed
    assert spark.read.parquet(out).count() == exp.points_found


def test_cli_export_autolayout(tmp_path, capsys):
    path, _cfg, _exp = write_simple_metrics(str(tmp_path))
    rc = main([
        "-input", path, "-timeformat", "yyyy-MM-dd m:ss",
        "-export", "-autolayout",
    ])
    assert rc == 0
    cfg = load_config(capsys.readouterr().out)
    assert len(cfg.column_layout) == 13
    assert cfg.column_layout[1].data_type.value == "NumericalField"


def test_cli_perfmon(tmp_path, capsys):
    path, exp, _ = write_perfmon(str(tmp_path), n_rows=5)
    rc = main(["-input", path, "-format", "Perfmon", "-cores", "8"])
    assert rc == 0
    assert "UTC offset -330" in capsys.readouterr().out


def test_cli_rollup_tiers(spark, tmp_path):
    path, _cfg, exp = write_simple_metrics(str(tmp_path))
    out = str(tmp_path / "out2")
    rc = main([
        "-input", path, "-timeformat", "yyyy-MM-dd m:ss",
        "-output", out, "-rollup", "-cores", "8",
    ])
    assert rc == 2
    t1m = spark.read.parquet(out + "_rollup_1m")
    t1d = spark.read.parquet(out + "_rollup_1d")
    # every ingested numeric value lands in exactly one bucket of each tier
    from pyspark.sql import functions as F

    assert t1m.agg(F.sum("cnt")).collect()[0][0] == exp.points_found * 12
    assert t1d.agg(F.sum("cnt")).collect()[0][0] == exp.points_found * 12


def test_cli_config_reload_preserves_settings(tmp_path):
    """S9 round-trip: settings loaded via -config must survive when the
    corresponding CLI flags are not passed (argparse defaults used to
    clobber timetype/precision/header/skip/validate — ADVICE r1)."""
    import json

    from influxer_spark.__main__ import _build_parser, _generic_config

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "measurement": "m",
        "time_format_type": "Epoch",
        "precision": "Milliseconds",
        "header_row": 3,
        "skip_rows": 5,
        "validate_rows": 42,
        "time_column": 2,
    }))
    args = _build_parser().parse_args(
        ["-input", "x.csv", "-config", str(cfg_path)]
    )
    cfg = _generic_config(args)
    assert cfg.time_format_type.value == "Epoch"
    assert cfg.precision.value == "Milliseconds"
    assert (cfg.header_row, cfg.skip_rows, cfg.validate_rows, cfg.time_column) == (3, 5, 42, 2)
    # explicit flags still win
    args2 = _build_parser().parse_args(
        ["-input", "x.csv", "-config", str(cfg_path), "-timetype", "String", "-skip", "0"]
    )
    cfg2 = _generic_config(args2)
    assert cfg2.time_format_type.value == "String" and cfg2.skip_rows == 0
    # and bare defaults (no config) still come from GenericFileConfig
    cfg3 = _generic_config(_build_parser().parse_args(["-input", "x.csv"]))
    assert cfg3.header_row == 1 and cfg3.validate_rows == 10


def test_cli_lineprotocol_output(spark, tmp_path):
    from influxer_spark.sinks import parse_line_protocol

    path, _cfg, exp = write_simple_metrics(str(tmp_path))
    lp = str(tmp_path / "lp")
    rc = main([
        "-input", path, "-format", "Generic",
        "-timeformat", "yyyy-MM-dd m:ss", "-table", "simple",
        "-lineprotocol", lp, "-cores", "8",
    ])
    assert rc == 2
    lines = spark.read.text(lp)
    parsed = parse_line_protocol(lines)
    rows = parsed.collect()
    assert rows
    assert all(r["measurement"] == "simple" for r in rows)
    # one line per ingested CSV row = one InfluxDatapoint = one reference
    # "point"; every field value rides that row's line
    assert len(rows) == exp.points_found
    assert all(r["fields"] for r in rows)


def test_cli_query_mode(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "q_out")
    rc = main([
        "-input", f"{sf_dir}/events.parquet", "-table", "events",
        "-timecol", "ts", "-output", out, "-cores", "8",
        "-query", "SELECT count(value) AS n FROM events"
        " GROUP BY time(1d), event_type",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert printed.splitlines()[0] == "time\tevent_type\tn"
    got = spark.read.parquet(out)
    assert got.count() > 0 and set(got.columns) == {"time", "event_type", "n"}


def test_cli_query_tier_only_with_catalog(spark, tmp_path, capsys):
    """-query -catalog without -input: the InfluxQL statement is answered
    entirely from the materialized tiers (incl. percentile via
    -histbounds), no raw table needed."""
    from influxer_spark.datagen import generate_pages
    from influxer_spark.pipeline import run_pipeline

    pages = generate_pages(str(tmp_path / "pg"), n_rows=1500, seed=3, days=2)
    root = str(tmp_path / "cat")
    from influxer_spark.operators.rollup import log2_bounds

    run_pipeline(spark, pages, root, encode_gorilla=False,
                 hist_bounds=log2_bounds(1.0, 2.0**21))
    # no -histbounds: the CLI resolves the bound list the pipeline pinned
    # as the tiers' hist_bounds table property
    rc = main([
        "-table", "pages", "-catalog", root, "-cores", "8",
        "-query", "SELECT mean(value) AS m, percentile(value, 95) AS p95 "
        "FROM pages GROUP BY time(4h), metric",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert printed.splitlines()[0] == "time\tmetric\tm\tp95"
    assert int(printed.splitlines()[-1].split()[0]) > 0  # "N rows in …"


def test_cli_query_kmv_tier_served(spark, tmp_path, capsys):
    """-query -catalog -kmvitem without -input: approx_count_distinct is
    answered entirely from the materialized kmv sketch tables."""
    from influxer_spark.datagen import generate_pages
    from influxer_spark.extract import (
        pages_to_points,
        with_crawl_metrics,
        with_extracted,
    )
    from influxer_spark.operators.kmv import build_kmv_tiers
    from influxer_spark.pipeline import run_pipeline

    pages = generate_pages(str(tmp_path / "pg"), n_rows=1500, seed=3, days=2)
    root = str(tmp_path / "cat")
    run_pipeline(spark, pages, root, encode_gorilla=False)
    points = pages_to_points(
        with_crawl_metrics(with_extracted(spark.read.parquet(pages)))
    )
    from influxer_spark.catalog import TableCatalog

    build_kmv_tiers(
        spark, TableCatalog(root), points, "warc_ts", ["metric"], "url", k=32
    )
    rc = main([
        "-table", "pages", "-catalog", root, "-cores", "8",
        "-keys", "metric", "-kmvitem", "url",
        "-query", "SELECT approx_count_distinct(url) AS uu "
        "FROM pages GROUP BY time(4h), metric",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert printed.splitlines()[0] == "time\tmetric\tuu"
    assert int(printed.splitlines()[-1].split()[0]) > 0


def test_cli_maintain_sweep(spark, tmp_path, capsys):
    """-maintain: one dependency-ordered sweep — refresh, retention DAG,
    compaction, vacuum, snapshot expiry — reported as one JSON line."""
    import json as _json

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.datagen import generate_pages
    from influxer_spark.pipeline import run_pipeline

    src = str(tmp_path / "pg")
    generate_pages(src, n_rows=600, seed=31, days=3)
    root = str(tmp_path / "cat")
    run_pipeline(spark, src, root, encode_gorilla=False)
    cat = TableCatalog(root)
    days = sorted(cat.committed_partitions("rollup_1d"))
    assert len(days) == 3
    # as-of far enough past the data that raw+1m TTLs have elapsed
    asof = "2024-03-20"
    rc = main([
        "-maintain", "-catalog", root, "-input", src, "-cores", "8",
        "-retention", "raw=7,1m=10", "-asof", asof, "-keeplast", "1",
    ])
    assert rc == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["fresh_days"] == 3 and report["refreshed_days"] == []
    assert sorted(report["retention_dropped"]) == ["raw_points", "rollup_1m"]
    assert report["retention_dropped"]["raw_points"] == days
    # drops committed + expiry ran: raw tiers empty, coarse tiers intact
    assert cat.committed_partitions("raw_points") == {}
    assert sorted(cat.committed_partitions("rollup_1d")) == days
    assert report["elapsed_s"] > 0


def test_cli_cq_run_incremental(spark, sf_dir, tmp_path, capsys):
    """`-query "cq run <iso>"`: the CLI drives the RESAMPLE-incremental
    path — a second run inside EVERY is gated to zero CQs."""
    root = str(tmp_path / "cqcat")
    base = [
        "-input", f"{sf_dir}/events.parquet", "-table", "events",
        "-timecol", "ts", "-catalog", root, "-cores", "8",
    ]
    rc = main([*base, "-query",
               "CREATE CONTINUOUS QUERY c1 ON db RESAMPLE EVERY 1h FOR 2h "
               "BEGIN SELECT count(value) AS n INTO ev_1h FROM events "
               "GROUP BY time(1h), event_type END"])
    assert rc == 0
    ts_max = spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        {"ts": "max"}).collect()[0][0]
    now = ts_max.replace(minute=30, second=0).isoformat()
    rc = main([*base, "-query", f"cq run {now}"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "cq c1:" in printed and " rows" in printed
    # within EVERY of the persisted watermark: gated
    rc = main([*base, "-query", f"cq run {now}"])
    assert rc == 0
    assert "no continuous queries" in capsys.readouterr().out


def test_cli_query_without_input_or_catalog_errors():
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["-query", "SELECT 1 FROM x", "-table", "x"])


def test_cli_refresh_catalog(spark, tmp_path, capsys):
    """-refresh -input -catalog: late pages land in the source dir; the CLI
    refresh recomputes only the stale days and reports them."""
    import shutil as _sh

    from influxer_spark.datagen import generate_pages
    from influxer_spark.pipeline import run_pipeline

    src = str(tmp_path / "pg")
    generate_pages(src, n_rows=600, seed=21, days=2)
    late = generate_pages(str(tmp_path / "late"), n_rows=200, seed=22, days=2)
    root = str(tmp_path / "cat")
    run_pipeline(spark, src, root, encode_gorilla=False)
    _sh.copy(late, f"{src}/late.parquet")

    rc = main(["-refresh", "-input", src, "-catalog", root, "-cores", "8"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "refreshed 2024-03-" in printed
    assert "day(s) refreshed" in printed

    # idempotent: a second refresh finds everything fresh
    rc = main(["-refresh", "-input", src, "-catalog", root, "-cores", "8"])
    printed = capsys.readouterr().out
    assert rc == 0 and printed.startswith("0 day(s) refreshed")


def test_cli_retention_drops_eligible_days(spark, tmp_path, capsys):
    """-retention -catalog: DAG-ordered TTL drops through the CLI, -asof
    pinning the evaluation date; blocked drops are reported, not forced."""
    from influxer_spark.datagen import generate_pages
    from influxer_spark.pipeline import run_pipeline

    src = str(tmp_path / "pg")
    generate_pages(src, n_rows=400, seed=31, days=2)
    root = str(tmp_path / "cat")
    run_pipeline(spark, src, root, encode_gorilla=False)

    # far-future asof: every tier past TTL, raw drops (1m committed)
    rc = main([
        "-retention", "raw=7,1m=30", "-catalog", root, "-asof", "2031-01-01",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "raw_points: 2 dropped" in printed or "raw_points: 3 dropped" in printed
    assert "rollup_1m:" in printed

    # asof before the data: nothing eligible
    rc = main(["-retention", "default", "-catalog", root, "-asof", "2024-03-01"])
    printed = capsys.readouterr().out
    assert rc == 0 and printed.startswith("nothing past TTL")


def test_cli_compact_binpacks_and_vacuums(spark, tmp_path, capsys):
    """-compact -catalog: binpack rewrite + vacuum through the CLI."""
    from influxer_spark.datagen import generate_pages
    from influxer_spark.pipeline import run_pipeline

    src = str(tmp_path / "pg")
    generate_pages(src, n_rows=400, seed=41, days=2)
    root = str(tmp_path / "cat")
    run_pipeline(spark, src, root, encode_gorilla=False)

    rc = main(["-compact", "rollup_1h,nope", "-catalog", root, "-cores", "8"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "rollup_1h:" in printed and "partitions" in printed
    assert "nope: absent, skipped" in printed


def test_cli_diff_prints_changelog(spark, tmp_path, capsys):
    """-diff TABLE:FROM prints the metadata-only snapshot changelog."""
    from pyspark.sql import functions as F

    from influxer_spark.catalog import TableCatalog

    root = str(tmp_path / "cat")
    cat = TableCatalog(root)
    df1 = spark.range(6).select(F.col("id"), F.lit("2024-01-01").alias("day"))
    cat.write_partitions(
        df1, "t", ["2024-01-01"],
        counters_by_partition={"2024-01-01": {"rows_in": 6}},
    )
    s1 = cat.current_snapshot("t")
    df2 = spark.range(9).select(F.col("id"), F.lit("2024-01-02").alias("day"))
    cat.write_partitions(
        df2, "t", ["2024-01-02"],
        counters_by_partition={"2024-01-02": {"rows_in": 9}},
    )
    rc = main(["-catalog", root, "-diff", f"t:{s1}", "-cores", "8"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "added: 2024-01-02" in printed
    assert "rows delta: +9" in printed


def test_cli_deleterows_and_updaterows(spark, tmp_path, capsys):
    """-deleterows/-updaterows drive the catalog's row-level DML from the
    ops surface: COW delete with audit counts, then an in-place UPDATE."""
    from pyspark.sql import functions as F

    from influxer_spark.catalog import TableCatalog

    root = str(tmp_path / "cat")
    cat = TableCatalog(root)
    df = spark.createDataFrame(
        [(i, float(i), "2024-01-01") for i in range(10)], ["id", "v", "day"]
    )
    cat.write_partitions(df, "t", ["2024-01-01"])

    rc = main(["-catalog", root, "-deleterows", "t", "-where", "id >= 8",
               "-cores", "8"])
    assert rc == 0
    assert "2 rows deleted" in capsys.readouterr().out
    assert cat.read_committed(spark, "t").count() == 8

    rc = main(["-catalog", root, "-updaterows", "t",
               "-where", "id < 3", "-set", "v=v * 10", "-cores", "8"])
    assert rc == 0
    assert "3 rows updated" in capsys.readouterr().out
    got = {r["id"]: r["v"] for r in cat.read_committed(spark, "t").collect()}
    assert got[2] == 20.0 and got[5] == 5.0

    with pytest.raises(SystemExit):
        main(["-catalog", root, "-deleterows", "t", "-cores", "8"])  # no -where
    with pytest.raises(SystemExit):
        main(["-catalog", root, "-updaterows", "t", "-where", "id=0",
              "-cores", "8"])  # no -set


def test_cli_ref_lifecycle(spark, tmp_path, capsys):
    """-ref drives the tag/branch lifecycle end to end: tag, list, branch,
    fast-forward, drop — metadata-only, no Spark job."""
    from pyspark.sql import functions as F

    from influxer_spark.catalog import TableCatalog

    root = str(tmp_path / "cat")
    cat = TableCatalog(root)
    df1 = spark.range(4).select(F.col("id"), F.lit("2024-01-01").alias("day"))
    cat.write_partitions(df1, "t", ["2024-01-01"])

    assert main(["-catalog", root, "-ref", "t:tag:rel1"]) == 0
    assert main(["-catalog", root, "-ref", "t:branch:audit"]) == 0
    df2 = spark.range(3).select(F.col("id"), F.lit("2024-01-02").alias("day"))
    cat.write_partitions(df2, "t", ["2024-01-02"], branch="audit")
    capsys.readouterr()
    assert main(["-catalog", root, "-ref", "t:list"]) == 0
    listed = capsys.readouterr().out
    assert "tag    rel1 -> 1" in listed and "branch audit -> 2" in listed

    assert main(["-catalog", root, "-ref", "t:ff:audit"]) == 0
    assert cat.current_snapshot("t") == 2
    assert cat.read_committed(spark, "t").count() == 7
    assert main(["-catalog", root, "-ref", "t:dropbranch:audit"]) == 0
    assert main(["-catalog", root, "-ref", "t:droptag:rel1"]) == 0
    assert cat.tags("t") == {} and cat.branches("t") == {}
