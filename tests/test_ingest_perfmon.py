"""Perfmon ingest tests — synthesized PDH fixture (Influxer.Test
TestPerfmonFile / TestPerfmonFileMultiMeasurement analogues)."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from influxer_spark.ingest.perfmon import ingest_perfmon_file, parse_pdh_header
from tests.ingest_fixtures import write_perfmon


def test_pdh_header_parse(tmp_path):
    path, _exp, _ = write_perfmon(str(tmp_path), n_rows=2)
    first = open(path, encoding="utf-8").readline().rstrip("\n")
    offset, counters = parse_pdh_header(first)
    assert offset == -330
    objs = {c.performance_object for c in counters}
    assert objs == {"Memory", "Processor", "PhysicalDisk"}
    # scrub + Trim('_') on all parts (PerfmonFile.cs:57-65)
    names = {c.counter_name for c in counters}
    assert "Pages_Input_sec" in names  # "Pages Input/sec"
    assert "Idle_Time" in names  # "% Idle Time" → leading % trimmed
    insts = {c.counter_instance for c in counters if c.counter_instance}
    assert "Total" in insts  # "_Total" → leading _ trimmed
    # ':' is NOT in the reserved set → "C:" survives unchanged
    assert any(c.counter_instance == "C:" for c in counters)


def test_perfmon_narrow_golden_count(spark, tmp_path):
    path, exp, _n_wide = write_perfmon(str(tmp_path))
    res = ingest_perfmon_file(spark, path)
    assert res.utc_offset_min == -330
    assert res.narrow.count() == exp.points_found
    assert res.bad_lines.count() == 0
    pts = res.points_narrow()
    assert pts.columns == [
        "ts", "Host", "PerformanceObject", "PerformanceCounter",
        "CounterInstance", "CounterValue",
    ]
    assert pts.count() == exp.points_found


def test_perfmon_ts_offset_applied(spark, tmp_path):
    path, _exp, _ = write_perfmon(str(tmp_path), n_rows=3)
    res = ingest_perfmon_file(spark, path)
    # first data line ts is 01/01/2017 16:00:00.000 local; offset −330 min
    tmin = res.narrow.agg(F.min("ts")).collect()[0][0]
    assert tmin.hour in (10, 11) and tmin.minute in (30, 31, 32)


def test_perfmon_wide_dup_last_wins(spark, tmp_path):
    path, _exp, n_wide_groups = write_perfmon(str(tmp_path))
    res = ingest_perfmon_file(spark, path)

    # expected: parse the file with plain python; dup counter column
    # (first + last) — last non-blank wins per (ts,row)
    rows = list(csv.reader(open(path, encoding="utf-8")))
    header, body = rows[0], rows[1:]
    # columns 1 and len-1 are both Memory\Pages Input/sec (by construction)
    dup_last_idx = len(header) - 1

    wide = {o: res.points_wide(o) for o in res.objects()}
    assert set(wide) == {"Memory", "PhysicalDisk", "Processor"}

    mem = wide["Memory"].collect()
    got = {r["ts"]: r["Pages_Input_sec"] for r in mem}
    checked = 0
    for line in body:
        last, first = line[dup_last_idx].strip(), line[1].strip()
        want = last if last else (first if first else None)
        if want is None:
            continue
        from influxer_spark.ingest.timestamps import py_parse_ts_string

        ts = py_parse_ts_string(line[0], "MM/dd/yyyy HH:mm:ss.fff", -330)
        if ts in got and got[ts] is not None:
            assert got[ts] == float(want), (line[0], got[ts], want)
            checked += 1
    assert checked > 5

    # total wide points across objects == by-construction group count
    total_wide = sum(df.count() for df in wide.values())
    assert total_wide == n_wide_groups


def test_perfmon_points_feed_rollup(spark, tmp_path):
    """Perfmon ingest → narrow point model → 1m tier: the full reference
    delegation path for the Perfmon format."""
    from influxer_spark.operators import rollup as R

    path, exp, _ = write_perfmon(str(tmp_path))
    res = ingest_perfmon_file(spark, path)
    pts = res.points_narrow().select(
        "ts",
        F.concat_ws(
            "|", "Host", "PerformanceObject", "PerformanceCounter"
        ).alias("series"),
        F.col("CounterValue").alias("value"),
    )
    t1m = R.rollup(pts, "ts", ["series"], "value", "1m")
    assert t1m.agg(F.sum("cnt")).collect()[0][0] == exp.points_found


def test_wide_counter_instance_is_header_metadata(spark, tmp_path):
    """PerfmonFile.cs:104-105: CounterInstance is tagged from the FIRST
    counter in column order with a non-blank HEADER instance, before and
    regardless of value parse — a blank-instance first column (even with an
    unparseable value) must not yield NULL (ADVICE r1)."""
    path = str(tmp_path / "mix.csv")
    header = [
        "(PDH-CSV 4.0) (India Standard Time)(-330)",
        r"\\HOST1\Network(   )\Bytes Total/sec",      # blank instance, col 1
        r"\\HOST1\Network(eth0)\Bytes Sent/sec",      # non-blank,  col 2
    ]
    rows = [
        ['"01/01/2017 16:00:00.000"', '" "', '"5.5"'],   # col1 value unparseable
        ['"01/01/2017 16:00:01.000"', '"1.0"', '"6.5"'],
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write(",".join(f'"{h}"' for h in header) + "\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    res = ingest_perfmon_file(spark, path)
    wide = res.points_wide("Network").orderBy("ts").collect()
    assert len(wide) == 2
    # both rows tagged eth0 (header metadata), incl. the row where the
    # blank-instance column's value failed to parse
    assert [r["CounterInstance"] for r in wide] == ["eth0", "eth0"]
    assert wide[0]["Bytes_Total_sec"] is None and wide[0]["Bytes_Sent_sec"] == 5.5
