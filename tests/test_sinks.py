"""Line-protocol sink: escaping/formatting parity vs a pure-Python spec
serializer, null handling, precision, and the text write path."""

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from influxer_spark.sinks import to_line_protocol, write_line_protocol


# ---- pure-Python line-protocol reference (public spec) ----

def _esc(s, chars):
    out = []
    for ch in s:
        out.append("\\" + ch if ch in chars else ch)
    return "".join(out)


def _field_val(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"{v}i"
    if isinstance(v, float):
        return repr(v) if v != int(v) else f"{v:.1f}"
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'


def ref_line(measurement, tags, fields, ts_ns):
    parts = [_esc(measurement, ", ")]
    for k in sorted(tags):
        v = tags[k]
        if v is None or v == "":
            continue
        parts.append("," + _esc(k, ",= ") + "=" + _esc(str(v), ",= "))
    fparts = [
        _esc(k, ",= ") + "=" + _field_val(v) for k, v in fields.items() if v is not None
    ]
    if not fparts:
        return None
    return "".join(parts) + " " + ",".join(fparts) + f" {ts_ns}"


TS = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
TS_NS = int(TS.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000


def test_escaping_parity(spark):
    rows = [
        Row(ts=TS, host="h 1", region="eu,west", msg='say "hi"\\now', cnt=3, val=2.5),
        Row(ts=TS, host="a=b", region=None, msg="plain", cnt=7, val=12.0),
        Row(ts=TS, host="", region="r", msg=None, cnt=None, val=0.25),
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        r["line"]
        for r in to_line_protocol(
            df,
            measurement="cpu load,1",
            tags=["host", "region"],
            fields=["cnt", "val", "msg"],
            ts_col="ts",
        ).collect()
    )
    exp = sorted(
        ref_line(
            "cpu load,1",
            {"host": r.host, "region": r.region},
            {"cnt": r.cnt, "val": r.val, "msg": r.msg},
            TS_NS,
        )
        for r in rows
    )
    assert got == exp
    # spot-check the actual escaped shapes
    joined = "\n".join(got)
    assert "cpu\\ load\\,1" in joined
    assert "host=h\\ 1" in joined
    assert "region=eu\\,west" in joined
    assert "host=a\\=b" in joined
    assert 'msg="say \\"hi\\"\\\\now"' in joined


def test_all_null_fields_row_dropped(spark):
    df = spark.createDataFrame([Row(ts=TS, v=None), Row(ts=TS, v=1.5)], "ts timestamp, v double")
    out = to_line_protocol(df, measurement="m", fields=["v"], ts_col="ts").collect()
    assert [r["line"] for r in out] == [f"m v=1.5 {TS_NS}"]


def test_measurement_col_and_bool_and_precision(spark):
    df = spark.createDataFrame(
        [Row(ts=TS, metric="up time", ok=True)], "ts timestamp, metric string, ok boolean"
    )
    us = TS_NS // 1000
    for prec, expect_ts in [("ns", TS_NS), ("us", us), ("ms", us // 1000), ("s", us // 1_000_000)]:
        out = to_line_protocol(
            df, measurement_col="metric", fields=["ok"], ts_col="ts", precision=prec
        ).collect()
        assert out[0]["line"] == f"up\\ time ok=true {expect_ts}"


def test_tag_sorted_by_key(spark):
    df = spark.createDataFrame(
        [Row(ts=TS, z="1", a="2", v=1.0)], "ts timestamp, z string, a string, v double"
    )
    out = to_line_protocol(df, measurement="m", tags=["z", "a"], fields=["v"], ts_col="ts").collect()
    assert out[0]["line"].startswith("m,a=2,z=1 ")


def test_write_and_readback(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(ts=TS, host=f"h{i}", v=float(i)) for i in range(10)],
        "ts timestamp, host string, v double",
    )
    path = os.path.join(tmp_path, "lp")
    write_line_protocol(df, path, measurement="m", tags=["host"], fields=["v"], ts_col="ts")
    back = spark.read.text(path)
    assert back.count() == 10
    assert back.filter(F.col("value").rlike(r"^m,host=h\d v=\d+\.\d+ \d+$")).count() == 10


def test_parse_roundtrip(spark):
    from influxer_spark.sinks import parse_line_protocol

    rows = [
        Row(ts=TS, host="h 1", region="eu,west", msg='say "hi"\\now', cnt=3, val=2.5),
        Row(ts=TS, host="a=b", region=None, msg="plain words here", cnt=7, val=12.0),
        Row(ts=TS, host="", region="r", msg=None, cnt=None, val=0.25),
    ]
    df = spark.createDataFrame(rows)
    lines = to_line_protocol(
        df, measurement="cpu load,1", tags=["host", "region"],
        fields=["cnt", "val", "msg"], ts_col="ts",
    ).withColumnRenamed("line", "value")
    parsed = parse_line_protocol(lines).collect()
    assert len(parsed) == 3
    by_host = {p["tags"].get("host"): p for p in parsed}
    p = by_host["h 1"]
    assert p["measurement"] == "cpu load,1"
    assert p["tags"] == {"host": "h 1", "region": "eu,west"}
    assert p["fields"] == {"cnt": "3", "val": "2.5", "msg": 'say "hi"\\now'}
    assert p["field_types"] == {"cnt": "integer", "val": "float", "msg": "string"}
    assert p["ts"] == TS
    p2 = by_host["a=b"]
    assert "region" not in p2["tags"]
    assert p2["fields"]["msg"] == "plain words here"
    p3 = by_host.get(None)  # empty host tag omitted on write
    assert p3["fields"] == {"val": "0.25"}


def test_parse_booleans_and_precisions(spark):
    from influxer_spark.sinks import parse_line_protocol

    us = TS_NS // 1000
    lines = spark.createDataFrame(
        [
            (f"m ok=true,bad=f,n=-5i {TS_NS}",),
            (f"m v=1.5 {us}",),
        ],
        "value string",
    )
    p1 = parse_line_protocol(lines.limit(1)).collect()[0]
    assert p1["fields"] == {"ok": "true", "bad": "false", "n": "-5"}
    assert p1["field_types"] == {"ok": "boolean", "bad": "boolean", "n": "integer"}
    assert p1["ts"] == TS
    us_line = lines.filter(F.col("value").startswith("m v=1.5"))
    p2 = parse_line_protocol(us_line, precision="us").collect()[0]
    assert p2["ts"] == TS


def test_read_write_roundtrip_files(spark, tmp_path):
    from influxer_spark.sinks import read_line_protocol

    df = spark.createDataFrame(
        [Row(ts=TS, host=f"h {i}", v=float(i) + 0.5, n=i) for i in range(20)],
        "ts timestamp, host string, v double, n long",
    )
    path = os.path.join(tmp_path, "lp")
    write_line_protocol(df, path, measurement="m", tags=["host"], fields=["v", "n"], ts_col="ts")
    back = read_line_protocol(spark, path)
    got = sorted(
        (r["tags"]["host"], float(r["fields"]["v"]), int(r["fields"]["n"]), r["ts"])
        for r in back.collect()
    )
    exp = sorted((f"h {i}", float(i) + 0.5, i, TS) for i in range(20))
    assert got == exp


def test_requires_field_and_single_measurement(spark):
    df = spark.createDataFrame([Row(ts=TS, v=1.0)], "ts timestamp, v double")
    with pytest.raises(ValueError, match="field"):
        to_line_protocol(df, measurement="m", fields=[], ts_col="ts")
    with pytest.raises(ValueError, match="measurement"):
        to_line_protocol(df, fields=["v"], ts_col="ts")
    with pytest.raises(ValueError, match="measurement"):
        to_line_protocol(df, measurement="m", measurement_col="v", fields=["v"], ts_col="ts")
