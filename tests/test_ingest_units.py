"""Unit tests per operator (SURVEY.md §5 engine strategy (a)): scrub,
.NET round, timestamp modes, transform chain, splits, inference precedence —
Python mirror AND Spark Column implementations, asserted equal."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from influxer_spark.ingest.config import (
    ColumnConfig,
    ColumnDataType,
    ExtractTransformation,
    FilterTransformation,
    GenericFileConfig,
    ReplaceTransformation,
    SplitterConfig,
    TimePrecision,
)
from influxer_spark.ingest import refmodel
from influxer_spark.ingest.scrub import scrub_col, scrub_name
from influxer_spark.ingest.timestamps import (
    dotnet_to_java_format,
    parse_ts_binary_col,
    parse_ts_epoch_col,
    py_parse_ts_binary,
    py_parse_ts_epoch,
)
from influxer_spark.ingest.transforms import (
    compile_chain,
    dotnet_round2_col,
    parse_double_col,
)

SCRUB_CASES = [
    ("Average Read Transfer Size (KiB/op)", "Average_Read_Transfer_Size_KiB_op"),
    ("% Idle Time", "Idle_Time"),
    ("a  b,,c", "a_b_c"),  # consecutive reserved chars collapse to ONE _
    ("__x__", "x"),
    ("plain", "plain"),
    ("A.B/C#D", "A_B_C_D"),
]


def test_scrub_name_python():
    for raw, want in SCRUB_CASES:
        assert scrub_name(raw) == want, raw


def test_scrub_col_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in SCRUB_CASES], ["s"])
    got = [r[0] for r in df.select(scrub_col(F.col("s"))).collect()]
    assert got == [w for _, w in SCRUB_CASES]


ROUND_CASES = [
    2.675, 2.665, 2.135, 0.125, 0.135, 1.005, -2.675, -0.125, 123.456, 5.0
]


def test_dotnet_round_matches_python(spark):
    df = spark.createDataFrame([(v,) for v in ROUND_CASES], ["v"])
    got = [r[0] for r in df.select(dotnet_round2_col(F.col("v"))).collect()]
    want = [refmodel.bround2(v) for v in ROUND_CASES]
    assert got == want
    # .NET binary-scaling behavior (documented in Math.Round remarks):
    # 2.135*100 is 213.49999… in IEEE → 2.13, where Spark's bround (decimal
    # string repr) would give 2.14 — the replica matches .NET.
    assert refmodel.bround2(2.135) == 2.13
    assert refmodel.bround2(0.125) == 0.12  # true midpoint → even


def test_number_regex_tryparse_shapes(spark):
    cases = {
        "123": 123.0, " 42 ": 42.0, "-1.5": -1.5, ".5": 0.5, "5.": 5.0,
        "1,234.5": 1234.5, "1e3": 1000.0, "-2.5E-2": -0.02,  # −0.025 → even
        "abc": None, "": None, ".": None, "e5": None, "1.2.3": None,
        "NaN": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], ["s"])
    v, err = parse_double_col(F.col("s"))
    got = {r["s"]: r["v"] for r in df.select("s", v.alias("v")).collect()}
    for s, want in cases.items():
        assert got[s] == want, (s, got[s], want)
        assert (refmodel.try_parse_double(s) is None) == (want is None), s


def test_format_translation():
    assert dotnet_to_java_format("MM/dd/yyyy HH:mm:ss.fff") == "MM/dd/yyyy HH:mm:ss.SSS"
    assert dotnet_to_java_format("yyyy-MM-dd-hh.mm.ss.ffffff") == "yyyy-MM-dd-hh.mm.ss.SSSSSS"
    assert dotnet_to_java_format("yyyy-MM-dd m:ss") == "yyyy-MM-dd m:ss"


EPOCH_CASES = [
    (1505990973803886, TimePrecision.MICROSECONDS),  # µs → ms truncation
    (1505990973803999, TimePrecision.MICROSECONDS),
    (-1500, TimePrecision.MICROSECONDS),  # toward-zero on negatives
    (1505999973, TimePrecision.SECONDS),
    (25099999, TimePrecision.MINUTES),
    (1755999973803886000, TimePrecision.NANOSECONDS),  # >2^53: long-exact path
]


def test_epoch_parse_matches_python(spark):
    df = spark.createDataFrame(
        [(str(v), p.value) for v, p in EPOCH_CASES], ["s", "p"]
    )
    for v, p in EPOCH_CASES:
        got = (
            spark.createDataFrame([(str(v),)], ["s"])
            .select(parse_ts_epoch_col(F.col("s"), p).alias("ts"))
            .collect()[0]["ts"]
        )
        assert got == py_parse_ts_epoch(v, p), (v, p, got)


def test_binary_ts_matches_python(spark):
    raw = (636420238298860000 + 12345670) | 0x4000000000000000
    got = (
        spark.createDataFrame([(str(raw),)], ["s"])
        .select(parse_ts_binary_col(F.col("s")).alias("ts"))
        .collect()[0]["ts"]
    )
    assert got == py_parse_ts_binary(raw)
    assert got.year == 2017 and got.microsecond == py_parse_ts_binary(raw).microsecond


# ---------------------------------------------------------------------------
# transform chain semantics
# ---------------------------------------------------------------------------

def _run_chain(spark, cfg: ColumnConfig, values: list[str]):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    tr = compile_chain(cfg, F.col("s"))
    rows = df.select(
        tr.content.alias("content"), tr.error.alias("err")
    ).collect()
    return [(r["content"], r["err"]) for r in rows]


def test_chain_default_fires_only_without_match(spark):
    cfg = ColumnConfig(
        influx_name="state",
        replace_transformations=[
            ReplaceTransformation(find_text="FL", replace_with="Florida"),
            ReplaceTransformation(default_value="Others", is_default=True),
        ],
    )
    got = _run_chain(spark, cfg, ["FL", "TX", "XFLY"])
    assert got[0] == ("Florida", False)
    assert got[1] == ("Others", False)
    assert got[2] == ("XFloridaY", False)  # contains-FL replace, no default
    for v in ["FL", "TX", "XFLY"]:
        assert refmodel.transform(cfg, v) == got[["FL", "TX", "XFLY"].index(v)][0]


def test_chain_transforms_stack_in_order(spark):
    # extract then replace — second transform sees the first one's output
    cfg = ColumnConfig(
        influx_name="x",
        extract_transformations=[
            ExtractTransformation(type="RegEx", regex=r"[a-z]+")
        ],
        replace_transformations=[
            ReplaceTransformation(find_text="abc", replace_with="Z")
        ],
    )
    got = _run_chain(spark, cfg, ["123abcdef456"])
    assert got[0] == ("Zdef", False)
    assert refmodel.transform(cfg, "123abcdef456") == "Zdef"


def test_filter_marks_row_error(spark):
    cfg = ColumnConfig(
        influx_name="t",
        filter_transformations=[FilterTransformation(regex=r"^debug")],
    )
    got = _run_chain(spark, cfg, ["DEBUG_x", "normal"])
    assert got[0][1] is True  # IgnoreCase regex
    assert got[1][1] is False


def test_regex_extract_result_pattern(spark):
    cfg = ColumnConfig(
        influx_name="ip",
        extract_transformations=[
            ExtractTransformation(
                type="RegEx",
                regex=r"(\d+)\.(\d+)\.(\d+)\.(\d+)",
                result_pattern="{0}-{1}-{2}-{3}",
            )
        ],
    )
    got = _run_chain(spark, cfg, ["ip=10.2.3.44 port=80"])
    assert got[0] == ("10-2-3-44", False)
    assert refmodel.transform(cfg, "ip=10.2.3.44 port=80") == "10-2-3-44"


def test_substring_extract_guard(spark):
    # applicable only if len > start AND len > start+length (Extract.cs:70-71)
    cfg = ColumnConfig(
        influx_name="s",
        extract_transformations=[
            ExtractTransformation(type="SubString", start_index=2, length=3)
        ],
    )
    got = _run_chain(spark, cfg, ["abcdefgh", "abcde", "ab"])
    assert got[0] == ("cde", False)
    assert got[1] == ("abcde", False)  # len 5 not > 5 → not applicable
    assert got[2] == ("ab", False)
    for i, v in enumerate(["abcdefgh", "abcde", "ab"]):
        assert refmodel.transform(cfg, v) == got[i][0]


def test_inference_precedence_double_bool_tag():
    cfg = GenericFileConfig(time_column=99)  # keep ts parsing out of the way
    layout = refmodel.Layout(
        [
            (0, ColumnConfig(influx_name="a")),
            (1, ColumnConfig(influx_name="b")),
            (2, ColumnConfig(influx_name="c")),
        ]
    )
    assert refmodel.infer_types(cfg, layout, ["1.5,true,hello", "2,false,x"])
    types = [c.data_type for _, c in layout.columns]
    assert types == [
        ColumnDataType.NUMERICAL_FIELD,
        ColumnDataType.BOOLEAN_FIELD,
        ColumnDataType.TAG,
    ]


def test_inference_inconsistency_raises():
    cfg = GenericFileConfig(time_column=99, validate_rows=5)
    layout = refmodel.Layout([(0, ColumnConfig(influx_name="a"))])
    with pytest.raises(ValueError, match="inconsistent"):
        refmodel.infer_types(cfg, layout, ["1.5", "oops"])


def test_fixed_width_split(spark):
    cfg = ColumnConfig(
        influx_name="w",
        split_config=SplitterConfig(
            type="FixedWidth",
            width=2,
            split_columns=[
                ColumnConfig(influx_name="p1", data_type=ColumnDataType.TAG),
                ColumnConfig(influx_name="p2", data_type=ColumnDataType.TAG),
                ColumnConfig(influx_name="p3", data_type=ColumnDataType.TAG),
            ],
        ),
    )
    got = refmodel.split_data(cfg, "aabbcc")
    assert [(c.influx_name, v) for c, v in got.values()] == [
        ("p1", "aa"), ("p2", "bb"), ("p3", "cc")
    ]
    from influxer_spark.ingest.transforms import compile_split

    df = spark.createDataFrame([("aabbcc",), ("aabbc",)], ["s"])
    leaves, err = compile_split(cfg.split_config, F.col("s"))
    row = df.select(
        *[v.alias(c.influx_name) for c, v, _p in leaves], err.alias("e")
    ).collect()
    assert tuple(row[0])[:4] == ("aa", "bb", "cc", False)
    assert tuple(row[1])[:4] == ("aa", "bb", "c", False)  # short tail chunk ok


def test_ns_precision_truncation_deviation_pinned(spark):
    """PINNED DEVIATION (VERDICT r1 #7): the reference keeps nanosecond
    epochs at 100ns tick resolution (epoch/100 ticks,
    Influxer/ExtensionMethods.cs:55-69); Spark timestamps hold µs, so this
    engine truncates to µs.  The divergence is therefore EXACTLY the
    sub-µs part of the 100ns tick — never more, and zero for µs-aligned
    inputs.  A change that widens this (e.g. ms truncation) must fail here."""
    import datetime as dt

    from pyspark.sql import functions as F

    from influxer_spark.ingest.config import TimePrecision
    from influxer_spark.ingest.timestamps import parse_ts_epoch_col

    ns = 1_700_000_000_123_456_789  # sub-µs component: 789 ns
    df = spark.createDataFrame([(str(ns),)], ["c"])
    got = df.select(
        parse_ts_epoch_col(F.col("c"), TimePrecision.NANOSECONDS).alias("ts")
    ).collect()[0]["ts"]
    # engine semantics: µs truncation
    want_us = ns // 1000
    epoch = dt.datetime(1970, 1, 1)
    assert got == epoch + dt.timedelta(microseconds=want_us)
    # .NET semantics: 100ns ticks; the pinned delta is exactly the sub-µs
    # remainder of the tick (here 700 ns), strictly < 1 µs
    dotnet_ticks_ns = (ns // 100) * 100
    delta_ns = dotnet_ticks_ns - want_us * 1000
    assert delta_ns == 700 and 0 <= delta_ns < 1000
    # µs-aligned input: no deviation at all
    ns_aligned = 1_700_000_000_123_456_000
    df2 = spark.createDataFrame([(str(ns_aligned),)], ["c"])
    got2 = df2.select(
        parse_ts_epoch_col(F.col("c"), TimePrecision.NANOSECONDS).alias("ts")
    ).collect()[0]["ts"]
    assert got2 == epoch + dt.timedelta(microseconds=ns_aligned // 1000)
    assert (ns_aligned // 100) * 100 == (ns_aligned // 1000) * 1000


def test_frombinary_local_kind_deviation_pinned(spark):
    """PINNED DEVIATION (VERDICT r1 #7): .NET DateTime.FromBinary applies a
    local-timezone adjustment when the kind bits (63-62) say Local
    (Influxer/GenericFile.cs:126-130); this engine masks the kind bits and
    interprets ticks verbatim for ALL four kind prefixes — i.e. Local's tz
    adjustment is deliberately not replicated (timezone-dependent output
    would break cross-engine determinism; fixtures use UTC).  All kinds
    must decode identically to the tick value."""
    import datetime as dt

    from pyspark.sql import functions as F

    from influxer_spark.ingest.timestamps import parse_ts_binary_col, py_parse_ts_binary

    base = dt.datetime(2017, 5, 13, 12, 30, 45)
    ticks = int((base - dt.datetime(1, 1, 1)).total_seconds()) * 10_000_000
    kinds = {
        "unspecified": 0,
        "utc": 1 << 62,
        "local": 2 << 62,  # .NET would tz-adjust this one; we must not
        "local2": 3 << 62,
    }
    rows = [(name, str((ticks | bits) - (1 << 64) if (ticks | bits) >= (1 << 63) else (ticks | bits)))
            for name, bits in kinds.items()]
    df = spark.createDataFrame(rows, ["kind", "c"])
    got = {
        r["kind"]: r["ts"]
        for r in df.select(
            "kind", parse_ts_binary_col(F.col("c")).alias("ts")
        ).collect()
    }
    assert all(v == base for v in got.values()), got
    # python mirror agrees (refmodel path)
    for bits in kinds.values():
        signed = (ticks | bits) - (1 << 64) if (ticks | bits) >= (1 << 63) else (ticks | bits)
        assert py_parse_ts_binary(signed) == base
