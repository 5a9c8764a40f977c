"""Deterministic synthesized equivalents of the reference's test fixtures
(FIXTURES.md / Influxer.Test/TestFiles) — same SHAPES, fresh data, seed 42.

Each writer returns (path, cfg, expected) where ``expected`` carries
by-construction golden counts — the analogue of the reference's hard-coded
PointsFound/PointsFailed assertions (Influxer.Test/InfluxerTests.cs).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass

from influxer_spark.ingest.config import (
    ColumnConfig,
    ColumnDataType,
    ExtractTransformation,
    FilterTransformation,
    GenericFileConfig,
    ReplaceTransformation,
    SplitterConfig,
    TimeFormatType,
    TimePrecision,
)

SEED = 42


@dataclass
class Expected:
    points_found: int
    points_failed: int


def _write(path: str, lines: list[str]) -> str:
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path


# ---------------------------------------------------------------------------
# 1. simple_metrics.csv — mirrors Simple.csv (InfluxerTests.cs:107-120):
#    header + 12 numeric columns, fmt "yyyy-MM-dd m:ss", 1 malformed row.
# ---------------------------------------------------------------------------

def write_simple_metrics(tmpdir: str, n_rows: int = 500):
    rng = random.Random(SEED)
    headers = ["Time"] + [f"Metric {i:02d} (ops/s)" for i in range(1, 13)]
    lines = [",".join(headers)]
    bad_row = 137  # past the 10-row inference sample
    for r in range(n_rows):
        ts = f"2017-09-08 {r % 60}:{(r * 7) % 60:02d}"
        vals = [f"{rng.uniform(0, 5000):.6f}" for _ in range(12)]
        if r == bad_row:
            vals[4] = "not-a-number"
        lines.append(",".join([ts] + vals))
    path = _write(os.path.join(tmpdir, "simple_metrics.csv"), lines)
    cfg = GenericFileConfig(measurement="simple", time_format="yyyy-MM-dd m:ss")
    return path, cfg, Expected(points_found=n_rows - 1, points_failed=1)


# ---------------------------------------------------------------------------
# 2. tagged_metrics.csv — mirrors Simple-2.csv (InfluxerTests.cs:122-134):
#    mixed tag + numeric + boolean columns, fmt "MM/dd/yyyy mm:ss",
#    exercises inference precedence double → bool → tag.
# ---------------------------------------------------------------------------

def write_tagged_metrics(tmpdir: str, n_rows: int = 226):
    rng = random.Random(SEED + 1)
    headers = [
        "DateTime", "ServerName", "TransactionGroup", "Transaction", "Region",
        "TxnCount", "TPS", "RespAvg", "RespP90", "ConcurrentUsers", "IsHealthy",
    ]
    servers = ["int05a", "int05b", "web01", "web02"]
    groups = ["Query", "Create", "Update"]
    txns = ["Query Order", "QueryProfiles", "Create Order", "Save/Commit"]
    regions = ["Oregon", "Virginia", "Dublin"]
    lines = [",".join(headers)]
    for r in range(n_rows):
        ts = f"04/{(r % 28) + 1:02d}/2017 {r % 60:02d}:{(r * 3) % 60:02d}"
        row = [
            ts,
            rng.choice(servers),
            rng.choice(groups),
            rng.choice(txns),
            rng.choice(regions),
            str(rng.randint(0, 50)),
            f"{rng.uniform(0, 10):.3f}",
            f"{rng.uniform(0, 2):.5f}",
            f"{rng.uniform(0, 4):.5f}",
            str(rng.randint(0, 30)),
            rng.choice(["true", "false", "True", "FALSE"]),
        ]
        lines.append(",".join(row))
    path = _write(os.path.join(tmpdir, "tagged_metrics.csv"), lines)
    cfg = GenericFileConfig(measurement="tagged", time_format="MM/dd/yyyy mm:ss")
    return path, cfg, Expected(points_found=n_rows, points_failed=0)


# ---------------------------------------------------------------------------
# 3. headerless_log.txt — mirrors HeaderlessText.txt + .conf
#    (InfluxerTests.cs:76-86): comments, positional layout, full transform
#    pipeline (extract / reformat / split / replace-with-default / filter),
#    UtcOffset 420, deliberate malformed rows.
# ---------------------------------------------------------------------------

_STATES = {"FL": "Florida", "CA": "California", "WA": "Washington"}


def headerless_config() -> GenericFileConfig:
    ts_col = ColumnConfig(
        influx_name="ts",
        data_type=ColumnDataType.TIMESTAMP,
        extract_transformations=[
            # strip trailing fractional garbage: keep the leading date+time run
            ExtractTransformation(type="RegEx", regex=r"^[0-9/]+ [0-9:]+")
        ],
    )
    transaction = ColumnConfig(
        influx_name="transaction",
        data_type=ColumnDataType.TAG,
        filter_transformations=[FilterTransformation(regex=r"^DEBUG_")],
    )
    site = ColumnConfig(influx_name="site", data_type=ColumnDataType.TAG)
    ip = ColumnConfig(
        influx_name="client_ip",
        data_type=ColumnDataType.TAG,
        extract_transformations=[
            ExtractTransformation(
                type="RegEx",
                regex=r"(\d+)\.(\d+)\.(\d+)\.(\d+)",
                result_pattern="{0}-{1}-{2}-{3}",
            )
        ],
    )
    location = ColumnConfig(
        influx_name="location",
        data_type=ColumnDataType.TAG,
        split_config=SplitterConfig(
            type="Delimited",
            delimiter=",",
            split_columns=[
                ColumnConfig(
                    influx_name="city", data_type=ColumnDataType.TAG, is_default=True
                ),
                ColumnConfig(
                    influx_name="state",
                    data_type=ColumnDataType.TAG,
                    replace_transformations=[
                        *[
                            ReplaceTransformation(find_text=k, replace_with=v)
                            for k, v in _STATES.items()
                        ],
                        ReplaceTransformation(default_value="Others", is_default=True),
                    ],
                ),
            ],
        ),
    )
    trans_time = ColumnConfig(
        influx_name="trans_time", data_type=ColumnDataType.NUMERICAL_FIELD
    )
    trailing = ColumnConfig(influx_name="_t", skip=True)
    return GenericFileConfig(
        measurement="headerless",
        header_missing=True,
        header_row=1,  # reference skips HeaderRow even when headerless
        comment_marker="#",
        time_column=1,
        time_format="M/d/yy HH:mm:ss",
        utc_offset=420,
        default_tags=["env=test"],
        column_layout=[ts_col, transaction, site, ip, location, trans_time, trailing],
    )


def write_headerless(tmpdir: str, n_rows: int = 500):
    rng = random.Random(SEED + 2)
    txns = ["T001_App_Launch", "T010_First_Create_Order", "T050_Search_Order"]
    sites = ["Countryside", " Sand Lake Branch", "Downtown"]
    cities = [("Clearwater", "FL"), ("Orlando", "FL"), ("Fresno", "CA"),
              ("Seattle", "WA"), ("Austin", "TX")]
    lines = [
        "# synthetic monitoring export",
        "# Column Ids: transTimestamp,bgTrans,site,cIP,cLoc,transTime,",
    ]
    n_bad_ts = n_filtered = n_unsplit = 0
    data_emitted = 0
    for r in range(n_rows):
        ts = f"5/{(r % 27) + 1}/17 {r % 24:02d}:{(r * 11) % 60:02d}:{(r * 7) % 60:02d}.000"
        txn = rng.choice(txns)
        site = rng.choice(sites)
        ip = f"10.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}"
        city, st = rng.choice(cities)
        loc = f'"{city},{st}"'
        val = f"{rng.uniform(100, 90000):.1f}"
        if r % 83 == 3:  # malformed timestamp → row error
            ts = "corrupted-stamp"
            n_bad_ts += 1
        elif r % 97 == 5:  # filtered transaction → row error
            txn = "DEBUG_Heartbeat"
            n_filtered += 1
        elif r % 101 == 7:  # un-splittable location → city default fallback (ok)
            loc = "Homestead"
            n_unsplit += 1
        lines.append(",".join([ts, txn, site, ip, loc, val, ""]))
        data_emitted += 1
        if r % 150 == 10:
            lines.append("# checkpoint marker")  # comment mid-file
    # the unconditional HeaderRow(=1) skip consumes the first comment line
    path = _write(os.path.join(tmpdir, "headerless_log.txt"), lines)
    cfg = headerless_config()
    failed = n_bad_ts + n_filtered
    return path, cfg, Expected(points_found=data_emitted - failed, points_failed=failed)


# ---------------------------------------------------------------------------
# 4. microsec_semicolon.txt — mirrors MicroSecSemicolonSeperated.txt
#    (InfluxerTests.cs:88-104): ';' splitter, fmt yyyy-MM-dd-hh.mm.ss.ffffff,
#    Microseconds precision, padded numeric cells, a free-text column.
# ---------------------------------------------------------------------------

def write_microsec(tmpdir: str):
    rows = [
        ("2019-03-21-10.49.33.803886", 2, 0, 4, 2, "SELECT A FROM T1", 0),
        ("2019-03-21-10.49.33.803886", 1, 0, 0, 0, "GRANT SELECT ON C1 TO ROLE R1", 0),
        ("2019-03-21-10.49.34.590125", 1, 0, 0, 0, "SELECT COLCOUNT FROM IDX", 0),
        ("2019-03-21-10.49.35.000003", 2, 0, 2, 1, "SELECT * FROM STATS", 0),
    ]
    hdr = (
        "SNAPSHOT_TIMESTAMP        ; NUM_EXECUTIONS     ;AVG_EXECUTION_TIME_S;"
        "STMT_SORTS          ;SORTS_PER_EXECUTION ;STMT_TEXT           ;DBPARTITIONNUM"
    )
    lines = [hdr]
    for ts, ne, avg, sorts, spe, text, part in rows:
        lines.append(
            f"{ts};{ne:>20};{avg:>20};{sorts:>20};{spe:>20};{text:<30};{part:>10}"
        )
    path = _write(os.path.join(tmpdir, "microsec_semicolon.txt"), lines)
    cfg = GenericFileConfig(
        measurement="microsec",
        column_splitter=";",
        time_format="yyyy-MM-dd-hh.mm.ss.ffffff",
        precision=TimePrecision.MICROSECONDS,
    )
    return path, cfg, Expected(points_found=4, points_failed=0)


# ---------------------------------------------------------------------------
# 5. epoch / binary csvs — mirror epoch_s.csv / epoch_u.csv / binary.csv
#    (InfluxerTests.cs:181-231): quoted cells, 4 rows each.
# ---------------------------------------------------------------------------

_EPOCH_HDR = '"time","exec_time_s","partition","n_exec","label"'


def _epoch_rows(times: list[int]) -> list[str]:
    rng = random.Random(SEED + 3)
    out = [_EPOCH_HDR]
    for t in times:
        out.append(
            f'"{t}","{rng.randint(0, 5)}","0","{rng.randint(1, 9)}","run_{t % 97}"'
        )
    return out


def write_epoch_seconds(tmpdir: str):
    times = [1505999973, 1505999974, 1506000001, 1506000002]
    path = _write(os.path.join(tmpdir, "epoch_s.csv"), _epoch_rows(times))
    cfg = GenericFileConfig(
        measurement="epoch_s",
        time_format_type=TimeFormatType.EPOCH,
        precision=TimePrecision.SECONDS,
    )
    return path, cfg, Expected(points_found=4, points_failed=0)


def write_epoch_micros(tmpdir: str):
    # deliberately NOT ms-aligned: exercises the µs→ms truncation (F8)
    times = [1505990973803886, 1505990973803999, 1505990974000001, 1505990975123456]
    path = _write(os.path.join(tmpdir, "epoch_u.csv"), _epoch_rows(times))
    cfg = GenericFileConfig(
        measurement="epoch_u",
        time_format_type=TimeFormatType.EPOCH,
        precision=TimePrecision.MICROSECONDS,
    )
    return path, cfg, Expected(points_found=4, points_failed=0)


def write_binary_ts(tmpdir: str):
    # .NET ticks with Utc kind bits (0x4000000000000000), as DateTime.ToBinary
    # would emit; µs-aligned tick values
    base_ticks = 636420238298860000  # 2017-09-21T04:37:09.886
    times = [
        (base_ticks + i * 10_000_000) | 0x4000000000000000 for i in range(4)
    ]
    path = _write(os.path.join(tmpdir, "binary.csv"), _epoch_rows(times))
    cfg = GenericFileConfig(
        measurement="binary", time_format_type=TimeFormatType.BINARY
    )
    return path, cfg, Expected(points_found=4, points_failed=0)


# ---------------------------------------------------------------------------
# 6. perfmon.csv — mirrors Perfmon.csv (InfluxerTests.cs:143-179): PDH
#    header with UTC offset, Object(Instance) paths, blank cells, one
#    duplicate counter column (last wins).
# ---------------------------------------------------------------------------

def write_perfmon(tmpdir: str, n_rows: int = 49):
    rng = random.Random(SEED + 4)
    host = "TESTHOST-01"
    paths: list[str] = []
    meta: list[tuple[str, str, str]] = []  # (object, instance, counter)

    def add(obj: str, inst: str, counter: str) -> None:
        ipart = f"({inst})" if inst else ""
        paths.append(f"\\\\{host}\\{obj}{ipart}\\{counter}")
        meta.append((obj, inst, counter))

    for c in ["Pages Input/sec", "Pages Output/sec", "Pool Nonpaged Bytes"]:
        add("Memory", "", c)
    for inst in ["_Total", "0", "1"]:
        for c in ["% Idle Time", "% Interrupt Time", "% User Time"]:
            add("Processor", inst, c)
    for inst in ["C:", "D:"]:
        for c in ["Disk Reads/sec", "Disk Writes/sec"]:
            add("PhysicalDisk", inst, c)
    # duplicate counter column: same (object, instance, counter) twice —
    # reference keeps the LAST value (PerfmonFile.cs:110-113)
    add("Memory", "", "Pages Input/sec")

    hdr_cells = ['"(PDH-CSV 4.0) (Test Standard Time)(-330)"'] + [
        f'"{p}"' for p in paths
    ]
    lines = [",".join(hdr_cells)]
    expected_narrow = 0
    wide_groups = set()
    for r in range(n_rows):
        ts = f"01/{(r % 28) + 1:02d}/2017 16:{r % 60:02d}:{(r * 13) % 60:02d}.{r % 1000:03d}"
        cells = [f'"{ts}"']
        for obj, inst, _c in meta:
            if rng.random() < 0.3:
                cells.append('" "')  # blank cell → silently skipped
            else:
                cells.append(f'"{rng.uniform(0, 100):.6f}"')
                expected_narrow += 1
                wide_groups.add((obj, r))
        lines.append(",".join(cells))
    path = _write(os.path.join(tmpdir, "perfmon.csv"), lines)
    return path, Expected(points_found=expected_narrow, points_failed=0), len(
        wide_groups
    )
