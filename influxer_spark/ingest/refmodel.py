"""Pure-Python reference-semantics model (SURVEY.md §7 step 2).

A line-at-a-time mirror of the reference's parse→point pipeline
(Influxer/GenericFile.cs) with NO Spark dependency. Two jobs:

1. **Driver-side type inference** — ``ValidateData``'s bounded N-row sample
   with the exact precedence double → bool → tag
   (Influxer/GenericFile.cs:485-493) and consistency enforcement; running a
   10-row sample on the driver is the correct scale posture even at 100 TB.
2. **Test oracle** — golden-count fixture tests compare the distributed
   Column-compiled pipeline (generic.py) against this model point-for-point,
   standing in for the .NET runtime + live InfluxDB of the reference's own
   tests (Influxer.Test/InfluxerTests.cs:107-134).

Error semantics: any per-row exception marks that ROW failed and processing
continues (GenericFile.cs:337-351 catch + failure tracker); a point with
zero fields is an error (GenericFile.cs:111-112).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Iterable, Iterator, Optional

from influxer_spark.ingest.config import (
    ColumnConfig,
    ColumnDataType,
    ExtractTransformation,
    FilterTransformation,
    GenericFileConfig,
    ReplaceTransformation,
    SplitterConfig,
    TimeFormatType,
)
from influxer_spark.ingest.scrub import scrub_name
from influxer_spark.ingest.timestamps import (
    py_parse_ts_binary,
    py_parse_ts_epoch,
    py_parse_ts_string,
)

_NUM_RE = re.compile(
    r"^\s*[+-]?(\d{1,3}(,\d{3})+(\.\d*)?|\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?\s*$"
)


class RowError(Exception):
    pass


def _blank(s: Optional[str]) -> bool:
    return s is None or s.strip() == ""


def try_parse_double(s: str) -> Optional[float]:
    if not _NUM_RE.match(s):
        return None
    return float(s.replace(",", ""))


def bround2(v: float) -> float:
    """Math.Round(v, 2) — half-to-even on the scaled value."""
    scaled = v * 100.0
    import math

    fl = math.floor(scaled)
    diff = scaled - fl
    if diff > 0.5:
        n = fl + 1
    elif diff < 0.5:
        n = fl
    else:
        n = fl + 1 if fl % 2 else fl
    return n / 100.0


def try_parse_bool(s: str) -> Optional[bool]:
    t = s.strip().lower()
    if t == "true":
        return True
    if t == "false":
        return False
    return None


# ---------------------------------------------------------------------------
# transform chain (GenericColumn.Transform)
# ---------------------------------------------------------------------------

def _can(t: Any, content: str) -> bool:
    if t.is_default:
        return True
    if isinstance(t, ExtractTransformation):
        if t.type == "SubString":
            return (
                not _blank(content)
                and len(content) > t.start_index
                and len(content) > t.start_index + t.length
            )
        return not _blank(content) and re.search(t.regex, content, re.I) is not None
    if isinstance(t, ReplaceTransformation):
        return not _blank(content) and t.find_text in content
    if isinstance(t, FilterTransformation):
        return not _blank(content) and re.search(t.regex, content, re.I) is not None
    raise TypeError(t)


def _apply(t: Any, content: str) -> str:
    if t.is_default:
        if isinstance(t, FilterTransformation):
            raise RowError(f"filtered: {content!r}")
        return t.default_value
    if isinstance(t, FilterTransformation):
        raise RowError(f"filtered by {t.regex}: {content!r}")
    if isinstance(t, ExtractTransformation):
        if t.type == "SubString":
            return content[t.start_index : t.start_index + t.length]
        m = re.search(t.regex, content, re.I)
        if m is None:
            return ""
        if t.result_pattern:
            return re.sub(
                r"\{(\d+)\}", lambda g: m.group(int(g.group(1)) + 1) or "", t.result_pattern
            )
        return m.group(0)
    if isinstance(t, ReplaceTransformation):
        return content.replace(t.find_text, t.replace_with)
    raise TypeError(t)


def transform(cfg: ColumnConfig, content: str) -> str:
    transforms = cfg.ordered_transforms()
    applied = False
    for t in (x for x in transforms if not x.is_default):
        if _can(t, content):
            content = _apply(t, content)
            applied = True
    if not applied:
        for t in (x for x in transforms if x.is_default):
            if _can(t, content):
                content = _apply(t, content)
    return content


# ---------------------------------------------------------------------------
# splits (Splitter.Split + GenericColumn.SplitData)
# ---------------------------------------------------------------------------

def _can_split(sc: SplitterConfig, content: str) -> bool:
    if _blank(content):
        return False
    if sc.type == "FixedWidth":
        return len(content) > sc.width
    return re.search(sc.delimiter, content, re.I) is not None


def _split_parts(sc: SplitterConfig, content: str) -> list[str]:
    if sc.type == "FixedWidth":
        return [content[i : i + sc.width] for i in range(0, len(content), sc.width)]
    return re.split(sc.delimiter, content, flags=re.I)


def split_data(cfg: ColumnConfig, content: str) -> dict[int, tuple[ColumnConfig, str]]:
    """Returns {id(leaf_cfg): (leaf_cfg, value)} in flattened leaf order."""
    sc = cfg.split_config
    out: list[tuple[ColumnConfig, str]] = []

    def walk(s: SplitterConfig, text: str) -> None:
        parts = _split_parts(s, text)
        for i, sub in enumerate(s.split_columns):
            if i >= len(parts):
                raise RowError(f"can't split {text!r}: part {i} missing")
            if sub.has_split:
                walk(sub.split_config, parts[i])
            else:
                out.append((sub, parts[i]))

    if _can_split(sc, content):
        walk(sc, content)
    else:
        defaults = [c for c in sc.split_columns if c.is_default]
        if not defaults:
            raise RowError(f"can't split {content!r}, no default column")
        out.append((defaults[0], content))
    return {id(c): (c, v) for c, v in out if not c.skip}


# ---------------------------------------------------------------------------
# line → point (ProcessGenericLine, GenericFile.cs:46-115)
# ---------------------------------------------------------------------------

@dataclass
class Point:
    measurement: str
    ts: Any = None
    tags: dict[str, str] = field(default_factory=dict)
    fields: dict[str, Any] = field(default_factory=dict)


@dataclass
class Layout:
    """Resolved (index, config) pairs — GenericFile.ColumnHeaders."""

    columns: list[tuple[int, ColumnConfig]]


def build_layout(cfg: GenericFileConfig, header_line: Optional[str]) -> Layout:
    """GetFileLayout (GenericFile.cs:157-212): header names scrubbed; config
    layout (if present) validated against the header by name_in_file, skipped
    columns dropped; headerless requires an explicit layout."""
    if cfg.header_missing:
        if not cfg.column_layout:
            raise ValueError("header missing and no column layout configured")
        return Layout(
            [(i, c) for i, c in enumerate(cfg.column_layout) if not c.skip]
        )
    assert header_line is not None
    names = [scrub_name(h) for h in re.split(cfg.column_splitter, header_line)]
    if cfg.column_layout:
        cols = []
        for i, name in enumerate(names):
            lc = cfg.column_layout[i]
            if lc.name_in_file and lc.name_in_file != name:
                raise ValueError(f"column {i} mismatch: {lc.name_in_file} != {name}")
            if not lc.skip:
                cols.append((i, lc))
        return Layout(cols)
    return Layout(
        [
            (
                i,
                ColumnConfig(
                    name_in_file=n, influx_name=n, data_type=ColumnDataType.UNKNOWN
                ),
            )
            for i, n in enumerate(names)
        ]
    )


def parse_timestamp(cfg: GenericFileConfig, content: str):
    if cfg.time_format_type == TimeFormatType.STRING:
        try:
            return py_parse_ts_string(content, cfg.time_format, cfg.utc_offset)
        except ValueError as e:
            raise RowError(str(e)) from e
    try:
        n = int(content)
    except ValueError as e:
        raise RowError(f"not a long: {content!r}") from e
    if cfg.time_format_type == TimeFormatType.BINARY:
        return py_parse_ts_binary(n)
    return py_parse_ts_epoch(n, cfg.precision)


def process_line(cfg: GenericFileConfig, layout: Layout, line: str) -> Point:
    cells = re.split(cfg.column_splitter, line)
    point = Point(measurement=cfg.measurement)
    for tag in cfg.default_tags:
        k, v = tag.split("=", 1)
        point.tags[k] = v

    point_data: list[tuple[int, ColumnConfig, str]] = []
    for idx, col in layout.columns:
        if idx >= len(cells):
            raise RowError(f"missing cell {idx}")
        content = cells[idx].replace('"', "")
        if col.has_split:
            for c, v in split_data(col, content).values():
                point_data.append((-1, c, v))
        else:
            point_data.append((idx, col, content))

    for idx, col, content in point_data:
        if col.ordered_transforms() and any(
            _can(t, content) for t in col.ordered_transforms()
        ):
            content = transform(col, content)
        if _blank(content):
            continue
        if idx == cfg.time_column - 1:
            point.ts = parse_timestamp(cfg, content)
            continue
        if col.data_type == ColumnDataType.NUMERICAL_FIELD:
            v = try_parse_double(content)
            if v is None:
                raise RowError(f"{col.influx_name}: not a number: {content!r}")
            point.fields[col.influx_name] = bround2(v)
        elif col.data_type == ColumnDataType.STRING_FIELD:
            point.fields[col.influx_name] = content
        elif col.data_type == ColumnDataType.BOOLEAN_FIELD:
            b = try_parse_bool(content)
            if b is None:
                raise RowError(f"{col.influx_name}: not a bool: {content!r}")
            point.fields[col.influx_name] = b
        elif col.data_type == ColumnDataType.TAG:
            point.tags[col.influx_name] = scrub_name(content)

    if not point.fields:
        raise RowError("no fields on row")
    return point


# ---------------------------------------------------------------------------
# type inference (ValidateData, GenericFile.cs:433-506)
# ---------------------------------------------------------------------------

def infer_types(cfg: GenericFileConfig, layout: Layout, lines: Iterable[str]) -> bool:
    """Mutates layout configs in place; precedence double → bool → tag;
    inconsistency on later sample rows raises (GenericFile.cs:496-499)."""
    seen = 0
    n = max(cfg.validate_rows, 1)
    for line in lines:
        if _blank(line) or (cfg.comment_marker and line.startswith(cfg.comment_marker)):
            continue
        cells = re.split(cfg.column_splitter, line)
        point_data: list[tuple[int, ColumnConfig, str]] = []
        for idx, col in layout.columns:
            content = cells[idx].replace('"', "") if idx < len(cells) else ""
            if col.has_split:
                try:
                    for c, v in split_data(col, content).values():
                        point_data.append((-1, c, v))
                except RowError:
                    continue
            else:
                point_data.append((idx, col, content))
        for idx, col, content in point_data:
            try:
                if col.ordered_transforms() and any(
                    _can(t, content) for t in col.ordered_transforms()
                ):
                    content = transform(col, content)
            except RowError:
                continue  # filter hits are row-specific; skip for inference
            if idx == cfg.time_column - 1:
                parse_timestamp(cfg, content)  # raises on bad sample timestamp
            if _blank(content):
                continue
            if col.data_type == ColumnDataType.UNKNOWN:
                if try_parse_double(content) is not None:
                    col.data_type = ColumnDataType.NUMERICAL_FIELD
                elif try_parse_bool(content) is not None:
                    col.data_type = ColumnDataType.BOOLEAN_FIELD
                else:
                    col.data_type = ColumnDataType.TAG
            elif col.data_type == ColumnDataType.NUMERICAL_FIELD:
                if try_parse_double(content) is None:
                    raise ValueError(f"{col.influx_name}: inconsistent number data")
            elif col.data_type == ColumnDataType.BOOLEAN_FIELD:
                if try_parse_bool(content) is None:
                    raise ValueError(f"{col.influx_name}: inconsistent bool data")
        seen += 1
        if seen == n:
            break
    return not any(
        c.data_type == ColumnDataType.UNKNOWN
        for _, c in layout.columns
        if not c.has_split
    )


# ---------------------------------------------------------------------------
# whole-file model (test oracle)
# ---------------------------------------------------------------------------

@dataclass
class RefRunResult:
    points: list[Point] = field(default_factory=list)
    failures: list[tuple[int, str]] = field(default_factory=list)  # (line_no, reason)


def data_lines(cfg: GenericFileConfig, lines: list[str]) -> Iterator[tuple[int, str]]:
    """Skip(HeaderRow + SkipRows) + comment/blank skip
    (GenericFile.cs:282-285). Note HeaderRow is skipped even when
    header_missing (the reference uses HeaderRow+SkipRows unconditionally).
    Yields (1-based line_no, line)."""
    start = cfg.header_row + cfg.skip_rows
    for i, line in enumerate(lines[start:], start + 1):
        if _blank(line):
            continue
        if cfg.comment_marker and line.startswith(cfg.comment_marker):
            continue
        yield i, line


def run_file(cfg: GenericFileConfig, lines: list[str]) -> RefRunResult:
    header = None if cfg.header_missing else lines[cfg.header_row - 1]
    layout = build_layout(cfg, header)
    if any(c.data_type == ColumnDataType.UNKNOWN for _, c in layout.columns):
        infer_types(cfg, layout, (l for _, l in data_lines(cfg, lines)))
    res = RefRunResult()
    for line_no, line in data_lines(cfg, lines):
        try:
            res.points.append(process_line(cfg, layout, line))
        except RowError as e:
            res.failures.append((line_no, str(e)))
    return res
