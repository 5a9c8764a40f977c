"""Engine config model — the analogue of the reference's ``InfluxerConfigSection``
object tree (Influxer/Config/*.cs), which is the only "logical plan" the
reference has (SURVEY.md §3.1).

Kept as plain dataclasses with JSON round-trip so the "-export /autolayout"
flow (S9, Influxer/Config/InfluxerConfigSection.cs:81-114) has a native
equivalent: infer a layout from a sample, emit JSON, reload it later.

Semantics cited from the reference:
- ColumnDataType universe: Influxer/Config/ColumnConfig.cs:8-16.
- A column may be split OR transformed, not both:
  Influxer/Config/ColumnConfig.cs PostDeserialize.
- Transform chain order = ColumnConfig property declaration order:
  Extract → Filter → Replace (reflection at Influxer/GenericColumn.cs:27-56).
- Defaults (IsDefault) fire only when no non-default transform applied:
  Influxer/GenericColumn.cs:120-145.
- Reserved identifier characters + replacement:
  Influxer/Config/InfluxDBConfig.cs:68-81.
- GenericFileConfig defaults (header row 1, validate 10 rows, time column 1,
  String time format, quote-aware comma splitter):
  Influxer/Config/GenericFileConfig.cs, Influxer/Config/PerfmonFileConfig.cs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class ColumnDataType(str, Enum):
    UNKNOWN = "Unknown"
    TIMESTAMP = "Timestamp"
    TAG = "Tag"
    NUMERICAL_FIELD = "NumericalField"
    STRING_FIELD = "StringField"
    BOOLEAN_FIELD = "BooleanField"


class TimeFormatType(str, Enum):
    STRING = "String"
    BINARY = "Binary"
    EPOCH = "Epoch"


class TimePrecision(str, Enum):
    HOURS = "Hours"
    MINUTES = "Minutes"
    SECONDS = "Seconds"
    MILLISECONDS = "Milliseconds"
    MICROSECONDS = "Microseconds"
    NANOSECONDS = "Nanoseconds"


# default reserved set, Influxer/Config/InfluxDBConfig.cs:71
RESERVED_CHARS = '" ;_()%#./*[]{},'
REPLACE_RESERVED_WITH = "_"

# default quote-aware splitter, Influxer/Config/PerfmonFileConfig.cs:17-22
DEFAULT_COLUMN_SPLITTER = ',(?=(?:[^"]*"[^"]*")*[^"]*$)'

# default time format, Influxer/Config/PerfmonFileConfig.cs:55-60 (.NET tokens)
DEFAULT_TIME_FORMAT = "MM/dd/yyyy HH:mm:ss.fff"


@dataclass
class ExtractTransformation:
    """Influxer/Transformations/ExtractTransformation.cs.

    type="RegEx": applicable iff non-blank and pattern matches (IgnoreCase);
    returns group 0, or ``result_pattern`` reformatted with groups 1..n
    (string.Format placeholders {0}={first captured group}).
    type="SubString": applicable iff len > start_index and len > start+length.
    is_default: always applicable; returns ``default_value``.
    """

    type: str = "RegEx"  # "RegEx" | "SubString"
    regex: str = ""
    result_pattern: str = ""
    start_index: int = 0
    length: int = 0
    default_value: str = ""
    is_default: bool = False


@dataclass
class ReplaceTransformation:
    """Influxer/Transformations/ReplaceTransformation.cs: literal find/replace;
    applicable iff non-blank and contains find_text. Default → constant."""

    find_text: str = ""
    replace_with: str = ""
    default_value: str = ""
    is_default: bool = False


@dataclass
class FilterTransformation:
    """Influxer/Transformations/FilterTransformation.cs: regex match (IgnoreCase)
    ⇒ the ROW is rejected (transform throws; row counted as failed)."""

    regex: str = ""
    is_default: bool = False


@dataclass
class SplitterConfig:
    """Influxer/Transformations/Splitter.cs: one cell → N sub-columns.

    type="Delimited": regex delimiter (IgnoreCase); can-split iff the
    delimiter matches; parts assigned positionally to split_columns, each of
    which may recursively split its part. Fewer parts than split_columns ⇒
    row error (reference: IndexOutOfRange → row failed).
    type="FixedWidth": ``width``-char chunks; can-split iff len > width.
    If un-splittable, the full content routes to the is_default sub-column,
    else row error (Influxer/GenericColumn.cs:101-118).
    """

    type: str = "Delimited"  # "Delimited" | "FixedWidth"
    delimiter: str = ""
    width: int = 0
    split_columns: list["ColumnConfig"] = field(default_factory=list)


@dataclass
class ColumnConfig:
    """Influxer/Config/ColumnConfig.cs:18-80."""

    name_in_file: str = ""
    influx_name: str = ""
    data_type: ColumnDataType = ColumnDataType.UNKNOWN
    skip: bool = False
    is_default: bool = False  # marks the fallback sub-column of a split
    extract_transformations: list[ExtractTransformation] = field(default_factory=list)
    filter_transformations: list[FilterTransformation] = field(default_factory=list)
    replace_transformations: list[ReplaceTransformation] = field(default_factory=list)
    split_config: Optional[SplitterConfig] = None

    def __post_init__(self) -> None:
        if self.split_config and self.split_config.split_columns and (
            self.extract_transformations or self.replace_transformations
        ):
            raise ValueError("A column can be split or transformed, but not both")

    def ordered_transforms(self) -> list[Any]:
        """Chain order = property declaration order in the reference config
        class: Extract → Filter → Replace (Influxer/GenericColumn.cs:27-56)."""
        return [
            *self.extract_transformations,
            *self.filter_transformations,
            *self.replace_transformations,
        ]

    @property
    def has_split(self) -> bool:
        return bool(self.split_config and self.split_config.split_columns)


@dataclass
class GenericFileConfig:
    """Influxer/Config/GenericFileConfig.cs (defaults from DefaultValue attrs)."""

    measurement: str = "points"
    column_splitter: str = DEFAULT_COLUMN_SPLITTER
    comment_marker: str = ""
    header_missing: bool = False
    header_row: int = 1
    skip_rows: int = 0
    time_column: int = 1  # 1-based
    time_format: str = DEFAULT_TIME_FORMAT
    time_format_type: TimeFormatType = TimeFormatType.STRING
    precision: TimePrecision = TimePrecision.SECONDS
    utc_offset: int = 0  # minutes added to parsed timestamps
    validate_rows: int = 10
    ignore_errors: bool = False
    default_tags: list[str] = field(default_factory=list)  # "k=v" pairs, F13
    column_layout: list[ColumnConfig] = field(default_factory=list)


@dataclass
class PerfmonFileConfig:
    """Influxer/Config/PerfmonFileConfig.cs."""

    measurement: str = "PerfmonData"
    column_splitter: str = DEFAULT_COLUMN_SPLITTER
    time_format: str = DEFAULT_TIME_FORMAT
    multi_measurements: bool = False
    default_tags: list[str] = field(default_factory=list)
    columns_filter: list[str] = field(default_factory=list)


# ---------------------------------------------------------------------------
# JSON round-trip (S9 "-export /autolayout",
# Influxer/Config/InfluxerConfigSection.cs:81-114)
# ---------------------------------------------------------------------------

def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, Enum):
        return obj.value
    if isinstance(obj, list):
        return [_to_jsonable(v) for v in obj]
    return obj


def export_config(cfg: GenericFileConfig) -> str:
    return json.dumps(_to_jsonable(cfg), indent=2, default=str)


def _col_from_dict(d: dict[str, Any]) -> ColumnConfig:
    sc = d.get("split_config")
    return ColumnConfig(
        name_in_file=d.get("name_in_file", ""),
        influx_name=d.get("influx_name", ""),
        data_type=ColumnDataType(d.get("data_type", "Unknown")),
        skip=d.get("skip", False),
        is_default=d.get("is_default", False),
        extract_transformations=[
            ExtractTransformation(**t) for t in d.get("extract_transformations", [])
        ],
        filter_transformations=[
            FilterTransformation(**t) for t in d.get("filter_transformations", [])
        ],
        replace_transformations=[
            ReplaceTransformation(**t) for t in d.get("replace_transformations", [])
        ],
        split_config=(
            SplitterConfig(
                type=sc.get("type", "Delimited"),
                delimiter=sc.get("delimiter", ""),
                width=sc.get("width", 0),
                split_columns=[_col_from_dict(c) for c in sc.get("split_columns", [])],
            )
            if sc
            else None
        ),
    )


def load_config(text: str) -> GenericFileConfig:
    d = json.loads(text)
    return GenericFileConfig(
        measurement=d.get("measurement", "points"),
        column_splitter=d.get("column_splitter", DEFAULT_COLUMN_SPLITTER),
        comment_marker=d.get("comment_marker", ""),
        header_missing=d.get("header_missing", False),
        header_row=d.get("header_row", 1),
        skip_rows=d.get("skip_rows", 0),
        time_column=d.get("time_column", 1),
        time_format=d.get("time_format", DEFAULT_TIME_FORMAT),
        time_format_type=TimeFormatType(d.get("time_format_type", "String")),
        precision=TimePrecision(d.get("precision", "Seconds")),
        utc_offset=d.get("utc_offset", 0),
        validate_rows=d.get("validate_rows", 10),
        ignore_errors=d.get("ignore_errors", False),
        default_tags=list(d.get("default_tags", [])),
        column_layout=[_col_from_dict(c) for c in d.get("column_layout", [])],
    )
