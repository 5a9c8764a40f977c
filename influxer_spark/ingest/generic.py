"""GenericFile ingest — the reference's main pipeline (SURVEY.md §3.1),
re-expressed as one declarative Column pipeline over ``spark.read.text``.

Reference flow (Influxer/GenericFile.cs:225-357): layout → type inference →
per-line parse loop → batched HTTP POST. Spark-first mapping:

- layout + N-row type inference happen ON THE DRIVER via ``refmodel`` —
  the reference's ValidateData is a bounded 10-row sample
  (GenericFile.cs:433-506), which stays a driver-side constant even at 100 TB;
- the per-line loop compiles to Column expressions (split / quote strip /
  transform chains / typed parses), all inside whole-stage codegen — the
  scan + parse stage is NARROW: no shuffle, no Python, pipelines straight
  into downstream rollups;
- the batch+retry sink (GenericFile.cs:298-326) is subsumed by Spark task
  retry + atomic table commits (see catalog.py);
- failure accounting (FailureTracker, A2/A3) becomes an ``errors``
  DataFrame: rows carry the FIRST failure reason in the reference's
  evaluation order, with per-reason counts + sample line numbers.

Line numbers: ``monotonically_increasing_id`` is sequential within a
partition; a small file (one split) gets exact 1-based numbers — matching
the reference's reporting — while a multi-split file gets ordered unique
surrogates (partition_id << 33 | offset), which keeps header/comment
skipping correct (header lines live in split 0) without any shuffle or
driver collect.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.ingest.config import (
    ColumnConfig,
    ColumnDataType,
    GenericFileConfig,
    TimeFormatType,
)
from influxer_spark.ingest.refmodel import Layout, build_layout, infer_types
from influxer_spark.ingest.scrub import scrub_col
from influxer_spark.ingest.timestamps import (
    parse_ts_binary_col,
    parse_ts_epoch_col,
    parse_ts_string_col,
)
from influxer_spark.ingest.transforms import (
    compile_chain,
    compile_split,
    parse_bool_col,
    parse_double_col,
)


@dataclass
class IngestResult:
    points: DataFrame  # wide: ts + tag cols (string) + typed field cols
    errors: DataFrame  # (line_no, error)
    layout: Layout
    measurement: str

    def status(self) -> dict[str, int]:
        """ProcessStatus analogue (Influxer/ProcessStatus.cs:3-9)."""
        return {
            "points_found": self.points.count(),
            "points_failed": self.errors.count(),
        }

    def failure_report(self) -> DataFrame:
        """FailureTracker analogue (Influxer/FailureTracker.cs:6-17):
        count + first 5 line numbers per failure reason."""
        return self.errors.groupBy("error").agg(
            F.count("*").alias("n"),
            F.slice(F.sort_array(F.collect_list("line_no")), 1, 5).alias(
                "sample_lines"
            ),
        )


def resolve_layout(cfg: GenericFileConfig, path: str) -> Layout:
    """Driver-side layout + bounded type inference (exact ValidateData
    semantics: precedence double → bool → tag, GenericFile.cs:485-493)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        lines = (ln.rstrip("\r\n") for ln in f)
        header = None
        if not cfg.header_missing:
            header = next(itertools.islice(lines, cfg.header_row - 1, None))
        layout = build_layout(cfg, header)
        needs_inference = any(
            c.data_type == ColumnDataType.UNKNOWN for _, c in layout.columns
        )
        if needs_inference:
            # reference skips HeaderRow+SkipRows unconditionally
            # (GenericFile.cs:439); we already consumed header_row lines when
            # a header is present, zero otherwise.
            consumed = cfg.header_row if not cfg.header_missing else 0
            skip = cfg.header_row + cfg.skip_rows - consumed
            data = itertools.islice(lines, skip, None)
            if not infer_types(cfg, layout, data):
                raise ValueError("type inference left Unknown columns")
    return layout


def ingest_generic_file(
    spark: SparkSession,
    path: str,
    cfg: GenericFileConfig,
    layout: Layout | None = None,
) -> IngestResult:
    """``layout`` overrides resolution — the hook for P4/P5 column filters
    (see ingest/filters.py), mirroring the reference's filtered
    ColumnHeaders list."""
    if layout is None:
        layout = resolve_layout(cfg, path)

    raw = spark.read.text(path).withColumn(
        "line_no", F.monotonically_increasing_id() + 1
    )
    start = cfg.header_row + cfg.skip_rows  # unconditional, GenericFile.cs:282
    data = raw.filter(F.col("line_no") > start)
    data = data.filter(F.trim("value") != "")
    if cfg.comment_marker:
        data = data.filter(~F.col("value").startswith(cfg.comment_marker))

    cells = F.split(F.col("value"), cfg.column_splitter)
    data = data.withColumn("_cells", cells)

    def cell(i: int):
        return F.replace(F.get(F.col("_cells"), i), F.lit('"'), F.lit(""))

    # (idx, leaf_config, content_col, present_col) in reference pointData order
    entries: list[tuple[int, ColumnConfig, object, object]] = []
    errors: list[tuple[object, str]] = []  # (cond, reason) in evaluation order

    time_idx = cfg.time_column - 1
    required = sorted({idx for idx, _ in layout.columns} | {time_idx})
    short_row = F.size(F.col("_cells")) <= max(required)
    errors.append((short_row, "malformed row: missing columns"))

    for idx, col in layout.columns:
        content = cell(idx)
        if col.has_split:
            leaves, split_err = compile_split(col.split_config, content)
            errors.append((split_err, f"{col.influx_name}: split failed"))
            for leaf_cfg, leaf_val, leaf_present in leaves:
                entries.append((-1, leaf_cfg, leaf_val, leaf_present))
        else:
            entries.append((idx, col, content, F.lit(True)))

    ts_col = None
    out_tags: list[tuple[str, object]] = []
    out_fields: list[tuple[str, object, str]] = []  # (name, col, kind)

    for tag in cfg.default_tags:  # F13
        k, v = tag.split("=", 1)
        out_tags.append((k, F.lit(v)))

    for idx, col, content, present in entries:
        tr = compile_chain(col, content)
        # absent split leaves never enter pointData (GenericFile.cs:65-68):
        # mask both the transformed content and any filter error
        content = F.when(present, tr.content)
        errors.append((present & tr.error, f"{col.influx_name}: filtered"))
        blank = content.isNull() | (F.trim(content) == "")
        effective = F.when(~blank, content)

        if idx == time_idx:
            if cfg.time_format_type == TimeFormatType.STRING:
                parsed = parse_ts_string_col(effective, cfg.time_format, cfg.utc_offset)
            elif cfg.time_format_type == TimeFormatType.BINARY:
                parsed = parse_ts_binary_col(effective)
            else:
                parsed = parse_ts_epoch_col(effective, cfg.precision)
            errors.append(
                (~blank & parsed.isNull(), "timestamp: unparseable"),
            )
            ts_col = parsed
            continue
        if col.data_type == ColumnDataType.NUMERICAL_FIELD:
            v, err = parse_double_col(effective)
            errors.append((err, f"{col.influx_name}: not a number"))
            out_fields.append((col.influx_name, v, "double"))
        elif col.data_type == ColumnDataType.STRING_FIELD:
            out_fields.append((col.influx_name, effective, "string"))
        elif col.data_type == ColumnDataType.BOOLEAN_FIELD:
            v, err = parse_bool_col(effective)
            errors.append((err, f"{col.influx_name}: not a boolean"))
            out_fields.append((col.influx_name, v, "boolean"))
        elif col.data_type == ColumnDataType.TAG:
            out_tags.append((col.influx_name, scrub_col(effective)))

    # mandatory-field predicate (GenericFile.cs:111-112)
    if out_fields:
        any_field = out_fields[0][1].isNotNull()
        for _, v, _ in out_fields[1:]:
            any_field = any_field | v.isNotNull()
        no_fields = ~any_field
    else:
        no_fields = F.lit(True)
    errors.append((no_fields, "no fields on row"))

    # first-match failure reason, reference evaluation order
    err_col = F.lit(None).cast("string")
    for cond, reason in reversed(errors):
        err_col = F.when(cond, F.lit(reason)).otherwise(err_col)

    projected = data.select(
        "line_no",
        err_col.alias("_error"),
        (ts_col if ts_col is not None else F.lit(None).cast("timestamp")).alias("ts"),
        *[c.alias(name) for name, c in out_tags],
        *[c.alias(name) for name, c, _ in out_fields],
    )

    points = projected.filter(F.col("_error").isNull()).drop("_error", "line_no")
    errs = projected.filter(F.col("_error").isNotNull()).select(
        "line_no", F.col("_error").alias("error")
    )
    return IngestResult(
        points=points, errors=errs, layout=layout, measurement=cfg.measurement
    )


def to_narrow_points(result: IngestResult) -> DataFrame:
    """Wide → the reference's point model (§1.1): one row per numeric field:
    (ts, tags..., metric, value). Feeds the rollup cascade directly."""
    names: list[str] = []

    def _collect(c: ColumnConfig) -> None:
        if c.skip:
            return
        if c.has_split:
            for sub in c.split_config.split_columns:
                _collect(sub)
        elif c.data_type == ColumnDataType.NUMERICAL_FIELD:
            names.append(c.influx_name)

    for _, c in result.layout.columns:
        _collect(c)
    names = [n for n in names if n in result.points.columns]
    if not names:
        raise ValueError("no numeric fields to unpivot")
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    tag_cols = [
        c for c in result.points.columns if c not in names and c != "ts"
    ]
    return result.points.selectExpr(
        "ts",
        *[f"`{t}`" for t in tag_cols],
        f"stack({len(names)}, {pairs}) as (metric, value)",
    ).filter(F.col("value").isNotNull())
