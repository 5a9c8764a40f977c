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
    _parsed: DataFrame | None = None  # cached parse (see ingest_generic_file)

    def unpersist(self) -> None:
        """Release the cached parse once points/errors are consumed."""
        if self._parsed is not None:
            self._parsed.unpersist()

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

    # The pipeline builds through STAGED projections with intermediate
    # columns: every sub-expression (split, quote strip, transform chain,
    # typed parse) is computed ONCE and referenced by attribute downstream.
    # Inlining everything into one projection duplicates each subtree at
    # every use site (value + error + blank checks…), which produced a
    # codegen method too large to JIT — measured ~100× slower.
    # CollapseProject keeps these stages apart because the aliased
    # expressions are non-cheap and multiply referenced.
    data = data.withColumn("_cells", F.split(F.col("value"), cfg.column_splitter))

    time_idx = cfg.time_column - 1
    required = sorted({idx for idx, _ in layout.columns} | {time_idx})
    errors: list[tuple[object, str]] = []  # (cond, reason) in evaluation order
    errors.append(
        (F.size(F.col("_cells")) <= max(required), "malformed row: missing columns")
    )

    # stage 1: quote-stripped raw cells
    data = data.withColumns(
        {
            f"_raw_{idx}": F.replace(
                F.get(F.col("_cells"), idx), F.lit('"'), F.lit("")
            )
            for idx in required
        }
    )

    # stage 2: split fan-out + transform chains → one _c_<n> column per
    # pointData entry (+ presence flags for split leaves)
    entries: list[tuple[int, ColumnConfig, str]] = []  # (idx, cfg, content attr)
    stage2: dict[str, object] = {}
    # reference error order (GenericFile.cs:60-110): loop 1 raises ALL split
    # errors in column order; loop 2 then walks pointData raising each
    # entry's transform-filter error and parse error IN ENTRY ORDER — so
    # filter and parse conditions interleave per entry, they don't group by
    # kind (ADVICE r1: a numeric error in an early column outranks a filter
    # hit in a later one)
    entry_filter_err: list[tuple[object, str]] = []
    n = 0
    for idx, col in layout.columns:
        content = F.col(f"_raw_{idx}")
        if col.has_split:
            leaves, split_err = compile_split(col.split_config, content)
            errors.append((split_err, f"{col.influx_name}: split failed"))
            for leaf_cfg, leaf_val, leaf_present in leaves:
                tr = compile_chain(leaf_cfg, leaf_val)
                # absent leaves never enter pointData (GenericFile.cs:65-68)
                stage2[f"_c_{n}"] = F.when(leaf_present, tr.content)
                entry_filter_err.append(
                    (leaf_present & tr.error, f"{leaf_cfg.influx_name}: filtered")
                )
                entries.append((-1, leaf_cfg, f"_c_{n}"))
                n += 1
        else:
            tr = compile_chain(col, content)
            stage2[f"_c_{n}"] = tr.content
            entry_filter_err.append((tr.error, f"{col.influx_name}: filtered"))
            entries.append((idx, col, f"_c_{n}"))
            n += 1
    data = data.withColumns(stage2)

    # stage 3: blank-masked effective content (referenced by parse + errors)
    data = data.withColumns(
        {
            f"_e_{i}": F.when(
                ~(F.col(a).isNull() | (F.trim(F.col(a)) == "")), F.col(a)
            )
            for i, (_, _, a) in enumerate(entries)
        }
    )

    # stage 4a: validity flags + raw casts as their OWN columns — the error
    # chain and the typed values reference these attributes instead of
    # re-embedding the parse trees (a value-tree inside an error condition
    # is what blew the collapsed expression up combinatorially)
    from influxer_spark.ingest.transforms import NUMBER_RE, dotnet_round2_col

    ts_attr = None
    out_tags: list[tuple[str, str]] = []  # (name, attr)
    out_fields: list[tuple[str, str]] = []
    stage4a: dict[str, object] = {}
    stage4b: dict[str, object] = {}
    entry_parse_err: dict[int, tuple[object, str]] = {}
    for i, (idx, col, _a) in enumerate(entries):
        eff = F.col(f"_e_{i}")
        if idx == time_idx:
            if cfg.time_format_type == TimeFormatType.STRING:
                parsed = parse_ts_string_col(eff, cfg.time_format, cfg.utc_offset)
            elif cfg.time_format_type == TimeFormatType.BINARY:
                parsed = parse_ts_binary_col(eff)
            else:
                parsed = parse_ts_epoch_col(eff, cfg.precision)
            stage4a["_ts"] = parsed
            ts_attr = "_ts"
            entry_parse_err[i] = (
                eff.isNotNull() & F.col("_ts").isNull(), "timestamp: unparseable"
            )
            continue
        out_name = col.influx_name
        if col.data_type == ColumnDataType.NUMERICAL_FIELD:
            # regex-validated content always try_casts successfully, so the
            # error condition needs only the flag, never the value tree
            stage4a[f"_ok_{i}"] = eff.rlike(NUMBER_RE)
            stage4a[f"_num_{i}"] = F.replace(
                eff, F.lit(","), F.lit("")
            ).try_cast("double")
            stage4b[f"_v_{i}"] = F.when(
                F.col(f"_ok_{i}"), dotnet_round2_col(F.col(f"_num_{i}"))
            )
            entry_parse_err[i] = (
                eff.isNotNull() & ~F.col(f"_ok_{i}"), f"{out_name}: not a number"
            )
            out_fields.append((out_name, f"_v_{i}"))
        elif col.data_type == ColumnDataType.STRING_FIELD:
            stage4b[f"_v_{i}"] = eff
            out_fields.append((out_name, f"_v_{i}"))
        elif col.data_type == ColumnDataType.BOOLEAN_FIELD:
            stage4a[f"_ok_{i}"] = F.lower(F.trim(eff)).isin("true", "false")
            stage4b[f"_v_{i}"] = F.when(
                F.col(f"_ok_{i}"), F.lower(F.trim(eff)) == "true"
            )
            entry_parse_err[i] = (
                eff.isNotNull() & ~F.col(f"_ok_{i}"), f"{out_name}: not a boolean"
            )
            out_fields.append((out_name, f"_v_{i}"))
        elif col.data_type == ColumnDataType.TAG:
            stage4b[f"_v_{i}"] = scrub_col(eff)
            out_tags.append((out_name, f"_v_{i}"))
    data = data.withColumns(stage4a)
    data = data.withColumns(stage4b)
    # loop-2 interleave: per entry, filter error then parse error
    for i in range(len(entries)):
        errors.append(entry_filter_err[i])
        if i in entry_parse_err:
            errors.append(entry_parse_err[i])

    # mandatory-field predicate (GenericFile.cs:111-112)
    if out_fields:
        any_field = F.col(out_fields[0][1]).isNotNull()
        for _, a in out_fields[1:]:
            any_field = any_field | F.col(a).isNotNull()
        no_fields = ~any_field
    else:
        no_fields = F.lit(True)
    errors.append((no_fields, "no fields on row"))

    # first-match failure reason, reference evaluation order
    err_col = F.lit(None).cast("string")
    for cond, reason in reversed(errors):
        err_col = F.when(cond, F.lit(reason)).otherwise(err_col)

    default_tag_cols = []
    for tag in cfg.default_tags:  # F13
        k, v = tag.split("=", 1)
        default_tag_cols.append(F.lit(v).alias(k))

    projected = data.select(
        "line_no",
        err_col.alias("_error"),
        (
            F.col(ts_attr) if ts_attr is not None else F.lit(None).cast("timestamp")
        ).alias("ts"),
        *default_tag_cols,
        *[F.col(a).alias(name) for name, a in out_tags],
        *[F.col(a).alias(name) for name, a in out_fields],
    )
    # Materialize the parsed output ONCE.  Without this, PushDownPredicates
    # substitutes the points/errors filter conditions down through every
    # projection to the scan — the _error test gets re-inlined with
    # hundreds of copies of the split/parse subtrees (measured: 403
    # `split(` occurrences in the pushed Filter, ~100× slower), and every
    # downstream consumer of `points` re-pays the whole parse.  Caching is
    # the in-session form of the at-scale design (parse once → table →
    # derive views); MEMORY_AND_DISK spills safely.  Non-deterministic
    # barrier expressions are NOT a fix: Spark 4 range-folds rand()
    # comparisons away.
    projected = projected.persist()

    points = projected.filter(F.col("_error").isNull()).drop(
        "_error", "line_no"
    )
    errs = projected.filter(F.col("_error").isNotNull()).select(
        "line_no", F.col("_error").alias("error")
    )
    return IngestResult(
        points=points, errors=errs, layout=layout,
        measurement=cfg.measurement, _parsed=projected,
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
