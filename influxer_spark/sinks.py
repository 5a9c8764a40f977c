"""InfluxDB line-protocol sink — the reference's actual wire output.

The reference hands parsed points to AdysTech.InfluxDB.Client.Net
(Influxer/GenericFile.cs:1 ``using AdysTech.InfluxDB.Client.Net``, batched
``PostPointsAsync`` at GenericFile.cs:303), whose client serializes each
point to InfluxDB line protocol:

    measurement[,tag_key=tag_val...] field_key=field_val[,...] [timestamp]

Re-expressed Spark-first: serialization is pure Column expressions inside
whole-stage codegen — a 100-TB points frame formats scan→project→write with
no Python, no shuffle, and full parquet column pruning.  The reference's
PointsInSingleBatch batching + retry queue (GenericFile.cs:298-327) maps to
Spark's unit of work: one output file per task, Spark task retry for
failures, and the catalog's staging-then-commit for all-or-nothing
visibility.

Escaping follows the public line-protocol spec:

- measurement: escape ``,`` and space;
- tag keys, tag values, field keys: escape ``,``, ``=``, space;
- string field values: double-quoted, escape ``\\`` and ``"``;
- backslashes elsewhere are written literally (the spec does not require
  escaping them);
- integer fields get an ``i`` suffix; booleans are ``true``/``false``;
- tags are emitted sorted by key (the spec's recommended write layout);
  null/empty tag values omit the tag, null fields omit the field, and rows
  with no surviving field are dropped (a line must carry ≥ 1 field).

Timestamps are int64 epoch at the requested precision (ns default).  Spark
timestamps are µs-resolution, so ns lines carry trailing zeros — same
pinned deviation as ingest/timestamps.py (the reference's .NET ticks are
100 ns).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRECISION_FROM_US = {"ns": 1000, "us": 1, "ms": None, "s": None}


def esc_measurement(col: Column) -> Column:
    return F.regexp_replace(col, "([, ])", r"\\$1")


def esc_tag(col: Column) -> Column:
    return F.regexp_replace(col, "([,= ])", r"\\$1")


def esc_field_string(col: Column) -> Column:
    # inside quoted string values the spec escapes backslash and quote
    out = F.regexp_replace(col, r"(\\)", r"\\$1")
    return F.regexp_replace(out, '(")', r"\\$1")


def _ts_epoch(ts: Column, precision: str) -> Column:
    us = F.unix_micros(ts.cast("timestamp"))
    if precision == "ns":
        return us * F.lit(1000)
    if precision == "us":
        return us
    if precision == "ms":
        return F.floor(us / 1000).cast("long")
    if precision == "s":
        return F.floor(us / 1_000_000).cast("long")
    raise ValueError(f"unknown precision {precision!r}")


def _field_value(df: DataFrame, name: str) -> Column:
    dtype = dict(df.dtypes)[name]
    c = F.col(name)
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return F.concat(c.cast("string"), F.lit("i"))
    if dtype in ("float", "double"):
        return c.cast("string")
    if dtype.startswith("decimal"):
        return c.cast("string")
    if dtype == "boolean":
        return F.when(c, F.lit("true")).otherwise(F.lit("false"))
    if dtype == "string":
        return F.concat(F.lit('"'), esc_field_string(c), F.lit('"'))
    raise ValueError(f"unsupported field type {dtype} for {name}")


def to_line_protocol(
    df: DataFrame,
    measurement: str | None = None,
    measurement_col: str | None = None,
    tags: list[str] | None = None,
    fields: list[str] | None = None,
    ts_col: str = "ts",
    precision: str = "ns",
) -> DataFrame:
    """Format rows as line-protocol strings; returns a one-column ``line``
    frame (plus nothing else, so the write is a pure projection).

    ``measurement`` is a literal name, or ``measurement_col`` a string
    column.  ``tags`` / ``fields`` are column names of ``df``; tags are
    emitted sorted by key, fields in the given order.
    """
    if not fields:
        raise ValueError("at least one field column is required")
    if (measurement is None) == (measurement_col is None):
        raise ValueError("exactly one of measurement / measurement_col")
    meas = (
        esc_measurement(F.col(measurement_col))
        if measurement_col
        else esc_measurement(F.lit(measurement))
    )

    tag_part: Column = F.lit("")
    for k in sorted(tags or []):
        seg = F.concat(F.lit("," + _esc_key(k)), F.lit("="), esc_tag(F.col(k).cast("string")))
        keep = F.col(k).isNotNull() & (F.col(k).cast("string") != "")
        tag_part = F.concat(tag_part, F.when(keep, seg).otherwise(F.lit("")))

    field_segs = [
        F.when(
            F.col(name).isNotNull(),
            F.concat(F.lit(_esc_key(name) + "="), _field_value(df, name)),
        )
        for name in fields
    ]
    field_part = F.concat_ws(",", *field_segs)  # concat_ws skips nulls

    staged = df.select(
        meas.alias("_m"),
        tag_part.alias("_t"),
        field_part.alias("_f"),
        _ts_epoch(F.col(ts_col), precision).cast("string").alias("_ts"),
    ).filter(F.col("_f") != "")  # a line must carry at least one field
    return staged.select(
        F.concat("_m", "_t", F.lit(" "), "_f", F.lit(" "), "_ts").alias("line")
    )


def _esc_key(k: str) -> str:
    out = []
    for ch in k:
        out.append("\\" + ch if ch in ",= " else ch)
    return "".join(out)


def write_line_protocol(df: DataFrame, path: str, mode: str = "overwrite", **kw) -> None:
    """Write the formatted lines as text files — one file per task, i.e.
    the Spark-native analogue of the reference's PointsInSingleBatch
    batches; task retry re-emits a failed batch idempotently."""
    to_line_protocol(df, **kw).write.mode(mode).text(path)


# ---------------------------------------------------------------------------
# read path: parse line protocol back into a typed frame, so a reference
# user's existing InfluxDB exports ingest directly.  Pure Column expressions
# throughout.  The escape problem (delimiters may appear escaped inside
# tokens, and raw spaces/commas inside quoted string values) is solved by
# (1) swapping each backslash-escaped delimiter for a control-byte sentinel,
# (2) masking structural chars inside quoted segments via a split-on-quote /
# transform / rejoin pass (even segments are outside quotes, odd inside),
# then splitting on the now-unambiguous structural delimiters and
# unescaping last.
# ---------------------------------------------------------------------------

# \\ must be processed FIRST: in `\\"` the backslash is escaped and the
# quote is real.  (Like InfluxDB's own parser, a literal backslash that
# happens to precede a special char in a *tag* value — where the writer
# does not escape backslashes, per spec — is inherently ambiguous.)
_SENT = {"\\": "\x05", ",": "\x01", "=": "\x02", " ": "\x03", '"': "\x04"}


def _to_sentinels(col: Column) -> Column:
    out = col
    for ch, s in _SENT.items():
        out = F.regexp_replace(out, "\\\\" + re.escape(ch), s)
    return out


def _unesc(col: Column) -> Column:
    return F.translate(col, "".join(_SENT.values()), "".join(_SENT.keys()))


def parse_line_protocol(
    lines: DataFrame,
    line_col: str = "value",
    precision: str = "ns",
) -> DataFrame:
    """lines(line_col: string) → (measurement, tags map<string,string>,
    fields map<string,string>, field_types map<string,string>, ts).

    Field values stay strings with a parallel type map ('integer', 'float',
    'boolean', 'string') — line protocol types are per-point, so a single
    typed wide schema cannot be imposed at parse time; callers project and
    cast what they need (``fields['v'] :: double``).  The trailing
    timestamp is required and read at ``precision`` (µs truncation, the
    engine's pinned deviation).
    """
    if precision not in ("ns", "us", "ms", "s"):
        raise ValueError(f"unknown precision {precision!r}")
    s = _to_sentinels(F.col(line_col))
    # mask raw structural chars inside quoted string values
    parts = F.split(s, '"')
    masked = F.array_join(
        F.transform(
            parts,
            lambda seg, i: F.when(
                i % 2 == 1,
                F.concat(F.lit("\x04"), F.translate(seg, ",= ", "\x01\x02\x03"), F.lit("\x04")),
            ).otherwise(seg),
        ),
        "",
    )
    head = F.substring_index(masked, " ", 1)
    ts_str = F.substring_index(masked, " ", -1)
    fields_str = masked.substr(
        F.length(head) + F.lit(2),
        F.length(masked) - F.length(head) - F.length(ts_str) - F.lit(2),
    )
    meas_tok = F.substring_index(head, ",", 1)
    measurement = _unesc(meas_tok)
    tag_part = F.when(
        F.length(head) > F.length(meas_tok),
        head.substr(F.length(meas_tok) + F.lit(2), F.length(head)),
    ).otherwise(F.lit(""))

    def _kv(part: Column) -> tuple[Column, Column]:
        kvs = F.filter(F.split(part, ","), lambda x: x != "")
        keys = F.transform(kvs, lambda kv: _unesc(F.substring_index(kv, "=", 1)))
        vals = F.transform(kvs, lambda kv: F.substring_index(kv, "=", -1))
        return keys, vals

    tag_keys, tag_vals = _kv(tag_part)
    f_keys, f_raw = _kv(fields_str)

    def _is_quoted(v: Column) -> Column:
        return v.startswith("\x04")

    f_type = F.transform(
        f_raw,
        lambda v: F.when(_is_quoted(v), F.lit("string"))
        .when(v.rlike("^-?[0-9]+i$"), F.lit("integer"))
        .when(F.lower(v).isin("t", "true", "f", "false"), F.lit("boolean"))
        .otherwise(F.lit("float")),
    )
    f_val = F.transform(
        f_raw,
        lambda v: F.when(
            _is_quoted(v), _unesc(v.substr(F.lit(2), F.length(v) - F.lit(2)))
        )
        .when(v.rlike("^-?[0-9]+i$"), v.substr(F.lit(1), F.length(v) - F.lit(1)))
        .when(F.lower(v).isin("t", "true"), F.lit("true"))
        .when(F.lower(v).isin("f", "false"), F.lit("false"))
        .otherwise(v),
    )

    staged = lines.select(
        measurement.alias("measurement"),
        F.map_from_arrays(tag_keys, F.transform(tag_vals, _unesc)).alias("tags"),
        F.map_from_arrays(f_keys, f_val).alias("fields"),
        F.map_from_arrays(f_keys, f_type).alias("field_types"),
        ts_str.cast("long").alias("_rts"),
    )
    # integer arithmetic only: ns epochs exceed double's 2^53 exact range,
    # so a float divide here would corrupt microseconds
    us_expr = {
        "ns": "_rts div 1000",
        "us": "_rts",
        "ms": "_rts * 1000",
        "s": "_rts * 1000000",
    }[precision]
    return staged.select(
        "measurement", "tags", "fields", "field_types",
        F.expr(f"timestamp_micros({us_expr})").alias("ts"),
    )


def read_line_protocol(spark, path: str, precision: str = "ns") -> DataFrame:
    """Read line-protocol text files into the parsed point frame."""
    return parse_line_protocol(spark.read.text(path), precision=precision)


