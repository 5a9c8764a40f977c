"""Ingest-parity subsystem: the reference's implemented surface (SURVEY.md
§2.1-2.3) re-expressed Spark-first.

The reference (AdysTech/Influxer) parses delimited text line-by-line on one
thread; here every per-line rule compiles to JVM-side Column expressions over
``spark.read.text`` (whole-stage codegen, no Python in the hot path), with a
pure-Python mirror (``refmodel``) used only for (a) driver-side type
inference over a tiny N-row sample — exactly the reference's bounded
ValidateData — and (b) as the test oracle standing in for the .NET runtime.
"""

from influxer_spark.ingest.config import (  # noqa: F401
    ColumnConfig,
    ColumnDataType,
    ExtractTransformation,
    FilterTransformation,
    GenericFileConfig,
    PerfmonFileConfig,
    ReplaceTransformation,
    SplitterConfig,
)
from influxer_spark.ingest.generic import ingest_generic_file  # noqa: F401
from influxer_spark.ingest.perfmon import ingest_perfmon_file  # noqa: F401
