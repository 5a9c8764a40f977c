"""Arrow-vectorized html→text extraction + crawl metrics (SURVEY.md §1.4, §2.8).

The reference's per-column Transform stage (ITransform,
Influxer/Interfaces/ITransform.cs:3-12, chained at
Influxer/GenericColumn.cs:120-145) maps to vectorized pandas UDFs here, per
BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)".

Extraction rule (deterministic, byte-level — this is THE per-row invariant):
1. decode utf-8,
2. keep only the <body>…</body> span,
3. strip all ``<...>`` tags,
4. collapse whitespace runs to single spaces, strip ends.

Crawl metrics (the analogue of Influxer's numeric fields,
Influxer/GenericFile.cs:90-94) are computed JVM-side wherever a built-in
expression exists (length of binary, regexp_count) — UDFs are reserved for
the extraction itself.
"""

from __future__ import annotations

import os
import re

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

_BODY_RE = re.compile(rb"<body[^>]*>(.*?)</body>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"[ \t\r\n\f\v]+")


def _extract_text_bytes_spec(html: bytes) -> str:
    """Executable SPEC of the extraction rule (pure regex form) — kept as
    the equivalence witness for the optimized implementation below."""
    m = _BODY_RE.search(html)
    body = m.group(1) if m else html
    stripped = _TAG_RE.sub(b" ", body)
    collapsed = _WS_RE.sub(b" ", stripped).strip()
    return collapsed.decode("utf-8")


def extract_text_bytes(html: bytes) -> str:
    """Byte-identical to the regex spec, ~2.7× faster (measured):

    - the body span locates via bytes.find — "<body" then the next ">" then
      the next "</body>" is exactly what the non-greedy regex matches, and
      any miss falls back to the whole document just like a failed match;
    - whitespace-collapse+trim via split()/join — bytes.split() with no
      separator splits on precisely the regex's ASCII whitespace class.
    Equivalence is pinned by tests/test_pipeline.py::test_extraction_matches_spec.
    """
    i = html.find(b"<body")
    body = html
    if i >= 0:
        gt = html.find(b">", i + 5)
        if gt >= 0:
            end = html.find(b"</body>", gt + 1)
            if end >= 0:
                body = html[gt + 1 : end]
    stripped = _TAG_RE.sub(b" ", body)
    return b" ".join(stripped.split()).decode("utf-8")


def _impl() -> str:
    """'arrow' (default): batch-vectorized numpy kernel over raw Arrow
    buffers via mapInArrow — zero per-row Python (north-rule input_hint),
    no pandas materialization.  'arrowcol': same kernel inside the
    column-level pandas UDF (only html ships to the worker, but the
    pandas boundary costs more than it saves — measured, BASELINE.md).
    'scalar': the per-row C-loop path (bytes.find/re.sub), kept as the
    byte-parity witness; statistically tied with 'arrow' end-to-end on
    this VM (median 73.7s vs 74.2s, pinned local[8], 8M rows ×3)."""
    return os.environ.get("SPARK_GRAFT_EXTRACT_IMPL", "arrow")


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow-batched html→text. Operates on the raw bytes of each batch —
    deterministic byte-level regexes, no HTML-parser heuristics, so the same
    html always yields the same text (per-row invariant)."""
    if _impl() == "scalar":
        return html.map(extract_text_bytes)
    from influxer_spark.extract_kernel import extract_kernel

    return extract_kernel(pa.array(html, type=pa.large_binary())).to_pandas()


def with_extracted(pages: DataFrame, validate: bool = False) -> DataFrame:
    """pages(url, warc_ts, html[, text], lang) → + extracted_text + metrics.

    Default path is ``mapInArrow``: batches stay Arrow RecordBatches end to
    end (scan → kernel → downstream), no pandas materialization and no
    per-row Python.  Note mapInArrow is a projection barrier — Catalyst
    cannot prune *input* columns below it, so hot paths should select the
    columns they need before calling (pipeline.py does).

    With ``validate=True`` keeps a boolean ``text_ok`` column comparing the
    extraction against the stored ``text`` column (byte-identical check).
    """
    if _impl() == "arrow":
        from influxer_spark.extract_kernel import extract_kernel

        names = list(pages.columns)
        h = names.index("html")
        out_schema = StructType(
            list(pages.schema.fields) + [StructField("extracted_text", StringType())]
        )

        def fn(batches):
            for b in batches:
                ext = extract_kernel(b.column(h)).cast(pa.string())
                yield pa.RecordBatch.from_arrays(
                    [b.column(i) for i in range(b.num_columns)] + [ext],
                    names=names + ["extracted_text"],
                )

        df = pages.mapInArrow(fn, schema=out_schema)
    else:
        df = pages.withColumn("extracted_text", extract_text(F.col("html")))
    if validate and "text" in pages.columns:
        df = df.withColumn("text_ok", F.col("extracted_text") == F.col("text"))
    return df


def with_crawl_metrics(pages: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Numeric fields per page — all JVM-side Column expressions (codegen):

    - html_bytes:  size of the raw page
    - text_chars:  extracted text length
    - n_tokens:    whitespace tokens in the text
    - n_tags:      markup density
    - text_ratio:  text_chars / html_bytes (deterministic double division)
    """
    t = F.col(text_col)
    html_bytes = F.length("html").cast("long")
    text_chars = F.length(t).cast("long")
    return (
        pages.withColumn("html_bytes", html_bytes)
        .withColumn("text_chars", text_chars)
        .withColumn(
            "n_tokens",
            F.when(text_chars == 0, F.lit(0)).otherwise(
                F.size(F.split(t, " "))
            ).cast("long"),
        )
        # ISO-8859-1 decode is byte-lossless (every byte maps to one char),
        # so tag counting is exact even on invalid-UTF-8 html; a utf8 cast
        # would collapse bad sequences into replacement chars (VERDICT r1)
        .withColumn(
            "n_tags",
            F.regexp_count(
                F.decode(F.col("html"), "ISO-8859-1"), F.lit(r"<[^>]*>")
            ).cast("long"),
        )
        .withColumn("text_ratio", text_chars.cast("double") / html_bytes.cast("double"))
    )


def pages_to_points(pages_with_metrics: DataFrame) -> DataFrame:
    """Wide metrics → narrow points (measurement-style long layout, the
    reference's point model §1.1): (url, warc_ts, lang, metric, value)."""
    return pages_with_metrics.selectExpr(
        "url",
        "warc_ts",
        "lang",
        "stack(4, 'html_bytes', cast(html_bytes as double), "
        "'text_chars', cast(text_chars as double), "
        "'n_tokens', cast(n_tokens as double), "
        "'text_ratio', text_ratio) as (metric, value)",
    )
