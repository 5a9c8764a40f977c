"""Transformation pipeline compiled to Column expressions (SURVEY.md §2.3).

The reference applies per-column ITransform chains row-at-a-time
(Influxer/GenericColumn.cs:120-145); here each chain compiles ONCE into a
nested when/otherwise Column tree, so the whole pipeline runs inside
whole-stage codegen — no Python in the hot path.

Chain semantics replicated exactly:
- every applicable NON-default transform fires, in declaration order
  (Extract → Filter → Replace), each seeing the previous one's output;
- DEFAULT transforms fire only if no non-default applied
  (Influxer/GenericColumn.cs:133-142);
- FilterTransformation match ⇒ the row errors out
  (Influxer/Transformations/FilterTransformation.cs:38-52);
- regexes are case-insensitive (RegexOptions.IgnoreCase in all three
  transform classes) → "(?i)" prefix here.

Splits (Influxer/Transformations/Splitter.cs + GenericColumn.SplitData):
- delimited: regex split; part i → split_columns[i], recursively;
  fewer parts than sub-columns ⇒ row error (reference IndexOutOfRange);
- fixed width: ``width``-char chunks (ExtensionMethods.SplitFixedWidth);
- un-splittable content routes whole to the is_default sub-column, else
  row error (GenericColumn.cs:101-118).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from influxer_spark.ingest.config import (
    ColumnConfig,
    ExtractTransformation,
    FilterTransformation,
    ReplaceTransformation,
    SplitterConfig,
)

# C# Double.TryParse (invariant, NumberStyles.Float|AllowThousands): optional
# sign, digits with optional thousands separators, fraction, exponent; every
# mantissa alternative carries ≥1 digit. "NaN"/"Infinity" parse in .NET but
# NaN is rejected downstream anyway (GenericFile.cs:92 IsNaN check) —
# excluded here.
NUMBER_RE = (
    r"^\s*[+-]?(\d{1,3}(,\d{3})+(\.\d*)?|\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?\s*$"
)


def _blank(c: Column) -> Column:
    """String.IsNullOrWhiteSpace"""
    return c.isNull() | (F.trim(c) == "")


def _can(t, c: Column) -> Column:
    """ITransform.CanTransform as a boolean Column (non-default path)."""
    if isinstance(t, ExtractTransformation):
        if t.type == "SubString":
            n = F.length(c)
            return ~_blank(c) & (n > t.start_index) & (n > t.start_index + t.length)
        return ~_blank(c) & c.rlike("(?i)" + t.regex)
    if isinstance(t, ReplaceTransformation):
        return ~_blank(c) & c.contains(t.find_text)
    if isinstance(t, FilterTransformation):
        return ~_blank(c) & c.rlike("(?i)" + t.regex)
    raise TypeError(t)


def _format_groups(result_pattern: str, c: Column, regex: str) -> Column:
    """string.Format(ResultPattern, groups[1..]) — {0} is capture group 1
    (ExtractTransformation.cs:90-94). Compiled to format_string over one
    regexp_extract per referenced group."""
    import re as _re

    fmt = _re.sub(r"\{(\d+)\}", "%s", result_pattern).replace("%%", "%%")
    idxs = [int(m) for m in _re.findall(r"\{(\d+)\}", result_pattern)]
    args = [F.regexp_extract(c, "(?i)" + regex, i + 1) for i in idxs]
    return F.format_string(fmt, *args)


def _apply(t, c: Column) -> Column:
    """ITransform.Transform for the can==True branch (non-default)."""
    if isinstance(t, ExtractTransformation):
        if t.type == "SubString":
            return F.substring(c, t.start_index + 1, t.length)
        if t.result_pattern:
            return _format_groups(t.result_pattern, c, t.regex)
        return F.regexp_extract(c, "(?i)" + t.regex, 0)
    if isinstance(t, ReplaceTransformation):
        return F.replace(c, F.lit(t.find_text), F.lit(t.replace_with))
    raise TypeError(t)


@dataclass
class Transformed:
    content: Column
    error: Column  # boolean: row must be rejected (filter hit)


def compile_chain(cfg: ColumnConfig, content: Column) -> Transformed:
    """GenericColumn.Transform as one Column tree."""
    transforms = cfg.ordered_transforms()
    err = F.lit(False)
    applied = F.lit(False)
    for t in (x for x in transforms if not x.is_default):
        can = _can(t, content)
        if isinstance(t, FilterTransformation):
            err = err | can
        else:
            content = F.when(can, _apply(t, content)).otherwise(content)
        applied = applied | can
    for t in (x for x in transforms if x.is_default):
        # IsDefault ⇒ CanTransform always true; fires only when nothing applied
        if isinstance(t, FilterTransformation):
            err = err | ~applied
        else:
            content = F.when(~applied, F.lit(t.default_value)).otherwise(content)
    return Transformed(content=content, error=err)


# ---------------------------------------------------------------------------
# splits → leaf cells
# ---------------------------------------------------------------------------

def _fixed_chunks(c: Column, width: int, n: int) -> list[Column]:
    return [F.substring(c, i * width + 1, width) for i in range(n)]


def compile_split(
    sc: SplitterConfig, content: Column
) -> tuple[list[tuple[ColumnConfig, Column, Column]], Column]:
    """Splitter.Split + GenericColumn.SplitData as Column trees.

    Returns ([(leaf_config, value_col, present_col)], row_error_col). Leaf
    order matches the reference's flattened SubColumns traversal
    (Splitter.cs SubColumns). ``present`` mirrors membership in the
    reference's SplitData dictionary: when content is un-splittable only the
    default leaf is present — absent leaves must NOT run their transform
    chains (their configs never enter pointData, GenericFile.cs:65-68)."""
    n = len(sc.split_columns)
    if sc.type == "FixedWidth":
        can = ~_blank(content) & (F.length(content) > sc.width)
        parts = _fixed_chunks(content, sc.width, n)
        # chunk i exists iff len > i*width (ExtensionMethods.SplitFixedWidth);
        # fewer chunks than sub-columns ⇒ reference IndexOutOfRange ⇒ row error
        enough = F.length(content) > (n - 1) * sc.width
    else:
        can = ~_blank(content) & content.rlike("(?i)" + sc.delimiter)
        arr = F.split(content, "(?i)" + sc.delimiter)
        parts = [F.get(arr, i) for i in range(n)]
        enough = F.size(arr) >= n

    default_cfgs = [c for c in sc.split_columns if c.is_default]
    err = F.lit(False)
    if default_cfgs:
        # un-splittable → whole content lands in the default sub-column
        fallback_cfg = default_cfgs[0]
    else:
        # no default: ANY un-splittable content (even blank) is a row error
        # (GenericColumn.cs:114-115 throws before the blank check)
        fallback_cfg = None
        err = err | ~can
    err = err | (can & ~enough)

    leaves: list[tuple[ColumnConfig, Column, Column]] = []
    for cfg, part in zip(sc.split_columns, parts):
        if cfg.has_split:
            # nested split runs unconditionally on its part (Splitter.cs
            # Split recursion has no CanSplit guard)
            sub_leaves, sub_err = compile_split(cfg.split_config, part)
            for leaf_cfg, leaf_val, leaf_present in sub_leaves:
                leaves.append((leaf_cfg, F.when(can, leaf_val), can & leaf_present))
            err = err | (can & sub_err)
        else:
            val = F.when(can, part)
            present = can
            if fallback_cfg is not None and cfg is fallback_cfg:
                val = F.when(can, part).otherwise(content)
                present = F.lit(True)
            leaves.append((cfg, val, present))
    # skip-flagged sub-columns are dropped from output (GenericColumn
    # GetGeneratedColumns honors Skip)
    leaves = [(c, v, p) for c, v, p in leaves if not c.skip]
    return leaves, err


# ---------------------------------------------------------------------------
# typed value parsing (F10/F11)
# ---------------------------------------------------------------------------

def dotnet_round2_col(v: Column) -> Column:
    """.NET Math.Round(v, 2): scale by 100 IN BINARY, half-to-even, divide.

    Spark's bround rounds the decimal string repr instead (2.135 → 2.14,
    where .NET yields 2.13 because 2.135*100 is 213.49999… in IEEE); this
    replica matches the reference bit-for-bit (GenericFile.cs:94).
    """
    scaled = v * 100
    fl = F.floor(scaled).cast("double")
    diff = scaled - fl
    n = (
        F.when(diff > 0.5, fl + 1)
        .when(diff < 0.5, fl)
        .otherwise(fl + (fl % 2 != 0).cast("int"))
    )
    return n / 100.0


def parse_double_col(c: Column) -> tuple[Column, Column]:
    """Double.TryParse + NaN reject + Math.Round(v, 2)
    (GenericFile.cs:90-94). Returns (value, parse_error)."""
    ok = c.rlike(NUMBER_RE)
    v = F.when(
        ok, dotnet_round2_col(F.replace(c, F.lit(","), F.lit("")).try_cast("double"))
    )
    return v, ~_blank(c) & (~ok | v.isNull())


def parse_bool_col(c: Column) -> tuple[Column, Column]:
    """Boolean.TryParse: trimmed, case-insensitive true/false
    (GenericFile.cs:100-105)."""
    t = F.lower(F.trim(c))
    ok = t.isin("true", "false")
    return F.when(ok, t == "true"), ~_blank(c) & ~ok
