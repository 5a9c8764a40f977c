"""Reserved-identifier scrub (SURVEY.md §1.3) — bit-for-bit replica.

Reference algorithm (Influxer/ExtensionMethods.cs:38-44): split the string on
the reserved character set dropping empty entries, join with single spaces,
trim, then replace spaces with '_'. Net effect: every RUN of reserved chars
collapses to ONE '_', and leading/trailing runs are removed (space and '_'
are themselves reserved, so pre-existing spaces/underscores take part in the
runs). Perfmon name parts additionally Trim('_')
(Influxer/PerfmonFile.cs:57-65) — that is a no-op after this scrub, since
leading/trailing reserved runs (including '_') are already stripped.

Applied to: generic header names (Influxer/GenericFile.cs:42), tag values
(Influxer/GenericFile.cs:107), all Perfmon name parts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from influxer_spark.ingest.config import RESERVED_CHARS

_RESERVED_CLASS = "[" + re.escape(RESERVED_CHARS) + "]"
_RUN_RE = re.compile(_RESERVED_CLASS + "+")
_EDGE_RE = re.compile("^" + _RESERVED_CLASS + "+|" + _RESERVED_CLASS + "+$")


def scrub_name(s: str) -> str:
    """Driver-side scrub (header names, Perfmon counter parts)."""
    return _RUN_RE.sub("_", _EDGE_RE.sub("", s))


def scrub_col(c: Column) -> Column:
    """Column-expression scrub for tag values — JVM-side, codegen-friendly.

    Same two-regex formulation as ``scrub_name``; java.util.regex and Python
    re agree on this character-class-only pattern.
    """
    # Java regex needs the same class; re.escape escapes for Python but the
    # escaped set ("\" \;\_\(\)%#\./\*\[\]\{\}\,") is valid and equivalent in
    # Java character classes too.
    edge = "^" + _RESERVED_CLASS + "+|" + _RESERVED_CLASS + "+$"
    return F.regexp_replace(
        F.regexp_replace(c, edge, ""), _RESERVED_CLASS + "+", "_"
    )
