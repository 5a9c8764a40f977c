"""SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. 2003, public
method) over the hourly tier: per (series, day) the 24 bucket values are
z-normalized, PAA-compressed into fixed segments, and mapped to an
alphabet by N(0,1) breakpoints, yielding one short WORD per series-day.
Equal words ⇔ similar daily shapes, so "what does this series usually do
in a day" becomes a groupBy over words — the motif/discord primitive of
the timeseries-mining literature, here as a continuous-aggregate read
(O(days · series) rows from the 1h tier, never raw points).

The reference has no mining surface (it ends at points pushed —
Influxer/Program.cs:78-102); this is an engine extension in the same
family as LTTB/M4/decompose.

Determinism discipline (DuckDB-oracle hash-exact): each day's 24 values
are collected bucket-ordered (array of 24 — bounded, unlike the fold
family's whole-series arrays), and every float reduction is an ORDERED
left fold (`F.aggregate` ↔ DuckDB `list_reduce`) so the IEEE operand
order is identical in both engines; sqrt is correctly rounded per IEEE
754, so identical variance → identical std; breakpoints are literal
constants.  Days with missing buckets are dropped (a PAA over a gap is
not comparable), deterministically in both engines.

Scale notes: one shuffle keyed (series, day) with 24-element state per
group; the word groupBy is summary-sized.  No UDFs, no unbounded
collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# N(0,1) quantile breakpoints per alphabet size (SAX paper, Table 3).
BREAKPOINTS: dict[int, list[float]] = {
    3: [-0.43, 0.43],
    4: [-0.6745, 0.0, 0.6745],
    5: [-0.84, -0.25, 0.25, 0.84],
}

_LETTERS = "abcdefgh"


def _ofold(arr: Column) -> Column:
    """Ordered left-fold sum — operand order pinned, mirrors DuckDB
    list_reduce(list_prepend(0.0, arr), (a, b) -> a + b)."""
    return F.aggregate(arr, F.lit(0.0), lambda a, b: a + b)


def sax_words(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    points_per_word: int = 24,
    segments: int = 6,
    alphabet: int = 4,
    word_seconds: int = 86400,
) -> DataFrame:
    """One SAX word per (series, word-window): (*keys, day, word).

    Defaults read daily shapes off an hourly series: 24 points → 6 PAA
    segments of 4 → a 6-letter word over a 4-letter alphabet.
    """
    if points_per_word % segments:
        raise ValueError("segments must divide points_per_word")
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    keys = list(key_cols)
    seg_len = points_per_word // segments
    n = float(points_per_word)

    secs = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long")
    day = F.timestamp_seconds(secs - (secs % word_seconds)).alias("day")
    g = (
        df.select(*keys, day, F.col(ts_col).alias("_t"),
                  F.col(value_col).cast("double").alias("_v"))
        .groupBy(*keys, "day")
        .agg(
            F.array_sort(F.collect_list(F.struct("_t", "_v"))).alias("_p")
        )
        .filter(F.size("_p") == points_per_word)
        .withColumn("_arr", F.transform(F.col("_p"), lambda s: s["_v"]))
        .drop("_p")
    )
    mean = (_ofold(F.col("_arr")) / F.lit(n)).alias("_mean")
    g = g.withColumn("_mean", mean)
    var = _ofold(
        F.transform(
            F.col("_arr"),
            lambda x: (x - F.col("_mean")) * (x - F.col("_mean")),
        )
    ) / F.lit(n)
    g = g.withColumn("_std", F.sqrt(var))

    bps = BREAKPOINTS[alphabet]

    def symbol(z: Column) -> Column:
        # z < bp[0] → 'a'; bp[i-1] <= z < bp[i] → letter i; else last
        expr = F.lit(_LETTERS[alphabet - 1])
        for i in range(alphabet - 2, -1, -1):
            expr = F.when(z < F.lit(bps[i]), F.lit(_LETTERS[i])).otherwise(expr)
        return expr

    letters = []
    for s in range(segments):
        seg = F.slice(F.col("_arr"), s * seg_len + 1, seg_len)
        paa = _ofold(seg) / F.lit(float(seg_len))
        z = F.when(F.col("_std") > 0.0, (paa - F.col("_mean")) / F.col("_std")).otherwise(F.lit(0.0))
        letters.append(symbol(z))
    return g.select(*keys, "day", F.concat(*letters).alias("word"))


def sax_motifs(
    words: DataFrame, key_cols: Sequence[str], top: int = 3
) -> DataFrame:
    """Most frequent daily shapes per series: (*keys, word, n_days, rank).
    Summary-sized groupBy + WindowGroupLimit top-n."""
    from pyspark.sql import Window

    keys = list(key_cols)
    counted = words.groupBy(*keys, "word").agg(
        F.count("*").cast("long").alias("n_days")
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("n_days").desc(), F.col("word").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
    )
