"""Exact-substring span deduplication (ExactSubstr — Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

The engine's other dedup operators decide per DOCUMENT (drop/keep); Lee
et al. showed the bigger win is removing the duplicated SPANS while
keeping the surrounding unique text — boilerplate, licence blocks, and
quoted passages vanish without losing the documents that carry them.
Their reference implementation builds a corpus-wide suffix array (fine
on one machine, hostile to shuffle-based distribution); the standard
distributed reformulation — used here — is k-word gram matching: a span
is "duplicated" iff every one of its k-grams occurs ≥ ``min_count``
times corpus-wide, which is exactly the suffix-array criterion at
word-granularity resolution k.

Pipeline (all DataFrame ops, no UDF):
1. per doc: word array + one k-gram per position (``transform`` over a
   guarded ``sequence`` — docs shorter than k emit none);
2. corpus-wide gram counts (ONE shuffle on gram; map-side combined.
   Unlike pairwise shingle joins there is no quadratic hot-key risk —
   a gram row carries only its count, never a pair fan-out, so no
   hot-bucket cap is needed);
3. duplicated positions (count ≥ min_count) → per-doc maximal merged
   spans via the classic islands window (running max of span ends);
4. clean text = words at uncovered positions, order restored by a
   per-doc sort — whitespace-normalized exactly like the gram stage.

Output: one row per input doc —
``(id, n_words, n_dup_grams, n_spans, dup_words, clean_text)``.
Docs with no duplicated span pass through with ``clean_text`` equal to
their whitespace-normalized text.

Scale notes: shuffles are (a) the gram-count groupBy, (b) the
marked-position join back (linear, gram-keyed), (c) per-doc windows —
partitioned by doc id, bounded by doc length.  Everything is integer /
string; the DuckDB oracle mirrors the pipeline stage for stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_substr_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Remove corpus-duplicated k-word spans from every document."""
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    )
    # one k-gram per 1-based position; sequence() guarded against n < k
    # (Spark's sequence(1, 0) counts DOWN — it must never be emitted)
    grams = base.select(
        "id",
        F.explode(
            F.when(
                F.size("w") >= k,
                F.expr(
                    f"transform(sequence(1, size(w) - {k} + 1),"
                    f" i -> struct(i AS pos, array_join(slice(w, i, {k}), ' ') AS gram))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("pg"),
    ).select("id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    dup = (
        grams.join(counts.filter(F.col("n") >= min_count), "gram")
        .select("id", "pos", (F.col("pos") + (k - 1)).alias("end"))
    )
    # islands: a position starts a new span iff there is at least one
    # UNcovered word between it and every previous span's end (running max
    # over the doc, ordered by pos) — overlapping AND adjacent grams merge,
    # so a span is a maximal contiguous duplicated region
    wprev = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = dup.withColumn(
        "new_span",
        (
            F.col("pos") > F.coalesce(F.max("end").over(wprev), F.lit(-1)) + 1
        ).cast("int"),
    ).withColumn("span_id", F.sum("new_span").over(wrun))
    spans = marked.groupBy("id", "span_id").agg(
        F.min("pos").alias("s"), F.max("end").alias("e")
    )
    covered = spans.select("id", F.explode(F.expr("sequence(s, e)")).alias("pos"))
    stats = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_words"),
    )
    dup_gram_counts = dup.groupBy("id").agg(F.count(F.lit(1)).alias("n_dup_grams"))
    words = base.select(
        "id",
        F.size("w").cast("long").alias("n_words"),
        F.posexplode_outer("w").alias("i0", "word"),
    ).select("id", "n_words", (F.col("i0") + 1).alias("pos"), "word")
    kept = (
        words.join(covered, ["id", "pos"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "word"))),
                    lambda st: st["word"],
                ),
                " ",
            ).alias("clean_text")
        )
    )
    return (
        base.select("id", F.size("w").cast("long").alias("n_words"))
        .join(dup_gram_counts, "id", "left")
        .join(stats, "id", "left")
        .join(kept, "id", "left")
        .select(
            "id",
            "n_words",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
