"""Lexical retrieval: distributed BM25 top-k over a document corpus.

Complements the embedding-side ANN family (operators/similarity.py) with the
sparse/lexical half of a training-data search stack — "find the documents
most relevant to these terms" is the workhorse of decontamination forensics,
targeted corpus audits, and hard-negative mining.

Scale shape: the corpus side is touched exactly twice — once for the
(id, token, tf) pre-aggregate (shuffle volume = distinct tokens per doc,
map-side combined) and once implicitly through the per-doc length frame
derived from it. The query-term side (document frequencies + quantized IDFs)
is a FEW-ROW frame (one row per query term) joined with an explicit
``F.broadcast`` — the corpus never shuffles on anything but its own token
key, and the final top-k is a TakeOrderedAndProject (per-partition heaps, no
global sort).

Determinism discipline (see curation.unigram_logprob): ``ln`` is evaluated
once per *query term* and immediately quantized to a scaled BIGINT; each
term's BM25 contribution is quantized to a scaled BIGINT before the per-doc
sum, so the aggregation is order-free integer arithmetic and the DuckDB
oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from influxer_spark.operators.curation import _doc_tokens

IDF_SCALE = 1_000_000
SCORE_SCALE = 1_000_000


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 (Robertson/Sparck Jones; the Lucene
    ``+1`` idf variant, so idf is always positive) for a bag of query terms.

    Returns (id, n_hit_terms, score_q, score) ordered by (score desc, id) —
    ``score_q`` is the exact scaled-BIGINT score (the tie-break/oracle key),
    ``score = score_q / SCORE_SCALE`` the float rendering.

    idf_t   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5)), quantized per term
    tf part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    """
    dt = _doc_tokens(df, id_col, text_col)  # (id, token, m=tf)
    dl = dt.groupBy("id").agg(F.sum("m").alias("dl"))
    n_total = df.select(
        F.count("*").alias("n_docs"),
    )
    # corpus-wide token total for avgdl, from the same pre-aggregate
    tok_total = dt.agg(F.sum("m").alias("n_tokens"))

    terms = df.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(query_terms))], ["token"]
    )
    # document frequency of the query terms only — a |terms|-row aggregate
    dfreq = (
        dt.join(F.broadcast(terms), "token")
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    idf = (
        dfreq.crossJoin(F.broadcast(n_total))
        .select(
            "token",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * IDF_SCALE,
                0,
            )
            .cast("long")
            .alias("idf_q"),
        )
    )
    scored = (
        dt.join(F.broadcast(idf), "token")
        .join(dl, "id")
        .crossJoin(F.broadcast(n_total.crossJoin(tok_total)))
        .select(
            "id",
            F.round(
                (F.col("idf_q") / F.lit(float(IDF_SCALE)))
                * (F.col("m") * (k1 + 1.0))
                / (
                    F.col("m")
                    + k1
                    * (
                        (1.0 - b)
                        + b
                        * F.col("dl")
                        / (F.col("n_tokens") / F.col("n_docs"))
                    )
                )
                * SCORE_SCALE,
                0,
            )
            .cast("long")
            .alias("contrib_q"),
        )
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum("contrib_q").alias("score_q"),
        )
    )
    return (
        scored.select(
            "id",
            "n_hit_terms",
            "score_q",
            (F.col("score_q") / F.lit(float(SCORE_SCALE))).alias("score"),
        )
        .orderBy(F.desc("score_q"), F.asc("id"))
        .limit(k)
    )


def rrf_fuse(
    lists: "list[tuple[str, DataFrame]]",
    k_const: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke, Buettcher — SIGIR 2009) of
    N ranked candidate lists: ``rrf(d) = Σ_i 1/(k + rank_i(d))``, the
    standard way to combine a lexical (BM25) and a semantic (ANN) retriever
    into one hybrid search result without score calibration.

    ``lists`` is an ORDERED ``[(name, df)]`` where each df has columns
    ``(id, rank)`` (1-based).  Output: ``(id, rank_<name>…, n_lists, rrf)``
    ordered by (rrf desc, id), limited to ``topk``.

    Determinism: each contribution is ``1.0/(k + rank)`` — a double
    division of exact integers — and the contributions are added in LIST
    ORDER (a fixed expression tree, not an order-free aggregate), so any
    oracle mirroring the same order is bit-exact.  Scale shape: the inputs
    are top-k candidate lists (already tiny — the expensive part was the
    retrievers); the fusion is N−1 joins of bounded lists and costs
    nothing.  For many-query batches, add the query id to ``id`` and the
    same plan fuses per query.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    joined: DataFrame | None = None
    names: list[str] = []
    for name, df_l in lists:
        cur = df_l.select(
            F.col("id"), F.col("rank").cast("long").alias(f"rank_{name}")
        )
        joined = cur if joined is None else joined.join(cur, "id", "full_outer")
        names.append(name)
    contribs = [
        F.coalesce(1.0 / (F.lit(k_const) + F.col(f"rank_{n}")), F.lit(0.0))
        for n in names
    ]
    rrf = contribs[0]
    for c in contribs[1:]:
        rrf = rrf + c
    hits = F.lit(0)
    for n in names:
        hits = hits + F.col(f"rank_{n}").isNotNull().cast("int")
    return (
        joined.select(
            "id",
            *[f"rank_{n}" for n in names],
            hits.cast("long").alias("n_lists"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(topk)
    )
