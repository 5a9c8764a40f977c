"""Corpus-curation operators: vocabulary statistics, per-domain caps, and a
CCNet-style unigram language-model quality score.

The reference's pipeline ends at "points pushed per measurement"
(Influxer/Program.cs:78-102 prints per-file totals); a training-data curator
needs the corpus-level analogues of those run statistics — which tokens
dominate the corpus, which sources over-contribute, and how "surprising"
each document is under the corpus' own unigram distribution (the
perplexity-filter proxy of CCNet / Wenzek et al. 2019).

Determinism discipline (see training_queries.py): every floating-point
number that crosses the Spark/DuckDB oracle boundary is derived from
integers by a single IEEE division with identical operand order.  The LM
score NEVER sums raw ``ln`` terms — JVM ``Math.log`` and libm disagree by
1 ulp on ~3% of inputs, and float summation order differs between engines —
instead each vocabulary entry's log-probability is quantized ONCE to a
scaled BIGINT and per-document scores are pure integer sums (order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"
LOGPROB_SCALE = 1_000_000


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, m) — per-document token multiplicities.

    The explode is immediately re-aggregated on (id, token), so the shuffle
    volume is the *distinct* tokens per document, not the token stream; the
    map-side partial aggregation absorbs within-partition repetition before
    anything moves.
    """
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count("*").alias("m"))
    )


def token_doc_freq(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 100
) -> DataFrame:
    """(token, doc_freq, total_freq) — the corpus vocabulary table, top
    ``top_k`` tokens by document frequency (ties → total_freq desc, then
    token asc; fully deterministic).

    This is the DF/IDF table every corpus filter pipeline needs (stopword
    discovery, boilerplate shingle caps, IDF weighting).

    Scale: two-level aggregation instead of ``countDistinct`` — the
    (id, token) pre-aggregate makes the second groupBy distinct-free, so
    Spark plans two plain partial-aggregated shuffles rather than an Expand.
    The final top-k is a TakeOrderedAndProject (per-partition heaps, no
    global sort).
    """
    return (
        _doc_tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("m").alias("total_freq"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("total_freq"), F.asc("token"))
        .limit(top_k)
    )


def domain_cap(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    order_col: str,
    n: int,
) -> DataFrame:
    """Keep at most ``n`` documents per domain/source — the standard
    per-domain downsampling step that stops a handful of giant hosts from
    dominating a crawl-derived corpus (C4 keeps 1 page per URL; curated
    sets cap pages per registered domain).

    Ranks by (``order_col`` desc, ``id_col`` asc) — "best n per domain"
    with a deterministic tiebreak — and returns
    (id, domain, <order_col>, rank).

    Scale: one shuffle on the domain key, then a rank filter that Spark
    pushes into the window as a running limit.  For a pathologically hot
    domain (one host = one partition's worth of rows) the same call can be
    preceded by a per-partition local top-n (groupBy domain with a
    ``max_by``-style partial heap) — not done by default because the window
    form is exact and the hot-domain case is precisely what the cap itself
    removes from downstream stages.
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(
            F.col(id_col).alias("id"),
            F.col(domain_col).alias("domain"),
            F.col(order_col),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum of ``value_col`` in ``order_col``
    order (``order_col`` must be unique for a deterministic result).

    Spark's window cumsum over a global ORDER BY collapses to a single
    partition — the classic scale trap.  This is the standard two-pass MPP
    prefix scan instead: range-partition on the order key, per-partition
    window cumsum (parallel), then add each partition's base offset.  The
    only driver-side data is ONE ROW PER PARTITION (the partial sums) —
    bounded by the partition count, not the data; their running sum is
    broadcast back.  ``repartitionByRange`` assigns ascending key ranges to
    ascending partition ids, which is what makes the offsets well-defined.
    """
    spark = df.sparkSession
    n = num_partitions or df.rdd.getNumPartitions()
    d = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    totals = sorted(
        d.groupBy("_pid").agg(F.sum(value_col).alias("_t")).collect(),
        key=lambda r: r["_pid"],
    )
    offs, acc = [], 0
    for r in totals:
        offs.append((r["_pid"], acc))
        acc += r["_t"] or 0
    off_df = spark.createDataFrame(offs, ["_pid", "_off"]) if offs else None
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if off_df is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.sum(value_col).over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay documents end-to-end in
    ``id_col`` order and cut every ``budget`` tokens — each document's
    training-sequence assignment is ``floor(start_offset / budget)``.  The
    standard pre-tokenization packing step for LLM training shards (docs
    may span a boundary, exactly as in GPT-style packed pretraining).

    Returns (id[, shard], n_tokens, start_offset, seq_id).

    Scale: with ``shard_col`` the cumsum is a per-shard window — embarrass-
    ingly parallel, one shuffle on the shard key (the realistic layout:
    packing happens within output shards).  Without it, the global offset
    uses :func:`prefix_sum`'s two-pass scan — NOT a single-partition global
    window.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        *([F.col(shard_col).alias("shard")] if shard_col else []),
        F.size(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT))
        .cast("long")
        .alias("n_tokens"),
    )
    if shard_col:
        w = (
            Window.partitionBy("shard")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = toks.withColumn("cumsum", F.sum("n_tokens").over(w))
    else:
        cum = prefix_sum(toks, "id", "n_tokens")
    return cum.select(
        "id",
        *(["shard"] if shard_col else []),
        "n_tokens",
        (F.col("cumsum") - F.col("n_tokens")).alias("start_offset"),
        F.floor((F.col("cumsum") - F.col("n_tokens")) / budget)
        .cast("long")
        .alias("seq_id"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, scale: int = LOGPROB_SCALE
) -> DataFrame:
    """CCNet-style unigram LM score: train a unigram distribution on the
    corpus itself, then score every document by its mean token
    log-probability (higher = more typical; the real CCNet filters on a
    KenLM 5-gram — the unigram version is the same plumbing with a
    broadcastable model).

    Returns (id, n_tokens, sum_logp_q, avg_logprob) where
    ``sum_logp_q = Σ_t m_t · round(ln(cnt_t/total)·scale)`` (BIGINT) and
    ``avg_logprob = sum_logp_q / (scale · n_tokens)``.

    Bit-exactness: ``ln`` is evaluated once per *vocabulary entry* and
    immediately quantized to a scaled BIGINT, so the per-document
    aggregation is integer arithmetic — immune to both the JVM/libm 1-ulp
    ``ln`` divergence (only ~vocab-size chances to flip a rounding
    boundary, not ~token-stream-size) and to float summation-order
    nondeterminism.  The final division is one IEEE op on exact integers.

    Scale: the vocabulary is built from the (id, token) pre-aggregate
    (same two-shuffle shape as ``token_doc_freq``); the corpus total is a
    1-row aggregate broadcast onto the vocab; the score join is on the
    token key — AQE broadcasts the vocab side when it fits (a unigram
    model does even for web-scale corpora; a few hundred million distinct
    tokens is the pathological ceiling) and falls back to a shuffle join
    when it doesn't.
    """
    dt = _doc_tokens(df, id_col, text_col)
    vocab = dt.groupBy("token").agg(F.sum("m").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    vq = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(F.log(F.col("cnt") / F.col("total")) * scale, 0)
        .cast("long")
        .alias("q"),
    )
    return (
        dt.join(vq, "token")
        .groupBy("id")
        .agg(
            F.sum("m").alias("n_tokens"),
            F.sum(F.col("m") * F.col("q")).alias("sum_logp_q"),
        )
        .select(
            "id",
            "n_tokens",
            "sum_logp_q",
            (F.col("sum_logp_q") / (F.lit(scale) * F.col("n_tokens"))).alias(
                "avg_logprob"
            ),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.75,
    scale: int = LOGPROB_SCALE,
) -> DataFrame:
    """Interpolated bigram LM score (the next rung of the CCNet ladder after
    :func:`unigram_logprob`): train on the corpus itself, score each document
    by its mean bigram log-probability under

        P(w₂|w₁) = λ·cnt(w₁w₂)/cnt(w₁·) + (1−λ)·cnt(·w₂)/total

    (Jelinek-Mercer interpolation with the "next-token" unigram as the
    backoff — every scored bigram exists in the model since it is trained on
    the same corpus, and interpolation keeps rare-bigram probabilities off
    the floor).

    Bit-exactness: same discipline as the unigram scorer — ``ln`` is
    evaluated once per bigram TYPE and immediately quantized to a scaled
    BIGINT, so per-document aggregation is integer arithmetic (immune to
    float summation order); the interpolation expression composes the same
    IEEE ops in the same order as the oracle SQL.

    Scale: bigram types ≫ unigram vocab but the model join is on the bigram
    key (shuffle join; AQE broadcasts if it fits); prefix and next-token
    marginals are two groupBys over the bigram-type frame, not the token
    stream.  Documents with <2 words contribute their whole token list as
    one degenerate "bigram" (word_shingles guard) so nothing drops out.
    """
    from influxer_spark.operators.dedup import word_shingles

    dbg = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), 2)).alias("bg"),
        )
        .groupBy("id", "bg")
        .agg(F.count("*").alias("m"))
    )
    bgv = dbg.groupBy("bg").agg(F.sum("m").alias("cbg"))
    parts = bgv.withColumn("w", F.split("bg", " ")).select(
        "bg",
        "cbg",
        F.element_at("w", 1).alias("w1"),
        F.element_at("w", -1).alias("w2"),
    )
    pre = parts.groupBy("w1").agg(F.sum("cbg").alias("cpre"))
    nxt = parts.groupBy("w2").agg(F.sum("cbg").alias("cnxt"))
    total = parts.agg(F.sum("cbg").alias("total"))
    p = F.lit(lam) * (F.col("cbg") / F.col("cpre")) + F.lit(1.0 - lam) * (
        F.col("cnxt") / F.col("total")
    )
    model = (
        parts.join(pre, "w1")
        .join(nxt, "w2")
        .crossJoin(F.broadcast(total))
        .select("bg", F.round(F.log(p) * scale, 0).cast("long").alias("q"))
    )
    return (
        dbg.join(model, "bg")
        .groupBy("id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("q")).alias("sum_logp_q"),
        )
        .select(
            "id",
            "n_bigrams",
            "sum_logp_q",
            (F.col("sum_logp_q") / (F.lit(scale) * F.col("n_bigrams"))).alias(
                "avg_logprob"
            ),
        )
    )


def curation_funnel(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    min_stop_hits: int = 2,
    decontam_k: int = 8,
) -> DataFrame:
    """End-to-end curation funnel (the FineWeb/RefinedWeb composition):
    Gopher quality filter → exact dedup (keep-first) → benchmark
    decontamination, reporting surviving-doc counts per stage as
    ``(stage_idx, stage, n_docs)``.

    Each stage is an existing operator; the funnel's value is proving they
    COMPOSE — ids thread through semi-joins, later stages see only
    survivors, and no stage rescans text it already dropped.  At 100 TB
    each stage boundary is where a pipeline materializes a snapshot
    (catalog.py), so per-stage counts are also the lineage record the
    north rule asks for.
    """
    from influxer_spark.operators.dedup import exact_dedup, ngram_decontam
    from influxer_spark.operators.textstats import gopher_quality

    gq = (
        gopher_quality(corpus, id_col, text_col, min_words, min_stop_hits)
        .filter("keep")
        .select(F.col("id").alias(id_col))
    )
    kept1 = corpus.join(gq, id_col)
    firsts = exact_dedup(kept1, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    kept2 = kept1.join(firsts, id_col)
    contam = ngram_decontam(bench=bench, corpus=kept2, id_col=id_col,
                            text_col=text_col, k=decontam_k).select(
        F.col("id").alias(id_col)
    )
    kept3 = kept2.join(contam, id_col, "left_anti")

    def stage(i: int, name: str, d: DataFrame) -> DataFrame:
        return d.agg(F.count("*").alias("n_docs")).select(
            F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"), "n_docs"
        )

    out = stage(0, "raw", corpus)
    for i, (name, d) in enumerate(
        [("gopher_quality", kept1), ("exact_dedup", kept2), ("decontam", kept3)],
        start=1,
    ):
        out = out.unionByName(stage(i, name, d))
    return out


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public method, reimplemented)
# ---------------------------------------------------------------------------


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col,
    buckets: int = 4096,
) -> DataFrame:
    """Per-document importance weight log(p_target/p_raw) under hashed
    n-gram bag-of-features models — the DSIR recipe: word unigrams+bigrams
    hashed into ``buckets``, two add-one-smoothed unigram models (target =
    rows where ``target_col`` is true; raw = all rows), and the document
    weight as the sum of per-feature log ratios.

    Determinism discipline (cross-engine hash-exact): per-bucket log
    ratios are quantized to integer micro-nats BEFORE the per-document
    sum, so the aggregation is integer arithmetic — order-independent and
    identical in the DuckDB oracle.

    Scale notes: the feature explode is the only corpus-sized stage (one
    shuffle on (doc, bucket)); the bucket model is ``buckets`` rows —
    broadcast — and totals are a 1-row broadcast, so scoring 10^12 docs
    is a map-side join over the exploded features.

    Returns (id, n_feats, w_micro) with w_micro = Σ m_f · q_f in
    micro-nats.
    """
    from influxer_spark.operators.dedup import h32, word_shingles

    txt = F.col(text_col)
    feats = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(target_col).alias("_tgt") if isinstance(target_col, str)
            else target_col.alias("_tgt"),
            F.explode(
                F.concat(word_shingles(txt, 1), word_shingles(txt, 2))
            ).alias("s"),
        )
        .select("id", "_tgt", (h32(F.col("s")) % buckets).alias("b"))
        .groupBy("id", "_tgt", "b")
        .agg(F.count("*").alias("m"))
    )
    bc = feats.groupBy("b").agg(
        F.sum("m").cast("long").alias("cr"),
        F.sum(F.when(F.col("_tgt"), F.col("m")).otherwise(0))
        .cast("long")
        .alias("ct"),
    )
    tot = bc.agg(
        F.sum("cr").cast("long").alias("R"), F.sum("ct").cast("long").alias("T")
    )
    model = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + F.lit(1.0)) / (F.col("T") + F.lit(buckets)))
                / ((F.col("cr") + F.lit(1.0)) / (F.col("R") + F.lit(buckets)))
            )
            * 1000000,
            0,
        )
        .cast("long")
        .alias("q"),
    )
    return (
        feats.join(F.broadcast(model), "b")
        .groupBy("id")
        .agg(
            F.sum("m").cast("long").alias("n_feats"),
            F.sum(F.col("m") * F.col("q")).cast("long").alias("w_micro"),
        )
    )


def dsir_resample(
    scored: DataFrame, id_col: str, n: int, seed: str = "dsir"
) -> DataFrame:
    """Gumbel-top-n over the importance weights: keep the n docs with the
    largest ``w_micro + Gumbel`` key — sampling without replacement with
    inclusion odds ∝ the importance ratio (the Gumbel-max trick), hash-
    deterministic like :func:`influxer_spark.operators.sampling.weighted_sample`.
    Gumbel noise is quantized to micro-nats so the key stays integer.

    A global top-n needs a total order, but Spark only applies
    InferWindowGroupLimit (map-side pre-trim) to windows WITH a partition
    spec — a bare ORDER BY window funnels the whole corpus into one
    partition.  So this is two-phase: per-salt top-n over 64 hash salts
    (WindowGroupLimit fires, plan-asserted), then the true top-n over the
    ≤ 64·n survivors — identical output (any global top-n row is in its
    salt's top-n), bounded final sort."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (hv + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    g_micro = F.round(-F.log(-F.log(u)) * 1000000, 0).cast("long")
    keyed = scored.withColumn("_key", F.col("w_micro") + g_micro).withColumn(
        "_salt", hv % 64
    )
    w_local = Window.partitionBy("_salt").orderBy(
        F.col("_key").desc(), F.col(id_col).asc()
    )
    survivors = (
        keyed.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= n)
        .drop("_lr")
    )
    w_final = Window.orderBy(F.col("_key").desc(), F.col(id_col).asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= n)
        .drop("_key", "_salt")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split overlong documents into fixed-stride token windows with
    overlap — the standard step between cleaning and sequence packing: a
    500k-token page must become many trainable chunks, each carrying a
    STABLE id (doc, chunk_idx) so downstream dedup/packing/splits stay
    deterministic across reruns.

    Tokens are whitespace words (the engine's token_stats discipline);
    chunk i covers words [i·stride, i·stride + max_tokens) with
    stride = max_tokens − overlap, and the chunk count is pure integer
    math — ``1 + (n − max_tokens + stride − 1) div stride`` for n >
    max_tokens, else 1 — so a DuckDB replay is bit-exact (no float ceil
    at a boundary).  Short/empty docs yield exactly one chunk.

    All Column expressions (split / sequence / slice / array_join) —
    whole-stage codegen, no shuffle at all: chunking is embarrassingly
    row-parallel, which is the point at 100 TB.

    Output: (id, chunk_idx, n_chunks, n_tokens, chunk_text).
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens "
            f"({max_tokens}) or the stride is non-positive"
        )
    stride = max_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        words.alias("_w"),
        F.size(words).cast("long").alias("_n"),
    ).withColumn(
        "n_chunks",
        F.when(F.col("_n") <= max_tokens, F.lit(1).cast("long")).otherwise(
            # pure integer ceil-div — no float at a chunk boundary
            F.expr(
                f"1 + (_n - {max_tokens} + {stride - 1}) DIV {stride}"
            ).cast("long")
        ),
    )
    idx = F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1))
    start = F.col("chunk_idx") * stride
    return (
        base.withColumn("chunk_idx", idx)
        .select(
            "id",
            "chunk_idx",
            "n_chunks",
            F.least(
                F.lit(max_tokens).cast("long"), F.col("_n") - start
            ).alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_w"), (start + 1).cast("int"), max_tokens),
                " ",
            ).alias("chunk_text"),
        )
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    size_col: str,
    targets: dict[str, float],
    budget: int,
    max_epochs: float = 10.0,
) -> DataFrame:
    """Plan a training mixture: given target SHARES per source and a total
    token budget, compute each source's epoch weight — the number
    :func:`upsample_epochs` consumes.  weight = budget·share / available,
    clamped at ``max_epochs`` (repeating a tiny source 400× memorizes it;
    the clamp surfaces as ``capped`` so the shortfall is a reported fact,
    not a silent one — same no-silent-caps rule as the LSH bucket guard).

    One tiny aggregation (per-group size sums) + driver-free arithmetic;
    the share lookup is a deterministic CASE chain in sorted key order.
    Sources absent from ``targets`` get share 0 (weight 0 → dropped by
    the upsampler).  Output: (group, available, share, target_size,
    weight, capped).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    avail = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(size_col).cast("long").alias("available")
    )
    share: Column = F.lit(0.0)
    for k in sorted(targets, reverse=True):
        share = F.when(F.col("group") == k, F.lit(float(targets[k]))).otherwise(
            share
        )
    target_size = share * float(budget)
    raw_w = target_size / F.col("available")
    return avail.select(
        "group",
        "available",
        share.alias("share"),
        target_size.alias("target_size"),
        F.least(raw_w, F.lit(float(max_epochs))).alias("weight"),
        (raw_w > max_epochs).alias("capped"),
    )
