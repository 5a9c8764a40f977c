"""Deterministic corpus sampling, splitting, shuffling, and embedding
quantization — the dataset-assembly steps between curation and training.

The reference ends at "points pushed" (Influxer/Program.cs:78-102); a
training-data pipeline additionally needs to carve the curated corpus into
train/val/test, subsample it to a target language/domain mixture, fix a
reproducible global example order, and shrink embedding payloads for
retrieval indices.  All four are implemented hash-deterministically so the
same inputs always yield the same dataset — re-running a 10^12-doc job
after a partial failure must not resample.

Scale notes:
- :func:`hash_split` and :func:`stratified_sample` are pure projections /
  filters over a 32-bit md5 bucket — ZERO shuffles, fully pushed into the
  scan stage, embarrassingly parallel at any executor count.  Because
  membership is a hash *threshold*, samples are nested: the 1% sample is a
  strict subset of the 10% sample (the standard trick for scaling-law
  subsets from one pass).
- :func:`global_shuffle` needs a total order; it reuses
  :func:`influxer_spark.operators.curation.prefix_sum`'s two-pass MPP scan
  (range partition → local rank → broadcast per-partition offsets) instead
  of Spark's single-partition global window.
- :func:`quantize_embeddings_int8` is element-wise Column math inside
  whole-stage codegen (no UDF); every float crossing the DuckDB oracle
  boundary is an IEEE expression with identical operand order in both
  engines (see training_queries.py determinism discipline).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import prefix_sum
from .dedup import h32

#: hash-bucket resolution for split weights / sample rates (1e-6 steps)
BUCKETS = 1_000_000


def hash_bucket(col: Column, seed: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(seed || value).

    Identical in DuckDB:
    ``CAST('0x' || substr(md5(seed || CAST(x AS VARCHAR)), 1, 8) AS BIGINT)
    % 1000000``.
    """
    return h32(F.concat(F.lit(seed), col.cast("string"))) % BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash threshold on ``id_col``.

    ``splits`` is ``[(name, weight), ...]``; the last split absorbs any
    remaining weight (so ``[("train", .98), ("val", .01), ("test", .01)]``
    partitions exactly).  Assignment depends only on (seed, id) — stable
    across runs, cluster sizes, and row order, and documents added later
    don't reshuffle existing assignments (the property that keeps a
    train/test split honest across crawl increments).

    Zero shuffles: one projected expression, evaluated scan-side.
    """
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    b = hash_bucket(F.col(id_col), seed)
    expr: Column | None = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        thr = int(round(acc * BUCKETS))
        cond = b < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert expr is not None
    return df.withColumn(out_col, expr.otherwise(splits[-1][0]))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Keep each row with a per-stratum probability — the mixture-building
    step (e.g. keep 100% of rare languages, 5% of English boilerplate).

    Membership is ``hash_bucket(id) < rate * BUCKETS`` so the sample is
    deterministic, exact-in-expectation, and *nested across rates*: raising
    a stratum's rate only ADDS documents (never swaps them), which is what
    makes ablation subsets comparable.

    Zero shuffles — a scan-side filter; at 10^12 docs this is the cheapest
    possible downsample (no sort, no sketch, no state).
    """
    b = hash_bucket(F.col(id_col), seed)
    thr: Column = F.lit(int(round(default_rate * BUCKETS)))
    for value, rate in sorted(rates.items()):
        thr = (
            F.when(F.col(strata_col) == value, int(round(rate * BUCKETS)))
            .otherwise(thr)
        )
    return df.filter(b < thr)


def upsample_epochs(
    df: DataFrame,
    id_col: str,
    weight: float,
    seed: str = "epoch",
    out_col: str = "epoch",
) -> DataFrame:
    """Multi-epoch upsampling — the other half of mixture building
    (stratified_sample downsamples; training mixes also UPweight sources,
    e.g. "wikipedia at 2.3 epochs").  weight = k + f emits k full copies
    (epoch 0..k−1) plus a fractional epoch k holding the rows with
    hash_bucket(id) < f — deterministic, and nested like
    stratified_sample: raising the weight only ADDS (id, epoch) rows, so
    mixture ablations stay comparable.

    Zero shuffles: one scan-side explode of a per-row epoch range (rows
    with zero epochs are filtered BEFORE the explode — sequence(0, −1)
    would count down).
    """
    if weight < 0:
        raise ValueError("weight must be non-negative")
    k = int(weight)
    thr = int(round((weight - k) * BUCKETS))
    n = F.lit(k) + (hash_bucket(F.col(id_col), seed) < thr).cast("int")
    return (
        df.withColumn("_n_epochs", n)
        .filter(F.col("_n_epochs") > 0)
        .withColumn(
            out_col, F.explode(F.sequence(F.lit(0), F.col("_n_epochs") - 1))
        )
        .drop("_n_epochs")
    )


def global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "shuffle",
) -> DataFrame:
    """(id, shuffle_key, shuffle_rank) — a reproducible global permutation:
    rank 1..N in md5(seed || id) order.  Writing in ``shuffle_rank`` order
    is the deterministic "shuffle the corpus once before training" step.

    The key is the md5 hex string suffixed with the id itself, so the
    order is total even under (astronomically unlikely) hash collisions.

    Scale: rank comes from the two-pass MPP prefix scan
    (:func:`curation.prefix_sum` — range partition by key, local window,
    one row per partition to the driver), never a single-partition global
    window.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.concat(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
            F.lit(":"),
            F.col(id_col).cast("string"),
        ).alias("shuffle_key"),
    )
    return prefix_sum(
        keyed.withColumn("_one", F.lit(1).cast("long")),
        "shuffle_key",
        "_one",
        out_col="shuffle_rank",
    ).select("id", "shuffle_key", F.col("shuffle_rank").cast("long"))


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-vector symmetric int8 quantization for retrieval indices:
    ``scale = max(|x|) / 127``, ``q_i = floor(x_i / scale + 0.5)`` — 4×
    smaller ANN index payloads with bounded error (|x - q*scale| ≤ scale/2).

    Returns (id, dim, scale, q_csv, err_e6):

    - ``q_csv``     the int8 codes, comma-joined (portable across engines)
    - ``err_e6``    floor(1e6 · Σ(x - q·scale)²) — the reconstruction SSE
                    as an integer (sequential left fold, so the float sum
                    is order-identical in Spark and the DuckDB oracle)

    All Column expressions (codegen, no UDF, no shuffle).  Elements are
    cast to double *before* any arithmetic so float→double promotion
    happens at the same point in both engines; ``floor(x + 0.5)`` is used
    instead of ``round`` because round-half modes differ across engines
    while floor over a bit-identical double cannot.
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    scale = F.when(mx > 0.0, mx / F.lit(127.0)).otherwise(F.lit(0.0))
    q = F.transform(
        xd,
        lambda x: F.when(
            F.lit(True) & (mx > 0.0),
            F.floor(x / (mx / F.lit(127.0)) + F.lit(0.5)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    err = F.aggregate(
        F.zip_with(
            xd, q,
            lambda x, qq: (x - qq.cast("double") * scale)
            * (x - qq.cast("double") * scale),
        ),
        F.lit(0.0),
        lambda a, e: a + e,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.col(vec_col)).cast("long").alias("dim"),
        scale.alias("scale"),
        F.array_join(q, ",").alias("q_csv"),
        F.floor(err * F.lit(1000000.0)).cast("long").alias("err_e6"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    strata_cols: list[str],
    n: int,
    seed: str = "wsamp",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, n per stratum, deterministic.

    Efraimidis–Spirakis A-Res (Inf. Proc. Letters 97(5), 2006): give each
    row the key ``u^(1/w)`` for u ~ Uniform(0,1] and keep the n largest
    per stratum — inclusion probability is then proportional to weight
    *without* replacement (the "take the n largest exponentials" trick).
    We rank by the monotone-equivalent ``ln(u)/w`` to stay in well-behaved
    double range, with u derived from the 60-bit md5 hash of
    (seed, id) — the same cross-engine-exact hash as operators/kmv.py —
    so the sample is a pure function of (data, seed) in both Spark and
    the DuckDB oracle.

    Scale notes: the ``rank <= n`` filter over the window is recognized by
    Spark's InferWindowGroupLimit, which inserts a partial WindowGroupLimit
    BEFORE the stratum exchange — executors pre-trim to n per stratum
    map-side, so the shuffle carries O(strata · n), not the corpus
    (plan-asserted in tests/test_weighted_sample.py).  Quality-weighted
    corpus subsetting at 10^12 docs is exactly this shape.
    """
    from pyspark.sql import Window

    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (hv + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*strata_cols).orderBy(
        es_key.desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def shard_assignments(
    df: DataFrame,
    id_col: str,
    docs_per_shard: int,
    seed: str = "shards",
) -> DataFrame:
    """(id, shuffle_rank, shard_idx) — deterministic training-shard
    assignment: the corpus in :func:`global_shuffle` order, cut into
    fixed-size shards of ``docs_per_shard`` consecutive ranks.  Fixed
    ROW counts (not bytes) keep the cut points a pure function of the
    data — greedy byte-packing would depend on scan order and be
    unverifiable; readers wanting byte bounds choose docs_per_shard from
    the corpus's mean document size.

    Scale: the rank is the two-pass MPP prefix scan (no global window);
    the shard index is a projection.  Every epoch/restart recomputes the
    identical assignment from (seed, ids) alone — resumable export with
    no state to persist."""
    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")
    return global_shuffle(df, id_col, seed=seed).withColumn(
        "shard_idx",
        ((F.col("shuffle_rank") - 1) / docs_per_shard).cast("long"),
    )


def export_shards(
    spark,
    catalog,
    docs: DataFrame,
    id_col: str,
    docs_per_shard: int,
    seed: str = "shards",
    table: str = "train_shards",
    payload_cols: Sequence[str] | None = None,
) -> list[str]:
    """Write the shuffled corpus as a catalog TABLE partitioned by shard —
    the dataset-export last mile: one committed partition per training
    shard, written in one wave job and flipped visible in one snapshot
    (a crashed export leaves the previous dataset version intact; the
    snapshot history records every re-export).  Readers stream shard k
    via ``catalog.read_partition(table, str(k))`` with manifest pruning —
    a trainer's data loader maps ranks to shards with no coordinator.

    Returns the committed shard ids (as partition-value strings).
    """
    cols = list(payload_cols) if payload_cols else [
        c for c in docs.columns if c != id_col
    ]
    assigned = shard_assignments(docs, id_col, docs_per_shard, seed)
    data = docs.select(F.col(id_col).alias("id"), *cols).join(
        assigned, on="id"
    )
    # the assignment join is 1:1 on id, so the corpus count IS the export
    # count — counting `docs` avoids executing the join + two-pass prefix
    # scan a second time just to size the shard list
    n = docs.count()
    n_shards = (n + docs_per_shard - 1) // docs_per_shard
    shards = [str(i) for i in range(n_shards)]
    catalog.write_partitions(
        data.withColumn("pshard", F.col("shard_idx").cast("string")),
        table, shards, day_col="pshard",
    )
    # a re-export over a SMALLER corpus writes fewer shards: retire the
    # higher-numbered partitions from the previous version, or readers of
    # "all committed shards" would mix two permutations (stale ranks)
    for stale in sorted(catalog.committed_partitions(table)):
        if stale.isdigit() and int(stale) >= n_shards:
            catalog.drop_partition(
                table, stale, reason=f"re-export: corpus now fills {n_shards} shards"
            )
    catalog.set_table_property(table, "docs_per_shard", int(docs_per_shard))
    catalog.set_table_property(table, "shuffle_seed", seed)
    return shards
