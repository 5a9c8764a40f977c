"""Deduplication operators for web-scale training-data pipelines.

The reference has no dedup (it pushes every parsed point), but a Common-Crawl
style corpus at 10^12 documents is unusable without it; these are the standard
four families, each expressed Spark-first:

- ``exact_dedup``            hash-groupBy on a normalized-text fingerprint.
- ``minhash_signatures`` /
  ``lsh_candidate_pairs`` /
  ``minhash_lsh_dedup``      shingle → MinHash → LSH band-bucket join →
                             exact-Jaccard verify of the candidates.
- ``simhash_dedup``          32-bit SimHash + pigeonhole block join
                             (EXACT for the Hamming radius: distance ≤ 3 with
                             4 blocks ⇒ at least one block is identical).
- ``jaccard_pairs``          exact set-similarity join over distinct shingles
                             (inverted-index self-join — the PPJoin-lite
                             baseline and the verifier for LSH).
- ``embedding_neardup``      exact cosine pairs over an embedding column
                             (small-scale verifier; the scale path is
                             ``similarity.lsh_ann``).

Cross-engine determinism: every hash bottoms out in ``md5`` (identical in
Spark and DuckDB); MinHash permutations are ``(a*h + b) % P`` with the literal
constants below, embedded verbatim in the oracle SQL.

Scale notes (100 TB posture):
- Everything is shingle-level ``explode`` + hash-partitioned joins; no
  driver-side collection, no per-row Python.  Shingle hashing / MinHash /
  SimHash are pure Column expressions inside whole-stage codegen (md5, conv,
  transform, aggregate) — zero UDFs.
- LSH banding turns the O(n²) pair space into per-bucket joins; buckets are
  the shuffle key, so hot buckets (boilerplate shingles) are the skew risk —
  mitigate with a df-frequency cap on shingles (``max_shingle_freq``) exactly
  like stop-shingle removal in PPJoin.
- The exact verifier only touches LSH candidates (broadcast when small,
  shuffle-join on pair keys when not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# MinHash universe: permutations (a*h + b) % MERSENNE31 over 32-bit md5-prefix
# shingle hashes.  Literal constants — the DuckDB oracle embeds the same table.
MERSENNE31 = 2_147_483_647
MINHASH_PERMS: list[tuple[int, int]] = [
    (1_203_114_875, 395_008_973),
    (655_167_469, 1_105_628_401),
    (1_487_655_823, 224_817_767),
    (876_542_219, 1_763_289_041),
    (1_998_765_431, 87_122_923),
    (345_678_917, 1_456_789_211),
    (1_122_334_455, 998_877_665),
    (777_777_783, 1_234_567_891),
    (1_594_336_871, 666_555_443),
    (432_198_765, 1_876_543_209),
    (1_357_924_681, 246_813_579),
    (987_654_323, 135_792_467),
    (1_700_000_009, 555_444_333),
    (250_000_013, 1_999_999_817),
    (1_444_333_229, 314_159_263),
    (271_828_183, 1_618_033_989),
]
LSH_BANDS = 4  # 16 perms = 4 bands × 4 rows

# Hot-bucket guard ON by default: a band bucket of m docs costs m(m-1)/2
# comparisons in the LSH self-join, so one template-boilerplate mega-bucket
# (every page of a site sharing chrome) turns the join quadratic at crawl
# scale.  10k is far above any genuine near-dup cluster's band bucket but
# bounds the worst bucket to ~5e7 pairs; drops are counted and logged
# (lsh_dropped_buckets), never silent.  Pass None to disable.
DEFAULT_MAX_BUCKET = 10_000


def h32(col: Column) -> Column:
    """Deterministic 32-bit hash: first 8 hex chars of md5, as a long.

    Identical in DuckDB: ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def word_shingles(col: Column, k: int = 5) -> Column:
    """Word k-gram shingles as an array<string>.

    Documents with fewer than ``k`` words produce ONE shingle (the whole
    token list joined) so no document silently drops out of the index.
    """
    words = F.split(F.trim(col), r"\s+")
    n = F.size(words)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, k), " "),
    )


def shingle_hashes(col: Column, k: int = 5) -> Column:
    """array<long> of 32-bit shingle hashes (pure codegen, no UDF)."""
    return F.transform(word_shingles(col, k), h32)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups on md5(normalized text).

    Returns one row per distinct fingerprint:
    ``(fingerprint, n_docs, canonical_id)`` — canonical is the min id, the
    usual keep-first policy.  Dedup = semi-join back on canonical_id.
    One shuffle on the fingerprint; trivially scales (group state is O(1)).
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        df.groupBy(fp)
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def incremental_dedup(
    corpus_fps: DataFrame, shard: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deduplicate a NEW shard against an already-kept corpus — the shape
    production dedup actually runs at crawl scale: each snapshot is checked
    against the accumulated corpus's fingerprint manifest (never its text),
    then within itself, and only surviving docs (plus their fingerprints)
    join the corpus.

    ``corpus_fps`` needs a single ``fingerprint`` column (e.g.
    ``exact_dedup(corpus, ...).select("fingerprint")`` or a prior call's
    output).  Returns one row per kept shard doc:
    ``(id, fingerprint, n_shard_dups)`` — keep-first (min id) within the
    shard, drop anything already in the corpus.

    Scale (100 TB posture): the manifest is 16 bytes/doc — at 10¹² docs a
    fingerprint-bucketed table, so the anti-join co-locates without a
    corpus-side shuffle; the shard side is one shuffle on fingerprint
    (groupBy + join share the key, AQE reuses the exchange).  Text never
    moves for the corpus side, which is the entire point at scale.
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    shard_fp = shard.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))
    firsts = shard_fp.groupBy("fingerprint").agg(
        F.min("id").alias("id"), F.count("*").alias("n_shard_dups")
    )
    return firsts.join(
        corpus_fps.select("fingerprint"), "fingerprint", "left_anti"
    ).select("id", "fingerprint", "n_shard_dups")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """(id, sig: array<long>[16]) — MinHash signature per document.

    Signature math is whole-stage-codegen Column expressions over the
    shingle-hash array — the full signature of a document is computed without
    any shuffle (narrow, scan-side).
    """
    hashes = shingle_hashes(F.col(text_col), k)
    sig = F.array(*[
        F.array_min(
            F.transform(hashes, lambda h: (F.lit(a) * (h % MERSENNE31) + F.lit(b)) % MERSENNE31)
        )
        for a, b in MINHASH_PERMS
    ]).alias("sig")
    return df.select(F.col(id_col).alias("id"), sig)


def _banded(sigs: DataFrame) -> DataFrame:
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)],
            ).alias("key"),
        )
        for b in range(LSH_BANDS)
    ])
    return sigs.select("id", F.explode(bands).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, max_bucket_size: int | None = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """Band the signatures and emit candidate pairs ``(id_a < id_b)``.

    Bands explode to (band_idx, band_key) rows; the self-join shuffles on the
    band key — this is THE shuffle of LSH dedup, and its skew profile is the
    shingle-frequency profile.  ``max_bucket_size`` is the hot-bucket guard
    for boilerplate-heavy corpora: a band bucket holding m docs contributes
    m(m-1)/2 within-bucket comparisons, so one million-doc bucket (every page
    sharing a site template) turns the join quadratic.  Buckets over the cap
    are DROPPED — near-dups that collide only in a mega-bucket are template
    artifacts, not content dups (the standard MinHash-at-web-scale trade).
    Use :func:`lsh_dropped_buckets` to count what a cap discards — never cap
    silently.

    The bucket-size window partitions exactly like the self-join shuffle, so
    the guard adds no extra exchange.
    """
    banded = _banded(sigs)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "key")
        banded = (
            banded.withColumn("_bsz", F.count("*").over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def lsh_dropped_buckets(sigs: DataFrame, max_bucket_size: int) -> DataFrame:
    """The band buckets a ``max_bucket_size`` cap would drop:
    ``(band, key, bucket_size)`` — run/aggregate this alongside a capped
    dedup so the discard is a reported counter, not a silent truncation."""
    return (
        _banded(sigs)
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def distinct_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """(id, shingle) rows, distinct per document — the inverted-index input."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
        )
        .distinct()
    )


def _verify_jaccard(cand: DataFrame, ds: DataFrame, min_jaccard: float) -> DataFrame:
    """Exact Jaccard for candidate pairs from per-doc distinct shingle sets."""
    sizes = ds.groupBy("id").agg(F.count("*").alias("n"))
    a = ds.select(F.col("id").alias("id_a"), "shingle")
    b = ds.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_jaccard: float = 0.7,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """MinHash→LSH candidates, then exact-Jaccard verify.

    Output: ``(id_a, id_b, jaccard)`` for LSH-candidate pairs whose true
    Jaccard ≥ threshold.  Probabilistic RECALL comes from the banding (a pair
    the bands miss is not reported — that is the LSH contract); reported pairs
    are exact.  The DuckDB oracle replicates the same bands, so parity is
    end-to-end deterministic.

    ``max_bucket_size`` caps band-bucket size (hot-bucket guard — see
    :func:`lsh_candidate_pairs`); when set and ``log_dropped``, the dropped
    buckets are counted (one small aggregate job) and logged — no silent caps.
    """
    sigs = minhash_signatures(df, id_col, text_col, k)
    if max_bucket_size is not None and log_dropped:
        dropped = lsh_dropped_buckets(sigs, max_bucket_size).count()
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_dedup: dropping %d band buckets over "
                "max_bucket_size=%d (boilerplate guard)", dropped, max_bucket_size
            )
    cand = lsh_candidate_pairs(sigs, max_bucket_size=max_bucket_size)
    ds = distinct_shingles(df, id_col, text_col, k)
    return _verify_jaccard(cand, ds, min_jaccard)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index set-similarity join)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_jaccard: float = 0.7,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold (EXACT, no LSH).

    Inverted-index self-join: only documents sharing ≥1 shingle ever meet.
    ``max_shingle_freq`` drops stop-shingles (df > cap) before the join —
    the standard skew guard for boilerplate at crawl scale.  Note the cap
    changes semantics (capped shingles leave both sets); None = exact.
    """
    ds = distinct_shingles(df, id_col, text_col, k)
    if max_shingle_freq is not None:
        rare = (
            ds.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        ds = ds.join(rare, "shingle")
    a = ds.select(F.col("id").alias("id_a"), "shingle")
    b = ds.select(F.col("id").alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cand, ds, min_jaccard)


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_jaccard: float = 0.7,
) -> DataFrame:
    """Prefix-filtered EXACT set-similarity self-join (AllPairs/PPJoin family:
    Bayardo et al. WWW 2007, Xiao et al. WWW 2008).

    Same output as :func:`jaccard_pairs` — all pairs with shingle-set Jaccard
    ≥ ``min_jaccard``, no approximation — but the inverted index holds only
    each document's PREFIX under a global rarest-first shingle order, not the
    whole set.  The completeness lemma: order all shingles by ascending
    document frequency (ties by shingle); if ``J(A,B) ≥ τ`` then
    ``|A∩B| ≥ τ/(1+τ)·(|A|+|B|) ≥ τ·max(|A|,|B|)`` (using the size bound
    ``τ·|A| ≤ |B| ≤ |A|/τ`` every qualifying pair satisfies), so the FIRST
    common shingle sits within the first ``|d| − ⌈τ·|d|⌉ + 1`` shingles of
    both documents — indexing only that prefix misses nothing.

    Why this is the 100 TB shape: :func:`jaccard_pairs` indexes every
    (doc, shingle) row, so boilerplate shingles shared by millions of pages
    create quadratic candidate buckets unless ``max_shingle_freq`` drops them
    (which CHANGES the answer).  Here the prefix keeps only each document's
    ~(1−τ) RAREST shingles — at τ=0.7, 70 %+ of the index rows vanish and the
    surviving rows are skewed toward low-frequency shingles, exactly the ones
    with small join buckets — while the answer stays bit-identical.  One
    per-document window (bounded by shingle count per doc), one
    size-conditioned equi-join on the prefix shingles, then the shared exact
    verify.  The ε guards keep float ``⌈τ·n⌉`` from rounding UP past the
    exact value (which would shorten a prefix below the complete length);
    rounding down only adds candidates, never loses pairs.
    """
    ds = distinct_shingles(df, id_col, text_col, k)
    dfreq = ds.groupBy("shingle").agg(F.count("*").alias("df_"))
    sizes = ds.groupBy("id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("id").orderBy("df_", "shingle")
    prefix = (
        ds.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "id")
        .filter(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(min_jaccard) * F.col("n") - F.lit(1e-9)) + 1
        )
        .select("id", "shingle", "n")
    )
    a = prefix.select(F.col("id").alias("id_a"), "shingle", F.col("n").alias("n_a"))
    b = prefix.select(F.col("id").alias("id_b"), "shingle", F.col("n").alias("n_b"))
    eps = F.lit(1e-9)
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") >= F.col("n_b") * F.lit(min_jaccard) - eps)
            & (F.col("n_b") >= F.col("n_a") * F.lit(min_jaccard) - eps)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cand, ds, min_jaccard)


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap screen)
# ---------------------------------------------------------------------------

def bloom_decontam(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bits_per_key: int = 16,
    num_hashes: int = 2,
) -> DataFrame:
    """``ngram_decontam`` with a Bloom-bitmap prefilter — identical output,
    different 100 TB cost model.

    ``ngram_decontam`` broadcasts the bench grams as a hash-join table;
    fine to ~10⁷ grams.  A full eval-suite + held-out-document screen can
    reach 10⁹ grams, where the join table (string keys + hash map overhead)
    stops fitting but a Bloom bitmap at 16 bits/key is ~2 GB and still
    broadcasts.  Corpus grams hash JVM-side (``xxhash64``), an Arrow-batched
    pandas UDF tests the bitmap, and only the ~(true hits + FP·10⁻⁴)
    fraction of grams reaches the exact-confirm join + doc-id shuffle — the
    expensive explode→shuffle stage shrinks by the non-overlap factor.

    False positives cannot leak into the output: every Bloom hit is
    confirmed against the real gram set, so the result is bit-identical to
    ``ngram_decontam`` (the driver oracle for both is the same SQL).
    """
    from pyspark.sql.functions import pandas_udf

    grams_of = lambda c: F.array_distinct(word_shingles(c, k))  # noqa: E731
    bench_g = (
        bench.select(F.explode(grams_of(F.col(text_col))).alias("gram"))
        .distinct()
    )
    hv = np.array(
        [r["h"] for r in bench_g.select(F.xxhash64("gram").alias("h")).collect()],
        dtype=np.int64,
    ).astype(np.uint64)
    mbits = ((bits_per_key * max(len(hv), 1) + 63) // 64) * 64
    words = np.zeros(mbits // 64, dtype=np.uint64)
    h1, h2 = hv & np.uint64(0xFFFFFFFF), (hv >> np.uint64(32)) | np.uint64(1)
    for i in range(num_hashes):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(mbits)
        np.bitwise_or.at(
            words,
            (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    bitmap = corpus.sparkSession.sparkContext.broadcast(words)
    nh, mb = num_hashes, mbits

    @pandas_udf("boolean")
    def bloom_maybe(h: pd.Series) -> pd.Series:
        x = h.values.astype(np.uint64)
        a, b = x & np.uint64(0xFFFFFFFF), (x >> np.uint64(32)) | np.uint64(1)
        bm = bitmap.value
        ok = np.ones(len(x), dtype=bool)
        for i in range(nh):
            idx = (a + np.uint64(i) * b) % np.uint64(mb)
            ok &= (
                (bm[(idx >> np.uint64(6)).astype(np.int64)]
                 >> (idx & np.uint64(63))) & np.uint64(1)
            ).astype(bool)
        return pd.Series(ok)

    per_doc = corpus.select(
        F.col(id_col).alias("id"), grams_of(F.col(text_col)).alias("_grams")
    )
    cand = (
        per_doc.select("id", F.explode("_grams").alias("gram"))
        .filter(bloom_maybe(F.xxhash64("gram")))
    )
    confirmed = (
        cand.join(
            F.broadcast(bench_g.withColumn("hit", F.lit(1))), "gram", "left"
        )
        .groupBy("id")
        .agg(F.count("hit").alias("n_contaminated"))
        .filter(F.col("n_contaminated") > 0)
    )
    return (
        confirmed.join(
            per_doc.select("id", F.size("_grams").alias("n_grams")), "id"
        )
        .select(
            "id",
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_grams")).alias("contam_frac"),
        )
    )


def ngram_decontam(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Flag corpus documents that share any word ``k``-gram with a benchmark
    (eval-set) corpus — the standard training-data decontamination screen
    (GPT-3 App. C / PaLM-style 8-gram overlap).

    Returns (id, n_grams, n_contaminated, contam_frac) for contaminated
    documents only: per-doc distinct k-gram count, how many of those appear
    anywhere in the benchmark set, and their ratio.

    Scale: benchmark suites are tiny relative to a crawl (≤ millions of
    grams), so the bench side is distinct-ed and **broadcast** — the corpus
    streams exactly once through explode → broadcast-hash-join → one
    partial-aggregated shuffle on doc id.  No corpus-side self-join, no
    sort-merge exchange; the plan survives a 100× corpus scale-up with the
    broadcast side unchanged.
    """
    def grams(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias(
                "gram"
            ),
        )

    bench_g = grams(bench).select("gram").distinct().withColumn("hit", F.lit(1))
    return (
        grams(corpus)
        .join(F.broadcast(bench_g), "gram", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            "id",
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_grams")).alias("contam_frac"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4  # pigeonhole: hamming ≤ SIMHASH_BLOCKS-1 ⇒ one block equal


def simhash(col: Column) -> Column:
    """32-bit SimHash over whitespace tokens (with multiplicity).

    bit_j(simhash) = 1 iff Σ_tokens (bit_j(h32(token)) ? +1 : -1) > 0.
    Pure Column expressions (aggregate over the token-hash array).
    """
    tokens = F.split(F.trim(col), r"\s+")
    hashes = F.transform(tokens, h32)
    def _vote_merge(j: int):
        def merge(acc, h):
            return acc + F.when(h.bitwiseAND(F.lit(2**j)) != 0, F.lit(1)).otherwise(F.lit(-1))
        return merge

    bits = []
    for j in range(SIMHASH_BITS):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_merge(j))
        bits.append(F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return out


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ ``max_hamming``.

    EXACT for max_hamming ≤ SIMHASH_BLOCKS-1: the 32-bit hash splits into 4
    8-bit blocks; a pair within distance 3 must agree on ≥1 block
    (pigeonhole), so the block-equality join loses nothing.  The join
    shuffles on (block_idx, block_value) — n per-block buckets instead of an
    O(n²) cross join.
    """
    if max_hamming > SIMHASH_BLOCKS - 1:
        raise ValueError("pigeonhole blocking is exact only for hamming <= blocks-1")
    bits_per_block = SIMHASH_BITS // SIMHASH_BLOCKS
    sh = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("blk"),
            (F.shiftright("sh", i * bits_per_block) % (2**bits_per_block)).alias("val"),
        )
        for i in range(SIMHASH_BLOCKS)
    ])
    blocked = sh.select("id", "sh", F.explode(blocks).alias("b")).select(
        "id", "sh", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(b, on=["blk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding cosine near-dup (exact small-scale verifier)
# ---------------------------------------------------------------------------

def dot_f64(a: Column, b: Column) -> Column:
    """Left-to-right double dot product — bit-identical to the oracle's
    ``list_reduce(list_transform(list_zip(...)))`` because IEEE addition in
    the same order is deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_f64(a, b) / (F.sqrt(dot_f64(a, a)) * F.sqrt(dot_f64(b, b)))


def embedding_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.4,
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold — EXACT O(n²) verifier.

    This is the correctness baseline; at corpus scale use
    ``similarity.lsh_ann`` (bucketed, approximate) and reserve this for
    within-bucket verification.  Norms are precomputed once per vector so the
    pair loop only does the cross dot product.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(dot_f64(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                dot_f64(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= min_cosine)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids,
    min_cosine: float = 0.4,
) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pairs: cluster embeddings to their
    nearest centroid, then compare pairs ONLY within a cluster (Abbas et al.
    2023, "SemDeDup" — k-means buckets bound the quadratic term).

    This is the scale path for :func:`embedding_neardup`: the O(n²) blowup
    becomes Σ O(|cluster|²), and at corpus scale ``len(centroids)`` is chosen
    ~ n/target_cluster_size so every cluster's pair loop is bounded.  The
    join shuffles on cluster_id; assignment itself is whole-stage-codegen
    fold dots (``similarity.nearest_centroid_expr``), so the operator is
    value-oracle-able with the centroid literals inlined.

    Recall note (by design, same as the paper): pairs straddling a cluster
    boundary are missed; the exact :func:`embedding_neardup` remains the
    within-bucket verifier.

    Output (cluster_id, id_a, id_b, cos) with id_a < id_b.
    """
    from influxer_spark.operators.similarity import nearest_centroid_expr

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(dot_f64(F.col(vec_col), F.col(vec_col))).alias("norm"),
        nearest_centroid_expr(vec_col, centroids).alias("cluster_id"),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.cluster_id").alias("cluster_id"),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                dot_f64(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= min_cosine)
    )


# ---------------------------------------------------------------------------
# pair → cluster resolution
# ---------------------------------------------------------------------------

def dedup_clusters(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Resolve near-dup PAIRS (id_a, id_b) into clusters: every member maps
    to its cluster's canonical (minimum) id — connected components by
    min-label propagation.

    The training-data decision is made per CLUSTER (keep one canonical doc),
    not per pair: A~B and B~C must collapse A,B,C together even though A~C
    was never emitted by the candidate generator.

    Algorithm: iterate label <- min(label, min over neighbors' labels) until
    fixpoint.  Each iteration is one join + one groupBy on the id key — the
    standard large-scale CC-over-DataFrames loop (converges in O(diameter)
    iterations; near-dup clusters are shallow, typically 2-3).  Raises if
    not converged within ``max_iterations`` (pathological chain clusters).

    Returns (id, canonical_id) for every id that appears in any pair.
    """
    edges = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .union(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
    )
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.least(F.min("dst"), F.first("src")).alias("label"))
        .select("id", F.least("id", "label").alias("label"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    "label", F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut lineage growth
        if changed == 0:
            return labels.withColumnRenamed("label", "canonical_id")
    raise RuntimeError(f"dedup_clusters did not converge in {max_iterations} iterations")


def cluster_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col: str,
) -> DataFrame:
    """The fuzzy-dedup DECISION step: resolve near-dup pairs into clusters
    and keep the best document of each cluster (highest ``order_col``,
    ties → lowest id).  Docs in no pair are their own singleton cluster and
    are always kept.

    Returns one row per document: (id, cluster_id, <order_col>, rnk, keep) —
    ``filter(keep)`` is the deduplicated corpus, and the non-kept rows are
    the audit trail (which near-duplicate shadowed each dropped doc).
    "Keep the best, not the first" matters in practice: crawl near-dup
    clusters mix truncated/boilerplate variants with the full page, and
    canonical-min-id would keep whichever hashed lowest.

    Scale: :func:`dedup_clusters` is the O(diameter) min-label CC loop;
    the cluster map is tiny relative to the corpus (only docs appearing in
    pairs), so the join back is broadcast-able (AQE picks it up), and the
    per-cluster rank window shuffles only on cluster_id with 2-3-row
    groups.
    """
    clusters = dedup_clusters(pairs.select("id_a", "id_b"))
    tagged = (
        docs.select(F.col(id_col).alias("id"), F.col(order_col))
        .join(clusters, "id", "left")
        .select(
            "id",
            F.coalesce("canonical_id", F.col("id")).alias("cluster_id"),
            F.col(order_col).cast("long"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(order_col), F.asc("id")
    )
    rn = F.row_number().over(w)
    return tagged.select(
        "id", "cluster_id", order_col,
        rn.cast("long").alias("rnk"),
        (rn == 1).alias("keep"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_containment: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Directed shingle-CONTAINMENT pairs: C(a→b) = |Sₐ∩S_b| / |Sₐ|.

    Asymmetric set containment catches what Jaccard misses: quotes, partial
    copies, and a short document embedded in a long one (|Sₐ∩S_b| can be all
    of Sₐ while Jaccard stays tiny).  Same inverted-index self-join shape as
    :func:`jaccard_pairs` — one shuffle on the shingle, candidates bounded by
    shared shingles — with the identical ``max_shingle_freq`` stop-shingle
    skew guard.  Emits BOTH directions (a→b and b→a score differently).

    Output: ``(id_a, id_b, containment)`` for ordered pairs with
    C(id_a→id_b) ≥ threshold.
    """
    ds = distinct_shingles(df, id_col, text_col, k)
    if max_shingle_freq is not None:
        rare = (
            ds.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        ds = ds.join(rare, "shingle")
    sizes = ds.groupBy("id").agg(F.count("*").alias("n"))
    a = ds.select(F.col("id").alias("id_a"), "shingle")
    b = ds.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    return (
        inter.join(na, "id_a")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / F.col("n_a")).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def incremental_minhash_dedup(
    corpus_sigs: DataFrame,
    shard: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_agree: int = 8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """FUZZY incremental dedup — the near-dup twin of
    :func:`incremental_dedup`: a new shard is checked against the kept
    corpus's MinHash SIGNATURE manifest (16 longs/doc; corpus text never
    moves), then within itself, keep-first by id.

    Match rule: an LSH band collision nominates the pair (4 of 16
    components already equal), then the pair drops iff ≥ ``min_agree``
    of the 16 signature components agree — the unbiased MinHash Jaccard
    estimate ≥ min_agree/16.  Verification is against the MANIFEST, not
    text: at snapshot scale the corpus's shingle sets are gone, and
    signature agreement is the standard web-scale stand-in (estimate, not
    exact Jaccard — the reported pairs inherit MinHash variance, unlike
    ``minhash_lsh_dedup``'s exact verify which still applies WITHIN a
    shard whose text is present, if callers want it).

    Drop rule is transitive-free and deterministic: a shard doc drops iff
    it matches the corpus OR a SMALLER-id shard doc (whether or not that
    doc itself dropped) — same keep-first discipline as the exact twin.

    ``corpus_sigs``: (id, sig) rows from :func:`minhash_signatures` —
    pass the stored manifest in production.  Returns kept shard ids:
    ``(id,)``.

    Scale: band buckets bound the join exactly as in
    ``lsh_candidate_pairs`` (shared hot-bucket cap over the UNION of both
    sides — a template bucket is hot regardless of which side fills it);
    signature frames are 16 longs/doc wide.
    """
    sigs_s = minhash_signatures(shard, id_col, text_col, k)
    banded = _banded(corpus_sigs).withColumn("side", F.lit("c")).unionByName(
        _banded(sigs_s).withColumn("side", F.lit("s"))
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "key")
        banded = (
            banded.withColumn("_bsz", F.count("*").over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    s_side = banded.filter(F.col("side") == "s").select(
        "band", "key", F.col("id").alias("sid")
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    )
    # shard vs corpus: any qualifying corpus match drops the shard doc
    c_side = banded.filter(F.col("side") == "c").select(
        "band", "key", F.col("id").alias("cid")
    )
    cand_sc = s_side.join(c_side, ["band", "key"]).select("sid", "cid").distinct()
    drop_corpus = (
        cand_sc.join(
            sigs_s.select(F.col("id").alias("sid"), F.col("sig").alias("sig_a")),
            "sid",
        )
        .join(
            corpus_sigs.select(
                F.col("id").alias("cid"), F.col("sig").alias("sig_b")
            ),
            "cid",
        )
        .filter(agree >= min_agree)
        .select("sid")
        .distinct()
    )
    # within shard: keep-first — a doc drops to any smaller-id match
    s2 = s_side.select("band", "key", F.col("sid").alias("sid_b"))
    cand_ss = (
        s_side.join(s2, ["band", "key"])
        .filter(F.col("sid_b") < F.col("sid"))
        .select("sid", "sid_b")
        .distinct()
    )
    drop_shard = (
        cand_ss.join(
            sigs_s.select(F.col("id").alias("sid"), F.col("sig").alias("sig_a")),
            "sid",
        )
        .join(
            sigs_s.select(
                F.col("id").alias("sid_b"), F.col("sig").alias("sig_b")
            ),
            "sid_b",
        )
        .filter(agree >= min_agree)
        .select("sid")
        .distinct()
    )
    dropped = drop_corpus.unionByName(drop_shard).distinct()
    return (
        sigs_s.select(F.col("id"))
        .join(dropped.select(F.col("sid").alias("id")), "id", "left_anti")
    )


def ngram_novelty(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    k-grams that appear in NO OTHER document of the corpus — the inverse
    of the boilerplate/memorization signal (decontamination asks "is this
    gram in the eval set?"; novelty asks "is this gram anywhere else at
    all?").  Low novelty = templated or heavily duplicated content worth
    down-weighting in a mixture; high = fresh text.

    Returns (id, n_grams, n_novel, novelty_frac) for every document with
    at least one gram.

    Scale: one explode → one gram-keyed partial-aggregated shuffle to
    count per-gram DOC FREQUENCY, then one shuffle back on doc id.  The
    gram DF table scales with corpus size, so unlike decontam's broadcast
    bench there is no broadcast here — both joins are plain hash
    exchanges on high-cardinality keys, the shape AQE handles.  A gram is
    novel iff its document frequency is exactly 1 (it can still repeat
    WITHIN the document — novelty is a cross-doc property).
    """
    g = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias(
            "gram"
        ),
    )
    df_counts = g.groupBy("gram").agg(F.count("*").alias("_df"))
    return (
        g.join(df_counts, "gram")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "id",
            "n_grams",
            "n_novel",
            (F.col("n_novel") / F.col("n_grams")).alias("novelty_frac"),
        )
    )


def semantic_decontam(
    corpus: DataFrame,
    evalset: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.8,
) -> DataFrame:
    """Embedding-similarity decontamination — the third screen beside the
    exact n-gram one (:func:`ngram_decontam`) and its Bloom-prefiltered
    twin (:func:`bloom_decontam`): a paraphrased or reformatted benchmark
    item shares no 8-gram with its source but still sits next to it in
    embedding space.  Flags every corpus document whose cosine against
    ANY eval vector reaches the threshold, with the best-matching eval id
    as evidence (max cosine, ties by eval id ascending).

    Plan: the eval set is the SMALL side by definition (benchmarks are
    thousands of items, the corpus is the 10^12 side) — broadcast it, the
    corpus streams once, per-corpus-row max via one groupBy.  For eval
    sets past broadcast size, pre-bucket both sides with
    ``similarity.with_lsh_bucket`` and join on the bucket instead.

    Output: (id, eval_id, cos) — one row per CONTAMINATED corpus doc.
    """
    # zero-norm vectors (padding / failed-embedding rows) would make
    # cos = 0/0 = NaN, and Spark orders NaN ABOVE every number — one
    # all-zero eval vector would flag the entire corpus.  They carry no
    # direction, so they can never evidence contamination: drop them.
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cvec"),
        F.sqrt(dot_f64(F.col(vec_col), F.col(vec_col))).alias("cnorm"),
    ).filter(F.col("cnorm") > 0)
    e = evalset.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).alias("evec"),
        F.sqrt(dot_f64(F.col(vec_col), F.col(vec_col))).alias("enorm"),
    ).filter(F.col("enorm") > 0)
    scored = c.join(F.broadcast(e), F.lit(True)).select(
        "id",
        "eval_id",
        (
            dot_f64(F.col("cvec"), F.col("evec"))
            / (F.col("cnorm") * F.col("enorm"))
        ).alias("cos"),
    ).filter(F.col("cos") >= F.lit(float(min_cosine)))
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("eval_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("id", "eval_id", "cos")
    )
