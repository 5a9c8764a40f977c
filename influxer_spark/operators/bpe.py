"""Distributed BPE tokenizer training + encoding over a document corpus.

The one tokenizer-pipeline operator a 100 TB training-data engine must
have: learn byte-pair-encoding merges from the corpus (Sennrich, Haddow,
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016) and encode documents with the learned merge table.

Why this is Spark-shaped despite being an iterative algorithm:

- BPE trains on the UNIQUE-WORD frequency table, not the raw corpus.
  The single corpus-sized job is the whitespace word count (one shuffle
  with map-side combine); at 10^12 documents that table is ~10^8 rows —
  four orders of magnitude smaller than the corpus — and every training
  iteration touches only it.
- Each iteration is (a) adjacent-pair counting: explode the symbol
  arrays, groupBy the pair, weighted by word count — one bounded
  shuffle; (b) argmax on the driver (one row: the pair vocabulary is
  small); (c) applying the merge: a pure-Column left-to-right
  ``F.aggregate`` fold over each word's symbol array — whole-stage
  codegen, no Python, no shuffle.
- The fold is ``localCheckpoint()``-ed each iteration so the plan stays
  depth-1 instead of accreting one lambda per merge (10k merges would
  otherwise build a 10k-deep expression tree).
- The scale path (``bpe_train`` default) re-counts pairs INCREMENTALLY:
  a merge changes pair counts only inside words that contain the merged
  pair, so each iteration after the first counts pairs over that
  (usually tiny) slice, diffs against the slice's previous pairs, and
  applies the delta to a persisted global pair-count frame.  The naive
  full-recount path (``recount="full"``) is kept as the reference
  kernel — the property tests pin both paths to identical merge lists
  (the Gorilla reference-kernel/vectorized-path discipline).

Determinism contract (pinned by tests, stated because Sennrich's
reference leaves ties unspecified): the winning pair maximizes summed
word frequency, ties broken by lexicographically smallest ``(left,
right)``.  Pair counts within a word count overlapping occurrences the
way the reference implementation's ``zip(syms, syms[1:])`` does, and a
merge applies left-to-right (after merging positions i,i+1 the scan
resumes at i+2) — the exact semantics of the published reference code.

Encoding also rides the unique-word table: the learned merges are
applied per DISTINCT word (the same rank-greedy loop HuggingFace
tokenizers use, as an Arrow-batched pandas UDF whose cost is bounded by
the vocabulary, not the corpus), then joined back to the exploded
corpus and re-assembled in word order.  No per-row Python ever sees the
corpus — only the unique-word frame does.

End-of-word handling follows the paper: the final character of each
word carries a ``</w>`` suffix, so learned subwords distinguish
word-internal from word-final positions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"

# ---------------------------------------------------------------------------
# reference kernel (pure Python, used by tests and by the per-word encoder)
# ---------------------------------------------------------------------------


def ref_word_symbols(word: str) -> list[str]:
    """Initial symbol sequence: characters, last one suffixed with EOW."""
    chars = list(word)
    if chars:
        chars[-1] = chars[-1] + EOW
    return chars


def ref_pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def ref_merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Left-to-right single-pass merge of ``pair`` inside one word."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_bpe_train(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Reference trainer over a word-frequency dict.  Returns the merge
    list in learned order.  Stops early when no pair occurs twice—
    merging a count-1 pair is never useful and keeps the output stable
    under corpus sharding."""
    vocab = {tuple(ref_word_symbols(w)): n for w, n in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = ref_pair_counts(vocab)
        if not counts:
            break
        # deterministic argmax: max count, then lexicographically smallest pair
        bc = max(counts.values())
        best = min(p for p, c in counts.items() if c == bc)
        if counts[best] < 2:
            break
        merges.append(best)
        # merging never collides two distinct words: the symbol
        # concatenation always reconstructs word+EOW, unique per word
        vocab = {ref_merge_word(s, best): n for s, n in vocab.items()}
    return merges


def ref_bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy encoding of one word (the HuggingFace/GPT-2 algorithm):
    repeatedly merge the present pair with the LOWEST learned rank until
    none of the word's pairs were learned."""
    syms = tuple(ref_word_symbols(word))
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        syms = ref_merge_word(syms, best)
    return list(syms)


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

_SYMS_INIT = (
    "transform(split(_word, ''), (c, i) -> "
    f"if(i = size(split(_word, '')) - 1, concat(c, '{EOW}'), c))"
)


def word_count_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wcount) over whitespace tokens — the ONLY corpus-sized job
    in BPE training.  One shuffle with map-side combine; everything
    downstream is vocabulary-sized."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_word")
    return (
        df.select(w)
        .where(F.col("_word") != "")
        .groupBy("_word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _with_syms(words: DataFrame) -> DataFrame:
    return words.select(
        "_word", "wcount", F.expr(_SYMS_INIT).alias("syms")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, pcount) — adjacent pairs weighted by word count.
    Overlapping occurrences count, matching the reference kernel's
    ``zip(syms, syms[1:])``."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS left, element_at(syms, i + 2) AS right))"
    )
    return (
        words.where(F.size("syms") >= 2)
        .select(F.col("wcount"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("wcount").alias("pcount"))
    )


def _best_pair(pair_counts: DataFrame) -> tuple[str, str, int] | None:
    row = (
        pair_counts.orderBy(
            F.desc("pcount"), F.asc("left"), F.asc("right")
        )
        .limit(1)
        .collect()
    )
    if not row or row[0]["pcount"] < 2:
        return None
    r = row[0]
    return (r["left"], r["right"], int(r["pcount"]))


def _merge_expr(left: str, right: str) -> str:
    """Left-to-right fold applying one merge inside a symbol array —
    pure Column expression (whole-stage codegen, zero Python).  The fold
    is exactly the reference's resume-at-i+2 single pass: the merged
    token ``left+right`` can never re-trigger as the LEFT of the same
    pair (that would need ``left+right == left``, impossible for a
    non-empty ``right``), so no scan-position flag is needed."""
    a = _sq(left)
    b = _sq(right)
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), "
        "  (acc, x) -> if(size(acc) > 0 "
        f"              AND element_at(acc, -1) = '{a}' AND x = '{b}', "
        f"    concat(slice(acc, 1, size(acc) - 1), array('{a}{b}')), "
        "    concat(acc, array(x))))"
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    recount: str = "incremental",
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a document corpus.  Returns a
    DataFrame (rank INT, left STRING, right STRING, pcount BIGINT) in
    learned order — the merge table downstream ``bpe_encode`` consumes.

    ``recount="full"`` re-counts every pair each iteration (reference
    path); ``"incremental"`` (default, the 100 TB path) re-counts only
    words containing the winning pair and applies the count delta to a
    persisted global pair frame — per-iteration cost proportional to the
    merge's footprint, not the vocabulary.
    """
    if recount not in ("full", "incremental"):
        raise ValueError(f"recount must be 'full' or 'incremental', got {recount!r}")
    spark = df.sparkSession
    words = _with_syms(word_count_table(df, text_col)).localCheckpoint()
    npart = max(1, words.rdd.getNumPartitions())

    merges: list[tuple[int, str, str, int]] = []
    pairs = _pair_counts(words).localCheckpoint() if recount == "incremental" else None

    for rank in range(num_merges):
        cur = pairs if pairs is not None else _pair_counts(words)
        best = _best_pair(cur)
        if best is None:
            break
        left, right, pcount = best
        merges.append((rank, left, right, pcount))

        # cheap prefilter (both symbols present) — the exact adjacency
        # test rides inside the fold itself: words where the fold is a
        # no-op produce identical syms and a zero delta.
        hit = words.where(
            F.arrays_overlap(F.col("syms"), F.array(F.lit(left)))
            & F.arrays_overlap(F.col("syms"), F.array(F.lit(right)))
        )
        merged_hit = hit.select(
            "_word", "wcount", F.expr(_merge_expr(left, right)).alias("syms")
        )

        if pairs is not None:
            # delta = pairs(after) - pairs(before) over the hit slice only
            before = _pair_counts(hit).withColumnRenamed("pcount", "c_before")
            after = _pair_counts(merged_hit).withColumnRenamed("pcount", "c_after")
            delta = (
                before.join(after, ["left", "right"], "full_outer")
                .select(
                    "left",
                    "right",
                    (
                        F.coalesce("c_after", F.lit(0))
                        - F.coalesce("c_before", F.lit(0))
                    ).alias("d"),
                )
                .where(F.col("d") != 0)
            )
            pairs = (
                pairs.join(delta, ["left", "right"], "full_outer")
                .select(
                    "left",
                    "right",
                    (
                        F.coalesce("pcount", F.lit(0)) + F.coalesce("d", F.lit(0))
                    ).alias("pcount"),
                )
                .where(F.col("pcount") > 0)
                .localCheckpoint()
            )

        miss = words.where(
            ~(
                F.arrays_overlap(F.col("syms"), F.array(F.lit(left)))
                & F.arrays_overlap(F.col("syms"), F.array(F.lit(right)))
            )
        )
        # union doubles the partition count; coalesce (narrow, no shuffle)
        # pins it or every iteration's checkpoint would double task counts
        words = miss.unionByName(merged_hit).coalesce(npart).localCheckpoint()

    return spark.createDataFrame(
        merges,
        T.StructType(
            [
                T.StructField("rank", T.IntegerType(), False),
                T.StructField("left", T.StringType(), False),
                T.StructField("right", T.StringType(), False),
                T.StructField("pcount", T.LongType(), False),
            ]
        ),
    )


def _sq(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def vocab_table(df: DataFrame, text_col: str, merges: DataFrame) -> DataFrame:
    """(token STRING, id INT) — the finished tokenizer artifact.  Base
    symbols (every character and character+EOW the corpus produces) take
    ids 0..B−1 in lexicographic order; merged tokens follow in learned
    rank order (the GPT-2-style convention: id order reproduces training
    order, so two trainings on the same corpus yield identical tables).
    Base extraction is one pass over the unique-word frame."""
    spark = df.sparkSession
    base = (
        _with_syms(word_count_table(df, text_col))
        .select(F.explode("syms").alias("token"))
        .distinct()
        .orderBy("token")
        .collect()
    )
    rows = [(r["token"], i) for i, r in enumerate(base)]
    b = len(rows)
    rows += [
        (r["left"] + r["right"], b + int(r["rank"]))
        for r in merges.select("rank", "left", "right")
        .orderBy("rank").collect()
    ]
    return spark.createDataFrame(rows, ["token", "id"]).select(
        "token", F.col("id").cast("int").alias("id")
    )


def bpe_encode_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: DataFrame,
    vocab: DataFrame,
) -> DataFrame:
    """(id, token_ids ARRAY<INT>, n_tokens) — encode then map tokens to
    vocab ids with one broadcast join on the token string (every token
    bpe_encode emits is in the vocab by construction: it is either a
    base symbol or a merge output).  The training-shard export shape."""
    enc = bpe_encode(df, id_col, text_col, merges)
    tok = enc.select("id", F.posexplode("tokens").alias("pos", "token"))
    v = vocab.select("token", F.col("id").alias("tid"))
    return (
        tok.join(F.broadcast(v), "token")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("token_ids")
        )
        .select(
            "id", "token_ids",
            F.size("token_ids").cast("long").alias("n_tokens"),
        )
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: DataFrame,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode documents with a learned merge table.  Returns (id, tokens
    ARRAY<STRING>, n_tokens BIGINT) with tokens in document word order.

    Plan shape (the reason this survives 10^12 docs): the rank-greedy
    merge loop runs once per DISTINCT word — an Arrow-batched pandas UDF
    over the unique-word frame, cost bounded by vocabulary size — and
    the corpus only ever sees a join against that frame (broadcast when
    the vocab is small) plus a posexplode/regroup to restore word order.
    """
    spark = df.sparkSession
    ranks = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.select("rank", "left", "right").collect()
    }
    branks = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode_word(words: pd.Series) -> pd.Series:
        rk = branks.value
        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = ref_bpe_encode(w, rk)
            return got

        return words.map(enc)

    toks = F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+"))
    exploded = (
        df.select(F.col(id_col).alias("id"), toks.alias("pos", "_word"))
        .where(F.col("_word") != "")
    )
    vocab = exploded.select("_word").distinct().select(
        "_word", encode_word("_word").alias("wtoks")
    )
    if broadcast_vocab:
        # right for the common case (vocab ≪ corpus); pass False when the
        # unique-word frame outgrows executor memory — the join then
        # shuffles both sides on the word, still corpus-linear.
        vocab = F.broadcast(vocab)
    return (
        exploded.join(vocab, "_word")
        .groupBy("id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "wtoks"))
                ).wtoks
            ).alias("tokens")
        )
        .select("id", "tokens", F.size("tokens").cast("long").alias("n_tokens"))
    )
