"""Unit tests for dedup operators (exact / MinHash-LSH / SimHash / Jaccard /
embedding cosine) on hand-crafted corpora with known duplicate structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import dedup as D

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy cat again and again today"
OTHER = "completely different content about spark shuffles and parquet files here"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE.upper()),        # exact dup of 1 after normalization
            (3, "  " + BASE + " "),   # exact dup of 1 after normalization
            (4, NEAR),                # near dup of 1 (1 word of 13 changed)
            (5, OTHER),
        ],
        ["doc_id", "text"],
    )


def test_exact_dedup_groups(docs):
    out = {r["canonical_id"]: r["n_docs"] for r in D.exact_dedup(docs, "doc_id", "text").collect()}
    assert out == {1: 3, 4: 1, 5: 1}


def test_incremental_dedup_shard(spark, docs):
    """New shard vs corpus manifest: corpus-known texts drop (even with a
    new id), within-shard dups keep-first, fresh texts survive."""
    manifest = D.exact_dedup(docs, "doc_id", "text").select("fingerprint")
    shard = spark.createDataFrame(
        [
            (10, BASE),           # known to corpus (exact fp) → drop
            (11, BASE.upper()),   # normalizes to corpus fp → drop
            (12, "brand new text"),
            (13, "brand new text"),   # within-shard dup → keep-first 12
            (14, "another new one"),
        ],
        ["doc_id", "text"],
    )
    kept = {r["id"]: r["n_shard_dups"]
            for r in D.incremental_dedup(manifest, shard, "doc_id", "text").collect()}
    assert kept == {12: 2, 14: 1}


def test_incremental_dedup_empty_corpus(spark, docs):
    """With an empty manifest the result is plain within-shard exact dedup."""
    empty = D.exact_dedup(docs, "doc_id", "text").select("fingerprint").limit(0)
    kept = D.incremental_dedup(empty, docs, "doc_id", "text")
    exact = D.exact_dedup(docs, "doc_id", "text")
    assert (
        sorted((r["id"], r["n_shard_dups"]) for r in kept.collect())
        == sorted((r["canonical_id"], r["n_docs"]) for r in exact.collect())
    )


def test_jaccard_pairs_exact(docs):
    rows = D.jaccard_pairs(docs, "doc_id", "text", k=5, min_jaccard=0.2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
    assert pairs[(1, 3)] == 1.0  # whitespace-trimmed → identical shingle sets
    # doc 4 differs from doc 1 in one word → shares some 5-shingles
    assert 0.2 <= pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs and (4, 5) not in pairs


@pytest.mark.parametrize("thr", [0.2, 0.5, 0.7, 0.9])
def test_prefix_filter_equals_brute(spark, thr):
    """PPJoin prefix filter is exact-complete: output bit-equals the full
    inverted-index join at every threshold, on a corpus with near-dups at
    several similarity levels."""
    words = "w{} x{} y{} z{}".format
    rows = [(i, " ".join(f"tok{j}" for j in range(20))) for i in range(3)]
    rows += [
        (10, " ".join(f"tok{j}" for j in range(19)) + " CHANGED"),
        (11, " ".join(f"tok{j}" for j in range(15)) + " a b c d e"),
        (12, " ".join(f"alt{j}" for j in range(20))),
        (13, " ".join(f"alt{j}" for j in range(10)) + " " + " ".join(f"tok{j}" for j in range(10))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    brute = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in D.jaccard_pairs(docs, "doc_id", "text", k=3, min_jaccard=thr).collect()
    )
    pp = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in D.prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", k=3, min_jaccard=thr
        ).collect()
    )
    assert pp == brute
    if thr <= 0.5:
        assert pp, "corpus should produce pairs at low thresholds"


def test_prefix_filter_exact_threshold_boundary(spark):
    """A pair whose Jaccard is EXACTLY τ must survive the float ⌈τ·n⌉ prefix
    math (the ε guard): two 4-shingle sets sharing 2 shingles → J = 1/3."""
    # k=1 shingles = words; A={a,b,c,d}, B={a,b,e,f}: inter=2, union=6, J=1/3
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b e f")], ["doc_id", "text"]
    )
    thr = 1.0 / 3.0
    out = D.prefix_filter_jaccard_pairs(docs, "doc_id", "text", k=1, min_jaccard=thr).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_prefix_filter_index_is_smaller(spark):
    """The point of the filter: the prefix index holds strictly fewer rows
    than the full inverted index at high τ (~(1−τ)·rows + 1 per doc)."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(30))) for i in range(5)],
        ["doc_id", "text"],
    )
    ds = D.distinct_shingles(docs, "doc_id", "text", k=3)
    full_rows = ds.count()
    n = 28  # 30 words → 28 3-shingles, all distinct per doc
    tau = 0.8
    expected_prefix = n - int(-(-tau * n // 1)) + 1  # n − ⌈τn⌉ + 1 = 28−23+1 = 6
    assert expected_prefix * 5 < full_rows / 2


def test_jaccard_case_sensitivity(docs):
    # shingling is NOT normalized: doc 2 (uppercase) shares no shingle with 4
    rows = D.jaccard_pairs(docs, "doc_id", "text", k=5, min_jaccard=0.01).collect()
    assert all(not (r["id_a"] == 2 and r["id_b"] == 4) for r in rows)


def test_minhash_identical_signatures(spark, docs):
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[3]           # whitespace-trimmed → same shingles
    assert len(sigs[1]) == len(D.MINHASH_PERMS)
    assert sigs[1] != sigs[5]


def test_minhash_lsh_finds_identical_and_near(docs):
    rows = D.minhash_lsh_dedup(docs, "doc_id", "text", k=5, min_jaccard=0.2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 3) in pairs              # identical docs always collide in LSH
    assert all(5 not in p for p in pairs)


def test_simhash_near_docs_have_close_hashes(spark):
    df = spark.createDataFrame([(1, BASE), (2, NEAR), (3, OTHER)], ["doc_id", "text"])
    sh = {r["id"]: r["sh"] for r in df.select(
        F.col("doc_id").alias("id"), D.simhash(F.col("text")).alias("sh")
    ).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])
    assert 0 <= sh[1] < 2**32


def test_simhash_dedup_pairs(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, OTHER)], ["doc_id", "text"]
    )
    rows = D.simhash_dedup(df, "doc_id", "text", max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert pairs[(1, 2)] == 0
    assert (1, 3) not in pairs


def test_simhash_blocking_radius_guard(spark, docs):
    with pytest.raises(ValueError):
        D.simhash_dedup(docs, "doc_id", "text", max_hamming=4)


def test_jaccard_stop_shingle_cap(spark):
    # a shingle present in every doc is dropped by the frequency cap
    df = spark.createDataFrame(
        [(i, f"common boilerplate footer text here unique{i} a b c d") for i in range(4)],
        ["doc_id", "text"],
    )
    exact = D.jaccard_pairs(df, "doc_id", "text", k=5, min_jaccard=0.01)
    capped = D.jaccard_pairs(df, "doc_id", "text", k=5, min_jaccard=0.01, max_shingle_freq=2)
    assert capped.count() < exact.count()


def test_embedding_neardup(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # ~parallel to 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),     # antiparallel
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    rows = D.embedding_neardup(df, "vec_id", "embedding", min_cosine=0.95).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert pairs == {(1, 2)}


def test_h32_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("hello",), ("spark graft",)], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", D.h32(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        d = duckdb.sql(
            f"SELECT CAST('0x' || substr(md5('{s}'), 1, 8) AS BIGINT)"
        ).fetchone()[0]
        assert h == d


def test_dedup_clusters_transitive(spark):
    from influxer_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 4), (7, 8), (8, 9), (9, 1)],  # {1,2,3,7,8,9},{4,5}
        ["id_a", "id_b"],
    )
    got = {r["id"]: r["canonical_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 8: 1, 9: 1, 4: 4, 5: 4}


def test_dedup_clusters_from_lsh_pairs(spark, docs):
    from influxer_spark.operators.dedup import dedup_clusters, minhash_lsh_dedup

    pairs = minhash_lsh_dedup(docs, "doc_id", "text", k=3, min_jaccard=0.5)
    if pairs.count() == 0:
        return
    cl = dedup_clusters(pairs.select("id_a", "id_b"))
    # canonical is the min id of each cluster and a member of it
    assert cl.filter(F.col("canonical_id") > F.col("id")).count() == 0


def test_lsh_hot_bucket_guard(spark):
    """A pathological boilerplate corpus (every doc identical template) puts
    all docs in the same band buckets; the cap bounds the within-bucket join
    and the dropped buckets are reported, never silently discarded."""
    from influxer_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_lsh_dedup,
        minhash_signatures,
    )

    boiler = "copyright footer navigation menu subscribe newsletter terms "
    rows = [(i, boiler * 4) for i in range(40)]  # identical template text
    rows += [(100, "a genuinely unique document about owls and rivers flowing"),
             (101, "a genuinely unique document about owls and rivers flowing")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    sigs = minhash_signatures(docs, "doc_id", "text", k=5)
    # uncapped: the 40-doc template bucket yields 40*39/2 pairs per band
    assert lsh_candidate_pairs(sigs).count() >= 40 * 39 // 2
    # capped: template buckets (size 40 > 10) dropped; the unique near-pair
    # (bucket size 2) survives
    capped = lsh_candidate_pairs(sigs, max_bucket_size=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert pairs == {(100, 101)}
    # and the discard is observable, not silent
    dropped = lsh_dropped_buckets(sigs, max_bucket_size=10).collect()
    assert len(dropped) >= 1 and all(r["bucket_size"] == 40 for r in dropped)
    # end-to-end: capped dedup still verifies the surviving pair exactly
    out = minhash_lsh_dedup(docs, "doc_id", "text", k=5, min_jaccard=0.7,
                            max_bucket_size=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


def test_lsh_guard_default_on():
    """The hot-bucket guard is the DEFAULT (round-2 verdict ask): callers that
    don't opt in still get bounded band buckets with logged drops."""
    import inspect

    from influxer_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET,
        lsh_candidate_pairs,
        minhash_lsh_dedup,
    )

    assert DEFAULT_MAX_BUCKET == 10_000
    for fn in (lsh_candidate_pairs, minhash_lsh_dedup):
        default = inspect.signature(fn).parameters["max_bucket_size"].default
        assert default == DEFAULT_MAX_BUCKET, fn.__name__


def test_ngram_decontam_flags_planted_overlap(spark):
    from influxer_spark.operators.dedup import ngram_decontam

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # contains the bench 4-gram "beta gamma delta epsilon"
            (1, "zz beta gamma delta epsilon yy"),
            # no 4-gram overlap
            (2, "one two three four five"),
        ],
        ["doc_id", "text"],
    )
    out = ngram_decontam(corpus, bench, "doc_id", "text", k=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == 1
    assert r["n_grams"] == 3            # 6 words → 3 distinct 4-grams
    assert r["n_contaminated"] == 1     # only "beta gamma delta epsilon"
    assert r["contam_frac"] == 1 / 3


def _decontam_frames(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "he said the quick brown fox jumps over everything"),
            (2, "totally unrelated text about spark shuffles and joins"),
            (3, "the lazy dog sleeps all day long in the sun"),
        ],
        ["doc_id", "text"],
    )
    return corpus, bench


def test_bloom_decontam_equals_exact(spark):
    corpus, bench = _decontam_frames(spark)
    exact = D.ngram_decontam(corpus, bench, "doc_id", "text", k=4)
    bloom = D.bloom_decontam(corpus, bench, "doc_id", "text", k=4)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(bloom) == key(exact) and len(key(exact)) > 0


def test_bloom_decontam_fp_flood_still_exact(spark):
    """1 bit/key + 1 hash ≈ every probe is a maybe — the confirm join must
    still kill all false positives, leaving the exact answer."""
    corpus, bench = _decontam_frames(spark)
    exact = D.ngram_decontam(corpus, bench, "doc_id", "text", k=4)
    flooded = D.bloom_decontam(
        corpus, bench, "doc_id", "text", k=4, bits_per_key=1, num_hashes=1
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(flooded) == key(exact)


def test_cluster_keep_transitive_best_per_cluster(spark):
    from influxer_spark.operators.dedup import cluster_keep

    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (4, 50), (5, 999)],
        ["doc_id", "n_chars"],
    )
    # A~B and B~C: 1,2,3 collapse transitively; 4 pairs with nobody... but
    # include (4,1) to make one 4-member cluster; 5 is a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 1)], ["id_a", "id_b"]
    )
    rows = {r["id"]: r for r in cluster_keep(docs, pairs, "doc_id", "n_chars").collect()}
    assert len(rows) == 5
    # all four connected docs share one cluster (min id = 1)
    assert {rows[i]["cluster_id"] for i in (1, 2, 3, 4)} == {1}
    # keeper is the HIGHEST n_chars (id 2), not the canonical min id
    assert rows[2]["keep"] and rows[2]["rnk"] == 1
    assert not rows[1]["keep"] and not rows[3]["keep"] and not rows[4]["keep"]
    # singleton keeps itself
    assert rows[5]["cluster_id"] == 5 and rows[5]["keep"]
    # ranks within the big cluster follow n_chars desc, id asc
    order = sorted((rows[i]["rnk"], i) for i in (1, 2, 3, 4))
    assert [i for _, i in order] == [2, 3, 1, 4]


def test_semantic_dedup_single_cluster_equals_exact(spark):
    """One cluster = no pruning: semantic_dedup must equal embedding_neardup."""
    import numpy as np
    from influxer_spark.operators import similarity as S

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((30, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    cent = S.ivf_random_centroids(8, 1)
    sem = D.semantic_dedup(df, "vec_id", "embedding", cent, 0.2).collect()
    exact = D.embedding_neardup(df, "vec_id", "embedding", 0.2).collect()
    assert sorted((r["id_a"], r["id_b"], r["cos"]) for r in sem) == sorted(
        (r["id_a"], r["id_b"], r["cos"]) for r in exact
    )
    assert all(r["cluster_id"] == 0 for r in sem)


def test_semantic_dedup_is_within_cluster_subset_of_exact(spark):
    """Pairs are a subset of the exact pairs, with bit-identical cosines,
    and both sides of every pair share a cluster."""
    import numpy as np
    from influxer_spark.operators import similarity as S

    rng = np.random.default_rng(6)
    mat = rng.standard_normal((40, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    cent = S.ivf_random_centroids(8, 4)
    sem = D.semantic_dedup(df, "vec_id", "embedding", cent, 0.1).collect()
    exact = {(r["id_a"], r["id_b"]): r["cos"]
             for r in D.embedding_neardup(df, "vec_id", "embedding", 0.1).collect()}
    assign = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", S.nearest_centroid_expr("embedding", cent).alias("c")
    ).collect()}
    assert len(sem) >= 1
    for r in sem:
        assert exact[(r["id_a"], r["id_b"])] == r["cos"]
        assert assign[r["id_a"]] == assign[r["id_b"]] == r["cluster_id"]


def test_containment_pairs_directed(spark):
    """Containment is ASYMMETRIC: a short quote embedded in a long document
    scores ~1.0 in the quote→document direction but low the other way
    (the case Jaccard misses)."""
    from influxer_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = ("intro words here " + quote +
                " and then a very long tail " + "filler words repeated " * 10)
    rows = [(1, quote), (2, long_doc), (3, "completely unrelated text body")]
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_pairs(
               spark.createDataFrame(rows, ["doc_id", "text"]),
               "doc_id", "text", k=3, min_containment=0.5).collect()}

    assert (1, 2) in out and out[(1, 2)] >= 0.9   # quote ⊂ long doc
    assert (2, 1) not in out                      # reverse direction is low
    assert all(3 not in pair for pair in out)


def test_incremental_minhash_fuzzy_shard(spark):
    """Fuzzy snapshot dedup against a signature-only corpus manifest:
    exact recrawls drop at 16/16 agreement, a lightly-edited near-dup
    drops at >=8/16, an unrelated doc survives, and keep-first applies to
    within-shard near-dup pairs."""
    from influxer_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy stone bridge near the river"
    )
    other = (
        "completely different subject matter entirely about compiler "
        "optimization passes and register allocation in modern backends"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], ["doc_id", "text"]
    )
    shard = spark.createDataFrame(
        [
            (10, base),                           # exact recrawl -> drop
            (11, base + " tiny appended tail"),   # near-dup -> drop
            (12, "entirely novel text about deep sea vents and the "
                 "chemosynthetic ecosystems that bloom around them today"),
            (13, "entirely novel text about deep sea vents and the "
                 "chemosynthetic ecosystems that bloom around them today"),
            # 13 == 12 within-shard: keep-first keeps 12, drops 13
        ],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(corpus, "doc_id", "text", 5)
    kept = sorted(
        r["id"]
        for r in incremental_minhash_dedup(
            sigs, shard, "doc_id", "text"
        ).collect()
    )
    assert kept == [12]  # 10 exact, 11 fuzzy vs corpus; 13 vs 12 in-shard


def test_ngram_novelty_cross_doc_property(spark):
    from influxer_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # unique everywhere
            (2, "one two three four five"),         # shares all grams with 3
            (3, "one two three four five six"),
            (4, "one two three four"),              # subset of 2/3's grams
        ],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["n_grams"], r["n_novel"])
        for r in ngram_novelty(docs, "doc_id", "text", k=4).collect()
    }
    assert got[1] == (1, 1)            # one gram, seen nowhere else
    assert got[4] == (1, 0)            # its only gram also in docs 2 and 3
    assert got[2] == (2, 0)            # both grams also appear in doc 3
    assert got[3] == (3, 1)            # only 'three four five six' is novel


def test_semantic_decontam_flags_best_eval_match(spark):
    from influxer_spark.operators.dedup import semantic_decontam

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # exact copy of eval 100
            (2, [0.9, 0.1, 0.0]),   # near eval 100
            (3, [0.0, 0.0, 1.0]),   # clean
        ],
        ["vec_id", "embedding"],
    )
    evalset = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    got = {r["id"]: (r["eval_id"], r["cos"]) for r in
           semantic_decontam(corpus, evalset, "vec_id", "embedding", 0.8).collect()}
    assert set(got) == {1, 2}            # doc 3 is clean
    assert got[1] == (100, 1.0)          # exact copy, best match evidenced
    assert got[2][0] == 100 and got[2][1] > 0.98


def test_semantic_decontam_ignores_zero_norm_vectors(spark):
    """An all-zero vector yields cos = 0/0 = NaN, and Spark sorts NaN
    above every number — without the norm guard one zero EVAL vector
    flags the whole corpus.  Zero vectors carry no direction: dropped."""
    from influxer_spark.operators.dedup import semantic_decontam

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    evalset = spark.createDataFrame(
        [(100, [0.0, 0.0]), (200, [1.0, 0.0])],  # zero eval vec present
        ["vec_id", "embedding"],
    )
    got = {r["id"]: r["eval_id"] for r in
           semantic_decontam(corpus, evalset, "vec_id", "embedding", 0.8).collect()}
    # only the genuine match survives; zero vectors flag nothing
    assert got == {1: 200}
