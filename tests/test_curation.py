"""Unit tests for corpus-curation operators (curation.py): known-value
checks on tiny frames plus a Python-mirror property for the LM score."""

import math

import pytest

from influxer_spark.operators import curation as C


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c", "s1", 7),
            (2, "a b", "s1", 3),
            (3, "c c c", "s1", 5),
            (4, "a d", "s2", 3),
        ],
        ["doc_id", "text", "source", "n_chars"],
    )


def test_token_doc_freq_counts_and_order(spark, corpus):
    rows = C.token_doc_freq(corpus, "doc_id", "text", top_k=3).collect()
    # a: docs {1,2,4} total 4; c: docs {1,3} total 4; b: docs {1,2} total 2
    assert [(r["token"], r["doc_freq"], r["total_freq"]) for r in rows] == [
        ("a", 3, 4),
        ("c", 2, 4),
        ("b", 2, 2),
    ]


def test_token_doc_freq_tiebreak_deterministic(spark):
    # b and z identical on both counts -> token asc decides the cut
    df = spark.createDataFrame(
        [(1, "z b"), (2, "z b"), (3, "q q q")], ["doc_id", "text"]
    )
    rows = C.token_doc_freq(df, "doc_id", "text", top_k=2).collect()
    # doc_freq: z=2 b=2 q=1; total_freq: z=2 b=2 -> token asc: b before z
    assert [r["token"] for r in rows] == ["b", "z"]


def test_domain_cap_keeps_best_n(spark, corpus):
    out = C.domain_cap(corpus, "doc_id", "source", "n_chars", n=2).collect()
    kept = {(r["domain"], r["id"], r["rank"]) for r in out}
    # s1: doc1 (7 chars) rank 1, doc3 (5) rank 2, doc2 dropped; s2: doc4
    assert kept == {("s1", 1, 1), ("s1", 3, 2), ("s2", 4, 1)}


def test_domain_cap_tiebreak_on_id(spark):
    df = spark.createDataFrame(
        [(10, "s", 5), (11, "s", 5), (12, "s", 5)],
        ["doc_id", "source", "n_chars"],
    )
    out = C.domain_cap(df, "doc_id", "source", "n_chars", n=2).collect()
    assert {r["id"] for r in out} == {10, 11}


def test_unigram_logprob_matches_python_mirror(spark, corpus):
    texts = {1: "a b a c", 2: "a b", 3: "c c c", 4: "a d"}
    toks = {i: t.split() for i, t in texts.items()}
    cnt: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    total = sum(cnt.values())
    q = {t: round(math.log(c / total) * 1_000_000) for t, c in cnt.items()}
    out = {
        r["id"]: r
        for r in C.unigram_logprob(corpus, "doc_id", "text").collect()
    }
    for i, ts in toks.items():
        sum_q = sum(q[t] for t in ts)
        assert out[i]["n_tokens"] == len(ts)
        assert out[i]["sum_logp_q"] == sum_q
        assert out[i]["avg_logprob"] == sum_q / (1_000_000 * len(ts))
    # the doc containing the rarest token scores lowest
    assert out[4]["avg_logprob"] < out[2]["avg_logprob"]


def test_prefix_sum_multi_partition_matches_python(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {
        r["k"]: r["cumsum"]
        for r in C.prefix_sum(df, "k", "v", num_partitions=7).collect()
    }
    acc = 0
    for k, v in rows:
        acc += v
        assert out[k] == acc, k


def test_pack_sequences_boundary_spanning(spark):
    # budget 5; docs of 3,3,3 tokens: starts 0,3,6 -> seq 0,0,1
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f"), (3, "g h i")], ["doc_id", "text"]
    )
    out = {r["id"]: r for r in
           C.pack_sequences(df, "doc_id", "text", budget=5).collect()}
    assert (out[1]["start_offset"], out[1]["seq_id"]) == (0, 0)
    assert (out[2]["start_offset"], out[2]["seq_id"]) == (3, 0)
    assert (out[3]["start_offset"], out[3]["seq_id"]) == (6, 1)


def test_pack_sequences_sharded_independent_offsets(spark):
    df = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "c d", "s2"), (3, "e f", "s1")],
        ["doc_id", "text", "source"],
    )
    out = {
        r["id"]: r
        for r in C.pack_sequences(
            df, "doc_id", "text", budget=3, shard_col="source"
        ).collect()
    }
    assert out[1]["start_offset"] == 0 and out[2]["start_offset"] == 0
    assert out[3]["start_offset"] == 2  # second doc within s1 only


def test_bigram_logprob_ranks_typical_above_rare(spark):
    from influxer_spark.operators.curation import bigram_logprob

    # doc 1: deterministic transitions (P(b|a)≈1) → high mean logprob;
    # doc 4: every "a …" bigram branches 4 ways (P(ci|a)≈1/4) → low
    predictable = "a b a b a b a b"
    branching = "a c1 a c2 a c3 a c4"
    docs = spark.createDataFrame(
        [(1, predictable), (2, predictable), (3, predictable),
         (4, branching)],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in bigram_logprob(docs, "doc_id", "text").collect()}
    assert out[1]["avg_logprob"] > out[4]["avg_logprob"]
    # integer plumbing: n_bigrams = words-1 per doc occurrence
    assert out[1]["n_bigrams"] == len(predictable.split()) - 1
    assert out[1]["avg_logprob"] == out[2]["avg_logprob"] == out[3]["avg_logprob"]


def test_curation_funnel_stage_attrition(spark):
    """Each stage drops exactly the docs it should: low-quality at stage 1,
    the exact dup at stage 2, the contaminated doc at stage 3."""
    from influxer_spark.operators.curation import curation_funnel

    good = ("the quick brown fox jumps over the lazy dog and runs far away "
            "with a friend that would have been glad to be of help today")
    contaminated = ("benchmark secret answer sequence alpha beta gamma delta "
                    "and that is the story of how it all began to be with us")
    rows = [
        (1, good),
        (2, good),                      # exact dup of 1 → dropped at dedup
        (3, "too short"),               # fails min_words → dropped at quality
        (4, contaminated),              # shares 4-grams with bench → dropped
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "secret answer sequence alpha beta gamma delta and")],
        ["doc_id", "text"],
    )
    out = {r["stage"]: r["n_docs"]
           for r in curation_funnel(corpus, bench, "doc_id", "text",
                                    min_words=10, min_stop_hits=1,
                                    decontam_k=4).collect()}
    assert out == {"raw": 4, "gopher_quality": 3, "exact_dedup": 2,
                   "decontam": 1}


def test_chunk_documents_windows_and_ids(spark):
    """Chunk windows: a 10-word doc at max=6/overlap=2 (stride 4) yields
    chunks [0..5], [4..9] — 2 chunks, the second full; an 11-word doc
    yields 3 with a 3-word tail; short docs one chunk; overlap region
    repeats verbatim."""
    import pytest as _pytest

    from influxer_spark.operators.curation import chunk_documents

    w10 = " ".join(f"w{i}" for i in range(10))
    w11 = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame(
        [(1, w10), (2, w11), (3, "a b"), (4, "")], ["doc_id", "text"]
    )
    out = {
        (r["id"], r["chunk_idx"]): (r["n_chunks"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", 6, 2).collect()
    }
    assert out[(1, 0)] == (2, 6, "w0 w1 w2 w3 w4 w5")
    assert out[(1, 1)] == (2, 6, "w4 w5 w6 w7 w8 w9")
    assert out[(2, 0)][0] == 3 and out[(2, 2)] == (3, 3, "w8 w9 w10")
    assert out[(3, 0)] == (1, 2, "a b")
    assert out[(4, 0)][0] == 1  # empty doc: exactly one (empty-ish) chunk
    assert len(out) == 2 + 3 + 1 + 1

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", 6, 6)


def test_mixture_plan_weights_and_clamp(spark):
    """weight = budget·share / available with the max-epochs clamp
    surfaced: a tiny source with a big share trips 'capped'; shares
    absent from targets plan to zero; and feeding the weights to
    upsample_epochs yields the planned token mass (± the fractional-
    epoch hash granularity)."""
    from influxer_spark.operators.curation import mixture_plan

    rows = (
        [("big", i, 100) for i in range(100)]    # 10_000 chars
        + [("tiny", 1000 + i, 10) for i in range(5)]  # 50 chars
        + [("other", 2000, 999)]
    )
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    got = {
        r["group"]: (r["available"], r["share"], r["weight"], r["capped"])
        for r in mixture_plan(
            df, "source", "n_chars",
            {"big": 0.5, "tiny": 0.5}, budget=20_000, max_epochs=10.0,
        ).collect()
    }
    assert got["big"] == (10_000, 0.5, 1.0, False)      # exactly 1 epoch
    assert got["tiny"] == (50, 0.5, 10.0, True)         # 200 epochs → clamp
    assert got["other"] == (999, 0.0, 0.0, False)
