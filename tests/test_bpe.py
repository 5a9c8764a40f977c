"""BPE trainer/encoder: distributed paths vs the pure-Python reference.

The contract (module docstring of operators/bpe.py): Sennrich-style
merges learned from whitespace word counts, deterministic argmax (count
desc, then lexicographically smallest pair), left-to-right merge
application, rank-greedy encoding.  The full-recount and incremental
trainers must produce IDENTICAL merge lists (Gorilla's reference-kernel
discipline), and encoding must reconstruct the document.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import bpe


CORPUS = [
    (0, "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"),
    (1, "low lowest newest widest wider new newer lowest"),
    (2, "aaaa aaa aa a aaaa aaaa"),          # overlap-heavy single-char runs
    (3, "it's o'clock back\\slash it's"),    # quote + backslash symbols
    (4, ""),                                  # empty doc
    (5, "   "),                               # whitespace-only doc
    (6, "καλή μέρα καλή"),                    # non-ASCII
]


def _ref_wc(rows):
    wc = collections.Counter()
    for _, t in rows:
        wc.update(t.split())
    return dict(wc)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_word_count_table_matches_counter(spark, docs):
    got = {
        r["_word"]: r["wcount"]
        for r in bpe.word_count_table(docs, "text").collect()
    }
    assert got == _ref_wc(CORPUS)


@pytest.mark.parametrize("mode", ["full", "incremental"])
def test_train_matches_reference(spark, docs, mode):
    ref = bpe.ref_bpe_train(_ref_wc(CORPUS), 12)
    assert len(ref) == 12  # corpus is rich enough that we don't stop early
    got = [
        (r["left"], r["right"])
        for r in bpe.bpe_train(docs, "text", 12, recount=mode)
        .orderBy("rank").collect()
    ]
    assert got == ref


def test_train_early_stop_when_no_pair_repeats(spark):
    # every word unique and 1 occurrence → after enough merges every
    # remaining pair has count 1 → trainer must stop, not pad
    docs = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    ref = bpe.ref_bpe_train(_ref_wc([(0, "ab cd ef")]), 50)
    got = bpe.bpe_train(docs, "text", 50, recount="incremental")
    assert got.count() == len(ref)


def test_train_tiebreak_is_lexicographic(spark):
    # "ba" and "ab" both appear twice; (a,b</w>) sorts before (b,a</w>)
    docs = spark.createDataFrame([(0, "ab ab ba ba")], ["doc_id", "text"])
    first = bpe.bpe_train(docs, "text", 1).collect()[0]
    ref = bpe.ref_bpe_train(_ref_wc([(0, "ab ab ba ba")]), 1)[0]
    assert (first["left"], first["right"]) == ref


def test_encode_matches_reference_and_reconstructs(spark, docs):
    merges = bpe.bpe_train(docs, "text", 12)
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    enc = {r["id"]: list(r["tokens"])
           for r in bpe.bpe_encode(docs, "doc_id", "text", merges).collect()}
    for doc_id, text in CORPUS:
        words = text.split()
        if not words:
            assert doc_id not in enc  # no tokens → no row (explode semantics)
            continue
        want = [t for w in words for t in bpe.ref_bpe_encode(w, ranks)]
        assert enc[doc_id] == want
        # concatenating tokens reconstructs the document words exactly
        joined = "".join(enc[doc_id]).replace(bpe.EOW, " ").rstrip()
        assert joined == " ".join(words)


def test_encode_without_broadcast_matches(spark, docs):
    merges = bpe.bpe_train(docs, "text", 8)
    a = bpe.bpe_encode(docs, "doc_id", "text", merges).orderBy("id").collect()
    b = bpe.bpe_encode(
        docs, "doc_id", "text", merges, broadcast_vocab=False
    ).orderBy("id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_partition_count_stays_bounded_across_iterations(spark, docs):
    # regression: union(miss, merged) used to double partitions per merge
    out = bpe.bpe_train(docs, "text", 10, recount="incremental")
    assert out.count() == 10  # training ran 10 iterations without blowup
    # the real assertion is wall-clock sanity — a doubling schedule makes
    # iteration 10 run 2^10 tasks and this test visibly hang


def test_vocab_and_id_encoding_roundtrip(spark, docs):
    merges = bpe.bpe_train(docs, "text", 10)
    vocab = bpe.vocab_table(docs, "text", merges)
    rows = vocab.collect()
    ids = [r["id"] for r in rows]
    assert sorted(ids) == list(range(len(rows)))  # dense, no gaps
    base = [r["token"] for r in rows if r["id"] < len(rows) - 10]
    assert base == sorted(base)  # base symbols lexicographic
    by_id = {r["id"]: r["token"] for r in rows}
    enc_s = {r["id"]: list(r["tokens"])
             for r in bpe.bpe_encode(docs, "doc_id", "text", merges).collect()}
    enc_i = {
        r["id"]: list(r["token_ids"])
        for r in bpe.bpe_encode_ids(
            docs, "doc_id", "text", merges, vocab
        ).collect()
    }
    assert enc_i.keys() == enc_s.keys()
    for d, tids in enc_i.items():
        assert [by_id[t] for t in tids] == enc_s[d]


def test_train_on_sf_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = bpe.ref_bpe_train(
        dict(collections.Counter(
            w for r in docs.select("text").collect()
            for w in r["text"].split()
        )),
        8,
    )
    got = [
        (r["left"], r["right"])
        for r in bpe.bpe_train(docs, "text", 8).orderBy("rank").collect()
    ]
    assert got == ref
