"""Deterministic sampling / split / shuffle / int8-quantization operators
(operators/sampling.py): stability, nesting, permutation, and error-bound
properties, plus the zero-shuffle plan guarantees that make them free at
10^12-doc scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import sampling as SA


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_hash_split_partitions_exhaustively(docs):
    out = SA.hash_split(docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    n = docs.count()
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n  # every row assigned exactly once
    assert 0.7 * n < by["train"] < 0.9 * n
    assert by["val"] > 0 and by["test"] > 0


def test_hash_split_is_stable_and_order_independent(docs):
    a = SA.hash_split(docs, "doc_id", [("a", 0.5), ("b", 0.5)])
    b = SA.hash_split(docs.orderBy(F.desc("doc_id")), "doc_id", [("a", 0.5), ("b", 0.5)])
    assert (
        a.select("doc_id", "split").exceptAll(b.select("doc_id", "split")).count() == 0
    )


def test_hash_split_assignments_survive_corpus_growth(docs):
    """Adding documents must not reshuffle existing assignments."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full = SA.hash_split(docs, "doc_id", [("train", 0.9), ("test", 0.1)])
    part = SA.hash_split(half, "doc_id", [("train", 0.9), ("test", 0.1)])
    joined = part.select("doc_id", F.col("split").alias("s1")).join(
        full.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0


def test_stratified_sample_nested_across_rates(docs):
    """hash-threshold membership: the low-rate sample ⊆ the high-rate sample."""
    lo = SA.stratified_sample(docs, "doc_id", "lang", {}, default_rate=0.1)
    hi = SA.stratified_sample(docs, "doc_id", "lang", {}, default_rate=0.4)
    assert lo.select("doc_id").exceptAll(hi.select("doc_id")).count() == 0
    assert lo.count() < hi.count()


def test_stratified_sample_respects_per_stratum_rates(docs):
    out = SA.stratified_sample(
        docs, "doc_id", "lang", rates={"zh": 1.0, "en": 0.0}, default_rate=0.5
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    all_ = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] == all_["zh"]  # rate 1.0 keeps everything
    assert "en" not in got  # rate 0.0 keeps nothing
    for lang in got:
        if lang not in ("zh", "en"):
            assert 0 < got[lang] <= all_[lang]


def test_split_and_sample_plans_have_no_exchange(docs):
    """The scan-side guarantee: assignment/filtering shuffles nothing."""
    for df in (
        SA.hash_split(docs, "doc_id", [("a", 0.5), ("b", 0.5)]),
        SA.stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, 0.1),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_global_shuffle_is_a_permutation(docs):
    n = docs.count()
    out = SA.global_shuffle(docs, "doc_id").collect()
    assert sorted(r["shuffle_rank"] for r in out) == list(range(1, n + 1))
    # rank order == key order
    by_rank = sorted(out, key=lambda r: r["shuffle_rank"])
    keys = [r["shuffle_key"] for r in by_rank]
    assert keys == sorted(keys)


def test_global_shuffle_seed_changes_order_not_membership(docs):
    a = SA.global_shuffle(docs, "doc_id", seed="s1")
    b = SA.global_shuffle(docs, "doc_id", seed="s2")
    ja = {r["id"]: r["shuffle_rank"] for r in a.collect()}
    jb = {r["id"]: r["shuffle_rank"] for r in b.collect()}
    assert set(ja) == set(jb)
    assert any(ja[i] != jb[i] for i in ja)  # actually permuted differently


def test_quantize_int8_bounds_and_reconstruction(vecs):
    out = SA.quantize_embeddings_int8(vecs, "vec_id", "embedding")
    rows = out.collect()
    raw = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    assert len(rows) == len(raw)
    for r in rows:
        codes = [int(c) for c in r["q_csv"].split(",")]
        assert len(codes) == r["dim"]
        assert all(-127 <= c <= 127 for c in codes)
        # |x - q*scale| <= scale/2 per element
        for x, q in zip(raw[r["id"]], codes):
            assert abs(x - q * r["scale"]) <= r["scale"] / 2 + 1e-12
        assert r["err_e6"] >= 0


def test_quantize_int8_zero_vector_is_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "id long, v array<float>",
    )
    rows = {r["id"]: r for r in SA.quantize_embeddings_int8(df, "id", "v").collect()}
    assert rows[1]["q_csv"] == "0,0,0" and rows[1]["scale"] == 0.0
    assert rows[1]["err_e6"] == 0
    assert rows[2]["q_csv"].split(",")[1] == "-127"  # max-|x| element saturates


def test_upsample_epochs_properties(spark, sf_dir):
    from influxer_spark.operators import sampling as SA

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    up = SA.upsample_epochs(docs, "doc_id", 2.3)
    rows = up.collect()
    # every doc gets epochs 0 and 1; ~30% get epoch 2
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert len(per_doc) == n
    assert all(sorted(v)[:2] == [0, 1] for v in per_doc.values())
    frac = sum(1 for v in per_doc.values() if len(v) == 3) / n
    assert 0.15 < frac < 0.45
    # nested: raising the weight only ADDS (id, epoch) pairs
    lo = {(r["doc_id"], r["epoch"]) for r in SA.upsample_epochs(
        docs, "doc_id", 1.1).collect()}
    hi = {(r["doc_id"], r["epoch"]) for r in rows}
    assert lo <= hi
    # weight < 1 downsamples (no full copy), weight 0 empties
    some = SA.upsample_epochs(docs, "doc_id", 0.4).count()
    assert 0 < some < n
    assert SA.upsample_epochs(docs, "doc_id", 0.0).count() == 0


def test_shard_assignment_deterministic_and_complete(spark):
    from influxer_spark.operators import sampling as SA

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], ["doc_id", "text"]
    )
    a = SA.shard_assignments(docs, "doc_id", 3)
    b = SA.shard_assignments(docs, "doc_id", 3)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    shards = {}
    for _, _, rank, sh in ra:
        shards.setdefault(sh, []).append(rank)
    # contiguous rank ranges, every shard full except possibly the last
    assert sorted(shards) == [0, 1, 2, 3]
    for sh, ranks in shards.items():
        assert sorted(ranks) == list(range(sh * 3 + 1, min(sh * 3 + 3, 10) + 1))


def test_export_shards_roundtrip_and_reexport_snapshot(spark, tmp_path):
    from influxer_spark.catalog import TableCatalog
    from influxer_spark.operators import sampling as SA

    cat = TableCatalog(str(tmp_path / "cat"))
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(10)], ["doc_id", "text"]
    )
    shards = SA.export_shards(spark, cat, docs, "doc_id", 4)
    assert shards == ["0", "1", "2"]
    assert cat.table_property("train_shards", "docs_per_shard") == 4
    back = spark.read.parquet(*cat.partition_paths("train_shards", shards))
    assert back.count() == 10
    assert set(back.columns) >= {"id", "text", "shuffle_rank", "shard_idx"}
    v1 = cat.current_snapshot("train_shards")
    # re-export (e.g. after corpus curation changed) lands a NEW snapshot;
    # the previous dataset version remains time-travelable
    SA.export_shards(spark, cat, docs.filter("doc_id < 8"), "doc_id", 4)
    assert cat.current_snapshot("train_shards") > v1
    # the smaller corpus fills 2 shards: shard "2" from v1 must be RETIRED
    # from the current snapshot (a reader of all committed shards must see
    # one permutation, never stale ranks from the previous export)
    live = cat.committed_partitions("train_shards")
    assert sorted(live) == ["0", "1"]
    assert "2" in cat.dropped_partitions("train_shards")
    cur = spark.read.parquet(
        *cat.partition_paths("train_shards", sorted(live))
    )
    assert cur.count() == 8
    assert sorted(r["id"] for r in cur.select("id").collect()) == list(range(8))
    old = spark.read.parquet(
        *[
            cat._partition_dir("train_shards", pv, e)
            for pv, e in cat.committed_partitions(
                "train_shards", as_of=v1
            ).items()
        ]
    )
    assert old.count() == 10
