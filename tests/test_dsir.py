"""DSIR importance resampling (operators/curation.py).

Checks: target-looking documents receive higher importance weights than
raw-looking ones; the resample is deterministic per seed and without
replacement; the global Gumbel-top-n window carries a WindowGroupLimit
(map-side pre-trim) in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from influxer_spark.operators.curation import dsir_importance, dsir_resample


def _corpus(spark):
    # target dialect: "alpha beta" vocabulary; raw dialect: "zeta omega"
    tgt = [(i, "alpha beta gamma alpha beta", True) for i in range(40)]
    raw = [(100 + i, "zeta omega theta zeta omega", False) for i in range(40)]
    mixed = [(200 + i, "alpha beta zeta omega", False) for i in range(10)]
    return spark.createDataFrame(
        tgt + raw + mixed, ["doc_id", "text", "is_tgt"]
    )


def test_target_dialect_scores_higher(spark):
    docs = _corpus(spark)
    scored = dsir_importance(docs, "doc_id", "text", "is_tgt", buckets=512)
    w = {r["id"]: r["w_micro"] for r in scored.collect()}
    # a raw-only doc must weigh less than a target-dialect doc, with the
    # mixed doc in between
    assert w[0] > w[200] > w[100], (w[0], w[200], w[100])


def test_resample_deterministic_without_replacement(spark):
    docs = _corpus(spark)
    scored = dsir_importance(docs, "doc_id", "text", "is_tgt", buckets=512)
    a = dsir_resample(scored, "id", 30).collect()
    b = dsir_resample(scored, "id", 30).collect()
    ids_a = sorted(r["id"] for r in a)
    assert ids_a == sorted(r["id"] for r in b)
    assert len(set(ids_a)) == 30
    # importance resampling: target-dialect docs should dominate the picks
    n_tgt = sum(1 for i in ids_a if i < 100)
    assert n_tgt > 20, n_tgt


def test_resample_plan_has_window_group_limit(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = dsir_importance(
        docs, "doc_id", "text", F.col("lang") == "en", buckets=2048
    )
    q = dsir_resample(scored, "id", 100)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q._jdf.queryExecution().explainString(mode)
    assert "WindowGroupLimit" in plan, plan
