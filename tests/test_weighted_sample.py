"""Efraimidis–Spirakis weighted sampling (operators/sampling.py).

Checks: without-replacement semantics, weight-proportional inclusion
across seeds (the distributional property that makes A-Res correct), and
the WindowGroupLimit partial top-n in the plan (the shuffle carries
O(strata · n), not the corpus).
"""

from __future__ import annotations

from influxer_spark.operators import sampling as SA


def _docs(spark, n=400):
    # two weight classes: ids < 200 weigh 1, ids >= 200 weigh 9
    rows = [(i, "en", 1 if i < 200 else 9) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "w"])


def test_without_replacement_and_exact_n(spark):
    df = _docs(spark)
    got = SA.weighted_sample(df, "doc_id", "w", ["lang"], 50).collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == 50 and len(set(ids)) == 50
    assert sorted(r["rank"] for r in got) == list(range(1, 51))


def test_inclusion_tracks_weight(spark):
    df = _docs(spark)
    heavy = light = 0
    for s in range(12):
        for r in SA.weighted_sample(
            df, "doc_id", "w", ["lang"], 50, seed=f"s{s}"
        ).collect():
            if r["doc_id"] >= 200:
                heavy += 1
            else:
                light += 1
    # 200 heavy (w=9) vs 200 light (w=1): heavy should dominate the
    # sample decisively (expected ~0.9 of picks; demand > 2/3).
    assert heavy / (heavy + light) > 2 / 3, (heavy, light)


def test_deterministic_per_seed(spark):
    df = _docs(spark)
    a = SA.weighted_sample(df, "doc_id", "w", ["lang"], 20).collect()
    b = SA.weighted_sample(df, "doc_id", "w", ["lang"], 20).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)


def test_window_group_limit_in_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = SA.weighted_sample(docs, "doc_id", "n_chars", ["lang"], 25)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q._jdf.queryExecution().explainString(mode)
    assert "WindowGroupLimit" in plan, plan
