"""Bucketed co-located joins (SURVEY.md §2.5 scale device): pre-bucketing
both sides of a recurring join key removes the per-query shuffle entirely —
with broadcast disabled, the plan must contain NO Exchange at all: the join
consumes the bucketed distribution directly and even the follow-up groupBy
on the bucket key reuses it."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from influxer_spark.operators import rollup as R


def _fmt(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t1m = R.rollup(ev, "ts", ["event_type"], "value", "1m")
    t1h = R.rollup(ev, "ts", ["event_type"], "value", "1h")

    for t in ("b1m", "b1h"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/influxer_warehouse/{t}", ignore_errors=True)
    (
        t1m.write.mode("overwrite")
        .bucketBy(8, "event_type").sortBy("event_type")
        .saveAsTable("b1m")
    )
    (
        t1h.write.mode("overwrite")
        .bucketBy(8, "event_type").sortBy("event_type")
        .saveAsTable("b1h")
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b1m")
            .join(
                spark.table("b1h").withColumnRenamed("bucket", "hbucket"),
                on="event_type",
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
        )
        plan = _fmt(spark, joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1500]  # zero shuffles end-to-end
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_commit_conflict_detected(spark, tmp_path):
    """Optimistic concurrency: committing a manifest read BEFORE another
    writer's snapshot landed must fail loudly (blind last-writer-wins
    would erase the other writer's partitions), and a re-read retry must
    see both changes."""
    import pytest as _pytest

    from influxer_spark.catalog import CommitConflictError, TableCatalog

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([(1, "a")], ["x", "day"])
    cat.write_partition(df, "t", "a")
    stale = cat.read_manifest("t")
    cat.set_table_property("t", "k", "v1")  # the other writer wins the race
    stale["properties"] = {"k": "v2"}
    with _pytest.raises(CommitConflictError, match="re-read"):
        cat._commit_manifest("t", stale)
    # retry protocol: re-read, re-apply, commit — both changes survive
    fresh = cat.read_manifest("t")
    fresh.setdefault("properties", {})["k2"] = "v2"
    cat._commit_manifest("t", fresh)
    assert cat.table_property("t", "k") == "v1"
    assert cat.table_property("t", "k2") == "v2"
    assert "a" in cat.committed_partitions("t")


def test_time_travel_manifest_cannot_commit(spark, tmp_path):
    from influxer_spark.catalog import CommitConflictError, TableCatalog

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([(1, "a")], ["x", "day"])
    cat.write_partition(df, "t", "a")
    v1 = cat.current_snapshot("t")
    cat.write_partition(df, "t", "b")
    old = cat.read_manifest("t", as_of=v1)
    import pytest as _pytest

    with _pytest.raises(CommitConflictError):
        cat._commit_manifest("t", old)


def test_concurrent_writers_same_table_all_land(spark, tmp_path):
    """Iceberg commit-retry: N threads each commit a DIFFERENT partition
    of the SAME table at once.  Every partition must survive (reapply on
    a rebased manifest), every commit is its own snapshot, and no writer
    errors out — before _commit_apply, one conflicting writer raised and
    the others could silently erase snapshots across processes."""
    from concurrent.futures import ThreadPoolExecutor

    from influxer_spark.catalog import TableCatalog

    cat = TableCatalog(str(tmp_path / "cat"))
    n = 8
    dfs = {
        f"d{i}": spark.createDataFrame([(i, f"d{i}")], ["x", "day"])
        for i in range(n)
    }

    def write(pv):
        cat.write_partitions(dfs[pv], "t", [pv])
        return pv

    with ThreadPoolExecutor(max_workers=n) as pool:
        done = list(pool.map(write, dfs))
    assert sorted(done) == sorted(dfs)
    parts = cat.committed_partitions("t")
    assert sorted(parts) == sorted(dfs)            # nothing lost
    assert len(cat.snapshots("t")) == n            # one snapshot per commit
    rows = {
        (r["x"], r["p"])
        for r in cat.read_partitions_with_key(spark, "t", sorted(parts)).collect()
    }
    assert rows == {(i, f"d{i}") for i in range(n)}


def test_stale_commit_lock_is_broken(spark, tmp_path):
    import os as _os
    import time as _time

    from influxer_spark.catalog import TableCatalog

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([(1, "a")], ["x", "day"])
    cat.write_partition(df, "t", "a")
    lock = _os.path.join(cat.table_path("t"), ".commit.lock")
    with open(lock, "w") as f:
        f.write("99999")  # a crashed holder's leftover
    old = _time.time() - 3600
    _os.utime(lock, (old, old))
    cat.write_partition(df, "t", "b")  # must break the stale lock, not hang
    assert "b" in cat.committed_partitions("t")
    assert not _os.path.exists(lock)


def test_compact_zorder_clusters_both_columns(spark, tmp_path):
    """ZORDER rewrite: per-file min/max ranges shrink on BOTH interleaved
    columns, where the SORT rewrite leaves the second column's per-file
    range as wide as the partition.  Data multiset and manifest contract
    (strategy note, snapshot flip) are preserved like every other rewrite."""
    import glob

    import pandas as pd

    from influxer_spark.catalog import TableCatalog
    from pyspark.sql import functions as F

    cat = TableCatalog(str(tmp_path / "cat"))
    n = 300_000
    # two decorrelated uniform columns + an incompressible payload so the
    # 1 MB target yields several output files
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 997).cast("long").alias("a"),
            ((F.col("id") * 7919 + 13) % 997).cast("long").alias("b"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .withColumn("day", F.lit("d"))
    )
    cat.write_partition(df, "points", "d")

    def file_ranges():
        paths = cat.partition_paths("points", ["d"])
        spans_a, spans_b = [], []
        files = glob.glob(f"{paths[0]}/*.parquet")
        for f in files:
            pdf = pd.read_parquet(f, columns=["a", "b"])
            spans_a.append(float(pdf["a"].max() - pdf["a"].min()))
            spans_b.append(float(pdf["b"].max() - pdf["b"].min()))
        return len(files), sum(spans_a) / len(spans_a), sum(spans_b) / len(spans_b)

    full = 996.0
    res_sort = cat.compact_partition(
        spark, "points", "d", target_file_mb=1, sort_cols=["a"]
    )
    assert res_sort["compacted"] and res_sort["files_after"] >= 4
    nf, span_a_sort, span_b_sort = file_ranges()
    assert nf >= 4
    assert span_a_sort < 0.5 * full        # sorted column clusters
    assert span_b_sort > 0.9 * full        # the OTHER column does not

    res_z = cat.compact_partition(
        spark, "points", "d", target_file_mb=1, zorder_cols=["a", "b"]
    )
    assert res_z["compacted"]
    nf_z, span_a_z, span_b_z = file_ranges()
    assert nf_z >= 4
    assert span_a_z < 0.75 * full          # both columns cluster
    assert span_b_z < 0.75 * full

    note = cat.committed_partitions("points")["d"]["compaction"]
    assert note["strategy"] == "zorder"
    assert note["zorder_cols"] == ["a", "b"] and note["zorder_bits"] == 8
    back = spark.read.parquet(*cat.partition_paths("points", ["d"]))
    assert back.count() == n
    assert back.agg(F.sum("a"), F.sum("b")).first() == df.agg(
        F.sum("a"), F.sum("b")
    ).first()
    # exclusivity + arity guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exclusive"):
        cat.compact_partition(
            spark, "points", "d", sort_cols=["a"], zorder_cols=["b"]
        )


def test_zorder_key_string_columns_cluster(spark, tmp_path):
    """String columns ride the order-preserving 7-byte-prefix image: a
    ZORDER on (url, metric) leaves each output file with a small slice of
    each column's distinct values, not a random shuffle of all of them."""
    import glob

    import pandas as pd

    from influxer_spark.catalog import TableCatalog
    from pyspark.sql import functions as F

    cat = TableCatalog(str(tmp_path / "cat"))
    n = 120_000
    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("url-"), F.format_string("%04d", F.col("id") % 500)).alias("url"),
            F.concat(F.lit("m-"), F.format_string("%03d", (F.col("id") * 31 + 7) % 200)).alias("metric"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .withColumn("day", F.lit("d"))
    )
    cat.write_partition(df, "points", "d")
    res = cat.compact_partition(
        spark, "points", "d", target_file_mb=1, zorder_cols=["url", "metric"]
    )
    assert res["compacted"] and res["files_after"] >= 4
    paths = cat.partition_paths("points", ["d"])
    frac_url, frac_metric, nf = [], [], 0
    for f in glob.glob(f"{paths[0]}/*.parquet"):
        pdf = pd.read_parquet(f, columns=["url", "metric"])
        frac_url.append(pdf["url"].nunique() / 500)
        frac_metric.append(pdf["metric"].nunique() / 200)
        nf += 1
    assert sum(frac_url) / nf < 0.75
    assert sum(frac_metric) / nf < 0.75


def test_zorder_key_handles_non_ascii_strings(spark):
    """The string image slices the first 7 BYTES of the UTF-8 value; a
    7-CHARACTER pad would hex-expand multi-byte chars past conv's
    unsigned-64 range — an ANSI ARITHMETIC_OVERFLOW crash on any
    non-ASCII url.  The image must evaluate and stay byte-order
    monotone."""
    from influxer_spark.catalog import zorder_key

    vals = ["café-url", "caz", "ab", "b", "日本語テスト", "zzzzzz", "", "caf"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["z"] for r in
           df.withColumn("z", zorder_key(df, ["s"], bits=8)).collect()}
    ranked = sorted(vals, key=lambda v: got[v])
    assert ranked == sorted(vals, key=lambda v: v.encode("utf-8"))


def test_compact_with_bloom_filters(spark, tmp_path):
    """bloom_cols rewrites the partition with a parquet bloom filter on
    the listed columns.  pyarrow 16 exposes no bloom metadata, so the
    pinned observable is the stored BITSET itself: two sort rewrites of
    identical data differ only by the bloom option, and the bloomed file
    must carry the extra bytes — plus the manifest compaction note and
    an unchanged read-back."""
    import glob

    from influxer_spark.catalog import TableCatalog

    cat = TableCatalog(str(tmp_path / "cat"))
    # high-cardinality url — the bloom use case (parquet-mr skips blooms
    # for fully dictionary-encoded columns by design)
    df = spark.createDataFrame(
        [(f"url-{i}", f"m-{i % 3}", float(i), "d") for i in range(2000)],
        ["url", "metric", "v", "day"],
    )
    cat.write_partition(df, "points", "d")

    def part_bytes():
        paths = cat.partition_paths("points", ["d"])
        return sum(
            os.path.getsize(f) for f in glob.glob(f"{paths[0]}/*.parquet")
        )

    res_plain = cat.compact_partition(spark, "points", "d", sort_cols=["url"])
    assert res_plain["compacted"]
    plain_bytes = part_bytes()
    res_bloom = cat.compact_partition(
        spark, "points", "d", sort_cols=["url"], bloom_cols=["url"]
    )
    assert res_bloom["compacted"]
    bloom_bytes = part_bytes()
    assert bloom_bytes > plain_bytes + 50_000  # the stored bitset
    note = cat.committed_partitions("points")["d"]["compaction"]
    assert note["bloom_cols"] == ["url"]
    back = spark.read.parquet(*cat.partition_paths("points", ["d"]))
    assert back.count() == 2000
    assert back.filter("url = 'url-7'").count() == 1
