"""InfluxQL DELETE / DROP MEASUREMENT against PERSISTED tier tables:
whole-bucket predicates map to catalog metadata drops or row-level COW
deletes; anything finer is rejected with the fix named."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxer_spark.catalog import TableCatalog
from influxer_spark.influxql_frontend import InfluxQLEngine, InfluxQLError
from influxer_spark.operators.refresh import build_point_tiers


def _points(spark):
    rows = []
    for d in (1, 2, 3):
        for h in (0, 6, 12):
            for k in ("a", "b"):
                rows.append((f"2024-01-0{d} {h:02d}:30:00", k, float(d * 10 + h)))
    return spark.createDataFrame(rows, ["ts", "event_type", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )


def _build(spark, tmp_path):
    ev = _points(spark)
    cat = TableCatalog(str(tmp_path / "cat"))
    build_point_tiers(spark, cat, ev, "ts", ["event_type"], "value")
    eng = InfluxQLEngine({"m": ev}, ts_col="ts")
    eng.register_tiered("m", cat, key_cols=("event_type",))
    return ev, cat, eng


def test_time_delete_is_metadata_only_and_consistent(spark, tmp_path):
    ev, cat, eng = _build(spark, tmp_path)
    res = {r["tier_table"]: r["rows_deleted"] for r in eng.execute_statement(
        "DELETE FROM m WHERE time < '2024-01-02'"
    ).collect()}
    # metadata-only path: no scan ran, so the row count is reported unknown
    assert res["rollup_1d"] == -1 and set(res) >= {"rollup_1m", "rollup_1h"}
    assert sorted(cat.committed_partitions("rollup_1d")) == [
        "2024-01-02", "2024-01-03"]
    # tier-served queries and the lazy raw frame agree after the delete
    got = {(r[0], r[1]): r[2] for r in eng.execute(
        "SELECT count(value) AS cnt FROM m GROUP BY time(1d), event_type"
    ).collect()}
    raw = InfluxQLEngine(
        {"m": ev.filter("ts >= '2024-01-02'")}, ts_col="ts"
    ).execute("SELECT count(value) AS cnt FROM m GROUP BY time(1d), event_type")
    assert got == {(r[0], r[1]): r[2] for r in raw.collect()}
    assert all(b.year == 2024 and b.day >= 2 for b, _ in got)


def test_tag_delete_rewrites_tiers(spark, tmp_path):
    ev, cat, eng = _build(spark, tmp_path)
    res = {r["tier_table"]: r["rows_deleted"] for r in eng.execute_statement(
        "DELETE FROM m WHERE event_type = 'a'"
    ).collect()}
    assert res["rollup_1h"] > 0  # row-level COW path, scanned and counted
    rows = eng.execute(
        "SELECT count(value) AS cnt FROM m GROUP BY time(1d), event_type"
    ).collect()
    assert rows and all(r["event_type"] == "b" for r in rows)
    # tag+time conjunction also works and prunes to the day range
    res2 = eng.execute_statement(
        "DELETE FROM m WHERE event_type = 'b' AND time >= '2024-01-03'"
    )
    assert eng.execute(
        "SELECT count(value) AS cnt FROM m GROUP BY time(1d), event_type"
    ).count() == 2  # b on days 1-2 only


def test_unsupported_tiered_predicates_fail_loudly(spark, tmp_path):
    _, _, eng = _build(spark, tmp_path)
    with pytest.raises(InfluxQLError, match="day boundaries"):
        eng.execute_statement("DELETE FROM m WHERE time < '2024-01-02 06:00:00'")
    with pytest.raises(InfluxQLError, match="half-open"):
        eng.execute_statement("DELETE FROM m WHERE time <= '2024-01-02'")
    with pytest.raises(InfluxQLError, match="AND-only"):
        eng.execute_statement(
            "DELETE FROM m WHERE event_type = 'a' OR event_type = 'b'")
    with pytest.raises(InfluxQLError, match="tag predicates"):
        eng.execute_statement("DELETE FROM m WHERE value > 5")


def test_tag_delete_rejected_before_any_commit_when_a_tier_lacks_the_tag(
    spark, tmp_path
):
    """A sketch tier keyed on a SUBSET of the measurement tags aggregates
    across the missing tag, so a tag DELETE cannot be expressed there.
    The statement must fail BEFORE any tier commits — not after the
    rollup tiers were already rewritten (family drift)."""
    from influxer_spark.operators.kmv import build_kmv_tiers

    ev, cat, eng = _build(spark, tmp_path)
    # kmv tier keyed on NOTHING: its rows merge all event_types
    build_kmv_tiers(spark, cat, ev, "ts", [], "event_type", k=16)
    snaps_before = {t: cat.snapshots(t)[-1]
                    for t in ("rollup_1m", "rollup_1h", "rollup_1d")}
    with pytest.raises(InfluxQLError, match="does not carry"):
        eng.execute_statement("DELETE FROM m WHERE event_type = 'a'")
    # no tier moved: the rollup snapshots are untouched and 'a' survives
    for t, s in snaps_before.items():
        assert cat.snapshots(t)[-1] == s
    assert eng.execute(
        "SELECT count(value) AS cnt FROM m GROUP BY time(1d), event_type"
    ).filter("event_type = 'a'").count() > 0


def test_trend_inner_aggregate_is_tier_served(spark, tmp_path):
    """trend(mean(value)) on a registered tiered measurement desugars its
    inner GROUP BY time(1h) through the continuous-aggregate router: the
    plan reads the rollup_1h tier, and the answer equals the raw path."""
    ev, cat, eng = _build(spark, tmp_path)
    df = eng.execute(
        "SELECT trend(mean(value)) AS drift FROM m GROUP BY time(1h), event_type"
    )
    # the raw path scans only the in-memory frame (Scan ExistingRDD); a
    # parquet FileScan in the plan proves the tier tables are read (the
    # tier path string itself gets elided under pytest's long tmp paths)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan
    raw = InfluxQLEngine({"m": ev}, ts_col="ts").execute(
        "SELECT trend(mean(value)) AS drift FROM m GROUP BY time(1h), event_type"
    )
    key = ["event_type", "drift", "drift_tau", "drift_s", "drift_n"]
    assert sorted(tuple(r[k] for k in key) for r in df.collect()) == \
        sorted(tuple(r[k] for k in key) for r in raw.collect())


def test_drop_measurement_purges_tiers(spark, tmp_path):
    _, cat, eng = _build(spark, tmp_path)
    eng.execute_statement("DROP MEASUREMENT m")
    assert cat.committed_partitions("rollup_1m") == {}
    assert cat.committed_partitions("rollup_1d") == {}
    assert "m" not in eng.tiered
    with pytest.raises(InfluxQLError, match="unknown measurement"):
        eng.execute("SELECT count(value) FROM m GROUP BY time(1h)")
    # history survives until expire_snapshots (time-travelable drop)
    snaps = cat.snapshots("rollup_1d")
    assert len(snaps) >= 2
    assert cat.committed_partitions("rollup_1d", as_of=snaps[-2]) != {}


def test_delete_rewrites_ohlc_tiers_too(spark, tmp_path):
    """A tiered DELETE must hit the candlestick tables with the rest of
    the family — a takedown that cleared rollup_* but left ohlc_* would
    keep serving the deleted series through first()/last()."""
    from influxer_spark.operators.rollup import build_ohlc_tiers

    ev, cat, eng = _build(spark, tmp_path)
    build_ohlc_tiers(spark, cat, ev, "ts", ["event_type"], "value")
    res = {r["tier_table"]: r["rows_deleted"] for r in eng.execute_statement(
        "DELETE FROM m WHERE event_type = 'a'"
    ).collect()}
    assert res.get("ohlc_1h", 0) > 0
    left = cat.read(spark, "ohlc_1h").select("event_type").distinct().collect()
    assert [r["event_type"] for r in left] == ["b"]
    # tier-served first/last reflects the delete
    eng2 = InfluxQLEngine({"m": ev.filter("event_type != 'a'")}, ts_col="ts")
    eng2.register_tiered("m", cat, key_cols=("event_type",), ohlc=True)
    rows = eng2.execute(
        "SELECT first(value) AS o, last(value) AS c"
        " FROM m GROUP BY time(1d), event_type"
    ).collect()
    assert rows and all(r["event_type"] == "b" for r in rows)
