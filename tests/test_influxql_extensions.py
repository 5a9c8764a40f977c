"""Round-2 InfluxQL surface: subqueries, INTO, GROUP BY *, SLIMIT/SOFFSET,
SHOW statements, continuous queries."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from influxer_spark.influxql_frontend import InfluxQLEngine, InfluxQLError

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


@pytest.fixture()
def eng(spark):
    rows = []
    for h in range(4):
        for m in (0, 20, 40):
            for i, host in enumerate(["a", "b", "c"]):
                rows.append(
                    Row(
                        ts=T0 + dt.timedelta(hours=h, minutes=m),
                        host=host,
                        dc="dc1" if host != "c" else "dc2",
                        value=float(h * 100 + m + i),
                        hits=h * 10 + i,
                    )
                )
    df = spark.createDataFrame(rows)
    return InfluxQLEngine({"cpu": df}, ts_col="ts")


def test_subquery_max_of_hourly_mean(eng):
    out = eng.execute(
        "SELECT max(hm) FROM (SELECT mean(value) AS hm FROM cpu "
        "GROUP BY time(1h), host) GROUP BY time(2h), host"
    )
    rows = {(r["time"], r["host"]): r["max"] for r in out.collect()}
    # host a: hour-0 mean = (0+20+40)/3 = 20, hour-1 = 120 → 2h max = 120
    assert rows[(T0, "a")] == 120.0
    assert rows[(T0 + dt.timedelta(hours=2), "b")] == 321.0


def test_subquery_requires_time(eng):
    with pytest.raises(InfluxQLError, match="time"):
        eng.execute("SELECT mean(m) FROM (SELECT mean(value) AS m FROM cpu GROUP BY host) GROUP BY time(1h)")


def test_group_by_star(eng):
    star = eng.execute("SELECT mean(value) FROM cpu GROUP BY time(1h), *")
    named = eng.execute("SELECT mean(value) FROM cpu GROUP BY time(1h), dc, host")
    assert sorted(star.columns) == sorted(named.columns)
    assert sorted(map(tuple, star.collect())) == sorted(map(tuple, named.collect()))


def test_slimit_soffset(eng):
    out = eng.execute(
        "SELECT mean(value) FROM cpu GROUP BY time(1h), host SLIMIT 1 SOFFSET 1"
    )
    assert {r["host"] for r in out.collect()} == {"b"}
    out2 = eng.execute("SELECT mean(value) FROM cpu GROUP BY time(1h), host SLIMIT 2")
    assert {r["host"] for r in out2.collect()} == {"a", "b"}


def test_limit_and_slimit_compose(eng):
    out = eng.execute(
        "SELECT mean(value) FROM cpu GROUP BY time(1h), host LIMIT 2 SLIMIT 1"
    )
    rows = out.collect()
    assert {r["host"] for r in rows} == {"a"} and len(rows) == 2


def test_into_registers_measurement(eng):
    eng.execute(
        "SELECT mean(value) AS mv INTO cpu_1h FROM cpu GROUP BY time(1h), host"
    )
    assert "cpu_1h" in eng.tables
    back = eng.execute("SELECT max(mv) FROM cpu_1h GROUP BY host")
    assert {r["host"]: r["max"] for r in back.collect()}["a"] == 320.0


def test_show_measurements_and_keys(eng):
    assert [r["name"] for r in eng.execute("SHOW MEASUREMENTS").collect()] == ["cpu"]
    tags = [r["tagKey"] for r in eng.execute("SHOW TAG KEYS FROM cpu").collect()]
    assert tags == ["dc", "host"]
    fk = {r["fieldKey"]: r["fieldType"] for r in eng.execute("SHOW FIELD KEYS FROM cpu").collect()}
    assert fk == {"value": "float", "hits": "integer"}
    vals = {r["value"] for r in eng.execute(
        "SHOW TAG VALUES FROM cpu WITH KEY = dc"
    ).collect()}
    assert vals == {"dc1", "dc2"}
    assert [r["name"] for r in eng.execute("SHOW DATABASES").collect()] == ["db0"]


def test_show_tag_values_rejects_field(eng):
    with pytest.raises(InfluxQLError, match="not a tag"):
        eng.execute("SHOW TAG VALUES FROM cpu WITH KEY = value")


def test_continuous_query_lifecycle(eng):
    eng.execute(
        'CREATE CONTINUOUS QUERY cq_1h ON db0 BEGIN '
        "SELECT mean(value) AS mv INTO cpu_1h FROM cpu GROUP BY time(1h), host END"
    )
    shown = eng.execute("SHOW CONTINUOUS QUERIES").collect()
    assert [r["name"] for r in shown] == ["cq_1h"]
    res = eng.run_continuous_queries()
    assert set(res) == {"cq_1h"}
    assert "cpu_1h" in eng.tables
    assert eng.tables["cpu_1h"].count() == 4 * 3  # 4 hours × 3 hosts
    eng.execute("DROP CONTINUOUS QUERY cq_1h ON db0")
    assert eng.cqs == {}
    with pytest.raises(InfluxQLError, match="unknown continuous query"):
        eng.execute("DROP CONTINUOUS QUERY cq_1h")


class TestResampleCQ:
    """RESAMPLE EVERY/FOR — incremental CQ runs (InfluxDB 1.8), the only
    CQ shape that survives 10^12 rows: recompute the trailing window's
    complete buckets only, merge into the target, gate on EVERY."""

    DDL = (
        "CREATE CONTINUOUS QUERY cq_r ON db RESAMPLE EVERY 1h FOR 2h BEGIN "
        "SELECT mean(value) AS mv INTO cpu_1h FROM cpu GROUP BY time(1h), host "
        "END"
    )

    def test_incremental_recomputes_only_the_for_window(self, eng):
        eng.execute(self.DDL)
        assert eng.cqs["cq_r"]["every"] == 3600.0
        assert eng.cqs["cq_r"]["for"] == 7200.0
        # data covers hours 0-3; now=03:30 → complete buckets end at 03:00,
        # FOR 2h → recompute [01:00, 03:00)
        ran = eng.run_continuous_queries(now=T0 + dt.timedelta(hours=3, minutes=30))
        got = {(r["ts"], r["host"]): r["mv"] for r in ran["cq_r"].collect()}
        hours = {t.hour for t, _ in got}
        assert hours == {1, 2}
        # target holds exactly the window (no previous rows existed)
        assert {(t.hour) for t, _ in {
            (r["ts"], r["host"]) for r in eng.tables["cpu_1h"].collect()
        }} == {1, 2}

    def test_merge_keeps_rows_outside_the_window(self, eng):
        # full backfill first (hours 0-3), then an incremental run must
        # REPLACE only [01:00, 03:00) and keep hours 0 and 3
        eng.execute(self.DDL)
        eng.run_continuous_queries()                      # backfill
        assert eng.tables["cpu_1h"].count() == 4 * 3
        ran = eng.run_continuous_queries(
            now=T0 + dt.timedelta(hours=3, minutes=30), force=True
        )
        assert set(ran) == {"cq_r"}
        rows = eng.tables["cpu_1h"].collect()
        assert len(rows) == 4 * 3                          # still all hours
        hours = sorted({r["ts"].hour for r in rows})
        assert hours == [0, 1, 2, 3]

    def test_every_gates_reruns_and_force_overrides(self, eng):
        eng.execute(self.DDL)
        now = T0 + dt.timedelta(hours=3, minutes=30)
        assert set(eng.run_continuous_queries(now=now)) == {"cq_r"}
        # 20 minutes later: EVERY 1h not elapsed → skipped
        later = now + dt.timedelta(minutes=20)
        assert eng.run_continuous_queries(now=later) == {}
        assert set(eng.run_continuous_queries(now=later, force=True)) == {"cq_r"}
        # a full hour later: due again
        assert set(eng.run_continuous_queries(
            now=now + dt.timedelta(hours=1))) == {"cq_r"}

    def test_defaults_without_resample_clause(self, eng):
        eng.execute(
            "CREATE CONTINUOUS QUERY cq_d ON db BEGIN "
            "SELECT mean(value) AS mv INTO cpu_d FROM cpu GROUP BY time(1h) END"
        )
        # EVERY and FOR default to the GROUP BY interval → one bucket
        ran = eng.run_continuous_queries(now=T0 + dt.timedelta(hours=2, minutes=5))
        hours = {r["ts"].hour for r in ran["cq_d"].collect()}
        assert hours == {1}                                # [01:00, 02:00)

    def test_show_renders_resample_clause(self, eng):
        eng.execute(self.DDL)
        q = eng.execute("SHOW CONTINUOUS QUERIES").collect()[0]["query"]
        assert q.startswith("RESAMPLE EVERY 3600s FOR 7200s ")

    def test_resample_persists_through_catalog(self, eng, tmp_path):
        from influxer_spark.catalog import TableCatalog

        cat = TableCatalog(str(tmp_path))
        eng.attach_cq_catalog(cat)
        eng.execute(self.DDL)
        now = T0 + dt.timedelta(hours=3, minutes=30)
        eng.run_continuous_queries(now=now)
        # storage: into_cpu_1h holds the window's buckets
        import pyspark.sql.functions as F_
        stored = cat.read_committed(
            eng.tables["cpu"].sparkSession, "into_cpu_1h"
        )
        assert {r["h"] for r in stored.select(
            F_.hour("ts").alias("h")).distinct().collect()} == {1, 2}
        # a second engine sees the registry AND the watermark → gated
        e2 = InfluxQLEngine({"cpu": eng.tables["cpu"]}, ts_col="ts")
        e2.attach_cq_catalog(cat)
        assert e2.cqs["cq_r"]["every"] == 3600.0
        assert e2.run_continuous_queries(
            now=now + dt.timedelta(minutes=10)) == {}

    def test_incremental_needs_group_by_time(self, eng):
        eng.execute(
            "CREATE CONTINUOUS QUERY cq_t ON db BEGIN "
            "SELECT mean(value) AS mv INTO cpu_t FROM cpu GROUP BY host END"
        )
        with pytest.raises(InfluxQLError, match="GROUP BY time"):
            eng.run_continuous_queries(now=T0 + dt.timedelta(hours=1))


def test_multi_measurement_from(eng, spark):
    eng.tables["gpu"] = eng.tables["cpu"].withColumn("value", F.col("value") * 2)
    out = eng.execute("SELECT max(value) FROM cpu, gpu GROUP BY time(1h), host")
    assert out.columns[0] == "measurement"
    rows = {(r["measurement"], r["time"], r["host"]): r["max"] for r in out.collect()}
    assert rows[("gpu", T0, "a")] == 2 * rows[("cpu", T0, "a")]
    # regex FROM matches the same set
    rex = eng.execute("SELECT max(value) FROM /pu$/ GROUP BY time(1h), host")
    assert rex.count() == out.count()
    with pytest.raises(InfluxQLError, match="no measurement matches"):
        eng.execute("SELECT max(value) FROM /nope/ GROUP BY time(1h)")
    del eng.tables["gpu"]


def test_multi_measurement_per_series_limit(eng):
    eng.tables["gpu"] = eng.tables["cpu"]
    out = eng.execute(
        "SELECT max(value) FROM cpu, gpu GROUP BY time(1h), host LIMIT 1"
    )
    # LIMIT 1 applies per (measurement, host) series: 2 measurements × 3 hosts
    assert out.count() == 6
    del eng.tables["gpu"]


def test_retention_policy_ddl(eng):
    eng.execute('CREATE RETENTION POLICY "raw" ON db0 DURATION 7d REPLICATION 1 DEFAULT')
    eng.execute("CREATE RETENTION POLICY monthly ON db0 DURATION 30d REPLICATION 2")
    eng.execute("CREATE RETENTION POLICY forever ON db0 DURATION INF REPLICATION 1")
    rows = {r["name"]: r for r in eng.execute("SHOW RETENTION POLICIES ON db0").collect()}
    assert rows["raw"]["duration"] == "604800s" and rows["raw"]["default"]
    assert rows["monthly"]["replicaN"] == 2 and not rows["monthly"]["default"]
    assert rows["forever"]["duration"] == "INF"
    # a later DEFAULT displaces the previous one
    eng.execute("ALTER RETENTION POLICY monthly ON db0 DURATION 30d DEFAULT")
    rows = {r["name"]: r for r in eng.execute("SHOW RETENTION POLICIES").collect()}
    assert rows["monthly"]["default"] and not rows["raw"]["default"]
    # bridge onto the engine's retention DAG
    dag = eng.retention_dag(
        {"raw": ("raw_points", "rollup_1m"), "monthly": ("rollup_1m", None),
         "forever": ("rollup_1d", None)}
    )
    by_table = {p.table: p for p in dag}
    assert by_table["raw_points"].ttl_days == 7
    assert by_table["raw_points"].depends_on == "rollup_1m"
    assert by_table["rollup_1m"].ttl_days == 30
    assert "rollup_1d" not in by_table  # INF never expires
    eng.execute("DROP RETENTION POLICY forever ON db0")
    assert set(eng.retention) == {"raw", "monthly"}
    with pytest.raises(InfluxQLError, match="unknown retention policy"):
        eng.execute("DROP RETENTION POLICY forever ON db0")


def test_cq_requires_into(eng):
    with pytest.raises(InfluxQLError, match="INTO"):
        eng.execute(
            "CREATE CONTINUOUS QUERY bad ON db0 BEGIN "
            "SELECT mean(value) FROM cpu GROUP BY time(1h) END"
        )


def test_alert_states_transitions_only(spark):
    """Kapacitor stateChangesOnly: first point emits, repeats don't,
    every edge emits exactly once; transitions_only=False emits all."""
    import datetime as dt

    from influxer_spark.operators.influxql import alert_states

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s", t0 + dt.timedelta(hours=i), v)
        for i, v in enumerate([10.0, 20.0, 120.0, 130.0, 160.0, 90.0, 95.0])
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = alert_states(df, ["k"], "ts", "v", warn=100.0, crit=150.0)
    got = [
        (r["level"], r["prev_level"])
        for r in out.orderBy("ts").collect()
    ]
    assert got == [
        ("OK", None),        # first point always emits
        ("WARN", "OK"),      # 120 crosses warn
        ("CRIT", "WARN"),    # 160 crosses crit
        ("OK", "CRIT"),      # 90 recovers
    ]
    every = alert_states(
        df, ["k"], "ts", "v", warn=100.0, crit=150.0, transitions_only=False
    )
    assert every.count() == 7


def test_sigma_running_deviations(spark):
    """Kapacitor sigma(): expanding mean/stddev (sample, n-1) INCLUDING the
    current point; first point and zero-variance prefixes emit 0.0."""
    import datetime as dt
    import math
    import statistics

    from influxer_spark.influxql_frontend import influxql

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 10.0, 16.0, 4.0, 22.0]
    df = spark.createDataFrame(
        [("s", t0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)],
        ["k", "ts", "v"],
    )
    out = influxql(
        "SELECT sigma(v) AS sig FROM m GROUP BY k", {"m": df}, ts_col="ts"
    )
    got = [r["sig"] for r in out.orderBy("time").collect()]
    for i, g in enumerate(got):
        prefix = vals[: i + 1]
        if i == 0 or len(set(prefix)) == 1:
            assert g == 0.0
        else:
            mu = statistics.mean(prefix)
            sd = statistics.stdev(prefix)
            assert math.isclose(g, abs(vals[i] - mu) / sd, rel_tol=1e-12)
