"""Driver-contract queries + DuckDB oracles for the InfluxQL function
library (operators/influxql.py), over hourly per-type series derived from
``events`` with the engine's quantization discipline (the hourly avg is
quantized to cents first, so every downstream transform is an IEEE op on
identical operands in identical order on both engines — bit-exact without
output rounding; only the order-unstable aggregates (integral, stddev) are
quantized at the output).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxer_spark.operators import influxql as Q

_HOURLY_SQL = """
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(round(sum(value) * 100, 0) AS BIGINT) / (count(value) * 100.0) AS v,
         CAST(round(sum(value) * 100, 0) AS BIGINT) AS s_c,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
)
"""


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            (
                F.round(F.sum("value") * 100, 0).cast("long")
                / (F.count("value") * 100.0)
            ).alias("v"),
            F.round(F.sum("value") * 100, 0).cast("long").alias("s_c"),
            F.count("*").alias("cnt"),
        )
    )


def _q_transforms(spark, sf_dir):
    h = _hourly(spark, sf_dir)
    keys, ts = ["event_type"], "bucket"
    return h.select(
        "event_type",
        "bucket",
        "v",
        Q.tr_difference(h, keys, ts, "v").alias("diff_v"),
        Q.tr_derivative(h, keys, ts, "v", 3600).alias("deriv_h"),
        Q.tr_non_negative_derivative(h, keys, ts, "v", 3600).alias("nn_deriv_h"),
        Q.tr_moving_average(h, keys, ts, "v", 3).alias("ma3"),
        # cumulative sum runs over the EXACT integer cents (s_c): a float
        # running sum lands on rounding boundaries (and DuckDB windows sum
        # pairwise via segment tree), integers cannot
        (Q.tr_cumulative_sum(h, keys, ts, "s_c") / 100.0).alias("csum"),
        Q.tr_elapsed(h, keys, ts, 60).alias("elapsed_min"),
    )


_TRANSFORMS_SQL = f"""
WITH {_HOURLY_SQL}
SELECT event_type, bucket, v,
  v - lag(v) OVER w AS diff_v,
  CASE WHEN epoch(bucket) - lag(epoch(bucket)) OVER w > 0 THEN
    (v - lag(v) OVER w)
      / CAST(epoch(bucket) - lag(epoch(bucket)) OVER w AS DOUBLE) * 3600
  END AS deriv_h,
  CASE WHEN epoch(bucket) - lag(epoch(bucket)) OVER w > 0
        AND (v - lag(v) OVER w)
            / CAST(epoch(bucket) - lag(epoch(bucket)) OVER w AS DOUBLE) * 3600 >= 0
  THEN (v - lag(v) OVER w)
       / CAST(epoch(bucket) - lag(epoch(bucket)) OVER w AS DOUBLE) * 3600
  END AS nn_deriv_h,
  CASE WHEN count(v) OVER w3 = 3 THEN avg(v) OVER w3 END AS ma3,
  sum(s_c) OVER wc / 100.0 AS csum,
  CAST(floor((epoch(bucket) - lag(epoch(bucket)) OVER w) / 60) AS BIGINT)
    AS elapsed_min
FROM hourly
WINDOW
  w AS (PARTITION BY event_type ORDER BY bucket),
  w3 AS (PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
  wc AS (PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _q_selectors(spark, sf_dir):
    h = _hourly(spark, sf_dir)
    spread = Q.agg_spread(h, ["event_type"], "v")
    fl = Q.sel_first_last(h, ["event_type"], "bucket", "v")
    p90 = Q.agg_percentile(h, ["event_type"], "v", 90.0)
    return spread.join(fl, "event_type").join(p90, "event_type")


_SELECTORS_SQL = f"""
WITH {_HOURLY_SQL},
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
)
SELECT h.event_type, max(h.v) - min(h.v) AS spread,
       arg_min(h.v, h.bucket) AS first_v, arg_max(h.v, h.bucket) AS last_v,
       (SELECT r.v FROM ranked r WHERE r.event_type = h.event_type
        AND r.rn = CAST(floor(0.9 * r.n + 0.5) AS INT)) AS p90
FROM hourly h GROUP BY h.event_type
"""


def _q_top3(spark, sf_dir):
    h = _hourly(spark, sf_dir)
    return Q.sel_top(h, ["event_type"], "v", 3, ts_col="bucket").select(
        "event_type", F.col("bucket"), "v", "rank"
    )


_TOP3_SQL = f"""
WITH {_HOURLY_SQL}
SELECT event_type, bucket, v, CAST(rank AS INT) AS rank FROM (
  SELECT event_type, bucket, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v DESC, bucket ASC) AS rank
  FROM hourly
) WHERE rank <= 3
"""


def _q_integral_stats(spark, sf_dir):
    h = _hourly(spark, sf_dir)
    q2 = lambda c: F.round(c * 100, 0).cast("long") / 100.0  # noqa: E731
    q6 = lambda c: F.round(c * 1000000, 0).cast("long") / 1000000.0  # noqa: E731
    integ = Q.agg_integral(h, ["event_type"], "bucket", "v", 3600).select(
        "event_type", q2(F.col("integral")).alias("integral_h")
    )
    sd = Q.agg_stddev(h, ["event_type"], "v").select(
        "event_type", q6(F.col("stddev")).alias("stddev_q")
    )
    md = Q.agg_mode(h, ["event_type"], "cnt")
    return integ.join(sd, "event_type").join(md, "event_type")


_INTEGRAL_SQL = f"""
WITH {_HOURLY_SQL},
tr AS (
  SELECT event_type,
         (v + lag(v) OVER w) / 2.0
           * CAST(epoch(bucket) - lag(epoch(bucket)) OVER w AS DOUBLE) AS a
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
modes AS (
  SELECT event_type, cnt AS mode FROM (
    SELECT event_type, cnt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY count(*) DESC, cnt ASC) AS rn
    FROM hourly GROUP BY event_type, cnt
  ) WHERE rn = 1
),
integ AS (
  SELECT event_type,
         CAST(round(sum(a) / 3600 * 100, 0) AS BIGINT) / 100.0 AS integral_h
  FROM tr GROUP BY event_type
),
sd AS (
  SELECT event_type,
         CAST(round(stddev_samp(v) * 1000000, 0) AS BIGINT) / 1000000.0
           AS stddev_q
  FROM hourly GROUP BY event_type
)
SELECT i.event_type, i.integral_h, s.stddev_q, m.mode
FROM integ i JOIN sd s USING (event_type) JOIN modes m USING (event_type)
"""


def _q_sample(spark, sf_dir):
    h = _hourly(spark, sf_dir)
    return Q.sel_sample(h, ["event_type"], "bucket", "v", 5)


_SAMPLE_SQL = f"""
WITH {_HOURLY_SQL}
SELECT event_type, bucket, v FROM (
  SELECT event_type, bucket, v,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(event_type || '|' ||
                        CAST(CAST(floor(epoch(bucket)) AS BIGINT) AS VARCHAR))
         ) AS rn
  FROM hourly
) WHERE rn <= 5
"""


def influxql_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "influxql_transforms_1h": _q_transforms,
        "influxql_selectors_1h": _q_selectors,
        "influxql_top3_hours": _q_top3,
        "influxql_integral_stats": _q_integral_stats,
        "influxql_sample5": _q_sample,
    }


def influxql_oracle_sql() -> dict[str, str]:
    return {
        "influxql_transforms_1h": _TRANSFORMS_SQL,
        "influxql_selectors_1h": _SELECTORS_SQL,
        "influxql_top3_hours": _TOP3_SQL,
        "influxql_integral_stats": _INTEGRAL_SQL,
        "influxql_sample5": _SAMPLE_SQL,
    }
