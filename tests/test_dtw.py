"""Band-constrained DTW pair distances (operators/dtw.py)."""

from __future__ import annotations

import numpy as np
import pytest

from influxer_spark.operators.dtw import _dtw_cost_banded, dtw_pairs


def _brute_dtw(a, b, band):
    """Reference O(n·m) python DP with the Sakoe-Chiba band."""
    n, m = len(a), len(b)
    inf = float("inf")
    d = [[inf] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(i - j) > band:
                continue
            c = abs(a[i - 1] - b[j - 1])
            d[i][j] = c + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return d[n][m]


def test_kernel_matches_bruteforce():
    rng = np.random.default_rng(3)
    for band in (1, 2, 5):
        a = rng.integers(-100, 100, size=30).astype(np.int64)
        b = rng.integers(-100, 100, size=30).astype(np.int64)
        assert _dtw_cost_banded(a, b, band) == _brute_dtw(a, b, band)


def test_identical_series_cost_zero():
    a = np.array([5, 9, 1, 7], dtype=np.int64)
    assert _dtw_cost_banded(a, a.copy(), 2) == 0


def test_shifted_series_cheaper_than_euclidean():
    # b = a delayed by one step: DTW with band>=1 realigns (small cost),
    # Euclidean (band 0 ≈ diagonal) pays the full shift at every point
    a = np.array([0, 10, 0, 0, 10, 0, 0, 10, 0], dtype=np.int64)
    b = np.roll(a, 1)
    assert _dtw_cost_banded(a, b, 2) < int(np.abs(a - b).sum())


def test_dtw_pairs_dataframe(spark):
    rows = []
    for k, vals in [("a", [1, 2, 3, 4]), ("b", [1, 2, 3, 4]),
                    ("c", [9, 9, 9, 9])]:
        rows += [(k, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = {(r["key_a"], r["key_b"]): r["dtw_cost"]
           for r in dtw_pairs(df, "k", "i", "v", band=1).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == 0
    assert out[("a", "c")] == out[("b", "c")] > 0


def test_dtw_pairs_sorts_by_order_col(spark):
    # rows arrive shuffled; the fold must order by i before the DP
    rows = [("a", 2, 3), ("a", 0, 1), ("a", 1, 2),
            ("b", 1, 2), ("b", 0, 1), ("b", 2, 3)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = dtw_pairs(df, "k", "i", "v", band=1).collect()
    assert out[0]["dtw_cost"] == 0


def test_max_points_guard(spark):
    rows = [("a", i, i) for i in range(10)] + [("b", i, i) for i in range(10)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    with pytest.raises(Exception, match="max_points"):
        dtw_pairs(df, "k", "i", "v", band=1, max_points=5).collect()


def test_unequal_lengths_beyond_band_raise():
    a = np.arange(10, dtype=np.int64)
    b = np.arange(5, dtype=np.int64)
    with pytest.raises(ValueError, match="band"):
        _dtw_cost_banded(a, b, 2)


def test_null_first_last_semantics(spark):
    # a NULL field value is an ABSENT point: first() must skip it, both on
    # the raw path and (by construction) in the OHLC tier
    from pyspark.sql import functions as F

    from influxer_spark.influxql_frontend import influxql

    df = spark.createDataFrame(
        [("2024-01-01T10:00:00", None), ("2024-01-01T10:30:00", 5.0),
         ("2024-01-01T10:59:00", None)],
        ["ts", "v"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = influxql(
        "SELECT first(v) AS o, last(v) AS c FROM m GROUP BY time(1h)",
        {"m": df},
        ts_col="ts",
    ).collect()
    assert out[0]["o"] == 5.0 and out[0]["c"] == 5.0


def test_null_ticks_dropped_before_fold(spark):
    # engine convention: NULL tick = absent point.  A None inside the
    # folded array used to reach np.asarray(int64) and raise an opaque
    # TypeError; now the fold drops the row and the DP sees clean series.
    rows = [("a", 0, 1), ("a", 1, None), ("a", 2, 3),
            ("b", 0, 1), ("b", 1, 3)]
    df = spark.createDataFrame(rows, "k string, i long, v long")
    out = dtw_pairs(df, "k", "i", "v", band=1).collect()
    assert len(out) == 1
    r = out[0]
    # series a folds to [1, 3] (the NULL point absent), identical to b
    assert (r["n_a"], r["n_b"], r["dtw_cost"]) == (2, 2, 0)


def test_dtw_gate_query_matches_duckdb(spark, sf_dir):
    """r04 conversion contract: the int64 DP replays bit-for-bit on the
    recursive-CTE DuckDB oracle — the same cross-check the driver runs."""
    import duckdb

    from influxer_spark.influxql_queries import _DTW_SQL, _q_dtw_pairs

    got = _q_dtw_pairs(spark, sf_dir)
    cols = sorted(got.columns)
    spark_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    cur = con.execute(_DTW_SQL)
    names = [d[0] for d in cur.description]
    idx = [names.index(c) for c in cols]
    ora_rows = sorted(tuple(row[i] for i in idx) for row in cur.fetchall())
    assert spark_rows == ora_rows and len(spark_rows) == 10
