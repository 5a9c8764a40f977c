"""PELT exact changepoint segmentation (operators/pelt.py)."""

from __future__ import annotations

import numpy as np
import pytest

from influxer_spark.operators.pelt import (
    _seg_cost,
    pelt_changepoints,
    pelt_segments_1d,
)


def _brute_optimal(x, beta):
    """Exhaustive optimal partitioning (the O(n²) DP, no pruning) —
    PELT must reach the same minimum objective."""
    n = len(x)
    c1 = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    c2 = np.concatenate(([0], np.cumsum(x.astype(np.int64) ** 2)))
    f = [-beta] + [np.inf] * n
    prev = [0] * (n + 1)
    for t in range(1, n + 1):
        for s in range(t):
            c = f[s] + _seg_cost(c1, c2, s, t) + beta
            if c < f[t]:
                f[t], prev[t] = c, s
    segs, t = [], n
    while t > 0:
        segs.append((prev[t], t))
        t = prev[t]
    return list(reversed(segs)), f[n]


def _objective(x, segs, beta):
    c1 = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    c2 = np.concatenate(([0], np.cumsum(x.astype(np.int64) ** 2)))
    return sum(_seg_cost(c1, c2, s, t) for s, t in segs) + beta * (
        len(segs) - 1
    )


def test_matches_exhaustive_dp_objective():
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [
            rng.integers(0, 10, 25),
            rng.integers(40, 50, 25),
            rng.integers(15, 25, 25),
        ]
    ).astype(np.int64)
    beta = 200.0
    got = pelt_segments_1d(x, beta)
    want, f_opt = _brute_optimal(x, beta)
    # PELT is exact: identical objective (and here, identical segments);
    # f[n] = -β + Σ(C+β) over segments = ΣC + β·(#cp), i.e. the objective
    assert _objective(x, got, beta) == pytest.approx(f_opt)
    assert got == want


def test_finds_planted_level_shifts():
    rng = np.random.default_rng(7)
    x = np.concatenate(
        [rng.integers(100, 105, 40), rng.integers(300, 305, 40),
         rng.integers(50, 55, 40)]
    ).astype(np.int64)
    segs = pelt_segments_1d(x)  # default BIC-ish penalty
    cps = [s for s, _ in segs[1:]]
    assert len(cps) == 2
    assert min(abs(c - 40) for c in cps) <= 2
    assert min(abs(c - 80) for c in cps) <= 2


def test_constant_series_one_segment():
    assert pelt_segments_1d(np.full(50, 7, dtype=np.int64)) == [(0, 50)]


def test_high_penalty_suppresses_splits():
    x = np.concatenate(
        [np.full(20, 0), np.full(20, 100)]
    ).astype(np.int64)
    assert pelt_segments_1d(x, penalty=1e12) == [(0, 40)]
    assert pelt_segments_1d(x, penalty=10.0)[0] == (0, 20)


def test_segments_cover_and_are_contiguous():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, 200).astype(np.int64)
    segs = pelt_segments_1d(x, penalty=5000.0)
    assert segs[0][0] == 0 and segs[-1][1] == len(x)
    for (a, b), (c, d) in zip(segs, segs[1:]):
        assert b == c and a < b


def test_dataframe_fold(spark):
    x = np.concatenate(
        [np.full(30, 10), np.full(30, 90)]
    ).astype(np.int64)
    rows = [("a", i, int(v)) for i, v in enumerate(x)]
    rows += [("b", i, 5) for i in range(40)]  # constant → one segment
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = pelt_changepoints(df, ["k"], "i", "v", penalty=100.0)
    got = {(r["k"], r["seg"]): (r["start_idx"], r["end_idx"], r["mean"])
           for r in out.collect()}
    assert got[("a", 0)] == (0, 30, 10.0)
    assert got[("a", 1)] == (30, 60, 90.0)
    assert got[("b", 0)] == (0, 40, 5.0)


def test_max_points_guard(spark):
    rows = [("a", i, i) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    with pytest.raises(Exception, match="max_points"):
        pelt_changepoints(df, ["k"], "i", "v", max_points=10).collect()


def test_null_ticks_dropped_before_dp(spark):
    # engine convention: NULL tick = absent point (asap/theta parity).
    # Without the notna filter pandas casts NaN to INT64_MIN and the
    # overflow guard fires with a misleading "coarser tick" error.
    rows = [("a", 0, 10), ("a", 1, None), ("a", 2, 10), ("a", 3, 10)]
    rows += [("b", i, None) for i in range(4)]  # all-NULL series → no rows
    df = spark.createDataFrame(rows, "k string, i long, v long")
    got = {(r["k"], r["seg"]): (r["start_idx"], r["end_idx"], r["n"], r["mean"])
           for r in pelt_changepoints(df, ["k"], "i", "v").collect()}
    assert got == {("a", 0): (0, 3, 3, 10.0)}


def test_pelt_gate_query_matches_duckdb(spark, sf_dir):
    """r04 conversion contract: the pruned DP replays bit-for-bit on the
    recursive-CTE DuckDB oracle (which carries the candidate set, so even
    exact-tie prunes agree) — the same cross-check the driver runs."""
    import duckdb

    from influxer_spark.influxql_queries import _PELT_SQL, _q_pelt_segments

    got = _q_pelt_segments(spark, sf_dir)
    cols = sorted(got.columns)
    spark_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    cur = con.execute(_PELT_SQL)
    names = [d[0] for d in cur.description]
    idx = [names.index(c) for c in cols]
    ora_rows = sorted(tuple(row[i] for i in idx) for row in cur.fetchall())
    assert spark_rows == ora_rows and len(spark_rows) > 0
