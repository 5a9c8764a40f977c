"""Matrix profile: exact-integer nearest-neighbor distance profile."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from influxer_spark.operators import matrixprofile as MP


def _brute(v: list[int], m: int, excl: int) -> dict[int, tuple[int, int]]:
    """Reference O(n²m) python loop: idx -> (nn_idx, nn_dist2)."""
    nw = len(v) - m + 1
    out = {}
    for i in range(nw):
        best = None
        for j in range(nw):
            if abs(i - j) < excl:
                continue
            d = sum((v[i + t] - v[j + t]) ** 2 for t in range(m))
            if best is None or d < best[1]:
                best = (j, d)
        if best is not None:
            out[i] = best
    return out


def _series_df(spark, v, key="a"):
    return spark.createDataFrame(
        [(key, i, int(x)) for i, x in enumerate(v)], ["k", "i", "v"]
    )


def test_profile_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    v = rng.integers(0, 1000, size=60).tolist()
    got = {
        r["idx"]: (r["nn_idx"], r["nn_dist2"])
        for r in MP.matrix_profile(
            _series_df(spark, v), ["k"], "i", "v", m=8
        ).collect()
    }
    assert got == _brute(v, 8, 4)


def test_profile_chunking_invariant(spark):
    rng = np.random.default_rng(9)
    v = rng.integers(0, 100, size=40).tolist()
    a = MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=4, chunk=7)
    b = MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=4, chunk=1024)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_profile_tie_breaks_to_smallest_index(spark):
    v = [5] * 10  # constant series: every distance is 0
    rows = MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=2).collect()
    for r in rows:
        want = 0 if r["idx"] >= 1 else 1  # excl=1: nearest allowed j
        assert (r["nn_idx"], r["nn_dist2"]) == (want, 0)


def test_profile_discord_sticks_out(spark):
    # periodic series with one spike: the spike's windows are the discords
    v = ([1, 2, 3, 2] * 8)[:30]
    v[13] = 500
    prof = MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=4)
    summary = MP.discords_and_motifs(prof, ["k"]).collect()[0]
    assert 10 <= summary["discord_idx"] <= 13  # a window containing the spike
    assert summary["motif_dist2"] == 0  # the clean period repeats exactly
    assert summary["discord_dist2"] > 0


def test_profile_short_series_emits_nothing(spark):
    assert MP.matrix_profile(_series_df(spark, [1, 2, 3]), ["k"], "i", "v", m=3).count() == 0


def test_profile_no_admissible_neighbor_rows_dropped(spark):
    # n=12, m=8 → excl_z=4, nw=5: idx 1..3 have NO admissible neighbor
    # (every other start is within the exclusion zone) — they must be
    # dropped, not emitted as 2⁶³−1 sentinels; idx 0 and 4 pair up.
    v = list(range(12))
    rows = MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=8).collect()
    got = {r["idx"]: (r["nn_idx"], r["nn_dist2"]) for r in rows}
    assert got == _brute(v, 8, 4)
    assert sorted(got) == [0, 4]
    assert all(d < 2**62 for _, d in got.values())


def test_profile_int64_overflow_guard_raises(spark):
    # ticks at 3e9 with m=4: the d² bound 4·m·tick² ≈ 1.4e20 ≥ 2⁶³ —
    # numpy would wrap silently, so the operator must fail loudly instead
    v = [3_000_000_000 * (i % 2) for i in range(12)]
    with pytest.raises(Exception, match="overflow"):
        MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=4).collect()


def test_ab_profile_int64_overflow_guard_raises(spark):
    va = [3_000_000_000 * (i % 2) for i in range(12)]
    vb = [1, 2, 3, 4, 5, 6]
    with pytest.raises(Exception, match="overflow"):
        MP.matrix_profile_ab(
            _series_df(spark, va), _series_df(spark, vb), ["k"], "i", "v", m=4
        ).collect()


def test_hourly_tick_series_floors_negative_means(spark):
    # cents = −1 over 3 points: (100·−1)/3 = −33.33…; DuckDB // floors to
    # −34, Spark DIV would truncate to −33 — the operator must floor.
    rows = [
        ("e", "2024-01-01 00:10:00", -0.005),
        ("e", "2024-01-01 00:20:00", -0.005),
        ("e", "2024-01-01 00:30:00", 0.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {str(r["bucket"]): r["v"] for r in MP.hourly_tick_series(df).collect()}
    assert got["2024-01-01 00:00:00"] == -34


def test_profile_max_points_guard(spark):
    df = _series_df(spark, list(range(50)))
    with pytest.raises(Exception, match="max_points"):
        MP.matrix_profile(df, ["k"], "i", "v", m=4, max_points=10).collect()


def test_profile_multiple_series_independent(spark):
    rng = np.random.default_rng(3)
    va = rng.integers(0, 50, 20).tolist()
    vb = rng.integers(0, 50, 25).tolist()
    df = _series_df(spark, va, "a").union(_series_df(spark, vb, "b"))
    rows = MP.matrix_profile(df, ["k"], "i", "v", m=5).collect()
    for key, v in (("a", va), ("b", vb)):
        got = {r["idx"]: (r["nn_idx"], r["nn_dist2"]) for r in rows if r["k"] == key}
        assert got == _brute(v, 5, 2)


def test_hourly_tick_series_div_semantics(spark):
    rows = [
        ("e", "2024-01-01 00:10:00", 1.005),  # sums to 3.005 with the next row
        ("e", "2024-01-01 00:20:00", 2.0),
        ("e", "2024-01-01 02:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        str(r["bucket"]): r["v"]
        for r in MP.hourly_tick_series(df).collect()
    }
    # hour 0: cents = round(3.005*100) = 301 (Spark round = HALF_UP, the
    # engine-wide cent discipline) → (100*301) DIV 2 = 15050
    assert got["2024-01-01 00:00:00"] == 15050
    assert got["2024-01-01 02:00:00"] == 70000


def test_ab_profile_matches_bruteforce(spark):
    rng = np.random.default_rng(17)
    va = rng.integers(0, 200, size=25).tolist()
    vb = rng.integers(0, 200, size=40).tolist()
    m = 6
    got = {
        r["idx"]: (r["nn_idx"], r["nn_dist2"])
        for r in MP.matrix_profile_ab(
            _series_df(spark, va), _series_df(spark, vb), ["k"], "i", "v", m=m
        ).collect()
    }
    want = {}
    for i in range(len(va) - m + 1):
        best = None
        for j in range(len(vb) - m + 1):
            d = sum((va[i + t] - vb[j + t]) ** 2 for t in range(m))
            if best is None or d < best[1]:
                best = (j, d)
        want[i] = best
    assert got == want


def test_ab_profile_exact_match_found(spark):
    # B contains A verbatim at offset 7 → every A window's nn_dist2 == 0
    rng = np.random.default_rng(29)
    va = rng.integers(0, 99, size=12).tolist()
    vb = rng.integers(100, 199, size=7).tolist() + va + [5, 5]
    rows = MP.matrix_profile_ab(
        _series_df(spark, va), _series_df(spark, vb), ["k"], "i", "v", m=4
    ).collect()
    assert rows
    for r in rows:
        assert r["nn_dist2"] == 0
        assert r["nn_idx"] == r["idx"] + 7


def test_ab_profile_key_only_on_one_side_emits_nothing(spark):
    a = _series_df(spark, [1, 2, 3, 4, 5, 6], "only_a")
    b = _series_df(spark, [1, 2, 3, 4, 5, 6], "both")
    rows = MP.matrix_profile_ab(a, b, ["k"], "i", "v", m=2).collect()
    assert rows == []


def test_influxql_matrix_profile_fold(spark):
    """The front-end fold emits one row per window start, aligned to the
    window's starting bucket, matching the operator on the same ticks."""
    from influxer_spark.influxql_frontend import influxql

    rows = [
        ("e", f"2024-01-01 {h:02d}:00:00", float(v))
        for h, v in enumerate([1, 2, 3, 1, 2, 3, 1, 2, 3, 50, 2, 3])
    ]
    h = spark.createDataFrame(rows, ["event_type", "bucket", "v"]).withColumn(
        "bucket", F.to_timestamp("bucket")
    )
    out = influxql(
        "SELECT matrix_profile(v, 4) AS mp FROM hourly GROUP BY event_type",
        {"hourly": h},
        ts_col="bucket",
    ).collect()
    assert len(out) == 9  # 12 buckets, m=4 → 9 window starts
    got = {str(r["time"]): r["mp"] for r in out}
    # window starting 00:00 ([1,2,3,1]) recurs verbatim at 03:00 → dist 0
    assert got["2024-01-01 00:00:00"] == 0.0
    # every window overlapping the 50-spike (starts 06..09) is a discord
    clean = [v for k, v in got.items() if k < "2024-01-01 06"]
    spiky = [v for k, v in got.items() if k >= "2024-01-01 06"]
    assert max(clean) < min(spiky)


def test_float_fast_path_equals_int_path(spark):
    """Ticks near the exactness threshold: the float64 BLAS path and the
    int64 path must agree bit-for-bit (both exact); oversized ticks must
    route to the int64 path and still match brute force."""
    rng = np.random.default_rng(41)
    small = rng.integers(0, 5_000_000, size=50).tolist()
    big_base = int(np.sqrt(2**53 / 4)) + 10  # trips _exact_float_ok at m>=1
    big = [big_base + int(x) for x in rng.integers(0, 1000, size=50)]
    m = 8
    for v in (small, big):
        from influxer_spark.operators.matrixprofile import _exact_float_ok
        got = {
            r["idx"]: (r["nn_idx"], r["nn_dist2"])
            for r in MP.matrix_profile(
                _series_df(spark, v), ["k"], "i", "v", m=m
            ).collect()
        }
        assert got == _brute(v, m, m // 2)
    assert _exact_float_ok(m, np.asarray(small))
    assert not _exact_float_ok(m, np.asarray(big))


def _fseries_df(spark, v, key="a"):
    return spark.createDataFrame(
        [(key, i, float(x)) for i, x in enumerate(v)], "k string, i int, v double"
    )


def test_znorm_profile_matches_bruteforce(spark):
    rng = np.random.default_rng(53)
    v = rng.normal(0, 10, size=45).tolist()
    m = 7
    got = {
        r["idx"]: (r["nn_idx"], r["nn_dist"])
        for r in MP.matrix_profile_znorm(
            _fseries_df(spark, v), ["k"], "i", "v", m=m
        ).collect()
    }

    def znorm(w):
        w = np.asarray(w, dtype=float)
        return (w - w.mean()) / w.std()

    nw = len(v) - m + 1
    for i in range(nw):
        best = min(
            ((float(np.sqrt(((znorm(v[i:i + m]) - znorm(v[j:j + m])) ** 2).sum())), j)
             for j in range(nw) if abs(i - j) >= m // 2),
        )
        assert got[i][0] == best[1]
        assert got[i][1] == pytest.approx(best[0], rel=1e-9, abs=1e-9)


def test_znorm_profile_amplitude_invariant(spark):
    """The same shape at 1x and 100x amplitude are nearest neighbors —
    the case the unnormalized profile deliberately keeps apart."""
    shape = [0, 3, 1, 4, 1, 5]
    v = [float(x) for x in shape] + [50.0] * 6 + [100.0 * x for x in shape]
    rows = MP.matrix_profile_znorm(
        _fseries_df(spark, v), ["k"], "i", "v", m=6, excl=3
    ).collect()
    got = {r["idx"]: (r["nn_idx"], r["nn_dist"]) for r in rows}
    assert got[0][0] == 12 and got[0][1] == pytest.approx(0.0, abs=1e-7)
    assert got[12][0] == 0
    # the flat plateau window is z-undefined and absent from the output
    assert 6 not in got


def test_znorm_profile_all_flat_emits_nothing(spark):
    assert (
        MP.matrix_profile_znorm(
            _fseries_df(spark, [2.0] * 12), ["k"], "i", "v", m=4
        ).count()
        == 0
    )


def test_top_motifs_nonoverlapping_and_ranked(spark):
    # two exact motif pairs at different scales + noise between them
    base = [1, 9, 1, 9]
    v = (
        base + [40, 41, 42, 43] + base            # pair A: idx 0 & 8 (dist 0)
        + [77, 60, 77, 60] + [55] * 4 + [77, 60, 77, 60]  # pair B: 12 & 20
    )
    prof = MP.matrix_profile(_series_df(spark, v), ["k"], "i", "v", m=4, excl=4)
    rows = MP.top_motifs(prof, ["k"], m=4, k=3).collect()
    got = sorted((r["motif_rank"], r["idx"], r["nn_idx"]) for r in rows)
    assert got[0][0] == 1 and got[0][1:] in [(0, 8), (8, 0), (12, 20), (20, 12)]
    # every kept pair's windows are >= m starts from every other kept window
    starts = [x for r in rows for x in (r["idx"], r["nn_idx"])]
    for i, a in enumerate(starts):
        for b in starts[i + 1:]:
            assert abs(a - b) >= 4
    # rank 1 is the best (zero-distance) motif
    assert min(r["nn_dist2"] for r in rows) == [
        r["nn_dist2"] for r in rows if r["motif_rank"] == 1
    ][0]
