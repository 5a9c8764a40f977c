"""Matrix profile over rolled-up series: per-window nearest-neighbor
distance, the primitive behind motif discovery (recurring shapes) and
discord/anomaly detection (the window least like any other) — Yeh et al.,
"Matrix Profile I" (ICDM 2016, public).

Engine variant: UNNORMALIZED squared Euclidean distance over
INTEGER-TICK series.  Rolled-up engine series share one unit, so the
z-normalization of the literature (needed there to compare shapes across
amplitude) is optional here — and dropping it buys bit-exactness: every
distance is a sum of squared BIGINT differences, associative integer
math that a DuckDB oracle replays regardless of summation order.  No
float discipline needed anywhere.

Execution shape: the series (a rollup tier output — hundreds to tens of
thousands of points per series, bounded by ``max_points``) groups to one
Arrow batch per series key; inside, numpy computes the profile via the
dot-product identity d²(i,j) = |Wᵢ|² + |Wⱼ|² − 2·WᵢWⱼ in CHUNKED int64
matmuls (memory O(chunk·nw), never the nw×nw matrix), with an exclusion
zone of m/2 suppressing trivial self-matches.  One shuffle on the series
key; work is quadratic in the SERIES length (not the raw point count —
run it on a tier, which is the point of having tiers).

Scale posture: at 10^12 raw points the profile is still computed per
SERIES over its TIER (1h tier over a year = 8,760 points → an 8,760²
int64 matmul, milliseconds); ``max_points`` (default 50k) fails loudly
— with a counted message, same discipline as
``influxql.guard_series_points`` — before an unbounded series can turn
the quadratic loose on an executor.

Reference anchor: the reference engine ships no motif search; this is an
engine extension in the same family as its gap-fill/downsample additions
(Influxer/GenericFile.cs:262-271 stops at retention routing).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_I64_MAX = np.iinfo(np.int64).max


def _gram_rows(W: np.ndarray, Wf: np.ndarray | None, s: int, e: int,
               other: np.ndarray, other_f: np.ndarray | None) -> np.ndarray:
    """Rows s:e of the Gram matrix W·otherᵀ as exact int64.

    When every tick is small enough that all partial sums stay below 2⁵³
    (checked by the caller via :func:`_exact_float_ok`), the matmul runs
    in float64 — BLAS, ~4× faster than numpy's loop-based int64 matmul —
    and converts back losslessly; otherwise exact int64 directly."""
    if Wf is not None:
        return (Wf[s:e] @ other_f.T).astype(np.int64)
    return W[s:e] @ other.T


def _exact_float_ok(m: int, *arrays: np.ndarray) -> bool:
    """True when float64 Gram/distance arithmetic over these ticks is
    EXACT: every product and partial sum ≤ 4·m·maxtick² stays under 2⁵³
    (integers below 2⁵³ are exactly representable; sums of exactly
    representable integers that never exceed it are exact)."""
    mx = max((int(np.abs(a).max()) if len(a) else 0) for a in arrays)
    return 4 * m * mx * mx < 2**53


def _check_int64_bound(fn: str, m: int, *arrays: np.ndarray) -> None:
    """Fail LOUDLY (same discipline as ``max_points``) when the exact-int64
    distance math could wrap: every intermediate |sqᵢ + sqⱼ − 2g| is
    bounded by 4·m·maxtick², computed here in unbounded Python ints.
    numpy int64 overflow is silent, so without this guard a byte-scale
    metric (ticks ~5e9, m=24 → d² ~6e20 > 2⁶³) would return a wrong —
    possibly negative — profile with no error."""
    mx = max((int(np.abs(a).max()) if len(a) else 0) for a in arrays)
    if 4 * m * mx * mx >= 2**63:
        raise ValueError(
            f"{fn}: max |tick| {mx} with window m={m} can overflow exact "
            f"int64 distance math (bound 4·m·tick² = {4 * m * mx * mx} ≥ 2⁶³); "
            f"re-quantize the series to coarser ticks upstream"
        )



def matrix_profile(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tick_col: str,
    m: int,
    excl: int | None = None,
    max_points: int = 50_000,
    chunk: int = 1024,
) -> DataFrame:
    """Nearest-neighbor distance profile of each series in ``series``.

    ``series`` rows are (keys…, order_col, tick_col BIGINT) — one point
    per row, integer ticks (quantize upstream; integer math is what makes
    the result oracle-exact).  For every window start ``idx`` (0-based in
    order of ``order_col``), emits the closest other window at least
    ``excl`` starts away (default m//2, min 1):

        (keys…, idx, nn_idx, nn_dist2)

    nn_dist2 = Σₜ (v[idx+t] − v[nn_idx+t])², exact BIGINT; ties break to
    the smallest nn_idx (numpy argmin first-occurrence == the oracle's
    ORDER BY d2, j).  Series shorter than m+excl emit nothing.
    """
    if m < 2:
        raise ValueError("matrix_profile window m must be >= 2")
    excl_z = max(1, m // 2) if excl is None else max(1, excl)
    keys = list(key_cols)
    key_fields = [series.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["idx int", "nn_idx int", "nn_dist2 long"]
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        v = pdf[tick_col].to_numpy(dtype=np.int64)
        n = len(v)
        if n > max_points:
            raise ValueError(
                f"matrix_profile: series {tuple(pdf.iloc[0][k] for k in keys)!r} "
                f"has {n} points > max_points={max_points}; the profile is "
                f"quadratic in series length — run it over a coarser rollup "
                f"tier or raise max_points deliberately"
            )
        nw = n - m + 1
        empty = pd.DataFrame(
            {
                **{k: pd.Series(dtype=pdf[k].dtype) for k in keys},
                "idx": pd.Series(dtype="int32"),
                "nn_idx": pd.Series(dtype="int32"),
                "nn_dist2": pd.Series(dtype="int64"),
            }
        )
        if nw < excl_z + 1:
            return empty
        _check_int64_bound("matrix_profile", m, v)
        W = np.lib.stride_tricks.sliding_window_view(v, m)  # (nw, m) view
        Wf = np.ascontiguousarray(W, dtype=np.float64) if _exact_float_ok(m, v) else None
        sq = np.einsum("ij,ij->i", W, W)  # |W_i|² exact int64
        best = np.full(nw, _I64_MAX, dtype=np.int64)
        best_j = np.full(nw, -1, dtype=np.int64)
        jj = np.arange(nw)
        for s in range(0, nw, chunk):
            e = min(s + chunk, nw)
            # d²(i,j) = |W_i|² + |W_j|² − 2 W_i·W_j — chunked exact matmul
            g = _gram_rows(W, Wf, s, e, W, Wf)
            d = sq[s:e, None] + sq[None, :] - 2 * g
            d[np.abs(np.arange(s, e)[:, None] - jj[None, :]) < excl_z] = _I64_MAX
            arg = d.argmin(axis=1)  # first occurrence → smallest j on ties
            best[s:e] = d[np.arange(e - s), arg]
            best_j[s:e] = arg
        # windows with NO admissible neighbor (every other start inside the
        # exclusion zone — possible while nw ≤ 2·excl_z) still carry the
        # _I64_MAX sentinel after the loop; the oracle and the brute
        # reference both omit them, so drop rather than emit garbage
        keep = best < _I64_MAX
        out = pd.DataFrame(
            {
                **{k: pdf.iloc[0][k] for k in keys},
                "idx": np.arange(nw, dtype=np.int32)[keep],
                "nn_idx": best_j.astype(np.int32)[keep],
                "nn_dist2": best[keep],
            }
        )
        return out if len(out) else empty

    return (
        series.select(*keys, order_col, tick_col)
        .groupBy(*keys)
        .applyInPandas(profile, out_schema)
    )


def hourly_tick_series(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly mean series in exact 1e-4 ticks: floor((100 · cent_sum) /
    count) — BIGINT end to end.  Spark's ``DIV`` truncates toward zero
    while the DuckDB oracle's ``//`` floors, so the truncating quotient is
    corrected by 1 when a NEGATIVE cent sum leaves a remainder (count is
    always > 0) — exact integer floor division with no float excursion.
    Index ``i`` is the 0-based rank of the OBSERVED hour buckets, so gaps
    don't produce phantom windows."""
    keys = list(key_cols)
    hourly = (
        events.groupBy(*keys, F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(
            F.round(F.sum(value_col) * 100, 0).cast("long").alias("_cents"),
            F.count(value_col).alias("_cnt"),
        )
        .withColumn(
            "v",
            F.expr(
                "(100 * _cents) DIV _cnt"
                " - CASE WHEN (100 * _cents) % _cnt < 0 THEN 1 ELSE 0 END"
            ),
        )
    )
    return hourly.select(*keys, "bucket", "v")


def discords_and_motifs(profile: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Per-series summary of a :func:`matrix_profile` result: the discord
    (max nn_dist2 — the window least like any other; ties → smallest idx)
    and the motif (min nn_dist2 — the most-repeated shape).  Pure window
    ranks over the already-proven profile; no new distance math."""
    keys = list(key_cols)
    from pyspark.sql import Window

    wd = Window.partitionBy(*keys).orderBy(F.desc("nn_dist2"), F.asc("idx"))
    wm = Window.partitionBy(*keys).orderBy(F.asc("nn_dist2"), F.asc("idx"))
    ranked = profile.withColumn("_rd", F.row_number().over(wd)).withColumn(
        "_rm", F.row_number().over(wm)
    )
    discord = ranked.filter(F.col("_rd") == 1).select(
        *keys,
        F.col("idx").alias("discord_idx"),
        F.col("nn_dist2").alias("discord_dist2"),
    )
    motif = ranked.filter(F.col("_rm") == 1).select(
        *keys,
        F.col("idx").alias("motif_idx"),
        F.col("nn_idx").alias("motif_pair_idx"),
        F.col("nn_dist2").alias("motif_dist2"),
    )
    return discord.join(motif, on=keys)


def matrix_profile_ab(
    series_a: DataFrame,
    series_b: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tick_col: str,
    m: int,
    max_points: int = 50_000,
    chunk: int = 1024,
) -> DataFrame:
    """AB-join profile: for every window of series A, the nearest window
    of series B WITH THE SAME KEY — "has this week's shape ever occurred
    in the reference period?" (novelty/regression detection between two
    time ranges of the same measurement).  No exclusion zone: A and B are
    different series, so self-matches can't exist.  Output
    (keys…, idx, nn_idx, nn_dist2) — idx indexes A's windows, nn_idx B's.
    Keys present in only one side emit nothing (inner-join semantics).
    Same exact-BIGINT discipline as :func:`matrix_profile`."""
    if m < 2:
        raise ValueError("matrix_profile_ab window m must be >= 2")
    keys = list(key_cols)
    key_fields = [series_a.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["idx int", "nn_idx int", "nn_dist2 long"]
    )
    tagged = series_a.select(
        *keys, F.col(order_col).alias("_o"), F.col(tick_col).alias("_v"),
        F.lit(0).alias("_side"),
    ).unionByName(
        series_b.select(
            *keys, F.col(order_col).alias("_o"), F.col(tick_col).alias("_v"),
            F.lit(1).alias("_side"),
        )
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                **{k: pd.Series(dtype=pdf[k].dtype) for k in keys},
                "idx": pd.Series(dtype="int32"),
                "nn_idx": pd.Series(dtype="int32"),
                "nn_dist2": pd.Series(dtype="int64"),
            }
        )
        a = pdf[pdf["_side"] == 0].sort_values("_o", kind="mergesort")
        b = pdf[pdf["_side"] == 1].sort_values("_o", kind="mergesort")
        va = a["_v"].to_numpy(dtype=np.int64)
        vb = b["_v"].to_numpy(dtype=np.int64)
        if max(len(va), len(vb)) > max_points:
            raise ValueError(
                f"matrix_profile_ab: series {tuple(pdf.iloc[0][k] for k in keys)!r} "
                f"has {max(len(va), len(vb))} points > max_points={max_points}"
            )
        if len(va) < m or len(vb) < m:
            return empty
        _check_int64_bound("matrix_profile_ab", m, va, vb)
        wa = np.lib.stride_tricks.sliding_window_view(va, m)
        wb = np.lib.stride_tricks.sliding_window_view(vb, m)
        fast = _exact_float_ok(m, va, vb)
        waf = np.ascontiguousarray(wa, dtype=np.float64) if fast else None
        wbf = np.ascontiguousarray(wb, dtype=np.float64) if fast else None
        sqa = np.einsum("ij,ij->i", wa, wa)
        sqb = np.einsum("ij,ij->i", wb, wb)
        nwa = len(wa)
        best = np.empty(nwa, dtype=np.int64)
        best_j = np.empty(nwa, dtype=np.int64)
        for s in range(0, nwa, chunk):
            e = min(s + chunk, nwa)
            d = sqa[s:e, None] + sqb[None, :] - 2 * _gram_rows(wa, waf, s, e, wb, wbf)
            arg = d.argmin(axis=1)
            best[s:e] = d[np.arange(e - s), arg]
            best_j[s:e] = arg
        return pd.DataFrame(
            {
                **{k: pdf.iloc[0][k] for k in keys},
                "idx": np.arange(nwa, dtype=np.int32),
                "nn_idx": best_j.astype(np.int32),
                "nn_dist2": best,
            }
        )

    return tagged.groupBy(*keys).applyInPandas(profile, out_schema)


def matrix_profile_znorm(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    m: int,
    excl: int | None = None,
    max_points: int = 50_000,
    chunk: int = 1024,
) -> DataFrame:
    """Z-NORMALIZED matrix profile — the literature-standard variant
    (amplitude- and offset-invariant shape matching): every window is
    standardized to mean 0 / std 1 before the Euclidean distance, so a
    small daily wiggle and a large one with the same SHAPE are neighbors.
    Use this across series of different scales or when level shifts
    shouldn't matter; use :func:`matrix_profile` (exact integers) for
    same-unit tier series and oracle-exact verification.

    Float64 throughout (normalization divides by an irrational std, so
    there is no exact-integer formulation); deterministic for a given
    input — numpy evaluates the same expression tree every run — but NOT
    DuckDB-replayable, hence pytest-pinned against brute force instead of
    a gate oracle.  Constant windows (std 0) are z-undefined; they emit
    dist NaN→excluded as neighbors and skipped as query windows, the
    convention of the reference implementations (stumpy/mass exclude
    flat regions).  Output (keys…, idx, nn_idx, nn_dist) — dist is the
    z-normalized EUCLIDEAN distance (not squared), in [0, 2√m].
    """
    if m < 3:
        raise ValueError("matrix_profile_znorm window m must be >= 3")
    excl_z = max(1, m // 2) if excl is None else max(1, excl)
    keys = list(key_cols)
    key_fields = [series.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["idx int", "nn_idx int", "nn_dist double"]
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        v = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(v)
        if n > max_points:
            raise ValueError(
                f"matrix_profile_znorm: series has {n} points > "
                f"max_points={max_points}"
            )
        nw = n - m + 1
        empty = pd.DataFrame(
            {
                **{k: pd.Series(dtype=pdf[k].dtype) for k in keys},
                "idx": pd.Series(dtype="int32"),
                "nn_idx": pd.Series(dtype="int32"),
                "nn_dist": pd.Series(dtype="float64"),
            }
        )
        if nw < excl_z + 1:
            return empty
        W = np.lib.stride_tricks.sliding_window_view(v, m)
        mu = W.mean(axis=1, keepdims=True)
        sd = W.std(axis=1, keepdims=True)  # population std, stumpy's choice
        flat = (sd.ravel() == 0.0)
        Z = (W - mu) / np.where(sd == 0.0, 1.0, sd)
        Z[flat] = np.nan  # flat windows are z-undefined: never neighbors
        best = np.full(nw, np.inf)
        best_j = np.full(nw, -1, dtype=np.int64)
        jj = np.arange(nw)
        for s in range(0, nw, chunk):
            e = min(s + chunk, nw)
            # z-normalized d² = 2m − 2·Zᵢ·Zⱼ (each z-window has |Z|² = m)
            d = 2.0 * m - 2.0 * (Z[s:e] @ Z.T)
            d[np.abs(np.arange(s, e)[:, None] - jj[None, :]) < excl_z] = np.inf
            d[np.isnan(d)] = np.inf
            arg = d.argmin(axis=1)
            best[s:e] = d[np.arange(e - s), arg]
            best_j[s:e] = arg
        keep = ~flat & np.isfinite(best)
        out = pd.DataFrame(
            {
                **{k: pdf.iloc[0][k] for k in keys},
                "idx": np.arange(nw, dtype=np.int32)[keep],
                "nn_idx": best_j.astype(np.int32)[keep],
                "nn_dist": np.sqrt(np.maximum(best[keep], 0.0)),
            }
        )
        return out if len(out) else empty

    return (
        series.select(*keys, order_col, value_col)
        .groupBy(*keys)
        .applyInPandas(profile, out_schema)
    )


def top_motifs(
    profile: DataFrame,
    key_cols: Sequence[str],
    m: int,
    k: int = 3,
) -> DataFrame:
    """Top-k NON-OVERLAPPING motif pairs per series from a
    :func:`matrix_profile` result: profile rows ascending by distance,
    greedily kept while neither window overlaps (within m starts of) an
    already-kept pair's windows — the de-duplicated "recurring shapes"
    list a dashboard renders (Matrix Profile I §D top-k motif
    convention).  Greedy suppression is sequentially dependent, so it
    folds per series over the (tiny: ≤ a few k windows) sorted profile
    rows collected per key — the profile itself stays the distributed
    artifact.  Output (keys…, motif_rank, idx, nn_idx, nn_dist2)."""
    keys = list(key_cols)
    key_fields = [profile.schema[c] for c in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["motif_rank int", "idx int", "nn_idx int", "nn_dist2 long"]
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["nn_dist2", "idx"], kind="mergesort"
        )
        taken: list[tuple[int, int, int]] = []
        occupied: list[int] = []
        for r in pdf.itertuples(index=False):
            if len(taken) >= k:
                break
            if any(abs(r.idx - o) < m or abs(r.nn_idx - o) < m for o in occupied):
                continue
            taken.append((int(r.idx), int(r.nn_idx), int(r.nn_dist2)))
            occupied += [int(r.idx), int(r.nn_idx)]
        return pd.DataFrame(
            {
                **{c: pdf.iloc[0][c] for c in keys},
                "motif_rank": np.arange(1, len(taken) + 1, dtype=np.int32),
                "idx": np.asarray([t[0] for t in taken], dtype=np.int32),
                "nn_idx": np.asarray([t[1] for t in taken], dtype=np.int32),
                "nn_dist2": np.asarray([t[2] for t in taken], dtype=np.int64),
            }
        )

    return profile.groupBy(*keys).applyInPandas(pick, out_schema)
