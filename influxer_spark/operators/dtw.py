"""Band-constrained Dynamic Time Warping distances between series pairs.

DTW is the classic "same shape, slightly shifted/stretched?" measure for
time series (Sakoe & Chiba 1978, public algorithm): it aligns two series
with a monotone warping path and sums the aligned-point costs, so a daily
load profile that runs 1-2 hours late still scores close to its template —
something Euclidean/corr (``corr_matrix``) and motif distance
(``matrixprofile``) both miss.  The Sakoe-Chiba band caps the warp at ±r
steps, which is both the standard accuracy guard and what keeps the DP
O(n·r) instead of O(n²).

Exactness discipline: inputs are integer ticks (quantize upstream, same
contract as ``trend``/``matrixprofile``); the per-cell cost is |a−b| and
the DP accumulates in int64, so the emitted cost is an exact BIGINT —
deterministic across runs and engines.  There is no SQL oracle for a DP
recurrence (the gate records this rows-only); semantics are pinned by a
brute-force reference DP in tests/test_dtw.py.

Execution shape: series fold to one array row each (bounded by
``max_points`` with a loud, counted error — run over a rollup TIER, e.g.
24-point daily profiles), pairs form with a condition-pruned self-join
(key_a < key_b), and each pair's DP runs vectorized anti-diagonal-free in
a Pandas UDF batch (numpy row sweep).  For k series that is k(k−1)/2
pairs of O(n·r) work — the same declared all-pairs posture as
``rollup.corr_matrix``: built for inter-series comparison panels (tens to
hundreds of series), not for corpus-scale nearest neighbor (that is the
ANN family's job).

The reference engine ships no series-similarity ops (Influxer is
ingest-only; Program.cs:78-102); this extends the analysis family beside
matrix_profile / SAX / ACF.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dtw_cost_banded(a: np.ndarray, b: np.ndarray, band: int) -> int:
    """Sakoe-Chiba banded DTW cost of two int64 vectors — exact int64.

    Row-sweep DP: row i holds min-cost paths ending at (i, j) for j in the
    band around i.  Cells outside the band are +inf (represented as a
    sentinel far above any reachable cost, so int arithmetic stays exact).
    """
    n, m = len(a), len(b)
    if abs(n - m) > band:
        # the band admits no monotone path between unequal-length series —
        # returning the sentinel would leak 2⁶² as a plausible cost, so
        # fail loudly like the max_points guard (gappy series should be
        # length-aligned, or the band widened, deliberately)
        raise ValueError(
            f"dtw: series lengths {n} and {m} differ by more than "
            f"band={band}; no warping path exists inside the band — "
            f"align the series or widen the band deliberately"
        )
    # any real path cost is < sum of all |a_i - b_j| maxima; this sentinel
    # is orders of magnitude above while leaving int64 headroom to add to
    sent = np.int64(2**62)
    prev = np.full(m + 1, sent, dtype=np.int64)
    prev[0] = 0
    cur = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur[:] = sent
        lo = max(1, i - band)
        hi = min(m, i + band)
        j = np.arange(lo, hi + 1)
        cost = np.abs(a[i - 1] - b[j - 1])
        # DP within the row is a prefix recurrence (cur[j-1] feeds cur[j]),
        # so sweep the short band serially — band is small by design
        for idx, jj in enumerate(j):
            best = min(prev[jj], prev[jj - 1], cur[jj - 1])
            cur[jj] = best + cost[idx]
        prev, cur = cur, prev
    return int(prev[m])


def dtw_pairs(
    series: DataFrame,
    key_col: str,
    order_col: str,
    tick_col: str,
    band: int = 2,
    max_points: int = 3_000,
) -> DataFrame:
    """All-pairs banded DTW over per-key integer-tick series.

    ``series`` rows are (key, order, tick BIGINT).  Emits one row per
    unordered key pair (key_a < key_b)::

        (key_a, key_b, n_a, n_b, dtw_cost)

    ``dtw_cost`` is the exact int64 band-constrained DTW sum of |Δtick|.
    Series longer than ``max_points`` fail loudly (the DP row sweep is
    O(n·band) per pair but the fold is one array row per series — same
    precondition as mk_theilsen/matrix_profile: run over a rollup tier).
    """
    folded = (
        series.select(key_col, order_col, tick_col)
        # engine convention: NULL tick = absent point — drop BEFORE the
        # fold (collect_list keeps None inside struct arrays, and the
        # int64 cast in the DP would raise an opaque TypeError instead of
        # this engine's loud, named errors)
        .filter(F.col(tick_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(order_col, tick_col))
            ).alias("_pts"),
            F.count("*").alias("_n"),
        )
        .select(
            F.col(key_col).alias("_k"),
            F.col(f"_pts.{tick_col}").alias("_v"),
            "_n",
        )
    )
    a = folded.select(
        F.col("_k").alias("key_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("n_a"),
    )
    b = folded.select(
        F.col("_k").alias("key_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("n_b"),
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))

    kt = series.schema[key_col].dataType.simpleString()
    out_schema = (
        f"key_a {kt}, key_b {kt}, n_a long, n_b long, dtw_cost long"
    )

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        costs = []
        for _, row in batch.iterrows():
            va = np.asarray(row["_va"], dtype=np.int64)
            vb = np.asarray(row["_vb"], dtype=np.int64)
            if len(va) > max_points or len(vb) > max_points:
                raise ValueError(
                    f"dtw_pairs: series pair ({row['key_a']!r}, "
                    f"{row['key_b']!r}) has {len(va)}/{len(vb)} points > "
                    f"max_points={max_points}; fold a coarser rollup tier "
                    f"or raise max_points deliberately"
                )
            costs.append(_dtw_cost_banded(va, vb, band))
        return pd.DataFrame(
            {
                "key_a": batch["key_a"],
                "key_b": batch["key_b"],
                "n_a": batch["n_a"].astype("int64"),
                "n_b": batch["n_b"].astype("int64"),
                "dtw_cost": pd.Series(costs, dtype="int64"),
            }
        )

    # mapInPandas streams pair batches through the DP — pairs of one key
    # spread across tasks, no single hot executor
    return pairs.mapInPandas(
        lambda it: (run(b) for b in it), out_schema
    )
