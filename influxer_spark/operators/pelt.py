"""PELT exact changepoint segmentation (Killick, Fearnhead & Eckley 2012,
"Optimal detection of changepoints with a linear computational cost" —
public algorithm).

CUSUM (``operators/decompose.py``'s family) DETECTS drifts online; PELT
answers the offline question "where exactly did the level change, and how
many times?" by minimizing Σ segment-RSS + β·(#changepoints) over ALL
segmentations — exact (same optimum as the O(n²) optimal-partitioning DP)
with linear expected cost thanks to the pruning inequality: a candidate
start s can never win again once F(s) + C(s,t) > F(t), because C is
subadditive in t.

Cost: mean-shift RSS per segment, C(s, t) = Σx² − (Σx)²/n over ticks
(s, t], computed from exact int64 prefix sums — one float division per
candidate, deterministic.  Penalty β is in tick² units; the classic
BIC-ish default 2·σ̂²·ln n is offered via ``penalty=None``.

Execution shape: per-series fold (``applyInPandas``, the
mk_theilsen/matrixprofile posture): each series groups to one Arrow
batch, the DP runs in numpy-backed python over the pruned candidate set.
Series length bounded by ``max_points`` with a loud, counted error — run
over a rollup TIER.  One shuffle on the series key.

There is no SQL oracle for a pruned DP (the gate records this
rows-only); the kernel is pinned against an exhaustive
optimal-partitioning reference in tests/test_pelt.py.

The reference engine ships no changepoint ops (ingest-only,
Program.cs:78-102); this completes the monitoring family beside CUSUM /
EWMA / MAD / seasonal-band.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _seg_cost(c1: np.ndarray, c2: np.ndarray, s: int, t: int) -> float:
    """RSS of ticks (s, t] from prefix sums c1=Σx, c2=Σx² (exact int64)."""
    n = t - s
    sx = float(c1[t] - c1[s])
    sxx = float(c2[t] - c2[s])
    return sxx - (sx * sx) / n


def pelt_segments_1d(
    x: np.ndarray, penalty: float | None = None
) -> list[tuple[int, int]]:
    """PELT on one int64 tick vector → list of (start, end) index pairs
    (half-open, covering [0, n)).  ``penalty=None`` → 2·σ̂²·ln n with σ̂²
    the variance of first differences / 2 (robust to the level shifts
    being detected)."""
    n = len(x)
    if n == 0:
        return []
    if n == 1:
        return [(0, 1)]
    # numpy int64 overflow is silent — without this guard a large-tick
    # series would return a wrong (possibly negative) RSS with no error,
    # same discipline as matrixprofile._check_int64_bound
    peak = float(np.max(np.abs(x))) if n else 0.0
    if n * peak * peak >= float(2**63):
        raise ValueError(
            f"pelt: Σtick² can overflow int64 (n={n}, max|tick|={peak:.3g});"
            " quantize with a coarser tick or segment a shorter series"
        )
    c1 = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    c2 = np.concatenate(([0], np.cumsum(x.astype(np.int64) ** 2)))
    if penalty is None:
        d = np.diff(x.astype(np.float64))
        sigma2 = float(np.var(d)) / 2.0 if len(d) else 1.0
        penalty = 2.0 * max(sigma2, 1e-12) * np.log(n)
    beta = float(penalty)
    f = np.empty(n + 1)
    f[0] = -beta
    prev = np.zeros(n + 1, dtype=np.int64)
    cand = [0]
    for t in range(1, n + 1):
        costs = [f[s] + _seg_cost(c1, c2, s, t) + beta for s in cand]
        k = int(np.argmin(costs))
        f[t] = costs[k]
        prev[t] = cand[k]
        # pruning: s stays viable only while f[s] + C(s,t) <= f[t]
        cand = [
            s for s, c in zip(cand, costs) if c - beta <= f[t]
        ]
        cand.append(t)
    # backtrack
    segs: list[tuple[int, int]] = []
    t = n
    while t > 0:
        s = int(prev[t])
        segs.append((s, t))
        t = s
    segs.reverse()
    return segs


def pelt_changepoints(
    series: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tick_col: str,
    penalty: float | None = None,
    max_points: int = 100_000,
) -> DataFrame:
    """Per-series PELT segmentation over integer-tick points.

    ``series`` rows are (keys…, order_col, tick_col BIGINT); points rank
    by ``order_col``.  Emits one row per segment::

        (keys…, seg, start_idx, end_idx, n, mean)

    ``start_idx``/``end_idx`` are 0-based half-open ranks, ``mean`` the
    segment's exact-sum tick mean (one float division).
    """
    keys = list(key_cols)
    key_fields = [series.schema[k] for k in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["seg long", "start_idx long", "end_idx long", "n long",
           "mean double"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # engine convention: NULL tick = absent point (asap/theta filter
        # notna the same way) — without this, pandas casts NaN to
        # INT64_MIN silently and the overflow guard fires with a
        # misleading "quantize with a coarser tick" error
        pdf = pdf[pdf[tick_col].notna()]
        if not len(pdf):
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype=object) for k in keys},
                    "seg": pd.Series([], dtype="int64"),
                    "start_idx": pd.Series([], dtype="int64"),
                    "end_idx": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "mean": pd.Series([], dtype="float64"),
                }
            )
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[tick_col].to_numpy(dtype=np.int64)
        if len(x) > max_points:
            raise ValueError(
                f"pelt_changepoints: series "
                f"{tuple(pdf.iloc[0][k] for k in keys)!r} has {len(x)} "
                f"points > max_points={max_points}; segment a coarser "
                f"rollup tier or raise max_points deliberately"
            )
        segs = pelt_segments_1d(x, penalty)
        return pd.DataFrame(
            {
                **{k: np.repeat(pdf.iloc[0][k], len(segs)) for k in keys},
                "seg": np.arange(len(segs), dtype=np.int64),
                "start_idx": np.asarray([s for s, _ in segs], dtype=np.int64),
                "end_idx": np.asarray([e for _, e in segs], dtype=np.int64),
                "n": np.asarray([e - s for s, e in segs], dtype=np.int64),
                "mean": np.asarray(
                    [float(x[s:e].sum()) / (e - s) for s, e in segs]
                ),
            }
        )

    return (
        series.select(*keys, order_col, tick_col)
        .groupBy(*keys)
        .applyInPandas(run, out_schema)
    )
