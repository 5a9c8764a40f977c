"""The replica gate's comparison contract (tools/compare_oracle.py).

The driver hashes TYPED values, so dtype-KIND drift (int64 vs float64 —
"43200" vs "43200.0") must be a hard local failure even when every value
is numerically equal: that was the r03 twa_1h_cascade red (DuckDB
sum(BIGINT) → HUGEINT → float64 in .df()).  These fixtures pin the
contract so a future oracle can't regress it silently.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from compare_oracle import compare  # noqa: E402


def test_identical_frames_pass():
    a = pd.DataFrame({"k": ["x", "y"], "v": [1, 2]})
    b = pd.DataFrame({"v": [2, 1], "k": ["y", "x"]})  # order-insensitive
    assert compare("t", a, b) == []


def test_dtype_kind_drift_is_a_hard_failure():
    # numerically equal, typed differently: int64 vs float64 — the exact
    # shape of the r03 twa red.  MUST fail locally.
    a = pd.DataFrame({"v": pd.Series([43200, 86400], dtype="int64")})
    b = pd.DataFrame({"v": pd.Series([43200.0, 86400.0], dtype="float64")})
    errs = compare("t", a, b)
    assert any("dtype kind mismatch" in e for e in errs), errs


def test_int_width_drift_is_canonicalized_not_failed():
    # same KIND, different width (int32 vs int64) — canon() widens both
    # to int64, matching the driver's typed-hash behavior
    a = pd.DataFrame({"v": pd.Series([1, 2], dtype="int32")})
    b = pd.DataFrame({"v": pd.Series([1, 2], dtype="int64")})
    assert compare("t", a, b) == []


def test_value_and_rowcount_drift_fail():
    a = pd.DataFrame({"v": [1, 2]})
    assert any(
        "values differ" in e
        for e in compare("t", a, pd.DataFrame({"v": [1, 3]}))
    )
    assert any(
        "rowcount" in e
        for e in compare("t", a, pd.DataFrame({"v": [1, 2, 3]}))
    )


def test_null_mismatch_fails():
    # NULL-bearing numeric columns reach the gate as float64 (both
    # engines' to-pandas paths); a NULL-vs-value drift must fail
    a = pd.DataFrame({"v": [1.0, float("nan")]})
    b = pd.DataFrame({"v": [1.0, 2.0]})
    assert any("values differ" in e for e in compare("t", a, b))
    # equal NaN patterns pass (equal_nan comparison)
    c = pd.DataFrame({"v": [float("nan"), 1.0]})
    assert compare("t", a, c) == []
