"""Funnel analysis: strict-order step matching with per-step windows."""

from __future__ import annotations

import datetime as dt

import pytest

from influxer_spark.operators.funnel import funnel_counts, funnel_times


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_strict_order_and_window(spark):
    """u1 converts fully; u2's click came BEFORE the view (order broken);
    u3's click is outside the window; u4 views twice and converts from
    the FIRST view (first-occurrence semantics)."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        (2, t(10), "click"), (2, t(11), "view"),
        (3, t(0), "view"), (3, t(45), "click"),
        (4, t(0), "view"), (4, t(20), "view"), (4, t(25), "click"),
    ]
    got = {
        r["step"]: (r["users"], r["conversion"])
        for r in funnel_counts(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within_seconds=30 * 60,
        ).collect()
    }
    assert got["view"] == (4, 1.0)
    assert got["click"] == (2, 0.5)      # u1 and u4
    assert got["purchase"] == (1, 0.25)  # u1 only
    times = {
        r["user"]: (r["t1"], r["t2"])
        for r in funnel_times(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"], 30 * 60,
        ).collect()
    }
    assert times[4] == (t(0), t(25))  # anchored at the FIRST view
    assert times[2][1] is None        # order broken → no step 2
    assert times[3][1] is None        # window expired


def test_funnel_needs_two_steps(spark):
    with pytest.raises(ValueError, match="two steps"):
        funnel_counts(
            _ev(spark, [(1, dt.datetime(2024, 1, 1), "view")]),
            "user_id", "ts", "event_type", ["view"], 60,
        )


def test_cohort_retention_hand_matrix(spark):
    """Hand-sized cohort matrix: day-1 cohort {u1,u2} with u1 back on
    day 2 and both back on day 3; day-2 cohort {u3} never returns."""
    from influxer_spark.operators.funnel import cohort_retention

    d = lambda n, h=0: dt.datetime(2024, 1, n, h)  # noqa: E731
    rows = [
        (1, d(1), "view"), (2, d(1, 5), "view"),
        (1, d(2), "view"),
        (1, d(3), "view"), (2, d(3, 9), "view"),
        (3, d(2, 1), "view"),
    ]
    got = {
        (r["cohort_day"].day, r["k"]): (
            r["cohort_size"], r["active"], r["retention"]
        )
        for r in cohort_retention(_ev(spark, rows), "user_id", "ts").collect()
    }
    assert got[(1, 0)] == (2, 2, 1.0)
    assert got[(1, 1)] == (2, 1, 0.5)
    assert got[(1, 2)] == (2, 2, 1.0)
    assert got[(2, 0)] == (1, 1, 1.0)
    assert (2, 1) not in got  # u3 never returned; absent, not zero


def test_event_transitions_counts_and_probs(spark):
    """Hand matrix: u1 view→click→view, u2 view→view.  Transitions:
    view→click 1, click→view 1, view→view 1 → P(click|view)=0.5."""
    from influxer_spark.operators.funnel import event_transitions

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "view"),
        (2, t(0), "view"), (2, t(3), "view"),
    ]
    got = {
        (r["cur"], r["nxt"]): (r["n"], r["p"])
        for r in event_transitions(
            _ev(spark, rows), "user_id", "ts", "event_type"
        ).collect()
    }
    assert got[("view", "click")] == (1, 0.5)
    assert got[("view", "view")] == (1, 0.5)
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 3


def test_funnel_latency_quantiles_hand_values(spark):
    """Delays 60s ×9 + 3600s ×1 for view→click: p50 lands in 60s's sketch
    bucket (exact: 60 < 2^11 region is fine-grained), p95 in 3600's —
    sketch lower bounds, rel error ≤ 2^-5."""
    from influxer_spark.operators.funnel import funnel_latency

    rows = []
    for u in range(9):
        rows += [(u, dt.datetime(2024, 1, 1, 0, 0), "view"),
                 (u, dt.datetime(2024, 1, 1, 0, 1), "click")]
    rows += [(99, dt.datetime(2024, 1, 1, 0, 0), "view"),
             (99, dt.datetime(2024, 1, 1, 1, 0), "click")]
    out = {
        r["step"]: (r["n"], r["q50"], r["q95"])
        for r in funnel_latency(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"], 7200, (0.5, 0.95),
        ).collect()
    }
    n, q50, q95 = out["click"]
    assert n == 10
    assert abs(q50 - 60) <= 60 / 32 + 1
    # nearest-rank: ceil(.95·10) = 10 → the one slow conversion
    assert abs(q95 - 3600) <= 3600 / 32 + 1
