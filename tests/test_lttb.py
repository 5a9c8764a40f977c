"""LTTB downsampling (operators/lttb.py) vs a plain-Python mirror of
Steinarsson's algorithm with the engine's exact arithmetic."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from influxer_spark.operators.lttb import lttb

T0 = dt.datetime(2024, 1, 1)


def _series(spark, values, key="a"):
    rows = [
        (key, T0 + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def py_lttb(ts, vs, t):
    x = [d.timestamp() for d in ts]  # container TZ is UTC, like the session
    L = len(vs)
    if L <= t:
        return list(zip(ts, vs))
    nb = t - 2
    every = (L - 2.0) / float(nb)
    bound = lambda i: 1 + int(math.floor(i * every))  # noqa: E731
    out = [(ts[0], vs[0])]
    prev = 0
    for i in range(nb):
        s, e, e2 = bound(i), bound(i + 1), bound(i + 2)
        px, py = x[prev], vs[prev]
        if i == nb - 1:
            ax, ay = x[L - 1], vs[L - 1]
        else:
            cnt = float(e2 - e)
            sx = 0.0
            sy = 0.0
            for j in range(e, e2):
                sx = sx + x[j]
                sy = sy + vs[j]
            ax, ay = sx / cnt, sy / cnt
        best, best_a = s, -1.0
        for j in range(s, e):
            a = abs((px - ax) * (vs[j] - py) - (px - x[j]) * (ay - py))
            if a > best_a:
                best, best_a = j, a
        out.append((ts[best], vs[best]))
        prev = best
    out.append((ts[L - 1], vs[L - 1]))
    return out


def _run(spark, values, t):
    df = _series(spark, values)
    rows = lttb(df, ["k"], "ts", "v", t).orderBy("ts").collect()
    got = [(int(r["ts"].timestamp()), r["lttb"]) for r in rows]
    want = [(int(p[0].timestamp()), p[1]) for p in py_lttb(
        [T0 + dt.timedelta(minutes=i) for i in range(len(values))],
        [float(v) for v in values], t)]
    return got, want


def test_lttb_matches_python_mirror(spark):
    values = [math.sin(i / 5.0) * 10 + (i % 13) * 0.7 for i in range(200)]
    got, want = _run(spark, values, 20)
    assert got == want and len(got) == 20


def test_lttb_keeps_endpoints_and_peaks(spark):
    values = [0.0] * 50
    values[17] = 100.0  # an isolated spike LTTB must keep
    got, _ = _run(spark, values, 10)
    ts = [g[0] for g in got]
    assert int(T0.timestamp()) == ts[0]
    assert int((T0 + dt.timedelta(minutes=49)).timestamp()) == ts[-1]
    assert any(g[1] == 100.0 for g in got)


def test_lttb_short_series_passthrough(spark):
    values = [1.0, 5.0, 2.0]
    got, want = _run(spark, values, 10)
    assert got == want and len(got) == 3


def test_lttb_mirror_x_epoch_mapping(spark):
    """The x coordinate is whole epoch seconds — a mirror sanity anchor."""
    got, want = _run(spark, [float(i) for i in range(7)], 5)
    assert got == want


def test_lttb_threshold_validation(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0])
    with pytest.raises(ValueError):
        lttb(df, ["k"], "ts", "v", 2)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(_finite, min_size=3, max_size=80),
       t=st.integers(min_value=3, max_value=12))
def test_property_lttb_bit_exact(spark, vals, t):
    got, want = _run(spark, vals, t)
    assert got == want
