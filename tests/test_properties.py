"""Property-based tests (hypothesis) for the pure-Python kernels: Gorilla
codec round-trip over arbitrary series, scrub invariants, .NET round
idempotence, epoch truncation ordering."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from influxer_spark.ingest.config import RESERVED_CHARS, TimePrecision
from influxer_spark.ingest.refmodel import bround2
from influxer_spark.ingest.scrub import scrub_name
from influxer_spark.ingest.timestamps import py_parse_ts_epoch
from influxer_spark.operators.gorilla import decode, encode

# timestamps: positive, strictly increasing via positive deltas (series are
# bucket-sorted); values: any finite float64 plus exact-zero runs
_series = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**7),  # delta seconds
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    min_size=0,
    max_size=60,
)


@given(_series, st.integers(min_value=0, max_value=2**40))
@settings(max_examples=200, deadline=None)
def test_gorilla_roundtrip(series, t0):
    deltas = [d for d, _ in series]
    ts = np.asarray([t0] + list(t0 + np.cumsum(deltas)), dtype=np.int64)
    vs = np.asarray([0.0] + [v for _, v in series], dtype=np.float64)
    blob = encode(ts, vs)
    dts, dvs = decode(blob)
    assert np.array_equal(dts, ts)
    # bit-exact value equality (covers -0.0 and subnormals)
    assert np.array_equal(dvs.view(np.uint64), vs.view(np.uint64))


def test_gorilla_empty_series():
    blob = encode(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    dts, dvs = decode(blob)
    assert len(dts) == 0 and len(dvs) == 0


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_scrub_invariants(s):
    out = scrub_name(s)
    assert scrub_name(out) == out  # idempotent
    # '_' is the replacement char and itself reserved — the only reserved
    # char that may appear in output (exactly as the reference behaves)
    assert not any(c in RESERVED_CHARS for c in out if c != "_")
    assert "__" not in out  # runs collapse to a single underscore
    assert not out.startswith("_") and not out.endswith("_")


@given(st.floats(allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12))
@settings(max_examples=300, deadline=None)
def test_bround2_idempotent_and_close(v):
    r = bround2(v)
    assert bround2(r) == r
    assert abs(r - v) <= 0.005 + 1e-9 * abs(v)


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=300, deadline=None)
def test_epoch_us_truncation_toward_zero(us):
    try:
        ms_ts = py_parse_ts_epoch(us, TimePrecision.MICROSECONDS)
    except OverflowError:
        return  # outside datetime's year range — irrelevant magnitudes
    base = py_parse_ts_epoch(0, TimePrecision.MICROSECONDS)
    got_ms = round((ms_ts - base).total_seconds() * 1000)
    want_ms = abs(us) // 1000 * (1 if us >= 0 else -1)  # C# trunc toward zero
    assert got_ms == want_ms
