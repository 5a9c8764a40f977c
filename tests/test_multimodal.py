"""Unit tests for the multimodal binary-column plumbing."""

from __future__ import annotations

import math

import pytest

from influxer_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "hello world")], ["doc_id", "text"]
    )
    return M.with_payload(df, "doc_id", "text")


def test_with_payload_schema(payloads):
    fields = {f.name: f.dataType.simpleString() for f in payloads.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["media"] == "struct<mime:string,n_bytes:bigint>"
    meta = {r["id"]: r["media"] for r in payloads.collect()}
    assert meta[1]["n_bytes"] == 4
    assert meta[3]["mime"] == "text/plain"


def test_byte_features_known_values(payloads):
    rows = {r["id"]: r for r in M.byte_features(payloads).collect()}
    # "aaaa": single byte value → entropy 0, mean = ord('a')
    assert rows[1]["n_bytes"] == 4
    assert rows[1]["entropy"] == 0.0
    assert rows[1]["mean_byte"] == float(ord("a"))
    assert rows[1]["first_byte"] == ord("a")
    # "ab": two equiprobable byte values → entropy exactly 1 bit
    assert rows[2]["entropy"] == pytest.approx(1.0, abs=0)
    # "hello world": entropy of the histogram, computed independently
    text = b"hello world"
    from collections import Counter
    p = [c / len(text) for c in Counter(text).values()]
    assert rows[3]["entropy"] == pytest.approx(-sum(x * math.log2(x) for x in p))


def test_decode_media_is_gated(payloads):
    with pytest.raises(NotImplementedError):
        M.decode_media(payloads, "image/jpeg")
