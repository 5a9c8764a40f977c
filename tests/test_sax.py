"""SAX symbolization (operators/sax.py): known-shape words, z-normalization
invariance, incomplete-day handling, and motif ranking."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from influxer_spark.operators.sax import sax_motifs, sax_words

T0 = dt.datetime(2024, 1, 1)


def _day(spark, values, key="k", day0=0):
    rows = [
        (key, T0 + dt.timedelta(days=day0, hours=h), float(v))
        for h, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_ramp_maps_to_monotone_word(spark):
    # strictly increasing day: PAA means ascend through the alphabet
    df = _day(spark, list(range(24)))
    out = sax_words(df, ["k"], "ts", "v").collect()
    assert len(out) == 1
    word = out[0]["word"]
    assert word == "".join(sorted(word))  # monotone non-decreasing letters
    assert word[0] == "a" and word[-1] == "d"


def test_z_normalization_invariance(spark):
    vals = [5, 1, 4, 9, 2, 8, 3, 7, 0, 6, 5, 1, 4, 9, 2, 8, 3, 7, 0, 6, 5, 1, 4, 9]
    base = sax_words(_day(spark, vals), ["k"], "ts", "v").first()["word"]
    scaled = sax_words(
        _day(spark, [100.0 + 7.0 * v for v in vals]), ["k"], "ts", "v"
    ).first()["word"]
    assert scaled == base  # affine transforms don't change the shape


def test_constant_day_is_all_mid_letter(spark):
    out = sax_words(_day(spark, [3.0] * 24), ["k"], "ts", "v").first()
    assert out["word"] == "c" * 6  # std=0 → z=0 → first letter >= 0


def test_incomplete_days_dropped(spark):
    df = _day(spark, list(range(20)))  # 20 of 24 buckets
    assert sax_words(df, ["k"], "ts", "v").count() == 0


def test_motifs_rank_recurring_shapes(spark):
    ramp = list(range(24))
    vee = list(range(12, 0, -1)) + list(range(12))
    days = []
    for d in range(5):
        days.append(_day(spark, ramp, day0=d))  # 5 ramp days
    for d in range(5, 8):
        days.append(_day(spark, vee, day0=d))  # 3 vee days
    df = days[0]
    for other in days[1:]:
        df = df.unionByName(other)
    words = sax_words(df, ["k"], "ts", "v")
    top = sax_motifs(words, ["k"], top=2).orderBy("rank").collect()
    assert top[0]["n_days"] == 5 and top[1]["n_days"] == 3
    assert top[0]["rank"] == 1 and top[1]["rank"] == 2
