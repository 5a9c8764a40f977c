"""Named snapshot refs (catalog.create_tag / tags / resolve_ref) — the
Iceberg tag contract: a tagged snapshot is addressable by name on every
read path and immune to expire_snapshots until the tag is dropped."""

from __future__ import annotations

import pytest

from influxer_spark.catalog import TableCatalog


@pytest.fixture()
def tagged(spark, tmp_path):
    """v1 = two clean days (tagged 'release-1'), v2 = one day overwritten
    with corrupted values."""
    cat = TableCatalog(str(tmp_path))
    clean = spark.createDataFrame(
        [("2024-01-01", "a", 1.0), ("2024-01-02", "b", 2.0)],
        ["day", "user", "value"],
    )
    cat.write_partitions(clean, "t", ["2024-01-01", "2024-01-02"])
    cat.create_tag("t", "release-1")
    bad = spark.createDataFrame(
        [("2024-01-02", "b", 999.0)], ["day", "user", "value"]
    )
    cat.write_partitions(bad, "t", ["2024-01-02"])
    return cat


def test_tag_addresses_historical_snapshot(spark, tagged):
    cur = {(r["user"], r["value"]) for r in tagged.read_committed(spark, "t").collect()}
    assert ("b", 999.0) in cur
    old = {
        (r["user"], r["value"])
        for r in tagged.read_committed(spark, "t", as_of="release-1").collect()
    }
    assert old == {("a", 1.0), ("b", 2.0)}


def test_expire_keeps_tagged_snapshot_and_its_data(spark, tagged):
    dropped = tagged.expire_snapshots("t", keep_last=1)
    # tag pins snapshot 1: its manifest AND the pre-overwrite data dir survive
    assert 1 in tagged.snapshots("t")
    old = {
        (r["user"], r["value"])
        for r in tagged.read_committed(spark, "t", as_of="release-1").collect()
    }
    assert old == {("a", 1.0), ("b", 2.0)}
    assert dropped["manifests"] == 0  # nothing expirable: both snapshots held


def test_drop_tag_releases_snapshot_to_expiry(spark, tagged):
    tagged.drop_tag("t", "release-1")
    tagged.expire_snapshots("t", keep_last=1)
    assert tagged.snapshots("t") == [2]
    with pytest.raises(ValueError):
        tagged.read_committed(spark, "t", as_of="release-1")


def test_tag_validation(tagged):
    with pytest.raises(ValueError):  # unknown snapshot
        tagged.create_tag("t", "bad", snapshot=99)
    with pytest.raises(ValueError):  # tags are immutable refs
        tagged.create_tag("t", "release-1", snapshot=2)
    # re-tagging the SAME snapshot is an idempotent no-op
    assert tagged.create_tag("t", "release-1", snapshot=1) == 1
    with pytest.raises(ValueError):  # unknown tag on read
        tagged.resolve_ref("t", "nope")
