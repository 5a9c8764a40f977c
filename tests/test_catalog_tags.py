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


def _vals(cat, spark, name, as_of=None):
    return {
        (r["user"], r["value"])
        for r in cat.read_committed(spark, name, as_of=as_of).collect()
    }


class TestBranches:
    def _base(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        df = spark.createDataFrame(
            [("2024-01-01", "a", 1.0)], ["day", "user", "value"]
        )
        cat.write_partitions(df, "t", ["2024-01-01"])
        return cat

    def test_branch_commits_invisible_until_fast_forward(self, spark, tmp_path):
        cat = self._base(spark, tmp_path)
        cat.create_branch("t", "audit")
        d2 = spark.createDataFrame(
            [("2024-01-02", "b", 2.0)], ["day", "user", "value"]
        )
        d3 = spark.createDataFrame(
            [("2024-01-03", "c", 3.0)], ["day", "user", "value"]
        )
        cat.write_partitions(d2, "t", ["2024-01-02"], branch="audit")
        cat.write_partitions(d3, "t", ["2024-01-03"], branch="audit")
        # two waves landed on the branch; main still sees only day 1
        assert _vals(cat, spark, "t") == {("a", 1.0)}
        assert _vals(cat, spark, "t", as_of="audit") == {
            ("a", 1.0), ("b", 2.0), ("c", 3.0)
        }
        head = cat.fast_forward("t", "audit")
        assert cat.current_snapshot("t") == head
        assert _vals(cat, spark, "t") == {("a", 1.0), ("b", 2.0), ("c", 3.0)}

    def test_fast_forward_refused_when_main_moved(self, spark, tmp_path):
        from influxer_spark.catalog import CommitConflictError

        cat = self._base(spark, tmp_path)
        cat.create_branch("t", "audit")
        d2 = spark.createDataFrame(
            [("2024-01-02", "b", 2.0)], ["day", "user", "value"]
        )
        cat.write_partitions(d2, "t", ["2024-01-02"], branch="audit")
        # a concurrent main-line commit forks history
        main2 = spark.createDataFrame(
            [("2024-01-05", "z", 9.0)], ["day", "user", "value"]
        )
        cat.write_partitions(main2, "t", ["2024-01-05"])
        with pytest.raises(CommitConflictError):
            cat.fast_forward("t", "audit")
        # main's commit is intact
        assert ("z", 9.0) in _vals(cat, spark, "t")

    def test_expire_keeps_branch_head_and_main_current(self, spark, tmp_path):
        cat = self._base(spark, tmp_path)
        cat.create_branch("t", "audit")
        d2 = spark.createDataFrame(
            [("2024-01-02", "b", 2.0)], ["day", "user", "value"]
        )
        cat.write_partitions(d2, "t", ["2024-01-02"], branch="audit")
        # branch head has the highest version; main current must survive too
        cat.expire_snapshots("t", keep_last=1)
        assert _vals(cat, spark, "t") == {("a", 1.0)}
        assert _vals(cat, spark, "t", as_of="audit") == {("a", 1.0), ("b", 2.0)}
        # dropping the branch releases its head at the next expiry
        cat.drop_branch("t", "audit")
        cat.expire_snapshots("t", keep_last=1)
        with pytest.raises(ValueError):
            cat.read_committed(spark, "t", as_of="audit")

    def test_expire_keeps_branch_ancestry_for_fast_forward(self, spark, tmp_path):
        # two waves on the branch, then expire: the INTERMEDIATE branch
        # snapshot must survive or fast_forward's ancestry walk breaks at
        # the missing manifest and refuses a perfectly publishable branch.
        cat = self._base(spark, tmp_path)
        cat.create_branch("t", "audit")
        for day, user, val in (
            ("2024-01-02", "b", 2.0), ("2024-01-03", "c", 3.0)
        ):
            cat.write_partitions(
                spark.createDataFrame([(day, user, val)],
                                      ["day", "user", "value"]),
                "t", [day], branch="audit",
            )
        cat.expire_snapshots("t", keep_last=1)
        head = cat.fast_forward("t", "audit")
        assert cat.current_snapshot("t") == head
        assert _vals(cat, spark, "t") == {("a", 1.0), ("b", 2.0), ("c", 3.0)}

    def test_branch_validation(self, spark, tmp_path):
        cat = self._base(spark, tmp_path)
        with pytest.raises(ValueError):
            cat.create_branch("t", "x", from_snapshot=42)
        cat.create_branch("t", "x")
        with pytest.raises(ValueError):
            cat.create_branch("t", "x")  # already exists
        with pytest.raises(ValueError):
            cat.drop_branch("t", "nope")
        with pytest.raises(ValueError):
            cat.write_partitions(
                spark.createDataFrame([("2024-01-02", "b", 2.0)],
                                      ["day", "user", "value"]),
                "t", ["2024-01-02"], branch="nope",
            )
