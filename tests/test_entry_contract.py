"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "bucket", "event_type", "cnt", "sum_v", "min_v", "max_v", "avg_v"
    }


def test_every_query_runs_at_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    q, o = set(E.queries()), set(E.oracle_sql())
    assert o <= q
    # every SQL-expressible query should carry an oracle; track exceptions here
    rows_only = q - o
    for name in rows_only:
        assert name.startswith(
            ("gorilla", "minhash", "simhash", "ann_", "stream",
             "holt_winters", "sketch", "bpe")
        ), (
            f"{name} has no oracle_sql entry but is not a known rows-only op"
        )


def test_gate_window_is_fully_value_oracled():
    """The driver records the FIRST 50 queries() entries: every one must
    carry a SQL oracle (rows-only entries belong at the tail, where they
    never burn a hard-signal slot)."""
    import __spark_entry__ as E

    window = list(E.queries())[:50]
    oracled = set(E.oracle_sql())
    missing = [n for n in window if n not in oracled]
    assert missing == [], missing
