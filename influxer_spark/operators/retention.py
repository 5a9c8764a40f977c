"""Dependency-ordered retention DAG (SURVEY.md S7, [delegated→build]).

The reference looks up / creates InfluxDB retention policies and attaches one
to every point (Influxer/GenericFile.cs:250-280, Influxer/PerfmonFile.cs:
215-243); the server then expires data per policy.  Natively, each tier table
carries a TTL and a dependency: **a partition may be expired only after every
dependent (coarser) tier has committed the same partition** — raw expires only
after 1m is committed, 1m only after 1h, etc.  This mirrors the reference's
policy-precedence resolution (duration-vs-name lookup order at
Influxer/GenericFile.cs:252-266) as a DAG over materialized tiers.

Expiry is a metadata-first partition drop through the catalog (Iceberg
partition delete / parquet-dir manifest removal) — never a row-level DELETE
scan, so it is O(partitions), not O(rows), at 100 TB.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from influxer_spark.catalog import TableCatalog


@dataclass(frozen=True)
class RetentionPolicy:
    table: str
    ttl_days: int  # partitions older than now - ttl are candidates
    depends_on: str | None = None  # tier that must have committed the partition


DEFAULT_DAG = [
    RetentionPolicy("raw_points", ttl_days=7, depends_on="rollup_1m"),
    RetentionPolicy("rollup_1m", ttl_days=30, depends_on="rollup_1h"),
    RetentionPolicy("rollup_1h", ttl_days=365, depends_on="rollup_1d"),
    RetentionPolicy("rollup_1d", ttl_days=3650, depends_on=None),
]


def apply_retention(
    catalog: TableCatalog,
    policies: list[RetentionPolicy] | None = None,
    now: dt.date | None = None,
) -> dict[str, list[str]]:
    """Expire overdue day-partitions whose dependents are committed.

    Returns {table: [dropped partition, ...]}.  A partition past TTL whose
    dependent tier has NOT committed it is retained (and reported under
    ``"blocked:<table>"``) — expiry never races ahead of the rollup cascade.
    """
    policies = DEFAULT_DAG if policies is None else policies
    today = now or dt.date.today()
    report: dict[str, list[str]] = {}
    for pol in policies:
        if not catalog.exists(pol.table):
            continue
        cutoff = today - dt.timedelta(days=pol.ttl_days)
        dep_parts = (
            set(catalog.committed_partitions(pol.depends_on))
            if pol.depends_on and catalog.exists(pol.depends_on)
            else set()
        )
        dropped, blocked = [], []
        for part in sorted(catalog.committed_partitions(pol.table)):
            try:
                part_date = dt.date.fromisoformat(part)
            except ValueError:
                continue  # non-date partitions are never auto-expired
            if part_date >= cutoff:
                continue
            if pol.depends_on is not None and part not in dep_parts:
                blocked.append(part)
                continue
            dropped.append(part)
        if dropped:
            # ONE snapshot for the whole sweep — a year-deep TTL pass over a
            # day-partitioned table must not pay 365 manifest commits
            catalog.drop_partitions(
                pol.table, dropped, reason=f"ttl {pol.ttl_days}d (cutoff {cutoff})"
            )
            report[pol.table] = dropped
        if blocked:
            report[f"blocked:{pol.table}"] = blocked
    return report
