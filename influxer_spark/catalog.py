"""Table catalog: Iceberg when the runtime jar is present, parquet-directory
tables with atomic manifest commits otherwise (SURVEY.md §7 step 1).

The reference's sink is InfluxDB (DB/retention-policy creation at
Influxer/Program.cs:115-140, Influxer/GenericFile.cs:250-280).  Our sink is a
table catalog:

- **Iceberg path** (preferred on a real cluster): ``df.writeTo(tbl)`` with
  ``PARTITIONED BY (days(warc_ts))`` so retention expiry is a metadata-only
  partition drop and time-range queries prune partitions.
- **Parquet fallback** (this sandbox has no Iceberg runtime jar): one
  directory per table, partition subdirs via ``partitionBy``, and a
  ``_manifest.json`` committed by atomic rename carrying the committed
  partition list + per-run lineage.  Overwrites are idempotent per partition
  (dynamic partition overwrite), which is what makes checkpoint/resume exact
  (SURVEY.md §7 hard part iv).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


@dataclass
class TableCatalog:
    """Parquet-directory catalog with manifest-based atomic commits."""

    root: str
    runs: list[dict[str, Any]] = field(default_factory=list)

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.table_path(name), "_manifest.json")

    def read_manifest(self, name: str) -> dict[str, Any]:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return {"partitions": {}, "lineage": []}
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, name: str, manifest: dict[str, Any]) -> None:
        os.makedirs(self.table_path(name), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.table_path(name), suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path(name))  # atomic on POSIX

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))

    def committed_partitions(self, name: str) -> dict[str, dict[str, Any]]:
        return self.read_manifest(name)["partitions"]

    def write_partition(
        self,
        df: DataFrame,
        name: str,
        partition_value: str,
        counters: dict[str, Any] | None = None,
        lineage: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Idempotently (over)write one partition of ``name``.

        Data lands in ``<table>/p=<partition_value>/`` via a staging dir +
        rename; the manifest commit is the only visibility point, so a crash
        between data write and manifest leaves the old committed state intact
        (resume re-does the partition — exactly-once at the partition level).
        """
        part_dir = os.path.join(self.table_path(name), f"p={partition_value}")
        staging = part_dir + f".staging-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        old_dirs = self._swap_in(staging, part_dir)

        manifest = self.read_manifest(name)
        entry = {
            "committed_at": time.time(),
            "counters": counters or {},
            "lineage": lineage or {},
        }
        manifest["partitions"][partition_value] = entry
        manifest["lineage"].append({"partition": partition_value, **entry})
        self._commit_manifest(name, manifest)
        self._drop_old(old_dirs)
        return entry

    def _swap_in(self, staging: str, dest: str) -> list[str]:
        """Swap staged data into place WITHOUT destroying the previous
        committed data: the old dir is renamed aside to a hidden ``.old-*``
        name (invisible to Spark readers, which skip dot-dirs) and deleted
        only AFTER the manifest commit succeeds — a crash anywhere in between
        leaves every committed partition's bytes still on disk."""
        olds: list[str] = []
        if os.path.exists(dest):
            aside = os.path.join(
                os.path.dirname(dest),
                f".old-{uuid.uuid4().hex[:8]}-{os.path.basename(dest)}",
            )
            os.replace(dest, aside)
            olds.append(aside)
        os.replace(staging, dest)
        return olds

    @staticmethod
    def _drop_old(old_dirs: list[str]) -> None:
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)

    def vacuum(self, name: str) -> int:
        """Remove garbage from crashed runs: hidden ``.old-*`` / ``.wave-*`` /
        ``*.staging-*`` dirs.  Safe under the single-writer assumption — every
        live write's temp dirs exist only within one write_partition(s) call."""
        tdir = self.table_path(name)
        if not os.path.isdir(tdir):
            return 0
        n = 0
        for d in os.listdir(tdir):
            if d.startswith((".old-", ".wave-")) or ".staging-" in d:
                shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                n += 1
        return n

    def write_partitions(
        self,
        df: DataFrame,
        name: str,
        partition_values: list[str],
        day_col: str = "day",
        counters_by_partition: dict[str, dict[str, Any]] | None = None,
        lineage_by_partition: dict[str, dict[str, Any]] | None = None,
    ) -> None:
        """Idempotently (over)write MANY partitions of ``name`` in ONE Spark
        job (``partitionBy`` into staging, then per-partition rename + a
        single manifest commit).

        This is the wave-mode commit path: at 1000-executor scale, pending
        partitions are processed as one job wave, not a serial loop — the
        per-partition granularity survives only in the COMMIT (manifest) and
        RESUME (pending-set) logic, never in job structure.  A crash between
        renames and the manifest commit leaves the previous committed state
        authoritative; resume redoes the whole wave (partition-level
        exactly-once, same contract as :meth:`write_partition`).
        """
        self.vacuum(name)
        staging = os.path.join(self.table_path(name), f".wave-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").partitionBy(day_col).parquet(staging)
        manifest = self.read_manifest(name)
        old_dirs: list[str] = []
        for pv in partition_values:
            src = os.path.join(staging, f"{day_col}={pv}")
            dest = os.path.join(self.table_path(name), f"p={pv}")
            if not os.path.exists(src):
                # zero rows staged for this value: no data dir, no manifest
                # entry — committing one would make read_partition throw later
                continue
            old_dirs.extend(self._swap_in(src, dest))
            entry = {
                "committed_at": time.time(),
                "counters": (counters_by_partition or {}).get(pv, {}),
                "lineage": (lineage_by_partition or {}).get(pv, {}),
            }
            manifest["partitions"][pv] = entry
            manifest["lineage"].append({"partition": pv, **entry})
        self._commit_manifest(name, manifest)
        self._drop_old(old_dirs)
        shutil.rmtree(staging, ignore_errors=True)

    def read_partitions_with_key(
        self, spark: SparkSession, name: str, partition_values: list[str]
    ) -> DataFrame:
        """Read given partitions keeping the partition value as column ``p``."""
        paths = [
            os.path.join(self.table_path(name), f"p={v}")
            for v in partition_values
            if os.path.exists(os.path.join(self.table_path(name), f"p={v}"))
        ]
        from pyspark.sql import functions as F

        df = spark.read.option("basePath", self.table_path(name)).parquet(*paths)
        # partition inference types p=2024-03-01 as DATE; keep the catalog's
        # partition keys as plain strings
        return df.withColumn("p", F.col("p").cast("string"))

    def read_partition(self, spark: SparkSession, name: str, partition_value: str) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.table_path(name), f"p={partition_value}")
        )

    def read_committed(self, spark: SparkSession, name: str) -> DataFrame:
        """Read ONLY manifest-committed partitions (staging/uncommitted dirs
        are invisible — the parquet-dir analogue of Iceberg snapshot reads)."""
        parts = sorted(self.committed_partitions(name))
        paths = [
            os.path.join(self.table_path(name), f"p={p}")
            for p in parts
            if os.path.exists(os.path.join(self.table_path(name), f"p={p}"))
        ]
        if not paths:
            raise ValueError(f"table {name} has no committed partitions")
        return spark.read.parquet(*paths)

    def drop_partition(self, name: str, partition_value: str, reason: str = "") -> bool:
        """Metadata-first partition drop (the parquet-dir analogue of Iceberg
        ``expire_snapshots`` / partition delete)."""
        manifest = self.read_manifest(name)
        if partition_value not in manifest["partitions"]:
            return False
        del manifest["partitions"][partition_value]
        manifest["lineage"].append(
            {"partition": partition_value, "dropped_at": time.time(), "reason": reason}
        )
        self._commit_manifest(name, manifest)
        part_dir = os.path.join(self.table_path(name), f"p={partition_value}")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        return True
