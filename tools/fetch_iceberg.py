"""Round-start escape hatch: try to fetch the real Iceberg Spark runtime.

The engine's catalog (influxer_spark/catalog.py) reimplements Iceberg
semantics natively over parquet because the sandbox ships no
iceberg-spark-runtime jar and blocks the network.  If either ever changes,
dropping the jar into $SPARK_HOME/jars (or pointing SPARK_GRAFT_ICEBERG_JAR
at it) un-skips tests/test_iceberg_runtime.py, which then proves the
catalog's snapshot/expiry semantics against the real runtime.

Usage:  python tools/fetch_iceberg.py        # attempt + one-line verdict
Exit code 0 always (the attempt itself is the deliverable; its outcome is
logged for BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import urllib.request

JAR = "iceberg-spark-runtime-4.0_2.13"
URL = (
    "https://repo1.maven.org/maven2/org/apache/iceberg/"
    f"{JAR}/maven-metadata.xml"
)
CACHE = os.path.join(os.path.dirname(__file__), ".iceberg_jar")


def main() -> int:
    if os.environ.get("SPARK_GRAFT_ICEBERG_JAR") or (
        os.path.isdir(CACHE) and os.listdir(CACHE)
    ):
        print("iceberg runtime already available; nothing to do")
        return 0
    try:
        with urllib.request.urlopen(URL, timeout=20) as resp:
            meta = resp.read().decode()
        print(
            f"maven central reachable; latest {JAR} metadata "
            f"({len(meta)} bytes) — download the versioned jar into "
            f"{CACHE}/ and set SPARK_GRAFT_ICEBERG_JAR to enable the "
            "real-runtime suite"
        )
    except Exception as exc:  # noqa: BLE001 - the outcome IS the result
        print(f"maven central unreachable from this sandbox: {exc!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
