"""Build the --py-files artifact for cluster submission (north rule: "runs
via spark-submit --py-files on multi-executor clusters").

Produces ``dist/influxer_spark.zip`` containing the package (source only, no
tests/fixtures) so every executor's Python worker can import it:

    python tools/package_pyfiles.py
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/influxer_spark.zip \
        tools/submit_pipeline.py --pages s3://bucket/pages --catalog s3://bucket/cat

The engine has no third-party dependencies beyond pyspark/pyarrow/pandas/
numpy (all part of a standard Spark+Python executor image), so a plain zip
is sufficient — no conda-pack/venv shipping needed.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "influxer_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "influxer_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
