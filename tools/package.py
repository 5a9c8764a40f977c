"""Build the --py-files artifact and print the spark-submit command
(north rule: "runs via spark-submit --py-files on multi-executor clusters").

Usage:
    python tools/package.py [dist_dir]          # writes dist/influxer_spark.zip
    python tools/package.py --print-submit      # show the submit command

The zip contains the pure-Python package only (no data, no tests); every
module gates optional deps behind import-try, so executors need just
pyspark + pyarrow + pandas + numpy.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dist_dir: str) -> str:
    os.makedirs(dist_dir, exist_ok=True)
    out = os.path.join(dist_dir, "influxer_spark.zip")
    pkg = os.path.join(REPO, "influxer_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


SUBMIT_TEMPLATE = """\
spark-submit \\
  --deploy-mode cluster \\
  --py-files {zip_path} \\
  --conf spark.sql.session.timeZone=UTC \\
  --conf spark.sql.adaptive.enabled=true \\
  --conf spark.sql.adaptive.skewJoin.enabled=true \\
  --conf spark.sql.execution.arrow.pyspark.enabled=true \\
  --conf spark.sql.shuffle.partitions=<3x total executor cores> \\
  your_job.py  # e.g. calls influxer_spark.pipeline.run_pipeline(...)
"""


def main() -> None:
    if "--print-submit" in sys.argv:
        print(SUBMIT_TEMPLATE.format(zip_path="dist/influxer_spark.zip"))
        return
    dist = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    out = build_zip(dist)
    print(out)


if __name__ == "__main__":
    main()
