"""The cluster submission path (north rule: "runs via spark-submit
--py-files on multi-executor clusters").

Two contracts, both of which broke silently at least once:

1. ``get_spark`` must HONOUR the launcher's ``--master``.  Under Spark
   4's PythonRunner, ``SparkConf(loadDefaults=True)`` does NOT surface
   the submitted conf (measured: empty), so the factory keys off
   ``PYSPARK_GATEWAY_PORT`` — before that fix, a cluster submission was
   silently pinned to ``local[32]``.
2. The ``--py-files`` zip built by ``tools/package_pyfiles.py`` must be
   a self-sufficient import of ``influxer_spark`` (driver script run
   from an EMPTY cwd, repo not on sys.path).

Both run the REAL ``spark-submit`` binary in a subprocess; skipped when
it is not on PATH (pip-only pyspark installs).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _submit(args: list[str], cwd: str) -> str:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # the factory must see the submitted master, not the harness override
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        ["spark-submit", "--master", "local[3]", *args],
        capture_output=True, text=True, timeout=300, cwd=cwd, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_get_spark_honours_submitted_master(tmp_path):
    probe = tmp_path / "probe.py"
    probe.write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from influxer_spark.session import get_spark
        s = get_spark("probe")
        print("MASTER=" + s.sparkContext.master)
    """))
    got = _submit([str(probe)], cwd=str(tmp_path))
    assert "MASTER=local[3]" in got


def test_pyfiles_zip_is_self_sufficient(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from package_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "influxer_spark.zip"))
    driver = tmp_path / "driver.py"
    # imports ONLY from the zip: cwd is tmp, repo never on sys.path
    driver.write_text(textwrap.dedent("""
        from influxer_spark.session import get_spark
        from influxer_spark.pipeline import run_pipeline  # deep import chain
        s = get_spark("zipcheck")
        print("ZIP_OK=" + s.sparkContext.master)
    """))
    got = _submit(
        ["--py-files", zip_path, str(driver)], cwd=str(tmp_path)
    )
    assert "ZIP_OK=local[3]" in got
