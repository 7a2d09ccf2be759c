"""The north rule's packaging path, actually executed: spark-submit with
the package arriving ONLY via --py-files, UDFs crossing the worker pickle
boundary, one JSON result line out."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("no spark-submit on PATH")
    from citation_graph_spark.session import build_package_zip

    zip_path = build_package_zip(str(tmp_path / "cgs.zip"))
    env = dict(os.environ)
    # the package must come from --py-files, not from the repo checkout
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # nothing importable from here except the zip
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    got = json.loads(line)
    assert got["converged"] is True
    assert got["vertices"] > 0
    assert abs(got["rank_sum"] - 1.0) < 1e-6
