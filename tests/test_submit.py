"""Deployment-shape test: the package runs via spark-submit --py-files
(the north-rule cluster entry path), with executors resolving
geofileops_spark from the shipped zip — not from the repo cwd."""

from __future__ import annotations

import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def _build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "geofileops_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("spark-submit not available")
    pkg_zip = str(tmp_path / "gfo_pkg.zip")
    _build_zip(pkg_zip)
    env = dict(os.environ)
    # the job must resolve the package from the zip, not the cwd
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pkg_zip,
            os.path.join(REPO, "tools", "submit_smoke.py"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "SUBMIT_SMOKE_OK" in res.stdout, (
        res.stdout[-2000:],
        res.stderr[-2000:],
    )
