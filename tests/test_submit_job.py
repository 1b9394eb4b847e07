"""North-rule deployment shape: the pipeline must run via
``spark-submit --py-files`` from a foreign cwd with the package
shipped only as a zip (catches executor ModuleNotFoundError and
repo-cwd-only assumptions that in-process tests hide)."""

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end():
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest
        pytest.skip("spark-submit not on this machine")
    with tempfile.TemporaryDirectory() as td:
        zip_path = os.path.join(td, "toshi_spark.zip")
        pkg = os.path.join(REPO, "toshi_spark")
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, REPO))
        out = subprocess.run(
            [spark_submit, "--master", "local[4]",
             "--py-files", zip_path,
             os.path.join(REPO, "submit_job.py"),
             "600", os.path.join(td, "ix"), "w0"],
            capture_output=True, text=True, timeout=420,
            cwd=td,  # foreign cwd: only --py-files provides the package
        )
        assert out.returncode == 0, out.stderr[-2000:]
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        assert payload["indexed_docs"] == 600
        assert payload["term"] == "w0"
        assert len(payload["top10"]) == 10
        assert len(payload["segments"]) >= 1
