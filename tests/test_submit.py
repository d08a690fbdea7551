"""North-rule deployment shape: ``spark-submit --py-files``.

The rule requires the job to "run via spark-submit --py-files on
multi-executor clusters". This test runs the EXACT prescribed
invocation (run_crawl.py docstring) — package zipped, entry script
copied to a bare working directory where ``searchengine_spark`` is NOT
importable from cwd or PYTHONPATH — so the crawl only works if the
zip actually ships the code to the driver and (for the Arrow-UDF
stages) the executors. Reference deployment point: the C++ engine is
one self-contained binary (SearchEngine.sln); our analogue is one zip
+ one entry script.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_pkg_zip(zpath: str) -> None:
    """zip -r searchengine_spark.zip searchengine_spark (py files only)."""
    pkg = os.path.join(REPO, "searchengine_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_crawl(tmp_path):
    zpath = str(tmp_path / "searchengine_spark.zip")
    _build_pkg_zip(zpath)
    entry = str(tmp_path / "run_crawl.py")
    shutil.copy(os.path.join(REPO, "run_crawl.py"), entry)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    store = str(tmp_path / "store")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--py-files",
            zpath,
            entry,
            "--store",
            store,
            "--rounds",
            "1",
            "--seeds",
            "8",
            "--n-shards",
            "2",
            "--master",
            "local[4]",
        ],
        cwd=str(tmp_path),  # searchengine_spark NOT importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rounds = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    # one round line + the final totals line, same shape the plain-python
    # CLI emits (verify recipe surface 1)
    assert any("round" in r and r["round"] == 0 for r in rounds)
    totals = [r for r in rounds if "total_docs" in r]
    assert totals and totals[0]["total_docs"] > 0
    assert totals[0]["seen_set"] >= totals[0]["total_docs"]
