"""North-rule deployment gate, EXECUTED: `spark-submit --py-files
graphiti_spark.zip tools/submit_job.py` on a local-cluster master (separate
executor JVMs — the faithful multi-executor topology this sandbox can run).

The job runs from a scratch cwd containing ONLY the entry script and the
zip, so `import graphiti_spark` on driver and executors can resolve ONLY
through --py-files — the test fails if the zip does not actually ship the
package (the exact failure mode of a real cluster deploy).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on host")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    # Build the deployment artifact exactly as the README prescribes.
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    stage = tmp_path / "deploy"
    stage.mkdir()
    shutil.copy(os.path.join(REPO, "graphiti_spark.zip"), stage / "graphiti_spark.zip")
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), stage / "submit_job.py")

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # The repo must be invisible except through --py-files.
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_MASTER", None)

    out_dir = tmp_path / "warehouse"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--py-files",
            str(stage / "graphiti_spark.zip"),
            str(stage / "submit_job.py"),
            "--master",
            "local-cluster[2,2,1536]",
            "--input-documents",
            "/root/testdata/sf0.001",
            "--output",
            str(out_dir),
        ],
        cwd=stage,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    # submit_job prints one JSON summary line on stdout.
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["counts"]["nodes"] > 0
    assert summary["counts"]["edges"] > 0
    assert summary["counts"]["episodes"] > 0
    assert summary["stages_run"], "pipeline claimed zero stages ran"
    # Stage snapshots committed under --output (checkpoint/resume contract).
    assert os.path.isdir(out_dir)
    assert any(os.scandir(out_dir)), "no committed stage snapshots"
