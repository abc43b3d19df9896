"""The spark-submit --py-files launch path must not rot (round-3 item 10).

``tools/run_spark_submit.sh`` zips the package and ships it via --py-files —
the cluster deployment contract the north rule names (the executors see only
the zip, never the repo checkout). One end-to-end shell-out at tiny scale
pins that packaging contract: a missing module in the zip, a stale
spark-submit flag, or an import that only works from the repo root all fail
here, not on a cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "run_spark_submit.sh")


def test_spark_submit_py_files_end_to_end():
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    if not (
        os.path.exists(os.path.join(spark_home, "bin", "spark-submit"))
        or shutil.which("spark-submit")
    ):
        pytest.skip("spark-submit not available")

    env = dict(os.environ)
    env["SPARK_GRAFT_SUBMIT_PAGES"] = "5000"
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    out = subprocess.run(
        ["bash", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/tmp",  # NOT the repo root: imports must come from the zip
    )
    assert out.returncode == 0, out.stderr[-3000:]
    payload = None
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            payload = json.loads(line)
            break
    assert payload is not None, f"no JSON line in stdout:\n{out.stdout[-2000:]}"
    assert payload["edges"] > 0
    assert payload["converged"] is True
    assert payload["top_rank"] > 0.0
