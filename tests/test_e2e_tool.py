"""The end-to-end pipeline bench tool must not rot.

``tools/bench_e2e.py`` drives the complete north-star flow (pages synth →
Arrow link extraction → vertex dictionary → edges → PageRank, optional
FENNEL pass) in a fresh interpreter. One tiny-scale shell-out pins the
tool's wiring — a renamed library symbol or changed config field fails
here, not mid-benchmark.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_e2e_tiny_run():
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "bench_e2e.py"),
            "20000",
            "2",
            "4",
            "--fennel",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["rows_pages"] == 20000
    assert res["rows_vertices"] >= 20000
    assert res["rows_edges_directed"] > 0
    assert res["rows_edges_undirected"] <= res["rows_edges_directed"]
    assert res["edges_per_sec_per_superstep"] > 0
    assert 0.0 <= res["cut_ratio"] <= 1.0
    assert res["waste"] >= 0.0
