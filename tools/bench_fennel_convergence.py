"""Multi-pass FENNEL convergence curve on the web-scale shuffle path.

Round-3 left "more passes converge it" unproven (BENCH.md round-3 table:
cut 0.83-0.87 after 1-2 passes at micro=2+cap). This harness runs the
195M-symmetrized-edge config to pass-plateau for micro ∈ {2, 8} (both with
`inflow_cap_slack=0.1` and `modular_initial`, the round-3 herding/
oscillation fixes) and records per pass: wall, changed, cut ratio, waste —
via the `on_pass` hook, so the symmetrized edge cache is built ONCE per
config, not once per pass count.

The curve picks the documented engine defaults (micro, slack, passes) and
doubles as the F6 evidence: restream-to-convergence is the declared
substitute for the SCOTCH static solver's one-shot quality.

Each config runs in its own subprocess (clean JVM). Usage:

    python tools/bench_fennel_convergence.py [n_pages] [cpus] [k] [max_passes]

Env: SPARK_GRAFT_MICROS="2,8"  SPARK_GRAFT_NO_WRITE=1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from graph_partitioning_spark.session import get_spark
from graph_partitioning_spark.sources import synthetic_edges
from graph_partitioning_spark.graph.edges import symmetrize
from graph_partitioning_spark.partitioning import (
    FennelConfig, fennel_partition, modular_initial,
)
from graph_partitioning_spark.partitioning.metrics import cut_metrics, waste

n_pages, cpus, k, micro, max_passes = (int(a) for a in sys.argv[1:6])
spark = get_spark(app_name=f"fennel_conv{micro}", cpus=cpus,
                  shuffle_partitions=2 * cpus)
edges = synthetic_edges(spark, n_pages).persist()
m = edges.count()

rows, t_prev = [], [time.time()]

def on_pass(it, assign, stats):
    wall = time.time() - t_prev[0]
    cm = cut_metrics(edges, assign)
    w = waste(assign, k)
    rows.append({
        "pass": it, "wall_sec": round(wall, 1),
        "changed": stats["changed"],
        "changed_frac": round(stats["changed"] / n_pages, 4),
        "cut_ratio": round(cm["cut_ratio"], 4), "waste": round(w, 4),
    })
    print(json.dumps(rows[-1]), flush=True)
    t_prev[0] = time.time()

cfg = FennelConfig(
    num_partitions=k, num_iterations=max_passes, micro_batches=micro,
    broadcast_state_max=0, converge_early=False, bucket_by="hash",
    inflow_cap_slack=0.1, extra={"on_pass": on_pass},
)
assign, info = fennel_partition(edges, cfg,
                                initial=modular_initial(spark.range(n_pages), k))
assign.count()
print(json.dumps({"config": {"micro": micro, "k": k, "n_pages": n_pages,
                             "edges_symmetrized": 2 * m,
                             "slack": 0.1, "init": "modular"},
                  "passes": rows}))
"""


def run_cfg(n_pages, cpus, k, micro, max_passes) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(n_pages), str(cpus), str(k),
         str(micro), str(max_passes)],
        capture_output=True, text=True, timeout=7200,
    )
    for line in out.stdout.strip().splitlines():
        if '"pass"' in line and '"passes"' not in line:
            print(f"  micro={micro} " + line, flush=True)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith('{"config"'):
            return json.loads(line)
    raise RuntimeError(f"worker failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    max_passes = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    micros = [int(x) for x in os.environ.get("SPARK_GRAFT_MICROS", "2,8").split(",")]

    results = [run_cfg(n_pages, cpus, k, micro, max_passes) for micro in micros]
    for r in results:
        print(json.dumps(r), flush=True)

    if os.environ.get("SPARK_GRAFT_NO_WRITE"):
        return
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            "\n## Round 4 — multi-pass FENNEL convergence "
            "(restream-to-plateau, the F6-role evidence)\n\n"
            f"`tools/bench_fennel_convergence.py`: local[{cpus}], k={k}, "
            f"{results[0]['config']['edges_symmetrized']:,} symmetrized edges, "
            "shuffle path forced, `modular_initial` + `inflow_cap_slack=0.1` "
            "(the round-3 defaults). Per-pass quality via the `on_pass` hook — "
            "one edge cache per config.\n\n"
            "| micro | pass | wall | changed frac | cut ratio | waste |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in results:
            mi = r["config"]["micro"]
            for p in r["passes"]:
                f.write(
                    f"| {mi} | {p['pass']} | {p['wall_sec']}s | "
                    f"{p['changed_frac']} | {p['cut_ratio']} | {p['waste']} |\n"
                )
        f.write("\n")


if __name__ == "__main__":
    main()
