"""Web-scale FENNEL shuffle-path benchmark (round-3 top item).

The driver gate verifies the *broadcast* fast path (n <= broadcast_state_max).
This harness measures the path that matters at 100x — the shuffle-join loop
(``broadcast_state_max=0`` forces it regardless of graph size) — on the
>=100M-edge synthetic link graph, and compares its per-restream-pass cost to
a PageRank superstep on the same graph (the north-rule throughput unit).

One restream pass = ``micro_batches`` bucket steps that together join every
symmetrized edge against the assignment state exactly once, so
``edges/sec/pass`` is directly comparable to PageRank's ``edges/sec/superstep``.

Each configuration runs in its own subprocess (fixed JVM core count).

Usage:
    python tools/bench_fennel_scale.py [n_pages] [cpus] [k] [iters] [micro_batches]

Env:
    SPARK_GRAFT_SALTS   comma list of salt_buckets values to try (default "0")
    SPARK_GRAFT_NO_WRITE  skip the BENCH.md append
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from graph_partitioning_spark.session import get_spark
from graph_partitioning_spark.sources import synthetic_edges
from graph_partitioning_spark.graph import pagerank
from graph_partitioning_spark.graph.edges import symmetrize
from graph_partitioning_spark.partitioning import (
    FennelConfig, fennel_partition, modular_initial,
)
from graph_partitioning_spark.partitioning.metrics import cut_metrics, waste

n_pages, cpus, k, iters, micro = (int(a) for a in sys.argv[1:6])
salt = int(sys.argv[6]); init = sys.argv[7]; dec_bcast = int(sys.argv[8])
slack = float(sys.argv[9]) if sys.argv[9] != "none" else None
spark = get_spark(app_name=f"fennel_scale{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus)
edges = synthetic_edges(spark, n_pages).persist()
m = edges.count()  # materialize before timing

# PageRank superstep cost on the same graph = the comparison yardstick
t0 = time.time()
ranks, pinfo = pagerank(edges, damping=0.85, tol=0.0, max_iter=3)
ranks.count()
pr_superstep = pinfo["loop_sec"] / max(pinfo["iterations"], 1)
ranks.unpersist() if hasattr(ranks, "unpersist") else None

cfg = FennelConfig(
    num_partitions=k, num_iterations=iters, micro_batches=micro,
    broadcast_state_max=0,          # force the web-scale shuffle path
    salt_buckets=salt, converge_early=False, bucket_by="hash",
    inflow_cap_slack=slack,
)
if dec_bcast >= 0:
    cfg.decision_broadcast_max = dec_bcast
initial = modular_initial(spark.range(n_pages), k) if init == "mod" else None
t0 = time.time()
assign, info = fennel_partition(edges, cfg, initial=initial)
assign.persist(); assign.count()
fennel_wall = time.time() - t0
per_pass = fennel_wall / iters
cm = cut_metrics(edges, assign)
w = waste(assign, k)
sym_m = 2 * m
print(json.dumps({
    "cpus": cpus, "n_pages": n_pages, "edges_directed": m,
    "edges_symmetrized": sym_m, "k": k, "iterations": iters,
    "micro_batches": micro, "salt_buckets": salt, "init": init,
    "inflow_cap_slack": slack,
    "decision_broadcast_max": cfg.decision_broadcast_max,
    "changed_last_pass": info["changed_last_iteration"],
    "skew_ratio": info["counters"].get("skew_ratio"),
    "pagerank_superstep_sec": round(pr_superstep, 2),
    "fennel_wall_sec": round(fennel_wall, 2),
    "fennel_pass_sec": round(per_pass, 2),
    "pass_vs_pagerank_superstep": round(per_pass / pr_superstep, 2),
    "edges_per_sec_per_pass": round(sym_m / per_pass, 1),
    "cut_ratio": round(cm["cut_ratio"], 4),
    "waste": round(w, 4),
}))
"""


def run_cfg(n_pages, cpus, k, iters, micro, salt, init="cold",
            dec_bcast=-1, slack=None, debug=False) -> dict:
    env = dict(os.environ)
    if debug:
        env["SPARK_GRAFT_DEBUG"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(n_pages), str(cpus), str(k),
         str(iters), str(micro), str(salt), init, str(dec_bcast),
         "none" if slack is None else str(slack)],
        capture_output=True, text=True, timeout=5400, env=env,
    )
    for line in out.stdout.strip().splitlines():
        if line.startswith("[fennel]"):
            print("  " + line, flush=True)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    micro = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    salts = [int(s) for s in os.environ.get("SPARK_GRAFT_SALTS", "0").split(",")]

    rows = []
    init = os.environ.get("SPARK_GRAFT_INIT", "mod")
    dec_bcast = int(os.environ.get("SPARK_GRAFT_DEC_BCAST", "-1"))
    slack_env = os.environ.get("SPARK_GRAFT_SLACK", "none")
    slack = None if slack_env == "none" else float(slack_env)
    for salt in salts:
        r = run_cfg(n_pages, cpus, k, iters, micro, salt, init=init,
                    dec_bcast=dec_bcast, slack=slack,
                    debug=bool(os.environ.get("SPARK_GRAFT_DEBUG")))
        print(json.dumps(r), flush=True)
        rows.append(r)

    if os.environ.get("SPARK_GRAFT_NO_WRITE"):
        return
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## FENNEL web-scale shuffle path (broadcast gate forced off)\n\n"
            f"local[{cpus}], k={k}, {iters} restream passes x {micro} buckets, "
            f"{rows[0]['edges_symmetrized']:,} symmetrized edges "
            f"(skew ratio {rows[0]['skew_ratio']:.1f}).\n\n"
            "| salt | init | pass wall | edges/s/pass | vs PageRank superstep | cut ratio | waste |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['salt_buckets']} | {r['init']} | {r['fennel_pass_sec']}s | "
                f"{r['edges_per_sec_per_pass']:,.0f} | "
                f"{r['pass_vs_pagerank_superstep']}x | "
                f"{r['cut_ratio']} | {r['waste']} |\n"
            )


if __name__ == "__main__":
    main()
