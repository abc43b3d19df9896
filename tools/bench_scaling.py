"""Scaling-efficiency evidence for the north-rule's two-cluster-size test.

No real cluster exists in this sandbox, so (per the driver instruction) the
same job runs at two parallelism levels — N and 4N *cores* — on the same
input, and we report throughput at both plus the efficiency

    efficiency = throughput(4N) / (4 × throughput(N))

The job is the headline workload: PageRank supersteps (fixed count,
tol=0) over the deterministic synthetic link graph (power-law in-degree),
big enough that superstep work, not scheduling overhead, dominates.

Methodology notes (what made early samples unfair):

* **CPU pinning.** ``local[N]`` alone does NOT model an N-core node: the
  JVM still sees all 32 host cores and spawns GC/JIT/Netty pools sized to
  them, so the "local[1]" loop was observed running at ~115% CPU — the
  baseline borrows cores the 4N run already owns, deflating efficiency.
  Each level therefore runs under ``taskset -c 0..N-1``; JVM 17 sizes its
  thread pools from the affinity mask, so the pinned run is an honest
  N-core node (GC and compute share the N cores, as they would on a real
  executor host).
* **Shared input.** The synthetic edge table is generated ONCE (unpinned,
  all cores) to a parquet snapshot; every level reads + persists that
  snapshot before the timed loop. Generation noise then cancels out of
  the ratio instead of being resampled per level.
* Each level runs in its own subprocess (a JVM's core count is fixed at
  startup). Results are appended to BENCH.md unless SPARK_GRAFT_NO_WRITE.

Usage:
    python tools/bench_scaling.py [n_pages] [iters] [N]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from graph_partitioning_spark.session import get_spark
from graph_partitioning_spark.sources import synthetic_edges

n_pages = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark(app_name="scale_gen", shuffle_partitions=64)
synthetic_edges(spark, n_pages).write.mode("overwrite").parquet(path)
spark.stop()
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from graph_partitioning_spark.session import get_spark
from graph_partitioning_spark.graph import pagerank

path = sys.argv[1]; iters = int(sys.argv[2]); cpus = int(sys.argv[3])
parts = int(sys.argv[4])
# IDENTICAL plan at both parallelism levels: shuffle/cache partitioning is a
# job config a real cluster keeps fixed while growing N -> 4N executors.
# Deriving it from the core count (the old 2*cpus) changes the WORK between
# levels - fewer, larger map partitions make the map-side combine collapse
# more contributions per dst (measured at 195M edges: 4 partitions shuffle
# 794MB/superstep and 171 CPU-core-s, 16 partitions 1431MB and 221 core-s,
# +26% CPU for the same superstep) - so the old ratio measured a plan
# change, not core scaling.
spark = get_spark(app_name=f"scale{cpus}", cpus=cpus, shuffle_partitions=parts)
edges = spark.read.parquet(path).persist()
m = edges.count()  # materialize input before timing
ranks, info = pagerank(edges, damping=0.85, tol=0.0, max_iter=iters)
ranks.count()
# throughput over the superstep loop: prepare (one-time links/vertex build)
# is amortized over the full convergence run at production scale.
# steady_state drops superstep 1, which carries one-time JVM JIT/codegen
# warmup (~40% over steady state at 195M edges) — a fixed cost that is
# negligible over a production convergence run but, at a 4-superstep
# sample, weighs ~4x more on the (shorter) 4N-level loop than on the
# N-level loop and so systematically deflates the measured ratio.
iter_secs = info.get("iter_secs") or []
steady = iter_secs[1:] if len(iter_secs) > 1 else iter_secs
out = {
    "cpus": cpus, "n_edges": m, "iterations": info["iterations"],
    "wall_sec": info["loop_sec"], "prepare_sec": info["prepare_sec"],
    "edges_per_sec_per_superstep": round(m * info["iterations"] / info["loop_sec"], 1),
    "iter_secs": iter_secs,
    "skew_ratio": info["counters"].get("skew_ratio"),
}
if steady:
    out["steady_edges_per_sec_per_superstep"] = round(m * len(steady) / sum(steady), 1)
print(json.dumps(out))
"""


def ensure_snapshot(n_pages: int) -> str:
    path = f"/tmp/scale_edges_{n_pages}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        out = subprocess.run(
            [sys.executable, "-c", GEN, str(n_pages), path],
            capture_output=True, text=True, timeout=3600,
        )
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise RuntimeError(f"snapshot generation failed:\n{out.stderr[-2000:]}")
    return path


def run_level(path: str, iters: int, cpus: int, parts: int) -> dict:
    cmd = [sys.executable, "-c", WORKER, path, str(iters), str(cpus), str(parts)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-2000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    path = ensure_snapshot(n_pages)
    # one fixed partitioning for both levels: 2 tasks/core at the WIDE
    # level (so the narrow level runs the same tasks in more waves)
    parts = 2 * 4 * n
    lo = run_level(path, iters, n, parts)
    print(json.dumps(lo), flush=True)
    hi = run_level(path, iters, 4 * n, parts)
    print(json.dumps(hi), flush=True)

    eff = hi["edges_per_sec_per_superstep"] / (4 * lo["edges_per_sec_per_superstep"])
    summary = {
        "n_pages": n_pages,
        "n_edges": lo["n_edges"],
        "iterations": iters,
        f"throughput_local[{n}]": lo["edges_per_sec_per_superstep"],
        f"throughput_local[{4*n}]": hi["edges_per_sec_per_superstep"],
        "scaling_efficiency_Nx4": round(eff, 3),
        "skew_ratio": lo["skew_ratio"],
    }
    s_lo = lo.get("steady_edges_per_sec_per_superstep")
    s_hi = hi.get("steady_edges_per_sec_per_superstep")
    if s_lo and s_hi:
        summary["steady_scaling_efficiency_Nx4"] = round(s_hi / (4 * s_lo), 3)
        summary[f"steady_throughput_local[{n}]"] = s_lo
        summary[f"steady_throughput_local[{4*n}]"] = s_hi
    print(json.dumps(summary), flush=True)

    if os.environ.get("SPARK_GRAFT_NO_WRITE"):
        return
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run (PageRank {iters} supersteps, synthetic link graph, CPU-pinned)\n\n"
            f"| setting | value |\n|---|---|\n"
            f"| pages / directed edges | {n_pages:,} / {lo['n_edges']:,} |\n"
            f"| in-degree skew ratio (max/avg) | {lo['skew_ratio']:.1f} |\n"
            f"| throughput {n} cores | {lo['edges_per_sec_per_superstep']:,.0f} edges/s/superstep ({lo['wall_sec']}s) |\n"
            f"| throughput {4*n} cores | {hi['edges_per_sec_per_superstep']:,.0f} edges/s/superstep ({hi['wall_sec']}s) |\n"
            f"| **scaling efficiency N→4N** | **{eff:.3f}** |\n"
            + (
                f"| steady-state (superstep 1 warmup dropped) {n}→{4*n} | "
                f"{s_lo:,.0f} → {s_hi:,.0f} e/s/superstep, "
                f"**efficiency {s_hi / (4 * s_lo):.3f}** |\n"
                if s_lo and s_hi else ""
            )
        )


if __name__ == "__main__":
    main()
