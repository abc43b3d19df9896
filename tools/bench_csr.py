"""CSR block-build micro-bench (round-1 task 3 / round-3 item 9).

End-to-end: synthetic canonical edge table → ``build_csr_blocks`` →
materialized block rows, on ``local[cores]`` with one FENNEL-style partition
per core, reporting symmetrized-edges/sec/core. "End-to-end" includes the
symmetrize + assignment joins + the (partition, src, dst) shuffle sort that
now replaces the per-block NumPy argsort, plus Arrow materialization.

Usage:
    python tools/bench_csr.py [n_pages] [cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from graph_partitioning_spark.session import get_spark
from graph_partitioning_spark.sources import synthetic_edges
from graph_partitioning_spark.plans.csr import build_csr_blocks

n_pages, cores = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"csr_bench{cores}", cpus=cores,
                  shuffle_partitions=max(2 * cores, 4))
edges = synthetic_edges(spark, n_pages).persist()
m = edges.count()
# one block per core: modular spread stands in for a FENNEL assignment
assign = spark.range(n_pages).select(
    "id", F.pmod("id", F.lit(cores)).cast("int").alias("partition")
).persist()
assign.count()

t0 = time.time()
blocks = build_csr_blocks(edges, assign).persist()
stats = blocks.agg(
    F.count("*").alias("blocks"), F.sum("n_edges").alias("edges")
).first()
wall = time.time() - t0
sym_m = int(stats["edges"])
print(json.dumps({
    "cores": cores, "n_pages": n_pages, "blocks": int(stats["blocks"]),
    "edges_in_blocks": sym_m, "wall_sec": round(wall, 2),
    "edges_per_sec_per_core": round(sym_m / wall / cores, 1),
}))
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(n_pages), str(cores)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            print(json.dumps(r))
            if not os.environ.get("SPARK_GRAFT_NO_WRITE"):
                with open("/root/repo/BENCH.md", "a") as f:
                    f.write(
                        f"\n### CSR block build end-to-end (local[{r['cores']}], "
                        f"{r['blocks']} blocks, shuffle-sorted adjacency)\n\n"
                        f"{r['edges_in_blocks']:,} block edges in {r['wall_sec']}s "
                        f"= **{r['edges_per_sec_per_core']:,.0f} edges/s/core** "
                        f"(includes symmetrize, assignment joins, shuffle sort, "
                        f"Arrow materialization).\n"
                    )
            return
    raise RuntimeError(f"worker failed:\n{out.stderr[-3000:]}")


if __name__ == "__main__":
    main()
