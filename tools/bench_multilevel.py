"""Multilevel-partitioner scale bench (F6 role at web scale).

Runs `multilevel_partition` on the deterministic synthetic link graph and,
for comparison on the same input, a seeded capped restream (the streaming
alternative whose 195M-edge convergence curve is in BENCH.md round 4).
Reports per-level shrink + wall, coarse/refine cost, and cut/waste of both
paths. Appends a BENCH.md section unless SPARK_GRAFT_NO_WRITE.

Usage:
    python tools/bench_multilevel.py [n_pages] [k] [coarsen_to] [restream_passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from graph_partitioning_spark.session import get_spark  # noqa: E402
from graph_partitioning_spark.graph.edges import undirect  # noqa: E402
from graph_partitioning_spark.partitioning import (  # noqa: E402
    FennelConfig,
    MultilevelConfig,
    fennel_partition,
    modular_initial,
    multilevel_partition,
)
from graph_partitioning_spark.partitioning.metrics import cut_metrics, waste  # noqa: E402
from graph_partitioning_spark.sources import synthetic_edges  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    coarsen_to = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    spark = get_spark(app_name="bench_multilevel")
    edges = undirect(synthetic_edges(spark, n_pages)).persist()
    m = edges.count()

    cfg = FennelConfig(
        num_partitions=k,
        num_iterations=4,
        micro_batches=8,
        inflow_cap_slack=0.1,
    )
    ml = MultilevelConfig(
        coarsen_to=coarsen_to,
        max_levels=10,
        refine_iterations=1,
        coarsener=os.environ.get("SPARK_GRAFT_COARSENER", "lpa"),
    )

    t0 = time.time()
    assign, info = multilevel_partition(edges, cfg, ml)
    n = assign.count()
    ml_wall = time.time() - t0
    ml_cut = cut_metrics(edges, assign)
    ml_waste = waste(assign, k, n_nodes=n)

    rs_cfg = FennelConfig(
        num_partitions=k,
        num_iterations=passes,
        micro_batches=8,
        inflow_cap_slack=0.1,
    )
    t0 = time.time()
    seed = modular_initial(assign.select("id"), k)
    rs_assign, _ = fennel_partition(edges, rs_cfg, initial=seed)
    rs_assign.count()
    rs_wall = time.time() - t0
    rs_cut = cut_metrics(edges, rs_assign)
    rs_waste = waste(rs_assign, k, n_nodes=n)

    lines = [
        f"\n## Multilevel partitioner at scale ({m:,} undirected edges, "
        f"{n:,} vertices, k={k}, local[{spark.sparkContext.defaultParallelism}])\n\n",
        "| path | wall | cut ratio | waste |\n|---|---|---|---|\n",
        f"| multilevel ({ml.coarsener} coarsener, coarsen_to={coarsen_to:,}, "
        f"{len(info['levels'])} levels, refine 1 pass/level) | {ml_wall:,.1f}s | "
        f"{ml_cut['cut_ratio']:.3f} | {ml_waste:.3f} |\n",
        f"| seeded capped restream ({passes} passes) | {rs_wall:,.1f}s | "
        f"{rs_cut['cut_ratio']:.3f} | {rs_waste:.3f} |\n",
        "\nPer-level shrink (n → matched): "
        + "; ".join(f"{d['n']:,}→{d['matched']:,}" for d in info["levels"])
        + f"; coarse n = {info['coarse_n']:,}.\n",
    ]
    text = "".join(lines)
    print(text)
    if not os.environ.get("SPARK_GRAFT_NO_WRITE"):
        with open("/root/repo/BENCH.md", "a") as f:
            f.write(text)


if __name__ == "__main__":
    main()
