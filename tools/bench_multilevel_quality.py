"""Multilevel F6 quality bench: boundary-FM refinement vs restream.

Round-4 finding (BENCH.md): on the community-FREE preferential-attachment
web graph, seeded capped restream beat the multilevel pyramid on cut
(0.737 vs 0.777 at 19.5M edges) — the F6 "quality" role was carried by
restream-to-plateau. Round 5 adds boundary-vertex-only FM refinement
(multilevel.refine_boundary, the Karypis-Kumar §4 sweep) and this bench
measures all three paths on BOTH graph families at ≥10M edges:

* the synthetic web graph (no planted structure — the hard case), and
* a planted-partition graph (sources.planted_edges — the case multilevel
  schemes exist for).

Paths: multilevel + boundary FM, multilevel + 1-pass restream refine
(the r4 configuration), and seeded capped restream (2 passes). Reports
wall, cut ratio, waste; appends a BENCH.md section unless
SPARK_GRAFT_NO_WRITE.

Usage:
    python tools/bench_multilevel_quality.py [n_web_pages] [n_planted] [k]
    (defaults 3_000_000 / 1_500_000 / 16; smoke: 200000 100000 8)
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
from graph_partitioning_spark.sources import planted_edges, synthetic_edges  # noqa: E402


def run_paths(spark, edges, k: int, coarsen_to: int) -> list[str]:
    m = edges.count()
    cfg = FennelConfig(
        num_partitions=k, num_iterations=4, micro_batches=8, inflow_cap_slack=0.1
    )
    rows = []

    def one(label, fn):
        t0 = time.time()
        assign = fn()
        n = assign.count()
        wall = time.time() - t0
        cm = cut_metrics(edges, assign)
        ws = waste(assign, k, n_nodes=n)
        rows.append(
            f"| {label} | {wall:,.1f}s | {cm['cut_ratio']:.3f} | {ws:.3f} |\n"
        )
        print(rows[-1], end="", flush=True)
        return assign

    ml_b = MultilevelConfig(
        coarsen_to=coarsen_to,
        max_levels=10,
        coarsener="lpa",
        refine="boundary",
        boundary_sweeps=6,
    )
    one(
        "multilevel + boundary FM (6 sweeps/level, r5 default)",
        lambda: multilevel_partition(edges, cfg, ml_b)[0],
    )
    ml_r = MultilevelConfig(
        coarsen_to=coarsen_to, max_levels=10, coarsener="lpa", refine_iterations=1
    )
    one(
        "multilevel + restream refine (1 pass/level, r4 config)",
        lambda: multilevel_partition(edges, cfg, ml_r)[0],
    )
    rs_cfg = FennelConfig(
        num_partitions=k, num_iterations=2, micro_batches=8, inflow_cap_slack=0.1
    )
    verts = edges.selectExpr("src AS id").union(edges.selectExpr("dst AS id")).distinct()
    one(
        "seeded capped restream (2 passes)",
        lambda: fennel_partition(edges, rs_cfg, initial=modular_initial(verts, k))[0],
    )
    return [f"({m:,} undirected edges)\n\n| path | wall | cut ratio | waste |\n|---|---|---|---|\n"] + rows


def main() -> None:
    n_web = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    coarsen_to = max(2000, n_web // 15)

    spark = get_spark(app_name="bench_multilevel_quality")
    out = [
        f"\n## Multilevel quality: boundary FM vs restream (k={k}, "
        f"local[{spark.sparkContext.defaultParallelism}])\n\n"
    ]

    web = undirect(synthetic_edges(spark, n_web)).persist()
    out.append(f"### Web graph (preferential attachment, n={n_web:,}) ")
    out += run_paths(spark, web, k, coarsen_to)
    web.unpersist()

    planted = undirect(planted_edges(spark, n_planted, communities=4 * k)).persist()
    out.append(f"\n### Planted-partition graph (n={n_planted:,}, {4 * k} blocks) ")
    out += run_paths(spark, planted, k, max(2000, n_planted // 15))
    planted.unpersist()

    text = "".join(out)
    print(text)
    if not os.environ.get("SPARK_GRAFT_NO_WRITE"):
        with open("/root/repo/BENCH.md", "a") as f:
            f.write(text)


if __name__ == "__main__":
    main()
