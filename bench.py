"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "pagerank": {...}, "spread": {...}}

Every query runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) in the same
session; ``queries`` carries the per-query MEDIAN and ``spread`` the
[min, max] — the shared-VM drift between rounds is ±20-40%, so single-shot
numbers kept producing phantom regressions (see BENCH.md round-2 notes).

The ``pagerank`` block carries the BASELINE.json headline figure —
edges-processed/sec per superstep for PageRank run to 1e-6 convergence on
the co-purchase link graph (median run) — plus superstep counters.
Scaling-efficiency evidence (same job at two parallelism levels) is
produced by ``tools/bench_scaling.py`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from graph_partitioning_spark.graph import pagerank
    from graph_partitioning_spark.graph.edges import symmetrize
    from graph_partitioning_spark.session import get_spark

    spark = get_spark(app_name="bench")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}

    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    def run(name: str, fn) -> None:
        # Repeat-rep hygiene: queries memoize heavy intermediates in
        # entry._EDGE_CACHE (the FENNEL assignment, minhash signatures, the
        # shared edge table). A rep that re-reads its own memo would time
        # ~0s and turn the median into fiction (measured: fennel_partition
        # 21s -> 0.07s). So each rep drops the entries the query itself
        # created — EXCEPT after the final rep, so later queries keep the
        # intentional cross-query reuse (lsh_pairs reads minhash's
        # signatures, fennel_quality reads fennel_partition's assignment)
        # exactly as a single-shot bench run would see it.
        runs = []
        for i in range(reps):
            before = set(entry._EDGE_CACHE.keys())
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
            if i < reps - 1:
                for key in set(entry._EDGE_CACHE.keys()) - before:
                    stale = entry._EDGE_CACHE.pop(key, None)
                    try:
                        # popping the dict is not enough: Spark's
                        # CacheManager matches the NEXT rep's identical
                        # logical plan against the still-persisted data
                        # and serves it warm
                        stale.unpersist()
                    except Exception:
                        pass
        timings[name] = round(_median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
        sys.stderr.write(
            f"[bench] {name}: {n} rows, median {timings[name]}s "
            f"of {[round(r, 2) for r in runs]}\n"
        )

    # warm the shared edge table once (cached by the entry module) so
    # per-query numbers measure the operator, not the shared scan
    t0 = time.time()
    edges = entry.copurchase_edges(spark, sf_dir)
    m = edges.count()
    edge_build = round(time.time() - t0, 3)
    timings["edge_build"] = edge_build

    qs = entry.queries()
    for name in [
        "part_degrees",
        "pagerank5",
        "components",
        "labelprop4",
        "triangle_total",
        "cut_quality",
        "qds_conductance",
        "fennel_partition",   # the full bounded FENNEL run (16 supersteps)
        "fennel_quality",     # its quality row (warm assignment)
        "doc_quality",
        "doc_langid",
        "minhash",
        "lsh_pairs",
        "simhash",
        "media_features",
        "ann_topk",
        "ann_kmeans",       # learned IVF quantizer path (round 4)
        "dedup_clusters",   # LSH pairs -> CC -> keep-list (round 4)
        "embed_text",       # hashed-token text embeddings (round 5)
        "embed_kmeans",     # text -> embedding -> learned IVF (round 5)
        "refine_level",     # boundary FM refinement sweep (round 5)
        "decontaminate",    # eval-set n-gram decontamination (round 5)
        "hash_split",       # deterministic corpus split (round 5)
        "corpus_funnel",    # composed 4-stage pretraining funnel (round 5)
        "events_hourly",
        "user_sessions",
        "tpch_q1",
    ]:
        run(name, qs[name])

    # headline: PageRank to 1e-6 convergence, edges/sec per superstep
    t0 = time.time()
    sym = symmetrize(edges)
    ranks, info = pagerank(sym, damping=0.85, tol=1e-6, max_iter=60)
    ranks.count()
    pr_wall = time.time() - t0
    iters = max(info["iterations"], 1)
    directed_m = 2 * m
    edges_per_sec_per_superstep = directed_m * iters / pr_wall
    timings["pagerank_converged"] = round(pr_wall, 3)

    result = {
        "metric": "headline query wall-clock at sf (see queries); pagerank block = edges/sec/superstep to 1e-6",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "pagerank": {
            "n_edges_directed": directed_m,
            "iterations": info["iterations"],
            "converged": info["converged"],
            "wall_sec": round(pr_wall, 3),
            "edges_per_sec_per_superstep": round(edges_per_sec_per_superstep, 1),
            "skew_ratio": info["counters"].get("skew_ratio"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
