"""End-to-end north-star pipeline bench.

Runs the complete flow the north star describes on the deterministic
synthetic Common-Crawl-style pages table, at a size where per-phase
throughput is meaningful:

    pages (url, warc_ts, html binary, text, lang)
      → Arrow-UDF hyperlink extraction → vertex dictionary (dense ids)
      → weighted directed edge table → canonical undirected edges
      → FENNEL web-scale restream pass (modular seed + inflow cap)
      → PageRank supersteps over the directed edges
      → partition-quality metrics (cut ratio, waste)

Per-phase wall-clock + row counts + the derived throughputs print as one
JSON line. Append-to-BENCH is manual (numbers get a narrative).

Usage:
    python tools/bench_e2e.py [n_pages] [pr_iters] [cpus] [--fennel]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    pr_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    run_fennel = "--fennel" in sys.argv

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from graph_partitioning_spark.session import get_spark
    from graph_partitioning_spark.sources import generate_pages
    from graph_partitioning_spark.graph import (
        build_vertex_dictionary,
        extract_edges,
        extract_links,
        pagerank,
        weight_links,
    )
    from graph_partitioning_spark.graph.edges import undirect

    spark = get_spark(app_name="e2e", cpus=cpus, shuffle_partitions=2 * cpus)
    out: dict = {"n_pages": n_pages, "cpus": cpus}

    t0 = time.time()
    pages = generate_pages(spark, n_pages=n_pages).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["rows_pages"] = pages.count()
    out["t_pages_synth"] = round(time.time() - t0, 1)

    # single-parse ingest: the Arrow HTML parse runs exactly once, fused with
    # the map-side combine of the weighted-pair aggregation; only the small
    # deduplicated pair table is persisted. Dictionary and edge table both
    # derive from it.
    t0 = time.time()
    weighted = weight_links(extract_links(pages)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["rows_weighted_links"] = weighted.count()
    out["t_extract_links"] = round(time.time() - t0, 1)

    t0 = time.time()
    verts = build_vertex_dictionary(pages, links=weighted).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["rows_vertices"] = verts.count()
    out["t_vertex_dict"] = round(time.time() - t0, 1)

    t0 = time.time()
    edges = extract_edges(pages, verts, weighted=weighted).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["rows_edges_directed"] = edges.count()
    out["t_extract_edges"] = round(time.time() - t0, 1)
    pages.unpersist()
    weighted.unpersist()
    t_ingest = out["t_extract_links"] + out["t_vertex_dict"] + out["t_extract_edges"]
    out["pages_per_sec_extract"] = round(n_pages / t_ingest, 1)

    t0 = time.time()
    und = undirect(edges).persist(StorageLevel.MEMORY_AND_DISK)
    out["rows_edges_undirected"] = und.count()
    out["t_undirect"] = round(time.time() - t0, 1)

    if run_fennel:
        from graph_partitioning_spark.partitioning import (
            FennelConfig,
            fennel_partition,
            modular_initial,
        )
        from graph_partitioning_spark.partitioning.metrics import cut_metrics, waste

        t0 = time.time()
        ids = verts.select("id")
        assign, _finfo = fennel_partition(
            und,
            FennelConfig(
                num_partitions=16,
                num_iterations=1,
                micro_batches=2,
                bucket_by="mod",
                inflow_cap_slack=0.1,
                broadcast_state_max=0,  # force the web-scale shuffle path
            ),
            initial=modular_initial(ids, 16),
        )
        out["t_fennel_pass"] = round(time.time() - t0, 1)
        t0 = time.time()
        cm = cut_metrics(und.select("src", "dst"), assign)
        out["cut_ratio"] = round(cm["cut_ratio"], 4)
        out["waste"] = round(waste(assign, 16), 4)
        out["t_quality"] = round(time.time() - t0, 1)

    t0 = time.time()
    ranks, info = pagerank(edges, damping=0.85, tol=0.0, max_iter=pr_iters)
    ranks.count()
    out["t_pagerank_loop"] = round(info["loop_sec"], 1)
    out["t_pagerank_prepare"] = round(info["prepare_sec"], 1)
    out["edges_per_sec_per_superstep"] = round(
        out["rows_edges_directed"] * pr_iters / info["loop_sec"], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
