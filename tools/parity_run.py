"""Reference-corpus parity run: engine vs sequential reference shadow.

Runs the full D1-D6 pipeline (METIS/GML ingest → prediction model → cutoff
→ batched arrival) on the reference repo's OWN data files under its own
notebook configs, twice:

- the ENGINE (graph_partitioning_spark.simulate_arrivals, batch-synchronous
  bounded restreams), once — it is deterministic;
- the SHADOW (tools/reference_shadow.py, the reference's sequential
  semantics transcribed line-by-line), once per node order. The reference
  streams nodes in networkx-1.x dict order, which is arbitrary — the spread
  across orders is the reference's own run-to-run sigma, and that spread is
  the parity yardstick (the reference's statistical-regression methodology,
  SURVEY §5).

Writes PARITY.md. Usage: python tools/parity_run.py [--quick]
"""

from __future__ import annotations

import random
import statistics
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from reference_shadow import build_adj, score_row, shadow_run  # noqa: E402

REF = "/root/reference/data"
METRICS = ("waste", "cut_ratio", "edges_cut", "tcv")

CONFIGS = [
    # graph-partitioning-parallel-run.ipynb cell 0: k=6, 1 iteration,
    # cut_off 0.10, batches of 10
    dict(name="oneshot_fennel_simple.txt (k=6, iters=1, batch=10, cut=0.10)",
         data=f"{REF}/oneshot_fennel_simple.txt", fmt="metis",
         arrivals=f"{REF}/simulated_arrival.txt",
         k=6, iters=1, cut_off=0.10, batch=10),
    # graph-partitioning-batch.ipynb cell 0: k=4, 10 iterations,
    # cut_off 0.10, batches of 100
    dict(name="oneshot_fennel_weights.txt (k=4, iters=10, batch=100, cut=0.10)",
         data=f"{REF}/oneshot_fennel_weights.txt", fmt="metis",
         arrivals=f"{REF}/simulated_arrival.txt",
         k=4, iters=10, cut_off=0.10, batch=100),
    # same config family on the node+edge-weighted restreaming corpus
    dict(name="restreaming_fennel.txt (k=4, iters=10, batch=100, cut=0.10)",
         data=f"{REF}/restreaming_fennel.txt", fmt="metis",
         arrivals=f"{REF}/simulated_arrival.txt",
         k=4, iters=10, cut_off=0.10, batch=100),
    # lesmis.gml under the parallel-run config; no arrival file -> everyone
    # arrives (load_network default, graph_partitioning.py:68-70)
    dict(name="lesmis.gml (k=6, iters=1, batch=10, cut=0.10)",
         data=f"{REF}/lesmis.gml", fmt="gml", arrivals=None,
         k=6, iters=1, cut_off=0.10, batch=10),
]


def load_corpus(cfg):
    if cfg["fmt"] == "metis":
        from graph_partitioning_spark.sources.metis import parse_metis

        nodes, edges = parse_metis(cfg["data"])
        node_w = [w for _, w in nodes]
    else:
        from graph_partitioning_spark.sources.gml import parse_gml

        with open(cfg["data"]) as f:
            gnodes, gedges = parse_gml(f.read())
        n = len(gnodes)
        node_w = [1.0] * n
        edges = [
            (int(e["source"]), int(e["target"]),
             float(e.get("value", e.get("weight", 1.0)) or 1.0))
            for e in gedges
        ]
        dedup = {}
        for s, d, w in edges:
            dedup[(min(s, d), max(s, d))] = w
        edges = [(u, v, w) for (u, v), w in dedup.items()]
    n = len(node_w)
    if cfg["arrivals"]:
        with open(cfg["arrivals"]) as f:
            arr = [int(line.strip()) for line in f if line.strip() != ""]
        arr = arr[:n] + [1] * max(0, n - len(arr))
    else:
        arr = [1] * n
    return n, node_w, edges, arr


def shadow_orders(n, n_orders=8):
    orders = [list(range(n)), list(range(n - 1, -1, -1))]
    for seed in range(n_orders - 2):
        o = list(range(n))
        random.Random(1000 + seed).shuffle(o)
        orders.append(o)
    return orders


def run_shadow(cfg, n, node_w, edges, arr, n_orders=8):
    runs = []
    for order in shadow_orders(n, n_orders):
        _, rows = shadow_run(
            n, node_w, edges, arr, cfg["k"], cfg["iters"], cfg["cut_off"],
            cfg["batch"], order=order,
        )
        runs.append(rows)
    return runs


def run_engine(spark, cfg, n, node_w, edges, arr):
    from pyspark.sql import functions as F

    from graph_partitioning_spark.partitioning import (
        ArrivalConfig,
        FennelConfig,
        fennel_partition,
        simulate_arrivals,
    )
    from graph_partitioning_spark.partitioning.metrics import cut_metrics, waste

    verts = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(node_w)], "id long, weight double"
    )
    edges_df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges],
        "src long, dst long, weight double",
    )
    k = cfg["k"]
    # the engine's documented web-scale prediction defaults (BENCH.md round
    # 3): modular_initial seed (no cold-start herding) + bounded inflow
    # (no synchronous oscillation); micro=32 on these 10^3-node corpora so
    # each bucket decides ~n/32 nodes — the closest batch-synchronous
    # approximation of the reference's after-every-node size updates
    from graph_partitioning_spark.partitioning import modular_initial

    if cfg["iters"] > 1:
        # multi-pass refinement: the engine's documented web-scale defaults
        # (modular seed, bounded inflow) — restream-as-refinement
        fc = FennelConfig(num_partitions=k, num_iterations=cfg["iters"],
                          micro_batches=32, bucket_by="mod",
                          inflow_cap_slack=0.1)
        initial = modular_initial(spark.range(n), k)
    else:
        # single-pass configs: the reference streams every node exactly once
        # from UNMAPPED, so the faithful mirror is the same cold stream with
        # the finest buckets; a random seed would inject votes the reference
        # never sees, and the inflow cap (per-pass damping) would pin most
        # nodes at that seed
        fc = FennelConfig(num_partitions=k, num_iterations=1,
                          micro_batches=64, bucket_by="mod")
        initial = None
    pred, _ = fennel_partition(edges_df, fc, vertices=verts, initial=initial)
    pred = pred.cache()
    adj = build_adj(n, edges)
    passign = {r["id"]: r["partition"] for r in pred.collect()}
    full = [passign.get(i, -1) for i in range(n)]
    rows = [("prediction",) + score_row(set(range(n)), adj, full, node_w, k)]

    cut = int(cfg["cut_off"] * sum(arr))
    prefix = [i for i in range(n) if arr[i] == 1][:cut]
    cassign = [full[i] if i in set(prefix) else -1 for i in range(n)]
    rows.append(("cutoff",) + score_row(set(prefix), adj, cassign, node_w, k))

    arrivals_df = spark.createDataFrame(
        [(i, int(a), i) for i, a in enumerate(arr)], "id long, arrived int, seq long"
    )
    acfg = ArrivalConfig(
        num_partitions=k, restream_batches=cfg["batch"],
        num_iterations=cfg["iters"], micro_batches=8,
        prediction_model_cut_off=cfg["cut_off"],
        prediction_iterations=cfg["iters"], bucket_by="mod",
    )
    final, metrics, info = simulate_arrivals(
        edges_df, arrivals_df, acfg, vertices=verts, prediction=pred
    )
    for r in metrics.orderBy("batch").collect():
        rows.append(
            (f"batch{r['batch']}", round(r["waste"], 6), round(r["cut_ratio"], 6),
             int(r["edges_cut"]), int(r["tcv"]), int(r["m_sub"]))
        )
    return rows


def summarize(name, shadow_runs, engine_rows, out):
    stages = [r[0] for r in shadow_runs[0]]
    out.append(f"\n## {name}\n")
    out.append("| stage | metric | shadow mean ± σ (8 stream orders) | shadow min..max | engine | |engine−mean|/σ |")
    out.append("|---|---|---|---|---|---|")
    eng = {r[0]: r for r in engine_rows}
    agree = total = 0
    report_stages = ["prediction", "cutoff", stages[-1] if shadow_runs[0][-1][5] else stages[-2]]
    for st_i, st in enumerate(stages):
        if st not in eng:
            continue
        for m_i, m in enumerate(METRICS):
            vals = [run[st_i][1 + m_i] for run in shadow_runs]
            mean = statistics.mean(vals)
            sd = statistics.pstdev(vals)
            ev = eng[st][1 + m_i]
            lo, hi = min(vals), max(vals)
            slack = max(2 * sd, 0.05 * max(abs(mean), 1.0))
            ok = (lo - slack) <= ev <= (hi + slack)
            total += 1
            agree += ok
            if st in report_stages:
                z = abs(ev - mean) / sd if sd > 0 else float("nan")
                out.append(
                    f"| {st} | {m} | {mean:.4f} ± {sd:.4f} | {lo:.4f}..{hi:.4f} "
                    f"| {ev:.4f} | {z:.2f} |"
                )
    out.append(
        f"\nAll-stage agreement: **{agree}/{total}** stage×metric cells inside "
        "the shadow's order-spread envelope (min..max widened by "
        "max(2σ, 5%))."
    )
    return agree, total


def main():
    quick = "--quick" in sys.argv
    from graph_partitioning_spark.session import get_spark

    spark = get_spark(app_name="parity", cpus=8, shuffle_partitions=8)
    out = [
        "# PARITY — engine vs reference on the reference's own corpus",
        "",
        "Method: the reference cannot execute here (networkx 1.x / sklearn /",
        "pyximport absent) and every notebook with stored outputs ran on",
        "`data/predition_model_tests/...` files not shipped in the repo, so the",
        "executable stand-in is `tools/reference_shadow.py` — the reference's",
        "sequential driver transcribed line-by-line (fennel.pyx:19-175,",
        "graph_partitioning.py:47-628, utils.py:158-233) and pinned by",
        "tests/test_parity.py. The reference streams nodes in networkx-1.x",
        "dict order (arbitrary); the shadow therefore runs under 8 stream",
        "orders and the spread is the reference's own run-to-run σ — the",
        "yardstick its statistical-regression methodology uses (SURVEY §5).",
        "The engine runs once (it is deterministic: mod bucket schedule).",
        "",
        "Engine config mirror: k, restream iterations, cut-off fraction and",
        "batch size from each notebook config. The engine is",
        "batch-synchronous, so its knobs are matched to each workload's shape",
        "(both regimes are the engine's documented configurations, BENCH.md",
        "round 3): multi-pass prediction configs (iters=10) run the web-scale",
        "defaults — `modular_initial` seed + `inflow_cap_slack=0.1`,",
        "micro_batches=32 on these 10^3-node corpora — because a cold",
        "synchronous start herds and undamped synchronous passes oscillate;",
        "single-pass configs (iters=1) run the faithful mirror of the",
        "reference's one cold sequential sweep — UNMAPPED start (a random",
        "seed would inject votes the reference never sees), micro_batches=64,",
        "no cap (per-pass damping would pin most nodes at the seed).",
        "Per-batch arrival restreams run micro_batches=8 anchored on the",
        "frozen set.",
        "Sliding-window mode is excluded: the reference reprocesses a rolling",
        "window per arrival, the engine re-shapes it into fixed batch ranges",
        "(documented divergence, gated separately as `arrival_sliding`).",
    ]
    grand_a = grand_t = 0
    for cfg in CONFIGS:
        if quick and "lesmis" not in cfg["name"]:
            continue
        n, node_w, edges, arr = load_corpus(cfg)
        print(f"[parity] {cfg['name']}: n={n} m={len(edges)} arrivals={sum(arr)}",
              flush=True)
        shadow_runs = run_shadow(cfg, n, node_w, edges, arr)
        engine_rows = run_engine(spark, cfg, n, node_w, edges, arr)
        a, t = summarize(cfg["name"], shadow_runs, engine_rows, out)
        grand_a += a
        grand_t += t
        print(f"[parity]   agreement {a}/{t}", flush=True)
    out.append(f"\n## Overall\n\n**{grand_a}/{grand_t}** stage×metric cells "
               "inside the reference's run-to-run envelope.\n")
    if not quick:
        with open("/root/repo/PARITY.md", "w") as f:
            f.write("\n".join(out) + "\n")
        print("[parity] wrote PARITY.md", flush=True)
    else:
        print("\n".join(out))


if __name__ == "__main__":
    main()
