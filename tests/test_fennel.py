"""FENNEL/LDG partitioner: formula parity, balance, cut quality, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.partitioning import (
    FennelConfig,
    cut_metrics,
    fennel_partition,
    waste,
)

from .conftest import random_edges
from .oracles import _adj, fennel_step_oracle


def _edges_df(spark, src, dst, w):
    return undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    ).persist()


def planted_graph(n_per=60, k=3, p_in=0.25, p_out=0.01, seed=5):
    """k dense clusters, sparse between — FENNEL should find a low cut."""
    rng = np.random.default_rng(seed)
    src, dst = [], []
    n = n_per * k
    for i in range(n):
        for j in range(i + 1, n):
            same = (i // n_per) == (j // n_per)
            if rng.random() < (p_in if same else p_out):
                src.append(i)
                dst.append(j)
    return (
        np.array(src, dtype=np.int64),
        np.array(dst, dtype=np.int64),
        np.ones(len(src)),
    )


def test_fennel_single_step_matches_reference_formula(spark):
    """With every other node fixed, a one-iteration/one-bucket run must make
    exactly the per-node decision of fennel.pyx:40-112 (votes − α·size,
    +α previous-partition credit, first-max tie-break)."""
    src, dst, w = random_edges(40, 150, seed=21, weighted=True)
    edges = _edges_df(spark, src, dst, w)
    ids = sorted({int(v) for v in np.concatenate([src, dst])})
    rng = np.random.default_rng(7)
    k = 3
    assign = {v: int(rng.integers(0, k)) for v in ids}
    movable = set(list(ids)[::5])  # every 5th node is free to move
    initial = spark.createDataFrame(list(assign.items()), "id long, partition int")
    fixed = spark.createDataFrame([(v,) for v in ids if v not in movable], "id long")

    cfg = FennelConfig(num_partitions=k, num_iterations=1, micro_batches=1, alpha=0.5)
    result, info = fennel_partition(edges, cfg, initial=initial, fixed=fixed)
    got = {r["id"]: r["partition"] for r in result.collect()}

    adj = _adj(src, dst, w)
    for v in ids:
        if v in movable:
            want = fennel_step_oracle(adj, v, assign, k, alpha=0.5)
            assert got[v] == want, f"node {v}: got {got[v]} want {want}"
        else:
            assert got[v] == assign[v]


def test_fennel_assigns_everyone_and_balances(spark):
    src, dst, w = planted_graph()
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(num_partitions=3, num_iterations=4, micro_batches=6)
    result, info = fennel_partition(edges, cfg)
    rows = result.collect()
    n = len(rows)
    assert n == 180
    parts = [r["partition"] for r in rows]
    assert all(0 <= p < 3 for p in parts)
    w_metric = waste(result, 3, n_nodes=n)
    assert w_metric < 0.35  # reasonably balanced

    cm = cut_metrics(edges, result)
    # a random 3-way cut of this graph cuts ~2/3 of edges; FENNEL must do
    # far better on a planted-partition graph
    assert cm["cut_ratio"] < 0.45


def test_fennel_deterministic(spark):
    src, dst, w = random_edges(100, 400, seed=31)
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(num_partitions=4, num_iterations=2, micro_batches=4)
    a1, _ = fennel_partition(edges, cfg)
    a2, _ = fennel_partition(edges, cfg)
    d1 = {r["id"]: r["partition"] for r in a1.collect()}
    d2 = {r["id"]: r["partition"] for r in a2.collect()}
    assert d1 == d2


def test_fennel_respects_fixed(spark):
    src, dst, w = random_edges(60, 200, seed=41)
    edges = _edges_df(spark, src, dst, w)
    ids = sorted({int(v) for v in np.concatenate([src, dst])})
    frozen = {v: v % 2 for v in ids[:20]}
    initial = spark.createDataFrame(list(frozen.items()), "id long, partition int")
    fixed = spark.createDataFrame([(v,) for v in frozen], "id long")
    cfg = FennelConfig(num_partitions=2, num_iterations=2, micro_batches=2)
    result, _ = fennel_partition(edges, cfg, initial=initial, fixed=fixed)
    got = {r["id"]: r["partition"] for r in result.collect()}
    for v, p in frozen.items():
        assert got[v] == p


def test_fennel_singletons_greedy_min_fill(spark):
    # graph plus isolated vertices supplied via the vertices table
    src, dst, w = random_edges(30, 80, seed=51)
    edges = _edges_df(spark, src, dst, w)
    iso = [1000, 1001, 1002, 1003]
    ids = sorted({int(v) for v in np.concatenate([src, dst])}) + iso
    vertices = spark.createDataFrame([(v, 1.0) for v in ids], "id long, weight double")
    cfg = FennelConfig(num_partitions=4, num_iterations=2, micro_batches=2)
    result, _ = fennel_partition(edges, cfg, vertices=vertices)
    got = {r["id"]: r["partition"] for r in result.collect()}
    assert set(got) == set(ids)
    # exact reference semantics (fennel.pyx:142-148): each singleton goes to
    # the CURRENT min-size partition (ties → smallest id), sizes updating
    # after every placement — simulate the greedy and compare placements
    sizes = [0.0] * 4
    for v, p in got.items():
        if v not in iso:
            sizes[p] += 1.0
    expected = []
    for v in sorted(iso):
        p = min(range(4), key=lambda q: (sizes[q], q))
        expected.append(p)
        sizes[p] += 1.0
    assert [got[v] for v in sorted(iso)] == expected


def test_ldg_strategy(spark):
    src, dst, w = planted_graph(n_per=40, k=2, seed=9)
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(num_partitions=2, num_iterations=3, micro_batches=4, strategy="ldg")
    result, info = fennel_partition(edges, cfg)
    rows = result.collect()
    assert len(rows) == 80
    assert waste(result, 2, n_nodes=80) < 0.35
    cm = cut_metrics(edges, result)
    assert cm["cut_ratio"] < 0.5


def test_fennel_salted_votes_match_unsalted(spark):
    src, dst, w = random_edges(80, 300, seed=61, weighted=True)
    edges = _edges_df(spark, src, dst, w)
    cfg_a = FennelConfig(num_partitions=3, num_iterations=2, micro_batches=3, salt_buckets=0)
    cfg_b = FennelConfig(num_partitions=3, num_iterations=2, micro_batches=3, salt_buckets=4)
    a, _ = fennel_partition(edges, cfg_a)
    b, _ = fennel_partition(edges, cfg_b)
    da = {r["id"]: r["partition"] for r in a.collect()}
    db = {r["id"]: r["partition"] for r in b.collect()}
    assert da == db


def test_fennel_foaf_pass(spark):
    """A lonely clique pair: nodes 100,101 connect only to each other and to
    unassigned-region neighbors; FOAF should pull them toward where their
    2-hop mass lives (fennel.pyx:188-297 semantics, batch-synchronous)."""
    src, dst, w = planted_graph(n_per=30, k=2, seed=15)
    edges = _edges_df(spark, src, dst, w)
    cfg_plain = FennelConfig(num_partitions=2, num_iterations=2, micro_batches=3, foaf=False)
    cfg_foaf = FennelConfig(num_partitions=2, num_iterations=2, micro_batches=3, foaf=True)
    a1, _ = fennel_partition(edges, cfg_plain)
    a2, _ = fennel_partition(edges, cfg_foaf)
    # FOAF is a refinement pass: still a total assignment into [0,k)
    d2 = {r["id"]: r["partition"] for r in a2.collect()}
    assert len(d2) == 60
    assert all(0 <= p < 2 for p in d2.values())
    # and it should not damage cut quality on a planted graph
    from graph_partitioning_spark.partitioning import cut_metrics as _cm
    assert _cm(edges, a2)["cut_ratio"] <= _cm(edges, a1)["cut_ratio"] + 0.05


def test_fennel_degree_hl_bucketing(spark):
    src, dst, w = random_edges(80, 300, seed=71)
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(
        num_partitions=3, num_iterations=2, micro_batches=4, bucket_by="degree_hl"
    )
    result, info = fennel_partition(edges, cfg)
    got = {r["id"]: r["partition"] for r in result.collect()}
    assert all(0 <= p < 3 for p in got.values())
    # deterministic across runs
    again, _ = fennel_partition(edges, cfg)
    assert got == {r["id"]: r["partition"] for r in again.collect()}


def test_best_of_never_worse_than_any_single_run(spark):
    from graph_partitioning_spark.partitioning import best_of, cut_metrics

    src, dst, w = random_edges(60, 220, seed=81)
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(num_partitions=3, num_iterations=2, micro_batches=2,
                       bucket_by="mod")
    best, info = best_of(edges, cfg, n_runs=3, objective="tcv")
    # independently recompute each candidate run's TCV
    singles = []
    for seed in range(3):
        from dataclasses import replace
        assign, _ = fennel_partition(edges, replace(cfg, bucket_seed=seed))
        singles.append(cut_metrics(edges, assign)["total_comm_volume"])
    best_tcv = cut_metrics(edges, best)["total_comm_volume"]
    assert best_tcv == min(singles)
    assert [c["tcv"] for c in info["candidates"]] == singles
    assert info["chosen"] == singles.index(min(singles))


def test_fennel_leverage_hl_bucketing(spark):
    src, dst, w = random_edges(80, 300, seed=72)
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(
        num_partitions=3, num_iterations=2, micro_batches=4, bucket_by="leverage_hl"
    )
    result, info = fennel_partition(edges, cfg)
    got = {r["id"]: r["partition"] for r in result.collect()}
    assert all(0 <= p < 3 for p in got.values())
    # deterministic across runs
    again, _ = fennel_partition(edges, cfg)
    assert got == {r["id"]: r["partition"] for r in again.collect()}


def test_fennel_shuffle_path_matches_broadcast_path(spark):
    """broadcast_state_max=0 forces the web-scale execution path (shuffle
    joins, AQE left on, no conf scope); assignments must be identical to
    the small-graph broadcast fast path — the two paths may differ only in
    physical strategy, never in results."""
    src, dst, w = random_edges(70, 260, seed=91, weighted=True)
    edges = _edges_df(spark, src, dst, w)
    cfg_small = FennelConfig(num_partitions=3, num_iterations=2, micro_batches=2,
                             bucket_by="mod")
    from dataclasses import replace
    cfg_scale = replace(cfg_small, broadcast_state_max=0)
    # third variant: decision frames forced to shuffle too (the true
    # n/micro_batches > decision_broadcast_max web-scale regime)
    cfg_noshortcut = replace(cfg_scale, decision_broadcast_max=0)
    a, _ = fennel_partition(edges, cfg_small)
    b, _ = fennel_partition(edges, cfg_scale)
    c, _ = fennel_partition(edges, cfg_noshortcut)
    da = {r["id"]: r["partition"] for r in a.collect()}
    db = {r["id"]: r["partition"] for r in b.collect()}
    dc = {r["id"]: r["partition"] for r in c.collect()}
    assert da == db == dc
    # conf scope restored either way
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_modular_initial_balanced_and_refined(spark):
    """modular_initial seeds a balanced cold start: every partition starts
    populated (waste ~0 before any restream), the restream only moves nodes,
    and the refined result must not be *worse* than the seed on edge cut."""
    from graph_partitioning_spark.partitioning import modular_initial
    from graph_partitioning_spark.partitioning.metrics import cut_metrics, waste

    src, dst, w = random_edges(120, 480, seed=93, weighted=True)
    edges = _edges_df(spark, src, dst, w)
    ids = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    k = 4
    seed_assign = modular_initial(ids, k)
    parts = {r["partition"] for r in seed_assign.select("partition").distinct().collect()}
    assert parts == set(range(k))
    seed_waste = waste(seed_assign, k)
    assert seed_waste < 0.05  # balanced by construction

    cfg = FennelConfig(num_partitions=k, num_iterations=3, micro_batches=4,
                       bucket_by="mod")
    refined, info = fennel_partition(edges, cfg, initial=seed_assign)
    cut_seed = cut_metrics(edges, seed_assign)["cut_ratio"]
    cut_ref = cut_metrics(edges, refined)["cut_ratio"]
    assert cut_ref <= cut_seed + 1e-9


def test_inflow_cap_identity_when_slack_huge(spark):
    """A cap that never binds must leave the capped path bit-identical to
    the uncapped decision logic — pins the window/admission rewrite."""
    from graph_partitioning_spark.partitioning import modular_initial

    src, dst, w = random_edges(100, 400, seed=96, weighted=True)
    edges = _edges_df(spark, src, dst, w)
    ids = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    init = modular_initial(ids, 4)
    cfg = FennelConfig(num_partitions=4, num_iterations=2, micro_batches=2,
                       bucket_by="mod")
    from dataclasses import replace
    a, _ = fennel_partition(edges, cfg, initial=init)
    b, _ = fennel_partition(
        edges, replace(cfg, inflow_cap_slack=1e9), initial=init
    )
    da = {r["id"]: r["partition"] for r in a.collect()}
    db = {r["id"]: r["partition"] for r in b.collect()}
    assert da == db


def test_inflow_cap_bounds_waste(spark):
    """With unit weights and a balanced modular seed, bounded inflow keeps
    every partition under (1+slack)·n/k, so waste ≤ slack — even at
    micro_batches=1, the regime where the uncapped synchronous step herds
    (BENCH.md round-3: waste 6.25 uncapped on the 195M-edge graph)."""
    from graph_partitioning_spark.partitioning import modular_initial
    from graph_partitioning_spark.partitioning.metrics import waste

    src, dst, w = random_edges(150, 700, seed=98, weighted=False)
    edges = _edges_df(spark, src, dst, w)
    ids = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    k, slack = 4, 0.3
    init = modular_initial(ids, k)
    cfg = FennelConfig(num_partitions=k, num_iterations=3, micro_batches=1,
                       bucket_by="mod", inflow_cap_slack=slack,
                       converge_early=False)
    assign, _ = fennel_partition(edges, cfg, initial=init)
    assert waste(assign, k) <= slack + 1e-9


def test_fennel_rejects_out_of_range_initial(spark):
    src, dst, w = random_edges(30, 80, seed=95)
    edges = _edges_df(spark, src, dst, w)
    ids = sorted({int(v) for v in np.concatenate([src, dst])})
    bad = spark.createDataFrame([(ids[0], 7)], "id long, partition int")
    cfg = FennelConfig(num_partitions=3, num_iterations=1, micro_batches=1)
    with pytest.raises(ValueError, match="num_partitions"):
        fennel_partition(edges, cfg, initial=bad)


def test_ldg_over_capacity_prefers_least_loaded(spark):
    """LDG has no previous-partition credit: a node whose only votes point
    at an over-capacity partition (negative remaining-capacity score) moves
    to the least-loaded partition instead of staying pinned at its prev —
    the reference kernel (graph-partitioning-ldg.ipynb cell 2) falls back
    to a partition with room whenever every score is <= 0."""
    # nodes 0..5 fixed in partition 0 (capacity = 7/2 = 3.5 < size 7);
    # node 6 is movable, neighbours only partition-0 nodes, prev = 0
    edges = undirect(
        spark.createDataFrame(
            [(i, (i + 1) % 6, 1.0) for i in range(6)] + [(6, 0, 1.0)],
            "src long, dst long, weight double",
        )
    )
    initial = spark.createDataFrame(
        [(i, 0) for i in range(7)], "id long, partition int"
    )
    fixed = spark.createDataFrame([(i,) for i in range(6)], "id long")
    cfg = FennelConfig(
        num_partitions=2, num_iterations=1, micro_batches=1,
        strategy="ldg", converge_early=False,
    )
    result, _ = fennel_partition(edges, cfg, initial=initial, fixed=fixed)
    got = {r["id"]: r["partition"] for r in result.collect()}
    assert got[6] == 1, "over-capacity prev must not pin the node under LDG"
    assert all(got[i] == 0 for i in range(6))


def test_place_singletons_distributed_matches_heap(spark):
    """The distributed merged-stream greedy (forced with max_collect=0) is
    node-for-node identical to the driver-heap replay on integer-valued
    sizes and unit weights — skewed initial sizes included, so the leveling
    prefix (all early picks draining into the smallest partition) and the
    steady-state cycle are both covered."""
    from graph_partitioning_spark.partitioning import place_singletons

    ids = [5, 9, 12, 40, 41, 42, 77] + list(range(100, 140))
    lonely = spark.createDataFrame([(i, 1.0) for i in ids], "id long, w double")
    for sizes in ([3.0, 1.0, 2.0, 1.0], [10.0, 0.0, 0.0, 7.0], [0.0] * 4):
        heap = {
            r["id"]: r["_np"]
            for r in place_singletons(lonely, sizes, 4, max_collect=10**6).collect()
        }
        dist = {
            r["id"]: r["_np"]
            for r in place_singletons(lonely, sizes, 4, max_collect=0).collect()
        }
        assert dist == heap, f"sizes={sizes}"


def test_place_singletons_distributed_mixed_weights_round_robin(spark):
    """Mixed weights above the cap: round-robin by stream rank over
    partitions ordered by (size, partition) — deterministic, total, and
    balanced in count."""
    from graph_partitioning_spark.partitioning import place_singletons

    rows = [(i, 1.0 + (i % 3)) for i in range(20)]
    lonely = spark.createDataFrame(rows, "id long, w double")
    sizes = [5.0, 1.0, 3.0]
    got = {
        r["id"]: r["_np"]
        for r in place_singletons(lonely, sizes, 3, max_collect=0).collect()
    }
    order = [1, 2, 0]  # ascending (size, p)
    assert got == {i: order[i % 3] for i in range(20)}


def test_fennel_singleton_cap_same_result(spark):
    """fennel_partition with singleton_collect_max=0 (every singleton takes
    the distributed path) produces the exact same assignment as the default
    heap path on a graph with isolated vertices."""
    src, dst, w = random_edges(30, 80, seed=51)
    edges = _edges_df(spark, src, dst, w)
    iso = [1000 + i for i in range(9)]
    ids = sorted({int(v) for v in np.concatenate([src, dst])}) + iso
    vertices = spark.createDataFrame([(v, 1.0) for v in ids], "id long, weight double")
    base_cfg = dict(num_partitions=4, num_iterations=2, micro_batches=2)
    a, _ = fennel_partition(edges, FennelConfig(**base_cfg), vertices=vertices)
    b, _ = fennel_partition(
        edges, FennelConfig(**base_cfg, singleton_collect_max=0), vertices=vertices
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
