"""Bottleneck centrality (F11) vs hand-computed and brute-force oracles.

Reference: utils.py:1285-1354 + bottleneck.r (R centiserve per batch
sub-network); ours is the in-engine per-component Arrow kernel.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.graph.centrality import bottleneck_centrality
from graph_partitioning_spark.partitioning.arrival import bottleneck_arrival_order

from .conftest import random_edges


def bn_bruteforce(edge_pairs):
    """Independent reimplementation: explicit path materialization.

    BFS with the same parent rule (smallest-id neighbor one level closer),
    then literally builds every root→t path as a list and counts
    membership — a different algorithm from the kernel's subtree-size
    accumulation, so agreement is meaningful.
    """
    adj = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    bn = {v: 0 for v in nodes}
    for root in nodes:
        dist = {root: 0}
        frontier = [root]
        while frontier:
            nxt = set()
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        nxt.add(v)
            for v in nxt:
                dist[v] = dist[frontier[0]] + 1
            frontier = sorted(nxt)
        parent = {}
        for v, dv in dist.items():
            if dv > 0:
                parent[v] = min(u for u in adj[v] if dist.get(u) == dv - 1)
        tree_nodes = list(dist)
        counts = {v: 0 for v in tree_nodes}
        for t in tree_nodes:
            if t == root:
                continue
            cur = t
            while cur != root:
                counts[cur] += 1
                cur = parent[cur]
        nt = len(tree_nodes)
        for v in tree_nodes:
            if v != root and counts[v] * 4 > nt:
                bn[v] += 1
    return bn


def _bn(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r["id"]: r["bottleneck"] for r in bottleneck_centrality(df).collect()}


def test_star_hand_oracle(spark):
    # center of a 4-leaf star: every leaf root routes 3 paths through it
    assert _bn(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]) == {
        0: 4, 1: 0, 2: 0, 3: 0, 4: 0,
    }


def test_path_hand_oracle(spark):
    assert _bn(spark, [(0, 1), (1, 2), (2, 3)]) == {0: 0, 1: 3, 2: 3, 3: 0}


def test_two_components_scored_independently(spark):
    got = _bn(spark, [(10, 11), (10, 12), (10, 13), (10, 14), (20, 21), (21, 22), (22, 23)])
    assert got[10] == 4 and got[21] == 3 and got[22] == 3
    assert got[11] == got[12] == got[13] == got[14] == got[20] == got[23] == 0


def test_matches_bruteforce_on_random_graph(spark):
    src, dst, _ = random_edges(60, 150, seed=7)
    pairs = sorted({(int(a), int(b)) for a, b in zip(src, dst) if a != b})
    got = _bn(spark, pairs)
    want = bn_bruteforce(pairs)
    assert got == want


def test_component_size_guard(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(Exception, match="max_component"):
        bottleneck_centrality(df, max_component=2).collect()


def test_arrival_reorder_alone_last_and_bn_desc(spark):
    # batch0 = {0,1,2,3}: path 0-1-2-3 → 1,2 (bn 3) stream first
    # batch1 = {4,5,6,7}: path 5-4-6, 7 isolated → 7 streams last
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5), (4, 6)], "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    arr = spark.createDataFrame(
        [(i, 1, i) for i in range(8)], "id long, arrived int, seq long"
    )
    rows = bottleneck_arrival_order(edges, arr, 4).orderBy("seq").collect()
    assert [r["id"] for r in rows] == [1, 2, 0, 3, 4, 5, 6, 7]
    assert [r["seq"] for r in rows] == list(range(8))
    assert rows[7]["bottleneck"] == 0  # the alone node
    # new seq is a permutation within each original batch
    assert {r["id"] for r in rows[:4]} == {0, 1, 2, 3}
    assert {r["id"] for r in rows[4:]} == {4, 5, 6, 7}


def test_arrival_reorder_deterministic(spark):
    src, dst, _ = random_edges(40, 80, seed=3)
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    ).withColumn("weight", F.lit(1.0))
    arr = spark.createDataFrame(
        [(i, 1, 1000 - i) for i in range(40)], "id long, arrived int, seq long"
    )
    a = bottleneck_arrival_order(edges, arr, 16).orderBy("seq").collect()
    b = bottleneck_arrival_order(edges, arr, 16).orderBy("seq").collect()
    assert a == b
