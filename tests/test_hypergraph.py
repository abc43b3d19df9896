"""Clique/hyperedge construction (J3) vs networkx + reference-logic oracles.

Reference: partitioners/patoh/patoh_data.py:62-270 (nx.find_cliques nets,
expansion modes); the C solver itself stays the F7 non-goal.
"""

import math

import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.partitioning.hypergraph import (
    EXPANSION_MODES,
    hyperedge_weights,
    maximal_cliques,
    patoh_arrays,
)

from .conftest import random_edges


def ref_expand(weights, mode):
    """Direct reimplementation of the reference's _hyperedgeExpansion
    (+_complete pairwise-min front-end) on Python lists."""
    if "_complete" in mode:
        ws = [
            min(weights[i], weights[j])
            for i in range(len(weights))
            for j in range(i + 1, len(weights))
        ]
    else:
        ws = list(weights)
    if "no_expansion" in mode:
        return 1
    h = 0.0
    for i, w in enumerate(ws):
        if "avg_node_weight" in mode:
            h += w
            if i + 1 == len(ws):
                h /= len(ws)
        elif "total_node_weight" in mode:
            h += w
        elif "smallest_node_weight" in mode:
            h = w if i == 0 else min(h, w)
        elif "largest_node_weight" in mode:
            h = w if i == 0 else max(h, w)
        elif "product_node_weight" in mode:
            if i == 0:
                h = 1.0
            h *= w
    if "squared" in mode:
        h = h ** 2.0
    if "sqrt" in mode:
        h = math.sqrt(h)
    r = round(h)
    return r if r > 0 else 1


def _cliques(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return sorted(
        tuple(r["members"]) for r in maximal_cliques(df, **kw).collect()
    )


def test_cliques_hand_oracle(spark):
    # triangle 0-1-2 plus pendant 2-3
    assert _cliques(spark, [(0, 1), (1, 2), (0, 2), (2, 3)]) == [(0, 1, 2), (2, 3)]
    # K4 is one clique
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _cliques(spark, k4) == [(0, 1, 2, 3)]
    # path = its edges
    assert _cliques(spark, [(0, 1), (1, 2), (2, 3)]) == [(0, 1), (1, 2), (2, 3)]


def test_cliques_match_networkx(spark):
    nx = pytest.importorskip("networkx")
    src, dst, _ = random_edges(40, 120, seed=13)
    pairs = sorted({(int(a), int(b)) for a, b in zip(src, dst)})
    got = _cliques(spark, pairs)
    g = nx.Graph(pairs)
    want = sorted(tuple(sorted(c)) for c in nx.find_cliques(g))
    assert got == want


def test_cliques_grouped_never_span_groups(spark):
    df = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 2), (0, 0, 2), (1, 0, 1)], "g long, src long, dst long"
    )
    got = sorted(
        tuple(r["members"])
        for r in maximal_cliques(df, group_col="g").collect()
    )
    assert got == [(0, 1), (0, 1, 2)]


def test_cliques_size_guard(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(Exception, match="max_component"):
        maximal_cliques(df, max_component=2).collect()


@pytest.mark.parametrize(
    "mode",
    [m for m in EXPANSION_MODES]
    + ["avg_node_weight_squared", "total_node_weight_sqrt",
       "product_node_weight_sqrt", "smallest_node_weight_complete",
       "largest_node_weight_complete", "avg_node_weight_complete",
       "total_node_weight_complete", "product_node_weight_complete",
       "no_expansion_complete"],
)
def test_expansion_modes_match_reference_logic(spark, mode):
    cliques = [([0, 1, 2], [2.0, 3.0, 5.0]), ([3, 4], [4.0, 0.25]), ([5], [7.0])]
    cdf = spark.createDataFrame(
        [(m,) for m, _ in cliques], "members array<long>"
    )
    vdf = spark.createDataFrame(
        [(i, w) for m, ws in cliques for i, w in zip(m, ws)],
        "id long, weight double",
    )
    got = {
        tuple(r["members"]): r["hyperedge_weight"]
        for r in hyperedge_weights(cdf, vdf, mode).collect()
    }
    for members, ws in cliques:
        assert got[tuple(members)] == ref_expand(ws, mode), (mode, members)


def test_expansion_default_weight_one(spark):
    cdf = spark.createDataFrame([([0, 1, 2],)], "members array<long>")
    got = hyperedge_weights(cdf, None, "total_node_weight").first()
    assert got["hyperedge_weight"] == 3


def test_patoh_arrays_export(spark):
    cdf = spark.createDataFrame(
        [([0, 1, 2],), ([2, 3],)], "members array<long>"
    )
    weighted = hyperedge_weights(cdf, None, "total_node_weight")
    xpins, pins, cwghts, nwghts = patoh_arrays(weighted, 4)
    assert list(xpins) == [0, 3, 5]
    assert list(pins) == [0, 1, 2, 2, 3]
    assert list(cwghts) == [1, 1, 1, 1]
    assert list(nwghts) == [3, 2]


def _np_refine_tcv(nets, assign, k, slack=0.1, sweeps=2):
    """Exact sequential oracle for refine_tcv: per-net connectivity deltas,
    gain = only_A + presence_B − nets(v), ties to the smaller partition,
    first-fit-prefix admission per target against (1+slack)·n/k."""
    assign = dict(assign)
    total = float(len(assign))
    cap = (1.0 + slack) * total / k
    for _ in range(sweeps):
        movers = []
        for v in sorted(assign):
            vnets = [net for net in nets if v in net]
            if not vnets:
                continue
            A = assign[v]
            oa = sum(
                1 for net in vnets
                if sum(1 for u in net if assign[u] == A) == 1
            )
            nv = len(vnets)
            best = None
            for B in range(k):
                if B == A:
                    continue
                pres = sum(
                    1 for net in vnets
                    if any(u != v and assign[u] == B for u in net)
                )
                g = oa + pres - nv
                key = (g, -B)
                if best is None or key > best[0]:
                    best = (key, B, g)
            if best is not None and best[2] > 0:
                movers.append((v, best[1], float(best[2])))
        sizes = {}
        for p in assign.values():
            sizes[p] = sizes.get(p, 0.0) + 1.0
        admitted = []
        by_t = {}
        for m in movers:
            by_t.setdefault(m[1], []).append(m)
        for t, ms in by_t.items():
            ms.sort(key=lambda m: (-m[2], m[0]))
            c = sizes.get(t, 0.0)
            for m in ms:
                c += 1.0
                if c <= cap:
                    admitted.append(m)
        if not admitted:
            break
        for v, t, _ in admitted:
            assign[v] = t
    return assign


def test_refine_tcv_matches_sequential_oracle(spark):
    from graph_partitioning_spark.partitioning import refine_tcv

    nets = [
        {0, 1, 2}, {2, 3, 4}, {4, 5, 6}, {6, 7, 0},
        {1, 3, 5, 7}, {0, 4}, {2, 6}, {8, 9}, {8, 0, 2}, {9, 5},
    ]
    pins = spark.createDataFrame(
        [(i, int(p)) for i, net in enumerate(nets) for p in net],
        "net long, pin long",
    )
    init = {v: v % 3 for v in range(10)}
    assign = spark.createDataFrame(list(init.items()), "id long, partition int")
    got_df, info = refine_tcv(pins, assign, k=3, slack=0.4, sweeps=3)
    got = {r["id"]: r["partition"] for r in got_df.collect()}
    want = _np_refine_tcv([set(n) for n in nets], init, k=3, slack=0.4, sweeps=3)
    assert got == want
    assert sum(info["moves"]) > 0


def test_refine_tcv_improves_best_of(spark):
    """The PaToH role, completed: best-of-N only SELECTS by min TCV;
    refine_tcv must then strictly improve the connectivity objective on
    the clique hypergraph, without breaking balance."""
    import numpy as np

    from graph_partitioning_spark.partitioning import (
        FennelConfig,
        best_of,
        clique_pins,
        hypergraph_tcv,
        maximal_cliques,
        refine_tcv,
    )
    from .test_fennel import _edges_df, planted_graph

    src, dst, w = planted_graph()
    edges = _edges_df(spark, src, dst, w)
    cfg = FennelConfig(num_partitions=3, num_iterations=2, micro_batches=4)
    base, info = best_of(edges, cfg, n_runs=3, objective="tcv")
    pins = clique_pins(maximal_cliques(edges)).persist()
    before = hypergraph_tcv(pins, base)
    refined, rinfo = refine_tcv(pins, base, k=3, slack=0.1, sweeps=4)
    after = hypergraph_tcv(pins, refined)
    assert after < before, f"TCV {before} -> {after}: no improvement"
    counts = {}
    for r in refined.collect():
        counts[r["partition"]] = counts.get(r["partition"], 0) + 1
    assert max(counts.values()) <= 1.1 * 180 / 3 + 1e-9
    pins.unpersist()
