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
