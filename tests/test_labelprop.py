"""Synchronous LPA: exact per-iteration parity with the NumPy oracle."""

from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.graph.labelprop import label_propagation

from .conftest import random_edges
from .oracles import lpa_oracle


def _run(spark, src, dst, w, iters, weighted=True):
    df = undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    )
    rows = df.collect()
    s = [r.src for r in rows]
    d = [r.dst for r in rows]
    ww = [r.weight for r in rows]
    import numpy as np

    got_df, info = label_propagation(df, max_iter=iters, weighted=weighted)
    got = {r.id: r.label for r in got_df.collect()}
    exp = lpa_oracle(np.array(s), np.array(d), np.array(ww), max_iter=iters, weighted=weighted)
    assert got == exp


def test_lpa_two_cliques_bridge(spark):
    import numpy as np

    clique1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    edges = clique1 + clique2 + [(4, 10)]
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    w = np.ones(len(edges))
    _run(spark, src, dst, w, iters=10)


def test_lpa_weighted_random(spark):
    src, dst, w = random_edges(80, 200, seed=23, weighted=True)
    _run(spark, src, dst, w, iters=5, weighted=True)


def test_lpa_unweighted_random(spark):
    src, dst, w = random_edges(60, 150, seed=29)
    _run(spark, src, dst, w, iters=4, weighted=False)
