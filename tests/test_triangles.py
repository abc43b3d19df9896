"""Triangle counting vs brute-force oracle (north star T4)."""

import numpy as np

from graph_partitioning_spark.graph.triangles import (
    triangle_count,
    triangle_count_per_vertex,
)

from .conftest import random_edges
from .oracles import triangles_oracle


def _df(spark, src, dst):
    return spark.createDataFrame(
        list(zip(src.tolist(), dst.tolist(), [1.0] * len(src))),
        "src long, dst long, weight double",
    )


def test_triangles_known():
    # oracle sanity: K4 has 4 triangles, each vertex in 3
    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    total, per = triangles_oracle(src, dst)
    assert total == 4
    assert per == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_k4(spark):
    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    df = _df(spark, src, dst)
    assert triangle_count(df) == 4
    per = {r.id: r.triangles for r in triangle_count_per_vertex(df).collect()}
    assert per == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_random(spark):
    src, dst, _ = random_edges(60, 400, seed=31)
    df = _df(spark, src, dst)
    total, per = triangles_oracle(src, dst)
    assert triangle_count(df) == total
    got = {r.id: r.triangles for r in triangle_count_per_vertex(df).collect()}
    assert got == per


def test_triangle_free(spark):
    # star graph: no triangles
    src = np.zeros(10, dtype=np.int64)
    dst = np.arange(1, 11, dtype=np.int64)
    assert triangle_count(_df(spark, src, dst)) == 0
