"""Connected components: exact match vs union-find oracle (north star T2)."""

import numpy as np

from graph_partitioning_spark.checkpoint import CheckpointManager
from graph_partitioning_spark.graph.components import connected_components

from .conftest import random_edges
from .oracles import components_oracle


def _check(spark, src, dst):
    df = spark.createDataFrame(
        list(zip(src.tolist(), dst.tolist(), [1.0] * len(src))),
        "src long, dst long, weight double",
    )
    got_df, info = connected_components(df)
    assert info["converged"]
    got = {r.id: r.component for r in got_df.collect()}
    assert got == components_oracle(src, dst)


def test_cc_random_graph(spark):
    src, dst, _ = random_edges(300, 400, seed=11)
    _check(spark, src, dst)


def test_cc_many_small_components(spark):
    # disjoint pairs + one long path (stresses O(log n) convergence)
    pairs = [(2 * i, 2 * i + 1) for i in range(50)]
    path = [(1000 + i, 1000 + i + 1) for i in range(120)]
    src = np.array([a for a, b in pairs + path])
    dst = np.array([b for a, b in pairs + path])
    _check(spark, src, dst)


def test_cc_checkpoint_resume(spark, tmp_path):
    src, dst, _ = random_edges(200, 250, seed=13)
    df = spark.createDataFrame(
        list(zip(src.tolist(), dst.tolist(), [1.0] * len(src))),
        "src long, dst long, weight double",
    )
    mgr = CheckpointManager(str(tmp_path), "cc_run")
    connected_components(df, max_iter=1, checkpointer=mgr)  # interrupted
    resumed, info = connected_components(df, checkpointer=mgr)
    assert info["converged"]
    got = {r.id: r.component for r in resumed.collect()}
    assert got == components_oracle(src, dst)
