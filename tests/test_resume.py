"""Checkpoint/resume: an interrupted run must continue (not restart) and
reach the same final state as an uninterrupted run (SURVEY.md §5 test plan)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.checkpoint import CheckpointManager
from graph_partitioning_spark.graph import (
    connected_components,
    label_propagation,
    pagerank,
)
from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.partitioning import FennelConfig, fennel_partition

from .conftest import random_edges


@pytest.fixture(scope="module")
def graph(spark):
    src, dst, w = random_edges(120, 500, seed=19, weighted=True)
    directed = spark.createDataFrame(
        list(zip(src.tolist(), dst.tolist(), w.tolist())),
        "src long, dst long, weight double",
    ).persist()
    return directed, undirect(directed).persist()


def test_pagerank_resume_identical(spark, graph, tmp_path):
    directed, und = graph
    full, info_full = pagerank(directed, tol=1e-8, max_iter=40)
    want = {r["id"]: r["pagerank"] for r in full.collect()}

    cp = CheckpointManager(str(tmp_path / "pr"), "run")
    part1, info1 = pagerank(directed, tol=1e-8, max_iter=3, checkpointer=cp)
    assert info1["iterations"] == 3 and not info1["converged"]

    cp2 = CheckpointManager(str(tmp_path / "pr"), "run")
    part2, info2 = pagerank(directed, tol=1e-8, max_iter=40, checkpointer=cp2)
    assert info2["converged"]
    # resumed run continued from superstep 3, not from scratch
    assert info2["iterations"] == info_full["iterations"]
    got = {r["id"]: r["pagerank"] for r in part2.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_components_resume_identical(spark, graph, tmp_path):
    directed, und = graph
    full, _ = connected_components(und)
    want = {r["id"]: r["component"] for r in full.collect()}

    cp = CheckpointManager(str(tmp_path / "cc"), "run")
    _, info1 = connected_components(und, max_iter=1, checkpointer=cp)
    cp2 = CheckpointManager(str(tmp_path / "cc"), "run")
    part2, info2 = connected_components(und, checkpointer=cp2)
    assert info2["converged"]
    got = {r["id"]: r["component"] for r in part2.collect()}
    assert got == want


def test_labelprop_resume_identical(spark, graph, tmp_path):
    directed, und = graph
    full, info_full = label_propagation(und, max_iter=8)
    want = {r["id"]: r["label"] for r in full.collect()}

    cp = CheckpointManager(str(tmp_path / "lpa"), "run")
    _, info1 = label_propagation(und, max_iter=2, checkpointer=cp)
    cp2 = CheckpointManager(str(tmp_path / "lpa"), "run")
    part2, info2 = label_propagation(und, max_iter=8, checkpointer=cp2)
    got = {r["id"]: r["label"] for r in part2.collect()}
    assert got == want


def test_fennel_resume_identical(spark, graph, tmp_path):
    directed, und = graph
    cfg = FennelConfig(num_partitions=3, num_iterations=3, micro_batches=2)
    full, _ = fennel_partition(und, cfg)
    want = {r["id"]: r["partition"] for r in full.collect()}

    cp = CheckpointManager(str(tmp_path / "fn"), "run")
    cfg1 = FennelConfig(num_partitions=3, num_iterations=1, micro_batches=2,
                        converge_early=False)
    _, info1 = fennel_partition(und, cfg1, checkpointer=cp)
    assert info1["iterations"] == 1

    cp2 = CheckpointManager(str(tmp_path / "fn"), "run")
    part2, info2 = fennel_partition(und, cfg, checkpointer=cp2)
    got = {r["id"]: r["partition"] for r in part2.collect()}
    assert got == want


def test_fennel_resume_rejects_bucket_schedule_mismatch(spark, graph, tmp_path):
    """A checkpointed state keeps the bucket column it was written with —
    resuming under a different bucket schedule (or k) must fail loudly, not
    silently starve the pruned vote join."""
    directed, und = graph
    cp = CheckpointManager(str(tmp_path / "fnm"), "run")
    cfg1 = FennelConfig(num_partitions=3, num_iterations=1, micro_batches=2,
                        converge_early=False)
    fennel_partition(und, cfg1, checkpointer=cp)

    with pytest.raises(ValueError, match="micro_batches"):
        fennel_partition(
            und,
            FennelConfig(num_partitions=3, num_iterations=2, micro_batches=4),
            checkpointer=CheckpointManager(str(tmp_path / "fnm"), "run"),
        )
    with pytest.raises(ValueError, match="bucket_by"):
        fennel_partition(
            und,
            FennelConfig(num_partitions=3, num_iterations=2, micro_batches=2,
                         bucket_by="mod"),
            checkpointer=CheckpointManager(str(tmp_path / "fnm"), "run"),
        )
    # matching config still resumes fine
    part2, info2 = fennel_partition(
        und,
        FennelConfig(num_partitions=3, num_iterations=2, micro_batches=2),
        checkpointer=CheckpointManager(str(tmp_path / "fnm"), "run"),
    )
    assert part2.count() == und.selectExpr("src as id").union(
        und.selectExpr("dst as id")
    ).distinct().count()
