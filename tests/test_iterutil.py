"""iterutil barriers: plan_size walk, materialize_static's two paths, and
the deep-lineage pagerank equivalence the static barrier exists for.

The static-frame barrier guards the iterative-Spark trap described in
iterutil's module docstring (reference drivers hold NetworkX graphs in
memory; a Spark loop instead re-analyzes each superstep's logical plan, so
un-truncated caller lineage is re-paid every iteration)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graph_partitioning_spark.graph.iterutil import (
    materialize_static,
    plan_size,
    release,
)
from graph_partitioning_spark.graph.pagerank import pagerank


def _shallow(spark):
    return spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))


def _deepen(df, rounds: int):
    """Chain projections/filters to inflate the analyzed plan depth."""
    for i in range(rounds):
        df = df.withColumn("v", F.col("v") + 1).where(F.col("id") >= 0)
    return df


def test_plan_size_counts_and_cap(spark):
    base = _shallow(spark)
    small = plan_size(base)
    assert 1 <= small < 20
    deep = _deepen(base, 60)
    big = plan_size(deep)
    assert big > small + 100  # 2 nodes per round: Project + Filter
    # budget cap bounds the walk (and the JVM call count with it)
    assert plan_size(deep, cap=10) <= 10


def test_materialize_static_shallow_keeps_lazy_persist(spark):
    df = _shallow(spark)
    out = materialize_static(df)
    try:
        # shallow path: plain persist — no plan truncation, no eager job
        assert out.storageLevel.useMemory
        assert plan_size(out) == plan_size(df)
        assert out.count() == 100
    finally:
        release(out)


def test_materialize_static_deep_truncates_plan(spark):
    df = _deepen(_shallow(spark), 60)
    out = materialize_static(df)
    try:
        # deep path: local checkpoint — analyzed plan collapses to a leaf
        assert plan_size(out) < 10
        rows = {r["id"]: r["v"] for r in out.collect()}
        assert rows == {i: i % 7 + 60 for i in range(100)}
    finally:
        release(out)


def test_pagerank_deep_lineage_matches_shallow(spark, small_graph):
    """The barrier must change plans only, never values: pagerank over an
    artificially deep edge lineage (> the materialize_static threshold)
    bit-matches pagerank over the same edges read shallow."""
    edges, _ = small_graph
    ranks_a, info_a = pagerank(edges, max_iter=5)
    deep = edges
    for i in range(45):  # 2 nodes/round pushes links past the 80-node gate
        deep = deep.withColumn("weight", F.col("weight") + 0).where(
            F.col("src") >= -1
        )
    ranks_b, info_b = pagerank(deep, max_iter=5)
    a = sorted(ranks_a.collect())
    b = sorted(ranks_b.collect())
    assert info_a["iterations"] == info_b["iterations"]
    assert [r["id"] for r in a] == [r["id"] for r in b]
    assert all(
        abs(x["pagerank"] - y["pagerank"]) < 1e-12 for x, y in zip(a, b)
    )
