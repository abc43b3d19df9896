"""Arrival-simulation pipeline (D4/D5), edge expansion (F9), virtual nodes (F8)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.partitioning.arrival import (
    ArrivalConfig,
    add_virtual_nodes,
    edge_expansion,
    remove_virtual_nodes,
    simulate_arrivals,
)

from .conftest import random_edges


@pytest.fixture(scope="module")
def graph(spark):
    src, dst, w = random_edges(80, 300, seed=77, weighted=True)
    edges = undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    ).persist()
    ids = sorted({int(v) for v in np.concatenate([src, dst])})
    return edges, ids


def _arrivals(spark, ids, arrived_frac=0.8, seed=5):
    rng = np.random.default_rng(seed)
    rows = [
        (v, int(rng.random() < arrived_frac), i) for i, v in enumerate(ids)
    ]
    return spark.createDataFrame(rows, "id long, arrived int, seq long"), rows


def test_edge_expansion_modes(spark, graph):
    edges, ids = graph
    weights = spark.createDataFrame(
        [(v, float(v % 5 + 1)) for v in ids], "id long, weight double"
    )
    base = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    for mode, fn in [
        ("minimum", min),
        ("maximum", max),
        ("product", lambda a, b: a * b),
        ("average", lambda a, b: (a + b) / 2),
        ("total", lambda a, b: a + b),
    ]:
        out = {
            (r["src"], r["dst"]): r["weight"]
            for r in edge_expansion(edges, weights, mode).collect()
        }
        for (s, d) in list(base)[:25]:
            w1, w2 = float(s % 5 + 1), float(d % 5 + 1)
            assert out[(s, d)] == pytest.approx(fn(w1, w2)), (mode, s, d)
    # default mode: (w1*e)*(w2*e)
    out = {
        (r["src"], r["dst"]): r["weight"]
        for r in edge_expansion(edges, weights, "default").collect()
    }
    for (s, d), e in list(base.items())[:25]:
        w1, w2 = float(s % 5 + 1), float(d % 5 + 1)
        assert out[(s, d)] == pytest.approx((w1 * e) * (w2 * e))


def test_edge_expansion_emphasis(spark, graph):
    edges, ids = graph
    weights = spark.createDataFrame([(v, 2.0) for v in ids], "id long, weight double")
    arrived = spark.createDataFrame([(ids[0],)], "id long")
    out = edge_expansion(
        edges, weights, "product", prediction_model_emphasis=10.0, arrived=arrived
    )
    rows = out.collect()
    for r in rows:
        want = 4.0 * (10.0 if ids[0] in (r["src"], r["dst"]) else 1.0)
        assert r["weight"] == pytest.approx(want)


def test_virtual_nodes(spark, graph):
    edges, ids = graph
    pred = spark.createDataFrame([(v, v % 3) for v in ids], "id long, partition int")
    aug, virt_assign, virt_ids = add_virtual_nodes(edges, pred, 3, virtual_edge_weight=7.0)
    v_edges = aug.filter(F.col("dst") < 0).collect()
    assert len(v_edges) == len(ids)
    for r in v_edges:
        assert r["dst"] == -(r["src"] % 3 + 1)
        assert r["weight"] == 7.0
    assert {r["id"] for r in virt_assign.collect()} == {-1, -2, -3}
    cleaned = remove_virtual_nodes(
        pred.unionByName(virt_assign)
    )
    assert cleaned.count() == len(ids)


def test_simulate_arrivals_basic(spark, graph):
    edges, ids = graph
    arrivals, rows = _arrivals(spark, ids)
    cfg = ArrivalConfig(
        num_partitions=3,
        restream_batches=20,
        num_iterations=1,
        micro_batches=1,
        prediction_model_cut_off=0.25,
        prediction_iterations=2,
        compute_metrics=True,
    )
    final, metrics, info = simulate_arrivals(edges, arrivals, cfg)
    got = {r["id"]: r["partition"] for r in final.collect()}
    arrived = {v for v, a, _ in rows if a == 1}
    # every arrived node assigned; every non-arrived node unassigned
    for v in ids:
        if v in arrived:
            assert 0 <= got[v] < 3, f"arrived node {v} unassigned"
        else:
            assert got.get(v, -1) == -1, f"non-arrived node {v} assigned"
    assert info["n_arrivals"] == len(arrived)
    assert info["cut_off_value"] == int(0.25 * len(arrived))
    mrows = metrics.collect()
    assert len(mrows) == info["n_batches"]
    assert all(r["cut_ratio"] <= 1.0 for r in mrows)


def test_simulate_arrivals_respects_prediction_cutoff(spark, graph):
    edges, ids = graph
    arrivals, rows = _arrivals(spark, ids, seed=11)
    pred = spark.createDataFrame([(v, (v + 1) % 2) for v in ids], "id long, partition int")
    cfg = ArrivalConfig(
        num_partitions=2,
        restream_batches=30,
        num_iterations=1,
        micro_batches=1,
        prediction_model_cut_off=0.5,
        compute_metrics=False,
    )
    final, metrics, info = simulate_arrivals(edges, arrivals, cfg, prediction=pred)
    got = {r["id"]: r["partition"] for r in final.collect()}
    # the first cut_off arrivals must sit exactly at their predicted partition
    arrived_in_order = [v for v, a, _ in sorted(rows, key=lambda t: t[2]) if a == 1]
    for v in arrived_in_order[: info["cut_off_value"]]:
        assert got[v] == (v + 1) % 2


def test_simulate_arrivals_virtual_nodes_pull(spark, graph):
    edges, ids = graph
    arrivals, rows = _arrivals(spark, ids, seed=13)
    pred = spark.createDataFrame([(v, v % 2) for v in ids], "id long, partition int")
    cfg = ArrivalConfig(
        num_partitions=2,
        restream_batches=40,
        num_iterations=1,
        micro_batches=1,
        prediction_model_cut_off=0.2,
        use_virtual_nodes=True,
        virtual_edge_weight=100.0,  # overwhelming pull toward prediction
        compute_metrics=False,
    )
    final, metrics, info = simulate_arrivals(edges, arrivals, cfg, prediction=pred)
    got = {r["id"]: r["partition"] for r in final.collect()}
    assert all(v >= 0 for v in got)  # virtual nodes stripped
    arrived = {v for v, a, _ in rows if a == 1}
    agree = sum(1 for v in arrived if got[v] == v % 2)
    assert agree / len(arrived) > 0.9  # strong virtual edges pin to prediction
