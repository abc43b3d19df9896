"""Coordinate-based weight prediction (F10 role) vs exact NumPy oracle.

Reference flow: utils.py:119-153 (mgcv GAM) consumed at
graph_partitioning.py:545-563 as weight = int(prob*100). The in-engine
estimator is a documented Nadaraya-Watson smoother, not an mgcv clone —
these tests pin ITS exact arithmetic and the pipeline wiring.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.partitioning.predict import predict_arrival_weights


def nw_oracle(coords, labels, n_train, h):
    tx = np.array([x for i, x, y in coords if i < n_train])
    ty = np.array([y for i, x, y in coords if i < n_train])
    tl = np.array([labels[i] for i, x, y in coords if i < n_train], dtype=float)
    out = {}
    for i, x, y in coords:
        w = np.exp(-(((x - tx) ** 2) + ((y - ty) ** 2)) / (2 * h * h))
        den = w.sum()
        p = (w * tl).sum() / den if den > 1e-300 else tl.mean()
        out[i] = p
    return out


@pytest.fixture(scope="module")
def geo(spark):
    rng = np.random.default_rng(42)
    n = 200
    xs = rng.uniform(-5, 5, n)
    ys = rng.uniform(-5, 5, n)
    # arrivals cluster in the north-east quadrant
    lab = ((xs > 0) & (ys > 0) & (rng.random(n) < 0.9)).astype(int)
    coords = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "id long, x double, y double",
    )
    labels = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(lab)], "id long, arrived int"
    )
    return coords, labels, [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))], {
        i: int(v) for i, v in enumerate(lab)
    }


def test_matches_numpy_oracle_exactly(spark, geo):
    coords, labels, clist, lmap = geo
    h = 1.5
    got = {
        r["id"]: r["prob"]
        for r in predict_arrival_weights(coords, labels, 120, bandwidth=h).collect()
    }
    want = nw_oracle(clist, lmap, 120, h)
    assert set(got) == set(want)
    for i in got:
        assert math.isclose(got[i], want[i], rel_tol=1e-12, abs_tol=1e-12), i


def test_weight_scaling_and_floor(spark, geo):
    coords, labels, _, _ = geo
    rows = predict_arrival_weights(coords, labels, 120, bandwidth=1.5).collect()
    for r in rows:
        assert 0.0 <= r["prob"] <= 1.0
        assert r["weight"] == max(int(r["prob"] * 100), 1)


def test_cluster_separation(spark, geo):
    coords, labels, _, _ = geo
    out = predict_arrival_weights(coords, labels, 200, bandwidth=1.0)
    joined = out.join(coords, "id")
    ne = joined.filter((F.col("x") > 1) & (F.col("y") > 1)).agg(F.avg("prob")).first()[0]
    sw = joined.filter((F.col("x") < -1) & (F.col("y") < -1)).agg(F.avg("prob")).first()[0]
    assert ne > 0.6 > sw  # the arrival cluster scores high, the far corner low


def test_auto_bandwidth_deterministic(spark, geo):
    coords, labels, _, _ = geo
    a = sorted(predict_arrival_weights(coords, labels, 120).collect())
    b = sorted(predict_arrival_weights(coords, labels, 120).collect())
    assert a == b


def test_feeds_fennel_vertices(spark, geo):
    """The predicted weights plug into the partitioner's weights input."""
    from graph_partitioning_spark.partitioning import FennelConfig, fennel_partition

    coords, labels, _, _ = geo
    w = predict_arrival_weights(coords, labels, 120, bandwidth=1.5).select(
        "id", F.col("weight").cast("double").alias("weight")
    )
    edges = spark.createDataFrame(
        [(i, (i + 1) % 200, 1.0) for i in range(200)],
        "src long, dst long, weight double",
    )
    assign, info = fennel_partition(
        edges, FennelConfig(num_partitions=4, num_iterations=1), vertices=w
    )
    assert assign.count() == 200
    assert assign.select("partition").distinct().count() <= 4
