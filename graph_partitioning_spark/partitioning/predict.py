"""Coordinate-based node-weight prediction (the F10 pipeline role).

The reference alters node weights from a geo-regression of the
simulated-arrival outcome on (x, y): ``mgcv::gam(shelter ~ s(x,y,k),
family=binomial)`` fit on the first ``num_arrived`` rows of the
coordinates + arrival files, predicting a probability for every node,
consumed as ``weight = int(prob * 100)``
(``utils.py:119-153``, ``graph_partitioning.py:545-563``).

This module fills the same pipeline slot with a **Nadaraya–Watson
Gaussian-kernel smoother** of the binary outcome — a published local
regression estimator that, like a spline GAM, estimates
E[arrived | x, y] without a parametric form. It is deliberately NOT an
mgcv re-implementation (thin-plate REML splines are not reproducible
here from public sources at hand and a guessed spline basis would fake
parity); the estimator choice is documented, deterministic, and tested
against an exact NumPy oracle. Downstream is identical: the predicted
probability scales to node weights that ``fennel_partition`` /
``simulate_arrivals`` consume via their ``vertices``/``weights`` input.

Scale shape: the training set is the arrived head (bounded by the
arrival stream, exactly the reference's ``nrows=num_arrived``), so it
broadcasts; scoring is one Arrow ``mapInPandas`` pass over the full
coordinates table — O(n_nodes · n_train) multiply-adds, vectorized. At
train sizes past ``train_max`` the call refuses rather than silently
degrading (an approximate-NN index is the documented path there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predict_arrival_weights(
    coordinates: DataFrame,
    labels: DataFrame,
    n_train: int,
    bandwidth: float | None = None,
    scale: float = 100.0,
    train_max: int = 500_000,
) -> DataFrame:
    """(id, prob, weight) for every node in ``coordinates``.

    ``coordinates``: (id, x, y) — e.g. ``sinks.read_coordinates`` (S6).
    ``labels``: (id, arrived 0/1) — the simulated-arrival list (S3).
    ``n_train``: fit on ids < n_train (the reference reads the first
    ``num_arrived`` rows of both line-ordered files — ids ARE row
    positions there).
    ``bandwidth``: Gaussian kernel width; ``None`` → Scott-style rule
    ``h = σ̂ · n^(-1/6)`` with σ̂ the mean of the train x/y standard
    deviations (deterministic).
    ``weight = int(prob · scale)`` truncated, floor 1 — matching the
    reference's ``int(gam_weights[node] * 100)`` consumption (a 0-weight
    node would vanish from balance accounting).
    """
    spark = coordinates.sparkSession
    train_rows = (
        coordinates.join(labels.select("id", "arrived"), "id")
        .filter(F.col("id") < n_train)
        .select("x", "y", F.col("arrived").cast("double").alias("yv"))
        .collect()
    )
    if not train_rows:
        raise ValueError("predict_arrival_weights: empty training head")
    if len(train_rows) > train_max:
        raise ValueError(
            f"predict_arrival_weights: {len(train_rows)} training rows "
            f"(train_max={train_max}); use an ANN-indexed scorer at this size"
        )

    import numpy as np

    tx = np.array([r["x"] for r in train_rows])
    ty = np.array([r["y"] for r in train_rows])
    tl = np.array([r["yv"] for r in train_rows])
    if bandwidth is None:
        sd = (float(np.std(tx)) + float(np.std(ty))) / 2.0
        bandwidth = max(sd * len(train_rows) ** (-1.0 / 6.0), 1e-9)
    h2 = 2.0 * float(bandwidth) ** 2
    gmean = float(np.mean(tl))
    bc = spark.sparkContext.broadcast((tx, ty, tl, h2, gmean))

    def score(batches):
        import pandas as pd

        bx, by, bl, bh2, bg = bc.value
        for pdf in batches:
            x = pdf["x"].to_numpy()[:, None]
            y = pdf["y"].to_numpy()[:, None]
            w = np.exp(-(((x - bx[None, :]) ** 2) + ((y - by[None, :]) ** 2)) / bh2)
            den = w.sum(axis=1)
            num = (w * bl[None, :]).sum(axis=1)
            # numerically dead kernels (node far from every train point)
            # fall back to the global arrival rate, like an intercept
            prob = np.where(den > 1e-300, num / np.maximum(den, 1e-300), bg)
            yield pd.DataFrame({"id": pdf["id"], "prob": prob})

    out = coordinates.select("id", "x", "y").mapInPandas(
        score, "id long, prob double"
    )
    return out.select(
        "id",
        "prob",
        F.greatest(
            F.floor(F.col("prob") * F.lit(float(scale))), F.lit(1)
        ).cast("long").alias("weight"),
    )
