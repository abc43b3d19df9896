"""Centrality measures used by the reference's node-reordering schemes (A13/F11).

- degree centrality: ``utils.py:999-1008`` — plain degree ranking.
- leverage centrality: ``utils.py:1010-1046`` — for node i with degree k_i,
  ``mean over neighbors j of (k_i − k_j) / (k_i + k_j)``; isolated nodes
  get NULL (the reference skips degree-0 nodes before computing,
  utils.py:1170-1176).

The R-subprocess centralities (PII, bottleneck — utils.py:1205-1354) are
documented non-goals (SURVEY.md §2.5 F11): they order a *sequential*
stream, which batch-synchronous execution replaces with the
``FennelConfig.bucket_by="degree_hl"`` bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import degrees, symmetrize


def degree_centrality(edges: DataFrame) -> DataFrame:
    """(id, degree, centrality) with centrality = degree / (n − 1)."""
    deg = degrees(edges)
    n = deg.count()
    denom = max(n - 1, 1)
    return deg.select("id", "degree", (F.col("degree") / denom).alias("centrality"))


def leverage_centrality(edges: DataFrame) -> DataFrame:
    """(id, leverage) — mean over neighbors of (k_i − k_j)/(k_i + k_j).

    One degree aggregation + one join of degrees onto the symmetrized edge
    list + one mean — the A13 plan from SURVEY.md §2.4.
    """
    deg = degrees(edges)
    sym = symmetrize(edges)
    d_i = deg.select(F.col("id").alias("src"), F.col("degree").alias("k_i"))
    d_j = deg.select(F.col("id").alias("dst"), F.col("degree").alias("k_j"))
    return (
        sym.join(d_i, "src")
        .join(d_j, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.avg(
                (F.col("k_i") - F.col("k_j")) / (F.col("k_i") + F.col("k_j"))
            ).alias("leverage")
        )
    )
