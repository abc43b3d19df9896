"""Connected components via alternating large-star / small-star (north-star T2).

Implements the two-phase algorithm of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SOCC'14): maintain a canonically-oriented edge set
(src > dst); alternate

  large-star(u): connect every neighbor v > u to m = min(Γ(u) ∪ {u})
  small-star(u): over edges oriented large→small, connect u and all its
                 (smaller) neighbors to their minimum

until the edge set reaches a fixpoint — a star forest where every vertex
points at its component's minimum id. Converges in O(log n) supersteps,
each a groupBy(min) + join, so it survives diameter-n path graphs that kill
naive min-propagation at web scale.

Component ids are the canonical minimum vertex id (exact, deterministic —
north star requires exact component assignments at convergence).

The reference computes per-partition structure but never components; its
nearest analogue is the clique machinery (/root/reference/graph_partitioning/
partitioners/patoh/patoh_data.py:151-154). T2 is mandated by BASELINE.json.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager, Counters
from .iterutil import LoopState, materialize, release


def _canon(edges: DataFrame) -> DataFrame:
    """Orient src > dst, drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.select("src", "dst").union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # e is already oriented src > dst
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    to_min = (
        e.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select("src", F.col("m").alias("dst"))
    return to_min.union(self_edge).filter(F.col("src") != F.col("dst")).distinct()


def _fingerprint_aggs() -> list:
    # built lazily: Column construction needs an active SparkContext
    return [
        F.count("*").alias("c"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ]


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(*_fingerprint_aggs()).first()
    return int(row["c"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpointer: CheckpointManager | None = None,
    resume: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (assignments(id, component), info).

    ``component`` is the minimum vertex id of the component. Vertices are
    everything appearing in ``edges``; isolated vertices (absent from the
    edge list) are their own components by definition — join them back with
    ``coalesce(component, id)`` at the call site if a full vertex table exists.
    """
    spark = edges.sparkSession
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    counters = Counters()
    start_step = 0
    e = None
    if checkpointer is not None and resume:
        manifest = checkpointer.latest_manifest()
        if manifest is not None and manifest.get("params", {}).get("algorithm") == "cc":
            start_step = manifest["superstep"]
            counters = Counters.from_dict(manifest["counters"])
            e = checkpointer.load_states(spark, manifest)["edges"]
    loop = LoopState(truncate_every=1)
    if e is None:
        e = _canon(edges)
    e = loop.set_initial(e)

    fp = _fingerprint(e)
    it = start_step
    converged = False
    while it < max_iter:
        it += 1
        m = fp[0]
        new_e, fp_row = loop.advance_agg(
            _small_star(_large_star(e)), _fingerprint_aggs()
        )
        new_fp = (int(fp_row["c"]), int(fp_row["h"]))
        counters.edges_scanned += 2 * m
        counters.messages_exchanged += 2 * m
        if checkpointer is not None:
            checkpointer.save(it, {"edges": new_e}, counters, params={"algorithm": "cc"})
        e = new_e
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    loop.close()

    assignments = (
        vertices.join(e.withColumnRenamed("src", "id"), "id", "left")
        .select("id", F.coalesce(F.col("dst"), F.col("id")).alias("component"))
    )
    info = {"iterations": it, "converged": converged, "counters": counters.to_dict()}
    return assignments, info
