"""Synchronous label propagation (north-star T3).

Each superstep, every vertex adopts the label with the maximum total incident
edge weight among its neighbors' current labels, ties broken by the smallest
label id (deterministic — matching the reference's first-max tie-break
discipline in /root/reference/graph_partitioning/fennel.pyx:89-107). Vertices
with no neighbors keep their label. Labels initialize to the vertex id.

The per-superstep plan is exactly the reference's vote join J1
(/root/reference/graph_partitioning/fennel.pyx:19-38) re-expressed:
  sym_edges ⋈ labels on nbr  →  groupBy(id, label).sum(weight)
  →  max_by((votes, -label)) per id.
The groupBy is a partial+final hash agg (hub-safe); the argmax is a
``max_by`` over a struct — no global window.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager, Counters
from .edges import symmetrize
from .iterutil import LoopState, materialize, materialize_static, release


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    weighted: bool = True,
    checkpointer: CheckpointManager | None = None,
    resume: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (labels(id, label), info). ``edges`` is canonical undirected."""
    spark = edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    w_col = F.col("weight") if weighted else F.lit(1.0)
    # materialize, not just persist: the per-superstep vote join embeds this
    # static frame's logical plan, so a deep caller lineage (pages → extract
    # → edges) would be re-analyzed by the driver every superstep. The
    # LogicalRDD keeps the dst hash partitioning for the join.
    sym = materialize_static(
        symmetrize(edges.select("src", "dst", "weight"))
        .select("src", "dst", w_col.alias("weight"))
        .repartition(num_partitions, "dst")
    )
    m = sym.count()

    counters = Counters()
    start_step = 0
    labels = None
    if checkpointer is not None and resume:
        manifest = checkpointer.latest_manifest()
        if manifest is not None and manifest.get("params", {}).get("algorithm") == "lpa":
            start_step = manifest["superstep"]
            counters = Counters.from_dict(manifest["counters"])
            labels = checkpointer.load_states(spark, manifest)["labels"]
    if labels is None:
        labels = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
            .select("id", F.col("id").alias("label"))
        )
    loop = LoopState(truncate_every=1)
    labels = loop.set_initial(labels)

    it = start_step
    converged = False
    while it < max_iter:
        it += 1
        votes = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), "label")
            .agg(F.sum("weight").alias("votes"))
        )
        # argmax by (votes desc, label asc): max_by over (votes, -label)
        picked = votes.groupBy("id").agg(
            F.max_by("label", F.struct(F.col("votes"), -F.col("label"))).alias("new_label")
        )
        joined = labels.join(picked, "id", "left").select(
            "id",
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            (F.coalesce(F.col("new_label"), F.col("label")) != F.col("label")).alias("_changed"),
        )
        joined, changed_row = loop.advance_agg(
            joined,
            [F.coalesce(F.sum(F.col("_changed").cast("long")), F.lit(0)).alias("changed")],
        )
        changed = int(changed_row["changed"])
        counters.edges_scanned += m
        counters.messages_exchanged += m

        labels = joined.drop("_changed")
        if checkpointer is not None:
            checkpointer.save(
                it, {"labels": labels}, counters,
                params={"algorithm": "lpa", "changed": changed},
            )
        if changed == 0:
            converged = True
            break

    loop.close()
    # every state is truncated (truncate_every=1), so the final labels frame
    # no longer references sym — free its checkpoint blocks
    release(sym)
    info = {"iterations": it, "converged": converged, "counters": counters.to_dict()}
    return labels.select("id", "label"), info
