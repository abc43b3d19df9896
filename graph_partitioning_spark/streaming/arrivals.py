"""Structured-Streaming front-end for the arrival pipeline.

The reference's "arrival stream" is a deterministic replay consumed in
micro-batches (graph_partitioning.py:462-519) — exactly Structured
Streaming's micro-batch model. This module wires a real ``readStream``
source (a directory of arrival parquet/csv drops, or any streaming source
with the same schema) into the same per-batch engine step the batch
pipeline uses: induced-subgraph FENNEL with the already-arrived set fixed,
then freeze the batch, checkpoint, and append a metrics row.

``foreachBatch`` is the right integration point: each micro-batch is a
plain DataFrame, so the incremental step shares 100% of its code with the
batch path (no semantics fork), and Spark's streaming checkpoint gives
exactly-once batch tracking on top of the engine's own state manifests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import CheckpointManager, Counters
from ..graph.iterutil import materialize, release
from ..partitioning.fennel import FennelConfig, fennel_partition
from ..partitioning.metrics import cut_metrics

ARRIVAL_STREAM_SCHEMA = "id long, seq long"


@dataclass
class StreamingArrivalState:
    """Mutable driver-side handle shared across micro-batches."""

    current: DataFrame            # (id, partition)
    fixed_ids: DataFrame          # (id)
    batches_done: int = 0
    metrics: list[tuple] = None   # (batch, m_sub, edges_cut, cut_ratio)

    def __post_init__(self):
        if self.metrics is None:
            self.metrics = []


def _process_batch(
    edges: DataFrame,
    state: StreamingArrivalState,
    batch_df: DataFrame,
    batch_id: int,
    num_partitions: int,
    num_iterations: int,
    checkpointer: CheckpointManager | None,
    compute_metrics: bool,
) -> None:
    spark = edges.sparkSession
    batch_ids = batch_df.select("id").distinct()
    arrived = state.fixed_ids.unionByName(batch_ids).distinct()
    sub = (
        edges.join(arrived.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(arrived.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .persist()
    )
    m_sub = sub.count()
    n_arr = arrived.count()
    alpha = (m_sub * num_partitions) / max(n_arr * n_arr, 1)
    assign, _ = fennel_partition(
        sub,
        FennelConfig(
            num_partitions=num_partitions,
            num_iterations=num_iterations,
            micro_batches=2,
            alpha=alpha,
        ),
        vertices=arrived.withColumn("weight", F.lit(1.0)),
        initial=state.current,
        fixed=state.fixed_ids,
    )
    merged = (
        state.current.withColumnRenamed("partition", "old_p")
        .join(assign.withColumnRenamed("partition", "new_p"), "id", "full")
        .select("id", F.coalesce(F.col("new_p"), F.col("old_p")).alias("partition"))
    )
    old_cur, old_fixed = state.current, state.fixed_ids
    state.current = materialize(merged)
    state.fixed_ids = materialize(arrived)
    if compute_metrics:
        cm = cut_metrics(sub.select("src", "dst"), state.current)
        state.metrics.append(
            (int(batch_id), float(m_sub), float(cm["edges_cut"]), float(cm["cut_ratio"]))
        )
    sub.unpersist()
    release(old_cur)
    release(old_fixed)
    state.batches_done += 1
    if checkpointer is not None:
        checkpointer.save(
            state.batches_done,
            {"assignments": state.current, "fixed": state.fixed_ids},
            Counters(edges_scanned=int(m_sub)),
            params={"algorithm": "streaming_arrival", "stream_batch_id": int(batch_id)},
        )


def run_streaming_arrivals(
    edges: DataFrame,
    stream_source: DataFrame,
    num_partitions: int,
    num_iterations: int = 1,
    checkpointer: CheckpointManager | None = None,
    compute_metrics: bool = True,
    query_name: str = "arrivals",
    trigger_once: bool = False,
    stream_checkpoint_dir: str | None = None,
) -> tuple[Any, StreamingArrivalState]:
    """Start the streaming arrival query.

    ``stream_source``: a *streaming* DataFrame with schema
    ``(id long, seq long)`` — e.g.
    ``spark.readStream.schema(ARRIVAL_STREAM_SCHEMA).parquet(dir)``.

    Returns (StreamingQuery, state). Call
    ``query.processAllAvailable()`` / ``awaitTermination`` as appropriate;
    ``state.current`` holds the live assignments.
    """
    spark = edges.sparkSession
    state = StreamingArrivalState(
        current=materialize(spark.createDataFrame([], "id long, partition int")),
        fixed_ids=materialize(spark.createDataFrame([], "id long")),
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _process_batch(
            edges, state, batch_df, batch_id,
            num_partitions, num_iterations, checkpointer, compute_metrics,
        )

    writer = (
        stream_source.writeStream.foreachBatch(on_batch)
        .queryName(query_name)
        .outputMode("update")
    )
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query, state
