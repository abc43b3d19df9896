"""Loop-state hygiene for iterative DataFrame algorithms.

Persisting per-iteration state is NOT enough: an ``InMemoryRelation`` still
carries its full child plan, so each superstep's logical plan embeds the
previous one and driver-side analysis/optimization grows without bound (the
classic iterative-Spark trap — observed here as 3x wall-clock growth per
superstep). ``localCheckpoint(eager=True)`` truncates the plan to the
materialized RDD, keeping every superstep's planning cost constant. Durable
parquet checkpoints (checkpoint.CheckpointManager) provide the
resume/lineage guarantees on top; local checkpoints are the in-loop
fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly truncate lineage; returns a DataFrame backed by cached RDDs."""
    return df.localCheckpoint(eager=True)


def release(df: DataFrame | None) -> None:
    """Free a previously materialized/persisted state (best-effort)."""
    if df is not None:
        try:
            df.unpersist()
        except Exception:
            pass
