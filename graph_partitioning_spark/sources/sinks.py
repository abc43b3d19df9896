"""Writers/readers for engine artifacts (reference S7-S11).

The reference writes assignment text files, per-partition node files, GML
dumps, and an append-mode metrics CSV
(/root/reference/graph_partitioning/utils.py:791-845). Here every artifact
is parquet with explicit layout choices:

- assignments partitioned by ``partition`` (S8's per-partition files are
  directory partitions — a filter on one partition prunes to one directory);
- the metrics table is an append-mode parquet "log" (S9's header-once CSV);
- a run manifest JSON replaces the re-parsed experiment text logs (S11).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def write_assignments(assignments: DataFrame, path: str, mode: str = "overwrite") -> None:
    """(id, partition) → parquet partitioned by partition (S8)."""
    assignments.write.mode(mode).partitionBy("partition").parquet(path)


def read_assignments(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("id", "partition")


def write_edges(edges: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Edge list sink (S7/S10's graph dumps)."""
    edges.write.mode(mode).parquet(path)


def append_metrics(metrics: DataFrame, path: str) -> None:
    """Append-mode metrics log (S9: header-once CSV append)."""
    metrics.write.mode("append").parquet(path)


def read_metrics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_run_manifest(path: str, manifest: dict) -> None:
    """Run-level manifest (S11's experiment log, structured)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def read_run_manifest(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
