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
from pyspark.sql import functions as F


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


def write_oslom_edges(edges: DataFrame, path: str) -> None:
    """S10: tab-delimited ``src\\tdst\\tweight`` edge list for the OSLOM
    binary (reference ``utils.py:825-829``).

    The external tool reads exactly one plain-text file, so the rows are
    coalesced to a single ordered part — an explicit driver-side funnel
    that is part of the handoff contract, not of any distributed plan (at
    scale you hand a *partitioned* text directory to a distributed
    community detector instead; this writer exists for binary parity).
    Rows are ordered (src, dst) so the file is byte-deterministic; weights
    are formatted as Python ``str(float)`` like the reference's
    ``"{}".format(weight)``.
    """
    lines = edges.orderBy("src", "dst").select(
        F.concat_ws(
            "\t",
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.col("weight").cast("double").cast("string"),
        ).alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(path)


def read_coordinates(spark: SparkSession, path: str) -> DataFrame:
    """S6: ``x,y`` CSV where LINE NUMBER is the node id (reference
    ``utils.py:1450-1472`` — the coordinates feed keyed by position).

    Line order is the only key the format has, so the read preserves it
    explicitly: single-file text read → ``zipWithIndex`` (one of the two
    sanctioned RDD uses in this engine — the other is CSR block export —
    because row-position semantics genuinely cannot be expressed
    declaratively). Returns ``(id long, x double, y double)``; malformed
    lines are skipped like the reference's ``len(xy) == 2`` guard.
    """
    rdd = (
        spark.sparkContext.textFile(path, minPartitions=1)
        .map(lambda s: s.strip())
        .zipWithIndex()
    )

    def parse(pair):
        line, i = pair
        xy = line.split(",")
        if len(xy) != 2:
            return []
        try:
            return [(int(i), float(xy[0]), float(xy[1]))]
        except ValueError:
            return []

    return spark.createDataFrame(
        rdd.flatMap(parse), "id long, x double, y double"
    )
