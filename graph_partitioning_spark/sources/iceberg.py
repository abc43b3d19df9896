"""Iceberg-aware page-table access (north-star input format).

The production input is an Iceberg table of Common-Crawl-style pages
(BASELINE.json input_hint). Iceberg's value to this engine is exactly what
the operators already assume: snapshot-isolated scans (a superstep loop
reads one snapshot id, recorded in the checkpoint manifest so resume reads
the *same* data), hidden partitioning with partition pruning on
``days(warc_ts)``/``bucket(url)``, and min/max file skipping for the
predicate pushdown the plans rely on.

This container ships no Iceberg runtime jar, so the adapter degrades to
parquet transparently; on a real cluster, submit with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.cc.type=hive ...

and pass ``cc.db.pages`` as the table name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str, snapshot_id: int | None = None) -> DataFrame:
    """Read the pages table from an Iceberg table name or a parquet path.

    ``source`` containing ``/`` (or ending .parquet) is treated as a path;
    otherwise as a catalog table. ``snapshot_id`` pins an Iceberg snapshot
    (time-travel) — the id the checkpoint manifest records for resume.
    """
    if "/" in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(source)


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Snapshot id recorded into run manifests (None for plain parquet)."""
    if "/" in table:
        return None
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["snapshot_id"]) if row else None
    except Exception:
        return None


def write_pages(
    df: DataFrame, target: str, mode: str = "append", partition_by: tuple[str, ...] = ()
) -> None:
    """Write pages to an Iceberg table (``writeTo``) or parquet path."""
    if "/" in target:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
    else:
        w = df.writeTo(target)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
