"""Shared helpers for the data-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow-scan/wide-work stage across every core.

    Shingle/token explodes and per-row array-of-md5 transforms multiply
    each document row's work ~10^3×, but Spark sizes the stage by the
    *scan*: a corpus that arrives as one small file runs the whole
    expansion on one task (measured at sf0.1: minhash_signatures
    18.9 s → 2.6 s once spread). Repartition up to defaultParallelism
    ONLY when the scan has fewer partitions — at production scale the
    scan already has ≥ cores splits and the (corpus-sized) shuffle this
    would cost is skipped entirely. Safe for every consumer here: all
    downstream results are per-row expressions or groupBy aggregates, so
    row placement never changes values.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
