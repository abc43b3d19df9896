"""Watermarked windowed aggregations for unbounded event feeds.

The batch engine answers the same question with a plain groupBy
(`__spark_entry__.q_events_hourly`); this is the streaming twin with
late-data discipline: an event-time watermark bounds state (windows older
than the watermark are finalized and their state dropped), tumbling or
sliding windows, and the standard count/sum rollup. The reference has no
streaming/watermark surface (SURVEY.md §2.8) — this is part of the
engine's training-data-pipeline extension, built entirely from Spark's
native operators so state management, late-event drop and incremental
output come from Structured Streaming itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(window, key, n, sum_value) windowed rollup with a watermark.

    Works on both streaming and batch DataFrames (the watermark is a no-op
    in batch mode, so the same code path is unit-testable batch-first and
    deployable as a stream).

    Late events arriving more than ``watermark`` behind the max observed
    event time are dropped by the engine; in update output mode each
    micro-batch emits the windows it touched.
    """
    w = (
        F.window(ts_col, window, slide)
        if slide is not None
        else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("window"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )
