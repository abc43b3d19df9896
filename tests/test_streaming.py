"""Structured-Streaming arrival feed, sinks, and centrality measures."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.graph.centrality import (
    degree_centrality,
    leverage_centrality,
)
from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.sources.sinks import (
    append_metrics,
    read_assignments,
    read_metrics,
    read_run_manifest,
    write_assignments,
    write_run_manifest,
)
from graph_partitioning_spark.streaming import run_streaming_arrivals
from graph_partitioning_spark.streaming.arrivals import ARRIVAL_STREAM_SCHEMA

from .conftest import random_edges
from .oracles import _adj


def test_streaming_arrivals_end_to_end(spark, tmp_path):
    src, dst, w = random_edges(50, 160, seed=3)
    edges = undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    ).persist()
    ids = sorted({int(v) for v in np.concatenate([src, dst])})

    # drop arrival files into a watched directory in 3 chunks
    stream_dir = str(tmp_path / "arrivals")
    os.makedirs(stream_dir)
    chunks = [ids[: len(ids) // 3], ids[len(ids) // 3 : 2 * len(ids) // 3], ids[2 * len(ids) // 3 :]]

    source = spark.readStream.schema(ARRIVAL_STREAM_SCHEMA).parquet(stream_dir)
    query, state = run_streaming_arrivals(
        edges, source, num_partitions=3, num_iterations=1,
        stream_checkpoint_dir=str(tmp_path / "scp"),
    )
    try:
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(
                [(v, j) for j, v in enumerate(chunk)], ARRIVAL_STREAM_SCHEMA
            ).write.mode("append").parquet(stream_dir)
            query.processAllAvailable()
    finally:
        query.stop()

    assert state.batches_done >= 1
    got = {r["id"]: r["partition"] for r in state.current.collect()}
    assert set(got) == set(ids)
    assert all(0 <= p < 3 for p in got.values())
    assert len(state.metrics) == state.batches_done
    assert state.fixed_ids.count() == len(ids)


def test_sinks_roundtrip(spark, tmp_path):
    a = spark.createDataFrame([(i, i % 4) for i in range(40)], "id long, partition int")
    path = str(tmp_path / "assign")
    write_assignments(a, path)
    back = read_assignments(spark, path)
    assert {(r["id"], r["partition"]) for r in back.collect()} == {
        (i, i % 4) for i in range(40)
    }
    # partition pruning: reading one partition touches one directory
    assert back.filter(F.col("partition") == 2).count() == 10

    mpath = str(tmp_path / "metrics")
    m1 = spark.createDataFrame([(0, 0.5)], "batch int, cut_ratio double")
    m2 = spark.createDataFrame([(1, 0.4)], "batch int, cut_ratio double")
    append_metrics(m1, mpath)
    append_metrics(m2, mpath)
    assert read_metrics(spark, mpath).count() == 2

    man = str(tmp_path / "run" / "manifest.json")
    write_run_manifest(man, {"run": "r1", "batches": 2})
    assert read_run_manifest(man)["batches"] == 2


def test_centrality(spark):
    src, dst, w = random_edges(40, 140, seed=9)
    edges = undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    ).persist()
    adj = _adj(src, dst, w)
    deg = {v: len(nb) for v, nb in adj.items()}
    n = len(adj)

    dc = {r["id"]: (r["degree"], r["centrality"]) for r in degree_centrality(edges).collect()}
    for v, d in deg.items():
        assert dc[v][0] == d
        assert dc[v][1] == pytest.approx(d / (n - 1))

    lev = {r["id"]: r["leverage"] for r in leverage_centrality(edges).collect()}
    for v in list(deg)[:20]:
        want = np.mean(
            [(deg[v] - deg[u]) / (deg[v] + deg[u]) for u in adj[v]]
        )
        assert lev[v] == pytest.approx(want, rel=1e-9)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: state carries across micro-batches."""
    from graph_partitioning_spark.streaming.sessionize import sessionize_stream

    stream_dir = str(tmp_path / "events")
    os.makedirs(stream_dir)
    schema = "user_id long, ts timestamp"
    source = spark.readStream.schema(schema).parquet(stream_dir)
    out = sessionize_stream(source, gap_seconds=1800)
    query = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        import datetime as dt

        t0 = dt.datetime(2022, 1, 1, 10, 0, 0)
        # batch 1: user 1 two events 10min apart (1 session); user 2 one event
        spark.createDataFrame(
            [(1, t0), (1, t0 + dt.timedelta(minutes=10)), (2, t0)], schema
        ).write.mode("append").parquet(stream_dir)
        query.processAllAvailable()
        # batch 2: user 1 event 2h later -> NEW session (state remembered)
        spark.createDataFrame(
            [(1, t0 + dt.timedelta(hours=2))], schema
        ).write.mode("append").parquet(stream_dir)
        query.processAllAvailable()
        rows = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in spark.sql(
                "select user_id, max(n_sessions) n_sessions, max(n_events) n_events "
                "from sess group by user_id"
            ).collect()
        }
    finally:
        query.stop()
    assert rows[1] == (2, 3)   # second session opened across batches
    assert rows[2] == (1, 1)


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Streaming windowed rollup: state carries across micro-batches and an
    event older than the watermark is dropped by the engine."""
    import datetime as dt

    from graph_partitioning_spark.streaming import windowed_event_counts

    stream_dir = str(tmp_path / "wevents")
    os.makedirs(stream_dir)
    schema = "ts timestamp, event_type string, value double"
    source = spark.readStream.schema(schema).parquet(stream_dir)
    out = windowed_event_counts(source, window="1 hour", watermark="30 minutes")
    query = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "wcp"))
        .start()
    )
    try:
        t0 = dt.datetime(2022, 1, 1, 10, 0, 0)
        spark.createDataFrame(
            [(t0, "click", 1.0), (t0 + dt.timedelta(minutes=20), "click", 2.0)],
            schema,
        ).write.mode("append").parquet(stream_dir)
        query.processAllAvailable()
        # advance event time far past the watermark, then send a LATE event
        # into the (now-finalized) 10:00 window — it must be dropped
        spark.createDataFrame(
            [(t0 + dt.timedelta(hours=3), "click", 5.0)], schema
        ).write.mode("append").parquet(stream_dir)
        query.processAllAvailable()
        spark.createDataFrame(
            [(t0 + dt.timedelta(minutes=30), "click", 100.0)], schema
        ).write.mode("append").parquet(stream_dir)
        query.processAllAvailable()
        rows = spark.sql(
            "select window_start, max(n) n, max(sum_value) s from winagg "
            "group by window_start order by window_start"
        ).collect()
    finally:
        query.stop()
    by_start = {r["window_start"]: (r["n"], r["s"]) for r in rows}
    first = by_start[dt.datetime(2022, 1, 1, 10, 0, 0)]
    assert first == (2, 3.0)   # late 100.0 event dropped, not (3, 103.0)
    assert by_start[dt.datetime(2022, 1, 1, 13, 0, 0)] == (1, 5.0)


def test_windowed_event_counts_batch_mode(spark):
    """Same operator on a batch frame (watermark no-op) — unit parity."""
    import datetime as dt

    from graph_partitioning_spark.streaming import windowed_event_counts

    t0 = dt.datetime(2022, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [
            (t0, "a", 1.0),
            (t0 + dt.timedelta(minutes=59), "a", 2.0),
            (t0 + dt.timedelta(hours=1), "a", 4.0),
            (t0, "b", 8.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert got[(t0, "a")] == (2, 3.0)
    assert got[(t0 + dt.timedelta(hours=1), "a")] == (1, 4.0)
    assert got[(t0, "b")] == (1, 8.0)
