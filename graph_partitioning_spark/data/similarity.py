"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k of query vectors against the
  corpus — broadcast the (small) query set, one pass over the corpus, a
  per-query top-k window. The dot product is a JVM higher-order
  ``zip_with``+``aggregate`` fold in float64 index order, so results are
  bitwise-reproducible at any parallelism (and match the DuckDB oracle's
  in-order fold exactly).
- ``bucketed_topk``: the scale path — an IVF-style coarse quantization.
  Corpus rows carry a bucket id (here the ``label`` column; in a real
  pipeline, a k-means coarse centroid id); each query probes only its own
  bucket's rows (assigned by the query's own bucket), turning the n×m
  cross join into a co-partitioned equi-join. Exact within the probed
  bucket; recall depends on quantizer quality, which is the standard IVF
  trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    """Cosine similarity of two array<double> columns, folded in index order."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k, self excluded.

    ``queries``: (vec_id, embedding) — must be small enough to broadcast.
    Ties broken by neighbor id ascending for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style top-k: each query probes only corpus rows in its bucket.

    Same output schema as ``brute_force_topk``; at 10^12 rows this is the
    shape that survives — the join key (bucket) co-partitions both sides
    and per-bucket work is |bucket| × queries-in-bucket.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col(bucket_col).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col(bucket_col).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
