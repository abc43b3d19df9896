"""Triangle counting via degree-ordered wedge closure (north-star T4).

Standard two-join plan (Suri & Vassilvitskii, "Counting Triangles and the
Curse of the Last Reducer", WWW'11): orient each undirected edge from the
lower-ranked to the higher-ranked endpoint under the total order
(degree(v), v); every triangle then has exactly one "pivot" vertex with two
out-edges, so

  wedges  = oriented ⋈ oriented on pivot (b ranked below c)
  triangles = wedges ⋈ oriented on (b, c)

Orienting by degree bounds every vertex's out-degree by O(sqrt(m)) on any
graph — the reason this survives power-law hubs: the hub's in-edges never
self-join; only low-degree pivots fan out. The reference's related op is
maximal-clique hyperedge construction (/root/reference/graph_partitioning/
partitioners/patoh/patoh_data.py:151-154); T4 is mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .edges import degrees, undirect


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical undirected edges → oriented (a, b) with rank(a) < rank(b),
    rank = (degree, id). Carries b's rank key for the wedge self-join."""
    und = undirect(edges)
    deg = degrees(und)
    e = (
        und.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "d_src"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "d_dst"), "dst")
    )
    lower_first = F.struct("d_src", "src") < F.struct("d_dst", "dst")
    return e.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(lower_first, F.col("d_dst")).otherwise(F.col("d_src")).alias("d_b"),
    )


def triangle_triples(edges: DataFrame) -> DataFrame:
    """DataFrame (a, b, c) — one row per triangle, vertices in rank order."""
    o = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = o.select(F.col("a").alias("p"), F.col("b").alias("x"), F.col("d_b").alias("dx"))
    e2 = o.select(F.col("a").alias("p"), F.col("b").alias("y"), F.col("d_b").alias("dy"))
    wedges = e1.join(e2, "p").filter(
        F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    )
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    return wedges.join(closing, ["x", "y"]).select(
        F.col("p").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count."""
    return triangle_triples(edges).count()


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) — per-vertex participation count; vertices in no
    triangle are omitted (left-join a vertex table at the call site for 0s)."""
    t = triangle_triples(edges)
    return (
        t.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
