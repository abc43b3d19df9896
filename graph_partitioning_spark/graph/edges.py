"""Edge-table construction: vertex dictionary, dense ids, degrees.

Maps the reference's loader semantics (METIS 1-based ids → dense 0-based,
/root/reference/graph_partitioning/utils.py:61-63) onto a scalable Spark
plan. Dense id assignment avoids a single global window: range-partition by
the key, count per partition (tiny driver-side prefix sum), then
``row_number`` *within* each partition plus the partition's offset — two
scans, no global sort bottleneck, deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extraction import extract_links_udf


def assign_dense_ids(
    df: DataFrame,
    key: str | list[str],
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense 0..n-1 ids ordered by ``key`` (deterministic, scalable).

    Equivalent to ``row_number() over (order by key) - 1`` but without
    funneling all rows through one task: repartitionByRange(key) →
    per-partition row_number + driver-side offsets (k counts only).
    ``key`` may be a list of columns (compound sort key for tie-breaking).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        num_partitions, *[F.col(c) for c in keys]
    ).withColumn("_part", F.spark_partition_id())
    ranged = ranged.persist()
    counts = {r["_part"]: r["cnt"] for r in ranged.groupBy("_part").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame([(p, o) for p, o in offsets.items()], "_part int, _offset long")
    )
    w = Window.partitionBy("_part").orderBy(*keys)
    out = (
        ranged.join(offsets_df, "_part")
        .withColumn(id_col, F.row_number().over(w).cast("long") + F.col("_offset") - 1)
        .drop("_part", "_offset")
    )
    return out


def extract_links(pages: DataFrame) -> DataFrame:
    """``links(src_url, dst_url)`` — the ONE Arrow parse over the corpus.

    At the 100 TB north star the HTML parse is the single most expensive
    scan in the system, so it must run exactly once. Don't persist this raw
    frame — aggregate it first (``weight_links``) and persist that; the
    parse then fuses with the map-side combine and only the small pair
    table is materialized (``build_graph`` wires that up). Duplicate links
    kept — the multiplicity becomes the edge weight downstream.
    """
    return pages.select(
        F.col("url").alias("src_url"),
        F.explode(extract_links_udf("html")).alias("dst_url"),
    )


def weight_links(links: DataFrame) -> DataFrame:
    """``weighted(src_url, dst_url, weight)`` — per-page link multiplicity.

    This is the frame worth persisting in the single-parse ingest: the
    groupBy's map-side partial aggregation runs fused with the Arrow parse
    in one codegen stage (no raw-link materialization), and what hits the
    shuffle/cache is the *deduplicated* pair table — typically 2-5x smaller
    than the raw href stream on boilerplate-heavy crawl data. Caching the
    raw exploded links instead (the first r4 attempt) was measurably slower
    than re-parsing: serializing ~100M small string rows to storage cost
    more than the parse it saved.
    """
    return links.groupBy("src_url", "dst_url").agg(
        F.count("*").cast("double").alias("weight")
    )


def build_vertex_dictionary(
    pages: DataFrame, links: DataFrame | None = None
) -> DataFrame:
    """urls (page urls ∪ link targets) → dense vertex ids.

    Returns ``vertices(id long, url string)``. Link-target urls that have no
    crawled page still get vertices (dangling nodes), matching the usual
    web-graph convention. Pass the persisted ``weight_links(...)`` (or raw
    ``extract_links(...)``) frame as ``links`` to avoid re-parsing the HTML
    here — only the ``dst_url`` column is read, so either shape works.
    """
    if links is None:
        links = extract_links(pages)
    page_urls = pages.select("url")
    target_urls = links.select(F.col("dst_url").alias("url")).distinct()
    all_urls = page_urls.union(target_urls).distinct()
    return assign_dense_ids(all_urls, "url").select("id", "url")


def extract_edges(
    pages: DataFrame,
    vertices: DataFrame,
    links: DataFrame | None = None,
    weighted: DataFrame | None = None,
) -> DataFrame:
    """Hyperlink edge table ``(src long, dst long, weight double)``.

    weight = number of times the (src_url → dst_url) link occurs on the page.
    Self-loops are dropped. Two equi-joins against the vertex dictionary; at
    scale the dictionary is the smaller side but not broadcastable, so both
    joins shuffle on url — Catalyst/AQE handles skew (many pages → few hub
    target urls) via skew-join splitting. Pass the persisted
    ``weight_links(...)`` frame as ``weighted`` to avoid re-parsing the HTML
    (preferred), or a raw ``extract_links(...)`` frame as ``links``.
    """
    if weighted is None:
        if links is None:
            links = extract_links(pages)
        weighted = weight_links(links)
    src_v = vertices.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_v = vertices.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    return (
        weighted.join(src_v, "src_url")
        .join(dst_v, "dst_url")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
    )


def build_graph(
    pages: DataFrame, storage_level=None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Single-parse ingest: ``(weighted, vertices, edges)`` with the Arrow
    HTML parse executed exactly once.

    The shared frame is the *aggregated* ``weight_links`` table, not the raw
    exploded links: the parse fuses with the groupBy's map-side combine in
    one codegen stage, so the only thing materialized to cache is the small
    deduplicated pair table. ``weighted`` is persisted (MEMORY_AND_DISK
    unless ``storage_level`` says otherwise) because both downstream frames
    consume it; the caller owns the unpersist once ``vertices``/``edges``
    are materialized. This is the ingest entry point the north-star pipeline
    should use — calling ``build_vertex_dictionary`` + ``extract_edges``
    without a shared frame pays the corpus parse twice.
    """
    from pyspark.storagelevel import StorageLevel

    if storage_level is None:
        storage_level = StorageLevel.MEMORY_AND_DISK
    weighted = weight_links(extract_links(pages)).persist(storage_level)
    vertices = build_vertex_dictionary(pages, links=weighted)
    edges = extract_edges(pages, vertices, weighted=weighted)
    return weighted, vertices, edges


def undirect(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Canonical undirected edge list: one row per {u,v} with src < dst,
    weights summed across both directions of duplicate links.

    Matches the reference's nx.Graph undirected semantics
    (/root/reference/graph_partitioning/utils.py:33: G = nx.Graph()) where
    re-adding an existing edge overwrites; here parallel edges combine by
    sum — the deterministic aggregate we standardize on.
    """
    canon = edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
    ).filter(F.col("src") != F.col("dst"))
    if dedup:
        canon = canon.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    return canon


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of an undirected canonical edge list (for per-node
    neighbor scans: votes join, degrees, LPA)."""
    return edges.select("src", "dst", "weight").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def degrees(undirected_edges: DataFrame) -> DataFrame:
    """(id, degree) over a canonical undirected edge list."""
    return (
        symmetrize(undirected_edges)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree) over a directed edge list."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
