"""Vertex dictionary / dense ids / edge extraction parity with a pure-Python
ground truth over the same pages."""

import pyspark.sql.functions as F

from graph_partitioning_spark.functions.extraction import extract_links_py
from graph_partitioning_spark.graph.edges import (
    assign_dense_ids,
    build_graph,
    build_vertex_dictionary,
    degrees,
    extract_edges,
    undirect,
)
from graph_partitioning_spark.sources.pages import generate_pages


def test_dense_ids_are_rank_by_key(spark):
    df = spark.createDataFrame([(w,) for w in ["d", "a", "c", "b", "e"]], "k string")
    got = {r.k: r.id for r in assign_dense_ids(df, "k").collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}


def test_dense_ids_dense_and_deterministic(spark):
    df = spark.range(0, 1000).select(F.concat(F.lit("u"), F.col("id").cast("string")).alias("k"))
    out1 = assign_dense_ids(df, "k", num_partitions=3).collect()
    out2 = assign_dense_ids(df.repartition(13), "k", num_partitions=7).collect()
    m1 = {r.k: r.id for r in out1}
    m2 = {r.k: r.id for r in out2}
    assert m1 == m2
    assert sorted(m1.values()) == list(range(1000))


def test_edge_extraction_matches_python_ground_truth(spark):
    pages = generate_pages(spark, n_pages=300).cache()
    verts = build_vertex_dictionary(pages).cache()
    edges = extract_edges(pages, verts)

    rows = pages.select("url", "html").collect()
    url2id = {r.url: r.id for r in verts.collect()}
    expected = {}
    for r in rows:
        for target in extract_links_py(bytes(r.html)):
            s, d = url2id[r.url], url2id[target]
            if s != d:
                expected[(s, d)] = expected.get((s, d), 0) + 1
    got = {(r.src, r.dst): r.weight for r in edges.collect()}
    assert got == {k: float(v) for k, v in expected.items()}


def test_build_graph_single_parse_parity(spark):
    """The single-parse ingest (build_graph: one persisted weighted-link frame
    feeding both the dictionary and the edge table) must produce exactly the
    frames the two-parse legacy path produces."""
    pages = generate_pages(spark, n_pages=300).cache()
    weighted, verts, edges = build_graph(pages)
    try:
        legacy_verts = build_vertex_dictionary(pages)
        legacy_edges = extract_edges(pages, legacy_verts)
        assert {(r.id, r.url) for r in verts.collect()} == {
            (r.id, r.url) for r in legacy_verts.collect()
        }
        assert {(r.src, r.dst, r.weight) for r in edges.collect()} == {
            (r.src, r.dst, r.weight) for r in legacy_edges.collect()
        }
        # weighted is the aggregated parse: one row per distinct url pair,
        # weight = href multiplicity on the page (self-loops still present —
        # they drop at the edge stage, after the id join)
        rows = pages.select("url", "html").collect()
        expected = {}
        for r in rows:
            for target in extract_links_py(bytes(r.html)):
                expected[(r.url, target)] = expected.get((r.url, target), 0) + 1
        got = {(r.src_url, r.dst_url): r.weight for r in weighted.collect()}
        assert got == {k: float(v) for k, v in expected.items()}
    finally:
        weighted.unpersist()


def test_undirect_and_degrees(spark):
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 2.0), (2, 3, 1.0), (3, 3, 9.0)], "src long, dst long, weight double"
    )
    und = {(r.src, r.dst): r.weight for r in undirect(e).collect()}
    assert und == {(1, 2): 3.0, (2, 3): 1.0}
    deg = {r.id: r.degree for r in degrees(undirect(e)).collect()}
    assert deg == {1: 1, 2: 2, 3: 1}
