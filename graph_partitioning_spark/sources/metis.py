"""METIS adjacency-format reader → (vertices, edges) DataFrames.

Matches the reference loader's semantics (/root/reference/graph_partitioning/
utils.py:20-104): header ``n m [fmt]`` with fmt 0/1/10/11 toggling
node/edge weights, comment lines starting with ``%``, 1-based neighbor ids
shifted to dense 0-based, blank line = node with no edges and default
weight 1.0, and the loader's node/edge count sanity asserts.

Divergence (documented): the reference leaves fmt=10 (node weights only)
unimplemented (``pass`` at utils.py:89-90); here it is parsed properly
(first token = node weight, rest = neighbors). Like nx.Graph's
``add_edges_from``, a later duplicate of an undirected edge overwrites the
earlier weight.

This reader is a *test/parity tool* for the reference's fixture corpus
(~10^3-node files); it parses on the driver and ships the result as
DataFrames. The production-scale source is the pages/Iceberg path
(sources/pages.py + graph/edges.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parse_metis(path: str) -> tuple[list[tuple[int, float]], list[tuple[int, int, float]]]:
    """Pure parser → (nodes [(id, weight)], undirected edges [(u<v, weight)])."""
    has_edge_w = False
    has_node_w = False
    header: tuple[int, int] | None = None
    nodes: list[tuple[int, float]] = []
    edges: dict[tuple[int, int], float] = {}
    n = 0
    with open(path) as f:
        for raw in f:
            if raw.startswith("%"):
                continue
            if header is None:
                parts = raw.split()
                header = (int(parts[0]), int(parts[1]))
                if len(parts) > 2:
                    fmt = int(parts[2])
                    if fmt not in (0, 1, 10, 11):
                        raise ValueError(f"unsupported METIS fmt {fmt}")
                    has_edge_w = fmt in (1, 11)
                    has_node_w = fmt in (10, 11)
                continue
            tok = raw.split()
            node_w = 1.0
            rest = tok
            if has_node_w:
                if tok:
                    node_w = float(tok[0])
                    rest = tok[1:]
            if has_edge_w:
                it = iter(rest)
                pairs = list(zip(it, it))
                for nbr, w in pairs:
                    u, v = n, int(nbr) - 1
                    edges[(min(u, v), max(u, v))] = float(w)
            else:
                for nbr in rest:
                    u, v = n, int(nbr) - 1
                    edges[(min(u, v), max(u, v))] = 1.0
            nodes.append((n, node_w))
            n += 1

    n_expect, m_expect = header
    if n != n_expect:
        raise ValueError(f"expected {n_expect} nodes, parsed {n}")
    if len(edges) != m_expect:
        raise ValueError(f"expected {m_expect} edges, parsed {len(edges)}")
    return nodes, [(u, v, w) for (u, v), w in edges.items()]


def read_metis(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """→ (vertices(id, weight), edges(src, dst, weight)) with src < dst."""
    nodes, edges = parse_metis(path)
    vertices = spark.createDataFrame(nodes, "id long, weight double")
    if edges:
        edges_df = spark.createDataFrame(edges, "src long, dst long, weight double")
    else:
        edges_df = spark.createDataFrame([], "src long, dst long, weight double")
    return vertices, edges_df
