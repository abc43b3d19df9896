"""GML graph reader (S2) — the reference's lesmis.gml path.

The reference loads GML via ``nx.read_gml(path, label='id')``
(/root/reference/graph-partitioning-ldg.ipynb cell 0) to feed the LDG
notebook. GML inputs in that workflow are small curated graphs (lesmis: 77
nodes), so the parse happens on the driver and the result lands in
DataFrames; large-scale inputs use the parquet/Iceberg scans, which remain
the engine's native formats.

Grammar subset handled (all the reference's files need): ``graph [ ... ]``
containing ``node [ id N label "..." <attr> ... ]`` and ``edge [ source N
target N value/weight X ... ]`` blocks, with arbitrary scalar attributes
and nested sub-blocks (skipped). Blank lines ignored. GML has no ``#``
line comments (and ``nx.read_gml``, the parity target, strips none), so
``#`` is an ordinary character — including inside quoted labels.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_TOKEN = re.compile(r'"[^"]*"|\[|\]|[^\s\[\]]+')


def _tokenize(text: str) -> list[str]:
    out = []
    for line in text.splitlines():
        out.extend(_TOKEN.findall(line))
    return out


def _parse_block(tokens: list[str], pos: int) -> tuple[dict[str, Any], int]:
    """Parse tokens after a '[' into a flat dict; nested blocks recurse (and
    are stored under their key only if scalar-free blocks are not needed —
    node/edge consumers read scalars)."""
    obj: dict[str, Any] = {}
    items: dict[str, list] = {}
    while pos < len(tokens):
        tok = tokens[pos]
        if tok == "]":
            return obj | {k: v for k, v in items.items()}, pos + 1
        key = tok
        pos += 1
        if pos >= len(tokens):
            break
        val = tokens[pos]
        if val == "[":
            sub, pos = _parse_block(tokens, pos + 1)
            items.setdefault(key, []).append(sub)
        else:
            pos += 1
            if val.startswith('"'):
                obj[key] = val.strip('"')
            else:
                try:
                    obj[key] = int(val)
                except ValueError:
                    try:
                        obj[key] = float(val)
                    except ValueError:
                        obj[key] = val
    return obj | {k: v for k, v in items.items()}, pos


def parse_gml(text: str) -> tuple[list[dict], list[dict]]:
    """Returns (nodes, edges) dict lists from GML text."""
    tokens = _tokenize(text)
    try:
        gpos = tokens.index("graph")
    except ValueError as exc:
        raise ValueError("not a GML document: no 'graph' block") from exc
    assert tokens[gpos + 1] == "[", "malformed GML: 'graph' not followed by ["
    graph, _ = _parse_block(tokens, gpos + 2)
    nodes = graph.get("node", [])
    edges = graph.get("edge", [])
    if not isinstance(nodes, list):
        nodes = [nodes]
    if not isinstance(edges, list):
        edges = [edges]
    return nodes, edges


def read_gml(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a GML file → (vertices(id, label, weight), edges(src, dst,
    weight)) DataFrames.

    Matches ``nx.read_gml(path, label='id')`` semantics: the GML ``id``
    field is the vertex id; edge weight comes from ``value`` or ``weight``
    (1.0 default, like the reference's weight fallback at
    graph_partitioning/utils.py:96-99).
    """
    with open(path, encoding="utf-8") as f:
        nodes, edges = parse_gml(f.read())
    v_rows = [
        (
            int(nd["id"]),
            str(nd.get("label", nd["id"])),
            float(nd.get("weight", nd.get("value", 1.0)) or 1.0),
        )
        for nd in nodes
    ]
    e_rows = [
        (
            int(ed["source"]),
            int(ed["target"]),
            float(ed.get("weight", ed.get("value", 1.0)) or 1.0),
        )
        for ed in edges
    ]
    vertices = spark.createDataFrame(v_rows, "id long, label string, weight double")
    edge_df = spark.createDataFrame(e_rows, "src long, dst long, weight double")
    return vertices, edge_df
