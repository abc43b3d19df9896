"""METIS reader parity on hand-written micro-fixtures (FIXTURES.md §6) and
on the reference's own data files."""

import os

import pytest

from graph_partitioning_spark.sources.metis import parse_metis, read_metis

REF = "/root/reference/data"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_fmt0_plain(tmp_path, spark):
    # triangle + pendant: 4 nodes, 4 edges (1-based ids)
    path = _write(tmp_path, "g0.txt", "4 4\n2 3\n1 3\n1 2 4\n3\n")
    verts, edges = read_metis(spark, path)
    assert {(r.id, r.weight) for r in verts.collect()} == {(0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0)}
    assert {(r.src, r.dst, r.weight) for r in edges.collect()} == {
        (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0),
    }


def test_fmt1_edge_weights(tmp_path):
    path = _write(tmp_path, "g1.txt", "3 3 1\n2 7 3 1\n1 7 3 2\n1 1 2 2\n")
    nodes, edges = parse_metis(path)
    assert nodes == [(0, 1.0), (1, 1.0), (2, 1.0)]
    assert sorted(edges) == [(0, 1, 7.0), (0, 2, 1.0), (1, 2, 2.0)]


def test_fmt11_node_and_edge_weights(tmp_path):
    path = _write(tmp_path, "g11.txt", "3 2 011\n5 2 4\n3 1 4 3 6\n2 2 6\n")
    nodes, edges = parse_metis(path)
    assert nodes == [(0, 5.0), (1, 3.0), (2, 2.0)]
    assert sorted(edges) == [(0, 1, 4.0), (1, 2, 6.0)]


def test_fmt10_node_weights_only(tmp_path):
    # reference leaves this unimplemented; we parse it properly
    path = _write(tmp_path, "g10.txt", "3 2 10\n5 2\n3 1 3\n2 2\n")
    nodes, edges = parse_metis(path)
    assert nodes == [(0, 5.0), (1, 3.0), (2, 2.0)]
    assert sorted(edges) == [(0, 1, 1.0), (1, 2, 1.0)]


def test_blank_line_and_comments(tmp_path):
    path = _write(tmp_path, "gb.txt", "% comment\n3 1\n2\n1\n\n")
    nodes, edges = parse_metis(path)
    assert nodes == [(0, 1.0), (1, 1.0), (2, 1.0)]
    assert edges == [(0, 1, 1.0)]


def test_count_mismatch_raises(tmp_path):
    path = _write(tmp_path, "gx.txt", "3 5\n2\n1\n\n")
    with pytest.raises(ValueError, match="expected 5 edges"):
        parse_metis(path)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference data not present")
def test_reference_fixture_counts():
    nodes, edges = parse_metis(f"{REF}/oneshot_fennel_simple.txt")
    assert len(nodes) == 1000
    assert len(edges) == 2939
    nodes_w, edges_w = parse_metis(f"{REF}/restreaming_fennel.txt")
    assert len(nodes_w) == 1000
    assert len(edges_w) == 2939
    # weighted variant has non-unit weights
    assert any(w != 1.0 for _, w in nodes_w) or any(w != 1.0 for _, _, w in edges_w)


LESMIS_LIKE = """
# a lesmis-shaped GML snippet
graph [
  comment "test graph"
  directed 0
  node [ id 0 label "Myriel" ]
  node [ id 1 label "Napoleon" ]
  node [ id 2 label "MlleBaptistine" value 2 ]
  node [
    id 3
    label "quoted [bracket] label"
    graphics [ x 1.5 y 2.5 ]
  ]
  edge [ source 1 target 0 value 1 ]
  edge [ source 2 target 0 value 8 ]
  edge [ source 3 target 0 ]
  edge [ source 3 target 2 weight 3.5 ]
]
"""


def test_read_gml(spark, tmp_path):
    """S2: GML reader parity with nx.read_gml(label='id') semantics —
    vertex ids from the id field, edge weight from value/weight (1.0
    default), nested blocks and quoted labels handled."""
    from graph_partitioning_spark.sources import read_gml

    path = tmp_path / "g.gml"
    path.write_text(LESMIS_LIKE)
    verts, edges = read_gml(spark, str(path))
    v = {r["id"]: (r["label"], r["weight"]) for r in verts.collect()}
    assert set(v) == {0, 1, 2, 3}
    assert v[0] == ("Myriel", 1.0)
    assert v[2][1] == 2.0           # node value → weight fallback
    assert "bracket" in v[3][0]
    e = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    assert e == {(1, 0): 1.0, (2, 0): 8.0, (3, 0): 1.0, (3, 2): 3.5}
    # feeds the standard pipeline: canonical undirect → partitioner input
    from graph_partitioning_spark.graph.edges import undirect

    und = undirect(edges)
    assert und.count() == 4


def test_read_gml_hash_inside_quoted_label(spark, tmp_path):
    """GML has no '#' line comments (and nx.read_gml strips none): a '#'
    inside a quoted label must survive tokenization intact."""
    from graph_partitioning_spark.sources import read_gml

    path = tmp_path / "hash.gml"
    path.write_text(
        'graph [\n'
        '  node [ id 0 label "C# intro" ]\n'
        '  node [ id 1 label "plain" ]\n'
        '  edge [ source 0 target 1 value 2.0 ]\n'
        ']\n'
    )
    verts, edges = read_gml(spark, str(path))
    v = {r["id"]: r["label"] for r in verts.collect()}
    assert v[0] == "C# intro"
    assert v[1] == "plain"
    e = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    assert e == {(0, 1): 2.0}


def test_write_oslom_edges(tmp_path, spark):
    """S10: single tab-delimited file, (src, dst) ordered, float weights
    (reference utils.py:825-829 format)."""
    import glob

    from graph_partitioning_spark.sources.sinks import write_oslom_edges

    df = spark.createDataFrame(
        [(2, 10, 1.0), (0, 1, 2.5), (0, 3, 1.0)], "src long, dst long, weight double"
    )
    out = str(tmp_path / "oslom")
    write_oslom_edges(df, out)
    parts = glob.glob(out + "/part-*")
    assert len(parts) == 1  # the external binary reads exactly one file
    lines = open(parts[0]).read().splitlines()
    assert lines == ["0\t1\t2.5", "0\t3\t1.0", "2\t10\t1.0"]


def test_read_coordinates_line_number_is_id(tmp_path, spark):
    """S6: x,y CSV keyed by line position (reference utils.py:1450-1472);
    malformed lines skipped like the len(xy)==2 guard."""
    from graph_partitioning_spark.sources.sinks import read_coordinates

    p = tmp_path / "COORDINATES.csv"
    p.write_text("1.5,2.25\nbad line\n-3.0,4.0\n7,8\n")
    rows = {r["id"]: (r["x"], r["y"]) for r in read_coordinates(spark, str(p)).collect()}
    assert rows == {0: (1.5, 2.25), 2: (-3.0, 4.0), 3: (7.0, 8.0)}
