"""CSR block construction and block-local kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.plans import build_csr_blocks, csr_degrees, local_votes

from .conftest import random_edges
from .oracles import _adj

K = 3


@pytest.fixture(scope="module")
def setup(spark):
    src, dst, w = random_edges(60, 220, seed=23, weighted=True)
    edges = undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    ).persist()
    ids = sorted({int(v) for v in np.concatenate([src, dst])})
    assign = {v: v % K for v in ids}
    a_df = spark.createDataFrame(list(assign.items()), "id long, partition int").persist()
    return edges, (src, dst, w), assign, a_df, ids


def test_blocks_cover_graph(spark, setup):
    edges, arrays, assign, a_df, ids = setup
    blocks = build_csr_blocks(edges, a_df).collect()
    assert {b["partition"] for b in blocks} == set(range(K))
    covered = [v for b in blocks for v in b["vertex_ids"]]
    assert sorted(covered) == ids  # every vertex in exactly one block
    for b in blocks:
        assert len(b["indptr"]) == b["n_vertices"] + 1
        assert b["indptr"][-1] == b["n_edges"] == len(b["indices"]) == len(b["edge_weights"])
        assert b["vertex_ids"] == sorted(b["vertex_ids"])


def test_csr_adjacency_roundtrip(spark, setup):
    edges, (src, dst, w), assign, a_df, ids = setup
    adj = _adj(src, dst, w)
    blocks = build_csr_blocks(edges, a_df).collect()
    for b in blocks:
        vids = b["vertex_ids"]
        for i, v in enumerate(vids):
            lo, hi = b["indptr"][i], b["indptr"][i + 1]
            nbrs = set()
            for j in range(lo, hi):
                ix = b["indices"][j]
                nbrs.add(vids[ix] if ix >= 0 else -ix - 1)
            assert nbrs == set(adj.get(v, {})), f"vertex {v}"
            for j in range(lo, hi):
                ix = b["indices"][j]
                u = vids[ix] if ix >= 0 else -ix - 1
                assert b["edge_weights"][j] == pytest.approx(adj[v][u])


def test_csr_degrees_kernel(spark, setup):
    edges, (src, dst, w), assign, a_df, ids = setup
    adj = _adj(src, dst, w)
    blocks = build_csr_blocks(edges, a_df)
    got = {r["id"]: r["degree"] for r in csr_degrees(blocks).collect()}
    for v in ids:
        assert got[v] == len(adj.get(v, {}))


def test_local_votes_match_intra_votes(spark, setup):
    edges, (src, dst, w), assign, a_df, ids = setup
    adj = _adj(src, dst, w)
    blocks = build_csr_blocks(edges, a_df)
    got = {
        (r["id"], r["partition"]): r["votes"]
        for r in local_votes(blocks, a_df, K).collect()
    }
    for v in ids:
        p = assign[v]
        want = sum(
            (wt if wt > 0 else 1.0)
            for u, wt in adj.get(v, {}).items()
            if assign[u] == p
        )
        if want > 0:
            assert got[(v, p)] == pytest.approx(want), f"vertex {v}"
        else:
            assert (v, p) not in got


def test_drop_cut_edges(spark, setup):
    edges, (src, dst, w), assign, a_df, ids = setup
    blocks = build_csr_blocks(edges, a_df, keep_cut_edges=False).collect()
    for b in blocks:
        assert all(ix >= 0 for ix in b["indices"])  # no cut-edge markers


def test_local_label_propagation_matches_distributed(spark, setup):
    """The block-local LPA kernel must reproduce the distributed LPA
    restricted to intra-partition edges bit-for-bit (same init, same
    per-iteration sync update, same (votes desc, label asc) tie-break)."""
    from graph_partitioning_spark.graph.labelprop import label_propagation
    from graph_partitioning_spark.plans.csr import local_label_propagation

    edges, (src, dst, w), assign, a_df, ids = setup
    blocks = build_csr_blocks(edges, a_df).persist()

    # distributed twin: LPA over the intra-partition edge set
    a_src = a_df.select(F.col("id").alias("src"), F.col("partition").alias("ps"))
    a_dst = a_df.select(F.col("id").alias("dst"), F.col("partition").alias("pd"))
    intra = (
        edges.join(a_src, "src").join(a_dst, "dst")
        .filter(F.col("ps") == F.col("pd"))
        .select("src", "dst", "weight")
    )
    want_df, _ = label_propagation(intra, max_iter=4)
    want = {r["id"]: r["label"] for r in want_df.collect()}

    got = {r["id"]: r["label"] for r in local_label_propagation(blocks, max_iter=4).collect()}
    assert set(got) == set(ids)          # kernel covers every block vertex
    for v in ids:
        # nodes outside the intra edge set keep their own id as label
        assert got[v] == want.get(v, v), v
    blocks.unpersist()
