"""PageRank vs NumPy power-iteration oracle (allclose 1e-6 per north star),
plus checkpoint/resume equivalence."""

import numpy as np

from graph_partitioning_spark.checkpoint import CheckpointManager
from graph_partitioning_spark.graph.pagerank import pagerank

from .oracles import pagerank_oracle


def _assert_close(result_df, expected, atol=1e-6):
    got = {r.id: r.pagerank for r in result_df.collect()}
    assert set(got) == set(expected)
    g = np.array([got[k] for k in sorted(got)])
    e = np.array([expected[k] for k in sorted(expected)])
    np.testing.assert_allclose(g, e, atol=atol)


def test_pagerank_matches_oracle(spark, small_graph):
    df, (src, dst, _) = small_graph
    result, info = pagerank(df, tol=1e-9, max_iter=200)
    expected = pagerank_oracle(src, dst, tol=1e-9, max_iter=200)
    assert info["converged"]
    _assert_close(result, expected)
    # ranks of a stochastic process sum to ~1
    total = sum(r.pagerank for r in result.collect())
    assert abs(total - 1.0) < 1e-6


def test_pagerank_dangling_nodes(spark):
    # 3 -> dangling sink; star into 0
    edges = [(1, 0, 1.0), (2, 0, 1.0), (0, 3, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    result, info = pagerank(df, tol=1e-10, max_iter=300)
    _assert_close(result, pagerank_oracle(src, dst, tol=1e-10, max_iter=300))


def test_pagerank_checkpoint_resume(spark, small_graph, tmp_path):
    df, (src, dst, _) = small_graph
    base = str(tmp_path / "ckpt")

    # full run with checkpoints
    full, info_full = pagerank(
        df, tol=1e-8, checkpointer=CheckpointManager(base, "full"), checkpoint_every=2
    )
    full_map = {r.id: r.pagerank for r in full.collect()}

    # partial run (interrupt after 3 iters), then resume to convergence
    partial_mgr = CheckpointManager(base, "partial")
    pagerank(df, tol=1e-8, max_iter=3, checkpointer=partial_mgr, checkpoint_every=1)
    resumed, info_res = pagerank(df, tol=1e-8, checkpointer=partial_mgr, checkpoint_every=1)
    assert info_res["iterations"] > 3
    res_map = {r.id: r.pagerank for r in resumed.collect()}

    for k in full_map:
        assert abs(full_map[k] - res_map[k]) < 1e-7
    # manifest carries counters per north star
    mani = partial_mgr.latest_manifest()
    assert mani["counters"]["edges_scanned"] > 0
    assert mani["counters"]["skew_ratio"] >= 1.0
