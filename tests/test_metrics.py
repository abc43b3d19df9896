"""Partition-quality metrics vs brute-force reference oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.graph.edges import undirect
from graph_partitioning_spark.partitioning import metrics as M

from .conftest import random_edges
from .oracles import (
    cut_oracle,
    loneliness_oracle,
    modularity_oracle,
    rbse_oracle,
    waste_oracle,
)

K = 4


@pytest.fixture(scope="module")
def fixture(spark):
    src, dst, w = random_edges(120, 500, seed=11, weighted=True)
    edges = undirect(
        spark.createDataFrame(
            list(zip(src.tolist(), dst.tolist(), w.tolist())),
            "src long, dst long, weight double",
        )
    ).persist()
    ids = np.unique(np.concatenate([src, dst]))
    rng = np.random.default_rng(3)
    assign = {int(v): int(rng.integers(0, K)) for v in ids}
    weights = {int(v): float(rng.integers(1, 4)) for v in ids}
    a_df = spark.createDataFrame(list(assign.items()), "id long, partition int").persist()
    v_df = spark.createDataFrame(list(weights.items()), "id long, weight double").persist()
    return edges, (src, dst, w), assign, weights, a_df, v_df, ids


def test_waste(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    got = M.waste(a_df, K, vertices=v_df, n_nodes=len(ids))
    want = waste_oracle(assign, weights, K, len(ids))
    assert got == pytest.approx(want, rel=1e-9)
    got_unw = M.waste(a_df, K, n_nodes=len(ids))
    want_unw = waste_oracle(assign, {}, K, len(ids))
    assert got_unw == pytest.approx(want_unw, rel=1e-9)


def test_cut_metrics(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    got = M.cut_metrics(edges, a_df)
    ec, cr, tcv = cut_oracle(src, dst, w, assign)
    assert got["edges_cut"] == ec
    assert got["cut_ratio"] == pytest.approx(cr, rel=1e-12)
    assert got["total_comm_volume"] == tcv


def test_rbse(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    got = M.rbse(edges, a_df)
    want = rbse_oracle(src, dst, w, assign, K)
    assert got == pytest.approx(want, rel=1e-12)


def test_loneliness(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    got = M.loneliness_wavg(edges, a_df, K, loneliness_score_param=1.2)
    want = loneliness_oracle(src, dst, w, assign, K, 1.2)
    assert got == pytest.approx(want, rel=1e-9)


def test_modularity(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    got = M.modularity(edges, a_df)
    want = modularity_oracle(src, dst, w, assign)
    assert got == pytest.approx(want, rel=1e-9)


def test_nmi_bounds_and_identity(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    labels = a_df.select("id", F.col("partition").alias("label"))
    assert M.nmi(labels, labels) == pytest.approx(1.0, abs=1e-9)
    # independent random labeling → low NMI
    rng = np.random.default_rng(99)
    other = spark.createDataFrame(
        [(int(v), int(rng.integers(0, K))) for v in ids], "id long, label int"
    )
    assert 0.0 <= M.nmi(labels, other) < 0.2


def test_fscore_relabel_recovers_permutation(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    labels = a_df.select("id", F.col("partition").alias("label"))
    # permute labels: relabelled F1 must return to ~1.0
    perm = {0: 2, 1: 3, 2: 0, 3: 1}
    permuted = a_df.select(
        "id",
        F.element_at(
            F.array(*[F.lit(perm[i]) for i in range(K)]), F.col("partition") + 1
        ).alias("label"),
    )
    r = M.fscore(permuted, labels)
    assert r["fscore"] < 0.1
    assert r["fscore_relabelled"] == pytest.approx(1.0, abs=1e-9)
    assert r["improvement"] > 0.8


def _community_quality_oracle(edge_rows, labels):
    """Brute-force Q / Qds / conductance (Chen-Kuzmin-Szymanski closed
    forms) over collected (src, dst, weight) rows and a label dict."""
    from collections import defaultdict

    w_in = defaultdict(float)
    w_pair = defaultdict(float)
    n_c = defaultdict(int)
    for v, c in labels.items():
        n_c[c] += 1
    m = 0.0
    for s, d, w in edge_rows:
        la, lb = labels[s], labels[d]
        m += w
        if la == lb:
            w_in[la] += w
        else:
            w_pair[(min(la, lb), max(la, lb))] += w
    w_out = defaultdict(float)
    for (c1, c2), w in w_pair.items():
        w_out[c1] += w
        w_out[c2] += w
    comms = sorted(n_c)
    q = qds = cond = 0.0
    for c in comms:
        wi, wo, n = w_in[c], w_out[c], n_c[c]
        vol = (2 * wi + wo) / (2 * m)
        d_c = 2 * wi / (n * (n - 1)) if n > 1 else 0.0
        q += wi / m - vol * vol
        qds += (wi / m) * d_c - (vol * d_c) ** 2
        cond += wo / (2 * wi + wo) if (2 * wi + wo) > 0 else 0.0
    sp = sum(
        w * w / (m * n_c[c1] * n_c[c2]) for (c1, c2), w in w_pair.items()
    )
    return q, qds - sp, cond / len(comms)


def test_community_quality_oracle(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    labels = a_df.select("id", F.col("partition").alias("label"))
    got = M.community_quality(edges, labels)
    edge_rows = [(r["src"], r["dst"], r["weight"]) for r in edges.collect()]
    q, qds, cond = _community_quality_oracle(edge_rows, assign)
    assert got["q"] == pytest.approx(q, rel=1e-9)
    assert got["qds"] == pytest.approx(qds, rel=1e-9)
    assert got["conductance"] == pytest.approx(cond, rel=1e-9)
    assert got["n_communities"] == K


def test_partition_community_quality(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    got = M.partition_community_quality(edges, a_df, lpa_iterations=3)
    assert set(got) == {"q_wavg", "qds_wavg", "conductance_wavg"}
    assert 0.0 <= got["conductance_wavg"] <= 1.0
    assert got["qds_wavg"] <= 1.0
    # deterministic
    again = M.partition_community_quality(edges, a_df, lpa_iterations=3)
    assert got == again


def test_quality_suite_has_full_metric_row(spark, fixture):
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    row = M.quality_suite(edges, a_df, K)
    for key in (
        "waste", "cut_ratio", "edges_cut", "total_comm_volume", "rbse",
        "loneliness", "modularity", "qds", "conductance",
        "q_wavg", "qds_wavg", "conductance_wavg", "maxperm_wavg",
    ):
        assert key in row, key


def test_partition_community_quality_csr_kernel_parity(spark, fixture):
    """The CSR-kernel execution path must produce the identical metric row
    as the distributed-LPA path (the kernel is exact-parity per
    test_csr.py; this pins the end-to-end wiring)."""
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    dist = M.partition_community_quality(edges, a_df, lpa_iterations=3)
    csr = M.partition_community_quality(
        edges, a_df, lpa_iterations=3, use_csr_kernel=True
    )
    for key in dist:
        assert csr[key] == pytest.approx(dist[key], rel=1e-12), key


def _permanence_brute(src, dst, labels):
    """NumPy re-statement of KDD'14 permanence for the test graph."""
    import collections

    nbrs = collections.defaultdict(set)
    for s, d in zip(src, dst):
        nbrs[int(s)].add(int(d))
        nbrs[int(d)].add(int(s))
    out = {}
    for v, ns in nbrs.items():
        deg = len(ns)
        internal = [u for u in ns if labels[u] == labels[v]]
        ext = collections.Counter(labels[u] for u in ns if labels[u] != labels[v])
        emax = max(ext.values()) if ext else 1
        d_in = len(internal)
        t_in = sum(
            1
            for i, u in enumerate(internal)
            for w_ in internal[i + 1 :]
            if w_ in nbrs[u]
        )
        c_in = 2.0 * t_in / (d_in * (d_in - 1.0)) if d_in >= 2 else 0.0
        out[v] = internal.__len__() / (emax * float(deg)) - (1.0 - c_in)
    return out


def test_permanence_brute_force_oracle(spark, fixture):
    """permanence() vs a per-vertex NumPy brute force (neighbor sets,
    E_max, internal-neighbor clustering) on the random fixture graph with
    random communities — covers external-heavy, internal-only (E_max→1),
    and d_in<2 (c_in→0) vertices."""
    edges, (src, dst, w), assign, weights, a_df, v_df, ids = fixture
    labels = {int(v): int(v) % 3 for v in ids}
    l_df = spark.createDataFrame(list(labels.items()), "id long, label long")
    got = {r["id"]: r["permanence"] for r in M.permanence(edges, l_df).collect()}
    want = _permanence_brute(src, dst, labels)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(round(want[v], 6), abs=2e-6), v


def test_permanence_clique_is_one(spark):
    """A disjoint clique whose community covers it exactly scores
    permanence 1.0 for every vertex (I=deg, E_max=1, c_in=1)."""
    n = 6
    rows = [(i, j, 1.0) for i in range(n) for j in range(i + 1, n)]
    rows += [(10 + i, 10 + j, 1.0) for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    lab = [(i, 0) for i in range(n)] + [(10 + i, 1) for i in range(4)]
    l_df = spark.createDataFrame(lab, "id long, label long")
    got = M.permanence(edges, l_df).collect()
    assert len(got) == n + 4
    for r in got:
        assert r["permanence"] == pytest.approx(1.0)


def test_wavg_permanence_two_cliques(spark):
    """Two cliques split cleanly into two partitions: within-partition LPA
    finds each clique as one community, so the weighted-average network
    permanence is 1.0; a cross-clique bridge edge is cut away by the
    intra-partition filter and must not change the score."""
    rows = [(i, j, 1.0) for i in range(5) for j in range(i + 1, 5)]
    rows += [(10 + i, 10 + j, 1.0) for i in range(5) for j in range(i + 1, 5)]
    rows += [(0, 10, 1.0)]  # bridge between partitions -> dropped
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    assign = [(i, 0) for i in range(5)] + [(10 + i, 1) for i in range(5)]
    a_df = spark.createDataFrame(assign, "id long, partition int")
    got = M.wavg_permanence(edges, a_df, 2, lpa_iterations=4)
    assert got == pytest.approx(1.0, abs=1e-9)


def test_nmi_fscore_contingency_cap_fires(spark):
    """Community-scale labelings (here: every node its own label) exceed
    max_cells and must raise instead of collecting O(communities²) rows."""
    from graph_partitioning_spark.partitioning.metrics import fscore, nmi

    la = spark.createDataFrame([(i, i) for i in range(50)], "id long, label long")
    lb = spark.createDataFrame(
        [(i, i * 7 % 50) for i in range(50)], "id long, label long"
    )
    with pytest.raises(ValueError, match="max_cells"):
        nmi(la, lb, max_cells=10)
    with pytest.raises(ValueError, match="max_cells"):
        fscore(la, lb, max_cells=10)
    # and the same inputs pass with an adequate cap
    assert 0.0 <= nmi(la, lb, max_cells=10**6) <= 1.0
