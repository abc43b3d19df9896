"""Reference-corpus parity fixtures (SURVEY §5, PARITY.md methodology).

The sequential reference shadow (tools/reference_shadow.py) is the
executable stand-in for the reference driver (which needs networkx 1.x /
pyximport, absent here). These tests pin (a) the shadow's own semantics on
hand-checkable fixtures and (b) engine-vs-shadow agreement on the
reference's own lesmis.gml corpus within the shadow's run-to-run spread —
the reference's networkx dict iteration order is arbitrary, so the spread
across stream orders is its run-to-run σ.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from parity_run import CONFIGS, load_corpus, run_engine, run_shadow  # noqa: E402
from reference_shadow import build_adj, fennel_pass, shadow_run  # noqa: E402


def test_shadow_fennel_pass_hand_checked():
    """One sequential pass on a 4-node path, k=2, alpha=0.5 — worked by
    hand against fennel.pyx:19-112: node 0 (no assigned neighbors, sizes
    zero, tie) -> P0; node 1 votes P0:1 vs alpha*size -> P0; node 2 votes
    P0:1 - 0.5*2 = 0 vs P1: 0 - 0 = 0, strict first-max -> P0; node 3
    votes P0:1 - 0.5*3 = -0.5 < P1: 0 -> P1."""
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    adj = build_adj(4, edges)
    assign, fixed = [-1] * 4, [-1] * 4
    fennel_pass(range(4), set(range(4)), adj, [1.0] * 4, assign, fixed, 0.5, 2)
    assert assign == [0, 0, 0, 1]


def test_shadow_singleton_min_fill():
    """Degree-0 nodes are deferred and then greedily min-filled with sizes
    re-read after each placement (fennel.pyx:133-148)."""
    edges = [(0, 1, 1.0)]
    adj = build_adj(4, edges)
    assign, fixed = [-1] * 4, [-1] * 4
    fennel_pass(range(4), set(range(4)), adj, [1.0] * 4, assign, fixed, 0.1, 3)
    # 0,1 -> P0 (votes), singles 2,3 -> the two smallest partitions P1, P2
    assert assign[:2] == [0, 0] and sorted(assign[2:]) == [1, 2]


def test_shadow_row_count_and_monotone_fixing():
    """Driver shape on a deterministic corpus: one prediction row, one
    cutoff row, ceil(remaining/batch) batch rows plus the reference's
    always-processed remainder; every arriving node assigned, every
    non-arriving node -1 (batch_arrival tail, graph_partitioning.py:507-509)."""
    n = 40
    edges = [(i, (i + 1) % n, 1.0) for i in range(n)]
    arr = [1 if i % 4 else 0 for i in range(n)]  # 30 arrivals
    assign, rows = shadow_run(n, [1.0] * n, edges, arr, k=3,
                              num_iterations=2, cut_off_frac=0.1, batch_size=10)
    # cut = 3 fixed, 27 remaining -> 2 full batches + remainder of 7
    assert [r[0] for r in rows] == ["prediction", "cutoff", "batch0", "batch1", "batch2"]
    assert all(assign[i] >= 0 for i in range(n) if arr[i])
    assert all(assign[i] == -1 for i in range(n) if not arr[i])


def test_engine_within_reference_spread_on_lesmis(spark):
    """Engine vs reference shadow on the reference's own lesmis.gml under
    the graph-partitioning-parallel-run.ipynb config (k=6, iters=1,
    batch=10, cut=0.10): ≥ 85% of stage×metric cells inside the shadow's
    8-order spread widened by max(2σ, 5%) — the PARITY.md criterion."""
    import statistics

    cfg = next(c for c in CONFIGS if "lesmis" in c["name"])
    n, node_w, edges, arr = load_corpus(cfg)
    shadow_runs = run_shadow(cfg, n, node_w, edges, arr)
    engine_rows = run_engine(spark, cfg, n, node_w, edges, arr)
    eng = {r[0]: r for r in engine_rows}
    stages = [r[0] for r in shadow_runs[0]]
    agree = total = 0
    for st_i, st in enumerate(stages):
        if st not in eng:
            continue
        for m_i in range(4):  # waste, cut_ratio, edges_cut, tcv
            vals = [run[st_i][1 + m_i] for run in shadow_runs]
            mean, sd = statistics.mean(vals), statistics.pstdev(vals)
            slack = max(2 * sd, 0.05 * max(abs(mean), 1.0))
            total += 1
            agree += (min(vals) - slack) <= eng[st][1 + m_i] <= (max(vals) + slack)
    assert total >= 36
    assert agree / total >= 0.85, f"parity agreement {agree}/{total}"
