"""Sequential reference shadow: the reference driver replayed faithfully.

The parity target for running the ENGINE on the reference's own corpus
(`/root/reference/data/*.txt|gml`). The reference itself cannot execute in
this container (networkx 1.x, sklearn, and pyximport are absent) and every
notebook with stored outputs ran on `data/predition_model_tests/...` files
that are not shipped in the repo — so this shadow is the executable
stand-in: a from-scratch pure-Python transcription of the sequential
semantics, verified line-by-line against

- fennel.pyx get_votes/get_assignment/fennel/generate_prediction_model
  (/root/reference/graph_partitioning/fennel.pyx:19-175)
- GraphPartitioning.load_network / prediction_model / assign_cut_off /
  batch_arrival / process_batch
  (/root/reference/graph_partitioning/graph_partitioning.py:47-628)
- utils.score + utils.base_metrics
  (/root/reference/graph_partitioning/utils.py:158-233)

Config family replayed: the graph-partitioning-batch.ipynb /
graph-partitioning-parallel-run.ipynb settings — edge expansion, FOAF,
node reordering, GAM weights, virtual nodes, one-shot alpha and
alter-arrived-weight all OFF; sliding_window off (the reference's sliding
mode reprocesses a rolling window per arrival, which the engine
deliberately re-shapes into fixed batch ranges — documented divergence,
excluded from parity).

The reference iterates networkx node dicts whose order is arbitrary
(Python-3.5-era nx 1.x), so every public function takes an ``order``
permutation: the spread of metric values across orders IS the reference's
own run-to-run sigma, and engine parity is judged against that spread.

Numeric note: the reference accumulates votes/sizes in C float32
(fennel.pyx:22,57); the shadow uses float64. On the integer-weighted
shipped corpora the scores are exact in both, so tie-breaks agree.
"""

from __future__ import annotations


def build_adj(n: int, edges) -> list[dict[int, float]]:
    adj: list[dict[int, float]] = [dict() for _ in range(n)]
    for s, d, w in edges:
        if s == d:
            continue
        adj[int(s)][int(d)] = float(w)
        adj[int(d)][int(s)] = float(w)
    return adj


def fennel_pass(nodes, present, adj, node_w, assign, fixed, alpha, k):
    """One reference restream (fennel.pyx:118-155) over ``nodes`` restricted
    to the subgraph ``present``: skip fixed, defer subgraph-degree-0 nodes,
    votes from assigned neighbors (weight ≤ 0 → 1), weighted sizes over the
    subgraph's nodes, score = votes − α·size (+α at the previous
    partition), strict first-max; then greedy min-fill for the deferred
    singles (sizes re-read after every placement, ties → smallest id)."""
    sizes = [0.0] * k
    for v in present:
        if assign[v] >= 0:
            sizes[assign[v]] += node_w[v]
    singles = []
    for node in nodes:
        if fixed[node] != -1:
            continue
        nbrs = [u for u in adj[node] if u in present]
        if not nbrs:
            singles.append(node)
            continue
        votes = [0.0] * k
        for u in nbrs:
            pu = assign[u]
            if pu >= 0:
                w = adj[node][u]
                votes[pu] += w if w > 0 else 1.0
        prev = assign[node]
        best = 0
        best_val = votes[0] - alpha * sizes[0] + (alpha if prev == 0 else 0.0)
        for p in range(1, k):
            val = votes[p] - alpha * sizes[p] + (alpha if prev == p else 0.0)
            if val > best_val:
                best, best_val = p, val
        if prev >= 0:
            sizes[prev] -= node_w[node]
        sizes[best] += node_w[node]
        assign[node] = best
    for node in singles:
        if assign[node] == -1:
            best = min(range(k), key=lambda p: (sizes[p], p))
            assign[node] = best
            sizes[best] += node_w[node]
    return assign


def score_row(sub, adj, assign, node_w, k):
    """(waste, cut_ratio, edges_cut, tcv, m_sub, n_sub) over the induced
    subgraph — utils.score:158-188 (waste normalized by the SUBGRAPH node
    count, weighted bincount) + utils.base_metrics:190-233 (TCV = per-node
    count of distinct foreign partitions across cut edges)."""
    n_sub = len(sub)
    sizes = [0.0] * k
    for v in sub:
        if assign[v] >= 0:
            sizes[assign[v]] += node_w[v]
    bal = [s / n_sub for s in sizes] if n_sub else [0.0] * k
    mx = max(bal)
    waste = sum(mx - b for b in bal)
    edges_cut = 0
    m_sub = 0
    tcv = 0
    for v in sub:
        foreign = set()
        for u in adj[v]:
            if u not in sub:
                continue
            if v < u:
                m_sub += 1
                if assign[v] != assign[u]:
                    edges_cut += 1
            if assign[v] != assign[u]:
                foreign.add(assign[u])
        tcv += len(foreign)
    cut_ratio = edges_cut / m_sub if m_sub else 0.0
    return (round(waste, 6), round(cut_ratio, 6), edges_cut, tcv, m_sub, n_sub)


def shadow_run(
    n: int,
    node_w: list[float],
    edges,
    arrivals: list[int],
    k: int,
    num_iterations: int,
    cut_off_frac: float,
    batch_size: int,
    order: list[int] | None = None,
):
    """The full reference driver: prediction model → assign_cut_off →
    batch_arrival. Returns (assignments, rows) where rows are
    (stage, waste, cut_ratio, edges_cut, tcv, m_sub, n_sub) — one
    'prediction' row, one 'cutoff' row, one row per processed batch
    (including the reference's final assign_all batch, which may be empty:
    graph_partitioning.py:504-505 always processes the remainder)."""
    order = list(range(n)) if order is None else list(order)
    adj = build_adj(n, edges)
    m = len(edges)
    assign = [-1] * n
    fixed = [-1] * n

    # prediction model (graph_partitioning.py:60-61,226-242): alpha from the
    # FULL graph, num_iterations restreams over all nodes
    alpha_pred = m * k / float(n * n)
    allset = set(range(n))
    for _ in range(num_iterations):
        fennel_pass(order, allset, adj, node_w, assign, fixed, alpha_pred, k)
    rows = [("prediction",) + score_row(allset, adj, assign, node_w, k)]

    # assign_cut_off (:363-406): freeze the first cut arriving nodes in id
    # order, discard every other prediction
    n_arr = sum(arrivals)
    cut = int(cut_off_frac * n_arr)
    arrived: list[int] = []
    for a in range(n):
        if arrivals[a] == 0:
            continue
        if len(arrived) >= cut:
            break
        fixed[a] = 1
        arrived.append(a)
    for i in range(n):
        if fixed[i] == -1:
            assign[i] = -1
    rows.append(("cutoff",) + score_row(set(arrived), adj, assign, node_w, k))

    # batch_arrival (:462-519) + process_batch (:522-628)
    bi = 0

    def process(batch: list[int]):
        nonlocal bi
        sub = set(arrived) | set(batch)
        m_sub = sum(1 for v in sub for u in adj[v] if u in sub and v < u)
        nodes_fixed = sum(1 for f in fixed if f == 1)
        denom = nodes_fixed + len(batch)
        alpha = m_sub * k / float(denom * denom) if denom else 0.0
        sub_order = [v for v in order if v in sub]
        for _ in range(num_iterations):
            fennel_pass(sub_order, sub, adj, node_w, assign, fixed, alpha, k)
        for v in batch:
            fixed[v] = 1
            arrived.append(v)
        rows.append((f"batch{bi}",) + score_row(sub, adj, assign, node_w, k))
        bi += 1

    batch: list[int] = []
    for a in range(n):
        if fixed[a] == 1 or arrivals[a] == 0:
            continue
        batch.append(a)
        if len(batch) == batch_size:
            process(batch)
            batch = []
    process(batch)  # assign_all remainder — emitted even when empty

    for i in range(n):
        if fixed[i] == -1:
            assign[i] = -1
    return assign, rows
