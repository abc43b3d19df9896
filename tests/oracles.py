"""Pure-NumPy oracles for the graph algorithms (SURVEY.md §5 test plan).

These re-implement the exact semantics the Spark operators claim, with no
Spark involved, so tests compare two independent code paths.
"""

from __future__ import annotations

import numpy as np


def _relabel(src, dst):
    ids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(ids)}
    s = np.array([idx[v] for v in src])
    d = np.array([idx[v] for v in dst])
    return ids, s, d


def pagerank_oracle(src, dst, damping=0.85, tol=1e-6, max_iter=100):
    """Power iteration with uniform dangling redistribution.
    Returns dict vertex_id -> rank."""
    ids, s, d = _relabel(src, dst)
    n = len(ids)
    outdeg = np.bincount(s, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    share = np.zeros(len(s))
    share[:] = 1.0 / outdeg[s]
    for _ in range(max_iter):
        contrib = np.bincount(d, weights=r[s] * share, minlength=n)
        dangling = r[outdeg == 0].sum()
        r_new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.max(np.abs(r_new - r)) < tol:
            r = r_new
            break
        r = r_new
    return dict(zip(ids.tolist(), r.tolist()))


def components_oracle(src, dst):
    """Union-find; component id = min vertex id. dict id -> comp."""
    ids, s, d = _relabel(src, dst)
    parent = np.arange(len(ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s, d):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(ids))])
    # canonical min-id per component
    comp_min = {}
    for i, r in enumerate(roots):
        comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])
    return {ids[i]: comp_min[roots[i]] for i in range(len(ids))}


def lpa_oracle(src, dst, w, max_iter=20, weighted=True):
    """Synchronous LPA: adopt the max-weight neighbor label, ties → smallest
    label; no-neighbor vertices keep their label. dict id -> label."""
    ids, s, d = _relabel(src, dst)
    n = len(ids)
    if not weighted:
        w = np.ones(len(s))
    # symmetric adjacency as lists
    nbrs = [[] for _ in range(n)]
    for a, b, wt in zip(s, d, w):
        nbrs[a].append((b, wt))
        nbrs[b].append((a, wt))
    labels = ids.copy().astype(np.int64)
    for _ in range(max_iter):
        new = labels.copy()
        changed = False
        for v in range(n):
            if not nbrs[v]:
                continue
            votes = {}
            for u, wt in nbrs[v]:
                lab = labels[u]
                votes[lab] = votes.get(lab, 0.0) + wt
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if best != labels[v]:
                changed = True
            new[v] = best
        labels = new
        if not changed:
            break
    return dict(zip(ids.tolist(), labels.tolist()))


def triangles_oracle(src, dst):
    """Exact triangle count + per-vertex counts over the simple undirected
    graph induced by the edge list. Returns (total, dict id -> count)."""
    pairs = set()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    total = 0
    per = {v: 0 for v in adj}
    for a, b in pairs:
        common = adj[a] & adj[b]
        for c in common:
            if c > b:  # a < b < c counts each triangle once (needs a<b here)
                if a < b:
                    total += 1
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
    return total, {v: c for v, c in per.items() if c > 0}
