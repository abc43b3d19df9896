"""Centrality measures used by the reference's node-reordering schemes (A13/F11).

- degree centrality: ``utils.py:999-1008`` — plain degree ranking.
- leverage centrality: ``utils.py:1010-1046`` — for node i with degree k_i,
  ``mean over neighbors j of (k_i − k_j) / (k_i + k_j)``; isolated nodes
  get NULL (the reference skips degree-0 nodes before computing,
  utils.py:1170-1176).

- bottleneck centrality: ``utils.py:1285-1354`` + ``bottleneck.r`` — the
  published BN measure, re-implemented in-engine as a per-component
  Arrow kernel (``bottleneck_centrality``); the reference shells out to
  R centiserve per batch subnetwork.

PII (``pii.R``, utils.py:1205-1283) remains the one documented F11
non-goal: it calls the jfaganUK/pii R package whose index formula is not
reproducible here from public sources at hand, and a guessed formula
would be worse than an honest exclusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import degrees, symmetrize


def degree_centrality(edges: DataFrame) -> DataFrame:
    """(id, degree, centrality) with centrality = degree / (n − 1)."""
    deg = degrees(edges)
    n = deg.count()
    denom = max(n - 1, 1)
    return deg.select("id", "degree", (F.col("degree") / denom).alias("centrality"))


def leverage_centrality(edges: DataFrame) -> DataFrame:
    """(id, leverage) — mean over neighbors of (k_i − k_j)/(k_i + k_j).

    One degree aggregation + one join of degrees onto the symmetrized edge
    list + one mean — the A13 plan from SURVEY.md §2.4.
    """
    deg = degrees(edges)
    sym = symmetrize(edges)
    d_i = deg.select(F.col("id").alias("src"), F.col("degree").alias("k_i"))
    d_j = deg.select(F.col("id").alias("dst"), F.col("degree").alias("k_j"))
    return (
        sym.join(d_i, "src")
        .join(d_j, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.avg(
                (F.col("k_i") - F.col("k_j")) / (F.col("k_i") + F.col("k_j"))
            ).alias("leverage")
        )
    )


def _bottleneck_kernel(max_component: int):
    """Per-component BN scorer for ``applyInPandas`` (Arrow-batched).

    One BFS per root over a CSR of the component: deterministic
    shortest-path trees (parent = smallest-id neighbor at the previous
    level, realized by iterating both the frontier and each neighbor list
    in ascending order), subtree sizes by reverse visit order, and
    BN(v) += 1 where the subtree rule fires. O(n·(n+m)) per component is
    the published algorithm's cost — bounded because callers score
    batch/arrival subgraphs (the reference runs R centiserve per batch
    subnetwork, never on the full graph), enforced by ``max_component``.
    """
    import numpy as np
    import pandas as pd

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        ids = np.unique(np.concatenate([src, dst]))
        n = int(len(ids))
        if n > max_component:
            raise ValueError(
                f"bottleneck_centrality: component has {n} nodes "
                f"(max_component={max_component}); score per-batch "
                "subgraphs, not the full graph (O(n·m) by definition)"
            )
        s = np.searchsorted(ids, src)
        d = np.searchsorted(ids, dst)
        # both directions, deduped, neighbor lists ascending
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        keys = u.astype(np.int64) * n + v
        keys = np.unique(keys[u != v])
        u, v = keys // n, keys % n
        indptr = np.searchsorted(u, np.arange(n + 1))
        bn = np.zeros(n, dtype=np.int64)
        dist = np.empty(n, dtype=np.int64)
        parent = np.empty(n, dtype=np.int64)
        sub = np.empty(n, dtype=np.int64)
        for root in range(n):
            dist.fill(-1)
            parent.fill(-1)
            dist[root] = 0
            frontier = [root]
            visit = [root]
            while frontier:
                nxt = []
                for a in frontier:  # ascending: first discovery = min-id parent
                    for b in v[indptr[a]:indptr[a + 1]]:
                        if dist[b] < 0:
                            dist[b] = dist[a] + 1
                            parent[b] = a
                            nxt.append(int(b))
                nxt = sorted(set(nxt))
                visit.extend(nxt)
                frontier = nxt
            nt = len(visit)  # |V(T_root)|
            sub.fill(0)
            for a in visit:
                sub[a] = 1
            for a in reversed(visit):
                p = parent[a]
                if p >= 0:
                    sub[p] += sub[a]
            # v ≠ root is a bottleneck of T_root iff the number of tree
            # paths root→t passing through v (= its subtree size, t=v
            # included) exceeds |V(T_root)|/4
            mask = (dist > 0) & (sub * 4 > nt)
            bn[mask] += 1
        return pd.DataFrame({"id": ids, "bottleneck": bn})

    return fn


def bottleneck_centrality(
    edges: DataFrame, max_component: int = 200_000, group_col: str | None = None
) -> DataFrame:
    """(id, bottleneck) — BN centrality (Przulj et al. 2004; the measure
    behind the reference's ``bottleneck.r`` / centiserve::bottleneck,
    reference ``utils.py:1285-1354``).

    For every root s, build the deterministic BFS shortest-path tree T_s
    (parent = smallest-id neighbor one level closer to s). A node v ≠ s is
    a *bottleneck* in T_s iff strictly more than |V(T_s)|/4 of the tree
    paths from s pass through v (a path ending at v counts). BN(v) = the
    number of roots marking v. Convention note: the root itself is never a
    bottleneck of its own tree (Przulj's formulation); implementations
    that count it shift every score in a ≥2-node component by exactly +1,
    so orderings — the reference's only use — are unaffected.

    Plan: the subgraphs are scored by ONE
    ``groupBy(...).applyInPandas`` kernel, Arrow-batched, all groups in
    parallel. The group key is ``group_col`` when the caller already knows
    a bounded partitioning of the graph (e.g. the arrival batch — the BFS
    never leaves a root's component, so a group may hold several
    components and scores are unchanged); otherwise one distributed
    connected-components pass labels the components first. Nodes absent
    from ``edges`` (isolated) score 0 by definition and are simply not
    returned — callers coalesce. ``max_component`` bounds the *group*
    size fed to the O(n·m) kernel.
    """
    canon = (
        edges.select(
            *([F.col(group_col)] if group_col else []),
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if group_col is None:
        from .components import connected_components

        comps, _ = connected_components(canon)
        labeled = canon.join(
            comps.withColumnRenamed("id", "src").withColumnRenamed("component", "_c"),
            "src",
        )
        group_col = "_c"
    else:
        labeled = canon
    return (
        labeled.groupBy(group_col)
        .applyInPandas(_bottleneck_kernel(max_component), "id long, bottleneck long")
        .select("id", "bottleneck")
    )
