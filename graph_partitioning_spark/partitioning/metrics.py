"""Partition-quality metrics as pure DataFrame aggregations.

Each function reproduces a reference formula exactly (cited per function);
tests/test_metrics.py checks them against brute-force NumPy oracles that
re-implement the reference line-for-line. All are one or two shuffles over
the edge/assignment tables — no driver-side iteration, no Python row path —
so they run unchanged at 10^12-edge scale (the joins are the same J1/J5
shapes as the partitioner's own superstep and benefit from the same
AQE skew handling).

Conventions:
- ``edges``: canonical undirected edge list (src < dst, one row per edge,
  ``weight`` double) — the output of ``graph.edges.undirect``.
- ``assignments``: ``(id long, partition int)``; partition −1 = unassigned
  (the reference's UNMAPPED, /root/reference/graph_partitioning/fennel.pyx:6).
- ``vertices`` (optional): ``(id, weight)`` node weights; absent → weight 1
  (matches bincount_assigned's default,
  /root/reference/graph_partitioning/utils.py:107-118).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph.edges import symmetrize


def _weighted_vertices(assignments: DataFrame, vertices: DataFrame | None) -> DataFrame:
    a = assignments.select("id", "partition")
    if vertices is None:
        return a.withColumn("weight", F.lit(1.0))
    return a.join(vertices.select("id", "weight"), "id", "left").withColumn(
        "weight", F.coalesce(F.col("weight"), F.lit(1.0))
    )


def partition_sizes(
    assignments: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """Weighted bincount over assigned nodes → ``(partition, size)``.

    Reference: ``bincount_assigned``
    (/root/reference/graph_partitioning/utils.py:107-118) — nodes with
    assignment < 0 excluded; missing node weight counts as 1.
    """
    return (
        _weighted_vertices(assignments, vertices)
        .filter(F.col("partition") >= 0)
        .groupBy("partition")
        .agg(F.sum("weight").alias("size"))
    )


def partition_populations(
    assignments: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """Per-partition (node count, total weight) → ``(partition, population,
    weight)``. Reference: ``get_partition_population``
    (/root/reference/graph_partitioning/utils.py:749-770)."""
    return (
        _weighted_vertices(assignments, vertices)
        .filter(F.col("partition") >= 0)
        .groupBy("partition")
        .agg(F.count("*").alias("population"), F.sum("weight").alias("weight"))
    )


def waste(
    assignments: DataFrame,
    num_partitions: int,
    vertices: DataFrame | None = None,
    n_nodes: int | None = None,
) -> float:
    """``Σ_p (max(balance) − balance_p)`` with ``balance = weighted
    bincount / n_nodes``.

    Reference: ``score`` (/root/reference/graph_partitioning/utils.py:158-177):
    balance is divided by the graph's node count (not the assigned count),
    and *all* k partitions participate — empty partitions contribute
    ``max(balance)`` each.
    """
    if n_nodes is None:
        n_nodes = assignments.count()
    if n_nodes == 0:
        return 0.0
    rows = partition_sizes(assignments, vertices).collect()
    sizes = {r["partition"]: r["size"] for r in rows}
    balance = [sizes.get(p, 0.0) / n_nodes for p in range(num_partitions)]
    mx = max(balance) if balance else 0.0
    return float(sum(mx - b for b in balance))


def cut_metrics(edges: DataFrame, assignments: DataFrame) -> dict[str, float]:
    """Edge-cut metrics in one pass over the edge table.

    Returns ``{edges_cut, cut_ratio, total_comm_volume, n_edges}``.

    - edges_cut / cut_ratio: edges whose endpoints differ, over all edges —
      reference ``score`` mismatch (utils.py:179-186) and ``base_metrics``
      edges_cut (utils.py:190-224; each undirected edge counted once).
    - total_comm_volume: Σ_v |{p(u) : u ∈ N(v), p(u) ≠ p(v)}| — the
      "communication steps" of ``base_metrics`` (utils.py:226-229), which
      visits every edge from both endpoints.

    Plan: two equi-joins (src, dst) against assignments, then one count and
    one two-level distinct aggregation; the J5 shape from SURVEY.md §2.3.
    """
    # the 2-column assignment table is broadcastable far beyond the
    # optimizer's conservative stats estimate for checkpointed states —
    # hint it explicitly when small (≤20M rows ≈ ~250MB); beyond that the
    # joins shuffle and AQE handles hub skew. Persisted first so the sizing
    # count and the broadcast build don't recompute an unmaterialized input.
    a_cached = assignments.select("id", "partition").persist()
    a = a_cached
    try:
        if a_cached.count() <= 20_000_000:
            a = F.broadcast(a_cached)
    except Exception:
        pass
    a_src = a.select(F.col("id").alias("src"), F.col("partition").alias("p_src"))
    a_dst = a.select(F.col("id").alias("dst"), F.col("partition").alias("p_dst"))
    labeled = edges.select("src", "dst").join(a_src, "src").join(a_dst, "dst")
    labeled = labeled.persist()
    try:
        n_edges = labeled.count()
        cut = labeled.filter(F.col("p_src") != F.col("p_dst"))
        edges_cut = cut.count()
        # per-endpoint foreign-partition sets: symmetrize the cut edges so
        # each endpoint sees its foreign neighbor's partition
        per_node = cut.select(
            F.col("src").alias("id"), F.col("p_dst").alias("foreign")
        ).union(cut.select(F.col("dst").alias("id"), F.col("p_src").alias("foreign")))
        tcv = (
            per_node.distinct()
            .groupBy("id")
            .agg(F.count("*").alias("steps"))
            .agg(F.sum("steps"))
            .first()[0]
            or 0
        )
    finally:
        labeled.unpersist()
        a_cached.unpersist()
    return {
        "edges_cut": float(edges_cut),
        "cut_ratio": float(edges_cut) / n_edges if n_edges else 0.0,
        "total_comm_volume": float(tcv),
        "n_edges": float(n_edges),
    }


def votes(edges: DataFrame, assignments: DataFrame) -> DataFrame:
    """Per-(node, partition) neighbor vote mass → ``(id, partition, votes)``.

    The J1 join (/root/reference/graph_partitioning/fennel.pyx:19-38):
    for each node, for each neighbor assigned to a partition ≥ 0, add the
    edge weight (weights ≤ 0 coerced to 1.0, fennel.pyx:33-34). Votes for
    every node appear regardless of the node's own assignment.
    """
    sym = symmetrize(edges)
    nbr = assignments.select(
        F.col("id").alias("dst"), F.col("partition").alias("nbr_partition")
    ).filter(F.col("nbr_partition") >= 0)
    return (
        sym.join(nbr, "dst")
        .groupBy(F.col("src").alias("id"), F.col("nbr_partition").alias("partition"))
        .agg(
            F.sum(
                F.when(F.col("weight") <= 0.0, F.lit(1.0)).otherwise(F.col("weight"))
            ).alias("votes")
        )
    )


def rbse(edges: DataFrame, assignments: DataFrame) -> float:
    """"Rather-be-somewhere-else": fraction of assigned nodes for which some
    *other* partition's vote mass strictly exceeds their own partition's.

    Reference: ``ratherBeSomewhereElseList`` + ``...Metric``
    (/root/reference/graph_partitioning/utils.py:1101-1153). Nodes with no
    neighbors have zero votes everywhere → not RBSE; unassigned nodes are
    excluded from the denominator.
    """
    assigned = assignments.filter(F.col("partition") >= 0).select("id", "partition")
    v = votes(edges, assignments)
    own = (
        assigned.join(
            v.withColumnRenamed("partition", "vp"), "id", "left"
        )
        .groupBy("id", "partition")
        .agg(
            F.max(F.when(F.col("vp") == F.col("partition"), F.col("votes"))).alias("own_votes"),
            F.max(F.when(F.col("vp") != F.col("partition"), F.col("votes"))).alias("best_other"),
        )
    )
    flags = own.select(
        (
            F.coalesce(F.col("best_other"), F.lit(0.0))
            > F.coalesce(F.col("own_votes"), F.lit(0.0))
        ).cast("int").alias("rbse")
    )
    row = flags.agg(F.avg("rbse").alias("m"), F.count("*").alias("n")).first()
    return float(row["m"]) if row["n"] else 0.0


def loneliness_wavg(
    edges: DataFrame,
    assignments: DataFrame,
    num_partitions: int,
    loneliness_score_param: float = 1.2,
) -> float:
    """Population-weighted average of per-partition loneliness.

    Per node, within its partition's *induced subgraph*:
    ``1 − 1/(deg_intra + 1)^param``; per-partition simple average; across
    partitions, average weighted by partition node count. Empty partitions
    score 0 with weight 0. Reference: ``loneliness_score`` +
    ``loneliness_score_wavg``
    (/root/reference/graph_partitioning/utils.py:565-600).
    """
    assigned = assignments.filter(F.col("partition") >= 0).select("id", "partition")
    a_src = assigned.select(F.col("id").alias("src"), F.col("partition").alias("p_src"))
    a_dst = assigned.select(F.col("id").alias("dst"), F.col("partition").alias("p_dst"))
    intra = (
        edges.select("src", "dst")
        .join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("p_src") == F.col("p_dst"))
    )
    deg = (
        intra.select(F.col("src").alias("id")).union(intra.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    per_node = (
        assigned.join(deg, "id", "left")
        .withColumn("deg", F.coalesce(F.col("deg"), F.lit(0)))
        .withColumn(
            "score",
            F.lit(1.0) - F.lit(1.0) / F.pow(F.col("deg") + 1.0, F.lit(loneliness_score_param)),
        )
    )
    rows = (
        per_node.groupBy("partition")
        .agg(F.avg("score").alias("score"), F.count("*").alias("population"))
        .collect()
    )
    total_pop = sum(r["population"] for r in rows)
    if total_pop == 0:
        return 0.0
    return float(sum(r["score"] * r["population"] for r in rows) / total_pop)


def modularity(edges: DataFrame, assignments: DataFrame) -> float:
    """Newman modularity Q of the partition over the weighted undirected graph.

    Q = Σ_p [ intra_p/m − (deg_p/(2m))² ] with m = total edge weight,
    deg_p = total weighted degree of partition p. The reference delegates to
    python-louvain's ``community.modularity``
    (/root/reference/graph_partitioning/utils.py:469-528); this is the same
    closed form as a DataFrame aggregation.
    """
    a_src = assignments.select(F.col("id").alias("src"), F.col("partition").alias("p_src"))
    a_dst = assignments.select(F.col("id").alias("dst"), F.col("partition").alias("p_dst"))
    labeled = edges.join(a_src, "src").join(a_dst, "dst").persist()
    try:
        m = labeled.agg(F.sum("weight")).first()[0] or 0.0
        if m == 0:
            return 0.0
        intra = {
            r["p_src"]: r["w"]
            for r in labeled.filter(F.col("p_src") == F.col("p_dst"))
            .groupBy("p_src")
            .agg(F.sum("weight").alias("w"))
            .collect()
        }
        deg = (
            labeled.select(F.col("p_src").alias("p"), F.col("weight"))
            .union(labeled.select(F.col("p_dst").alias("p"), F.col("weight")))
            .groupBy("p")
            .agg(F.sum("weight").alias("d"))
            .collect()
        )
        q = 0.0
        for r in deg:
            p, d = r["p"], r["d"]
            q += intra.get(p, 0.0) / m - (d / (2.0 * m)) ** 2
        return float(q)
    finally:
        labeled.unpersist()


def community_quality(edges: DataFrame, labels: DataFrame) -> dict[str, float]:
    """Q, Qds (modularity density) and conductance of a community division,
    as closed-form DataFrame aggregations.

    The reference obtains these three columns of its 12-metric row by
    shelling out to the external ComQualityMetric Java binary per partition
    (/root/reference/graph_partitioning/utils.py:293-321) — the in-engine
    replacement computes the published closed forms directly (Chen, Kuzmin,
    Szymanski, "Community Detection via Maximization of Modularity and Its
    Variants", 2014 — the paper behind that tool):

      Q    = Σ_c [ w_in(c)/m − ((2·w_in(c) + w_out(c)) / 2m)² ]
      Qds  = Σ_c [ (w_in(c)/m)·d(c) − ((2·w_in(c)+w_out(c))/2m · d(c))² ]
             − Σ_{c≠c'} (w_{c,c'}/2m) · d(c,c')          (split penalty)
      cond = (1/|C|) Σ_c  w_out(c) / (2·w_in(c) + w_out(c))

    with d(c) = 2·w_in(c)/(n_c(n_c−1)) the internal density, d(c,c') =
    w_{c,c'}/(n_c·n_{c'}) the pair density, m = total edge weight among
    labeled nodes. Nodes with label < 0 are excluded (UNMAPPED convention).

    Plan: one edge relabel (two equi-joins), one groupBy (c1,c2) pair
    aggregation, one label-count aggregation, then per-community arithmetic
    and a single-row final agg — two shuffles total, no driver iteration
    over communities.
    """
    lab = labels.select("id", "label").filter(F.col("label") >= 0)
    l_src = lab.select(F.col("id").alias("src"), F.col("label").alias("la"))
    l_dst = lab.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
    e = edges.select("src", "dst", "weight").join(l_src, "src").join(l_dst, "dst")
    pair = (
        e.select(
            F.least("la", "lb").alias("c1"),
            F.greatest("la", "lb").alias("c2"),
            "weight",
        )
        .groupBy("c1", "c2")
        .agg(F.sum("weight").alias("w"))
        .persist()
    )
    try:
        m = pair.agg(F.sum("w")).first()[0] or 0.0
        sizes = lab.groupBy("label").agg(F.count("*").alias("n"))
        n_comm = sizes.count()
        if m == 0 or n_comm == 0:
            return {"q": 0.0, "qds": 0.0, "conductance": 0.0, "n_communities": n_comm}
        intra = pair.filter(F.col("c1") == F.col("c2")).select(
            F.col("c1").alias("c"), F.col("w").alias("w_in")
        )
        cross = pair.filter(F.col("c1") != F.col("c2"))
        out_per = (
            cross.select(F.col("c1").alias("c"), "w")
            .union(cross.select(F.col("c2").alias("c"), "w"))
            .groupBy("c")
            .agg(F.sum("w").alias("w_out"))
        )
        comm = (
            sizes.select(F.col("label").alias("c"), "n")
            .join(intra, "c", "left")
            .join(out_per, "c", "left")
            .select(
                "c",
                "n",
                F.coalesce(F.col("w_in"), F.lit(0.0)).alias("w_in"),
                F.coalesce(F.col("w_out"), F.lit(0.0)).alias("w_out"),
            )
        )
        d_c = F.when(
            F.col("n") > 1, 2.0 * F.col("w_in") / (F.col("n") * (F.col("n") - 1.0))
        ).otherwise(F.lit(0.0))
        vol = (2.0 * F.col("w_in") + F.col("w_out")) / (2.0 * m)
        q_term = F.col("w_in") / m - vol * vol
        qds_term = (F.col("w_in") / m) * d_c - (vol * d_c) * (vol * d_c)
        cond_term = F.when(
            2.0 * F.col("w_in") + F.col("w_out") > 0,
            F.col("w_out") / (2.0 * F.col("w_in") + F.col("w_out")),
        ).otherwise(F.lit(0.0))
        row = comm.agg(
            F.sum(q_term).alias("q"),
            F.sum(qds_term).alias("qds_pos"),
            F.avg(cond_term).alias("cond"),
        ).first()
        # split penalty: each unordered cross pair appears once in `cross`
        # but contributes from both sides → factor 2 folds the 1/(2m) to 1/m
        n1 = sizes.select(F.col("label").alias("c1"), F.col("n").alias("n1"))
        n2 = sizes.select(F.col("label").alias("c2"), F.col("n").alias("n2"))
        sp = (
            cross.join(n1, "c1")
            .join(n2, "c2")
            .agg(
                F.sum(
                    F.col("w") * F.col("w") / (m * F.col("n1") * F.col("n2"))
                ).alias("sp")
            )
            .first()["sp"]
            or 0.0
        )
        return {
            "q": float(row["q"]),
            "qds": float(row["qds_pos"] - sp),
            "conductance": float(row["cond"]),
            "n_communities": n_comm,
        }
    finally:
        pair.unpersist()


def permanence(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(id, permanence) — per-vertex permanence of a community assignment
    (Chakraborty, Srinivasan, Ganguly, Mukherjee, "On the permanence of
    vertices in network communities", KDD 2014):

      Perm(v) = I(v) / (E_max(v) · deg(v)) − (1 − c_in(v))

    with I(v) = number of neighbors sharing v's community, E_max(v) = max
    connections from v into any single *other* community (1 if v has no
    external neighbors — the paper's ÷0 convention), and c_in(v) the
    clustering among v's internal neighbors: 2·T_in(v)/(I(v)·(I(v)−1)),
    T_in(v) = triangles through v whose three vertices share v's community
    (an edge between two internal neighbors of v is exactly such a
    triangle); 0 when I(v) < 2. Unweighted simple-graph semantics, matching
    the edge list the reference feeds its MaxPerm C binary
    (/root/reference/graph_partitioning/utils.py:629-665).

    The reference's 12-metric row obtains this column from that external
    binary (run_max_perm, utils.py:629) — the binary's internal community
    *detection* stays a non-goal; this computes the published closed form
    for a given assignment in-engine. Plan: one neighbor relabel join +
    per-(v, community) count (two shuffles), and the T_in term rides the
    degree-ordered triangle enumeration (O(√m) out-degree bound), so hubs
    never self-join — the same shape that makes T4 survive power-law
    graphs. Vertices with no edges are omitted (deg 0 ⇒ undefined).
    """
    from ..graph.triangles import triangle_triples

    lab = labels.select("id", "label")
    sym = symmetrize(edges).select("src", "dst")
    nbr = (
        sym.join(
            lab.withColumnRenamed("id", "src").withColumnRenamed("label", "c_v"),
            "src",
        ).join(
            lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "c_u"),
            "dst",
        )
    )
    per_comm = nbr.groupBy(F.col("src").alias("id"), "c_v", "c_u").agg(
        F.count("*").alias("n")
    )
    stats = per_comm.groupBy("id").agg(
        F.sum("n").alias("deg"),
        F.sum(
            F.when(F.col("c_u") == F.col("c_v"), F.col("n")).otherwise(F.lit(0))
        ).alias("internal"),
        F.max(F.when(F.col("c_u") != F.col("c_v"), F.col("n"))).alias("emax"),
    )
    tri = triangle_triples(edges)
    for corner in ("a", "b", "c"):
        tri = tri.join(
            lab.withColumnRenamed("id", corner).withColumnRenamed(
                "label", f"l_{corner}"
            ),
            corner,
        )
    t_in = (
        tri.filter(
            (F.col("l_a") == F.col("l_b")) & (F.col("l_b") == F.col("l_c"))
        )
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("t_in"))
    )
    j = stats.join(t_in, "id", "left").withColumn(
        "t_in", F.coalesce(F.col("t_in"), F.lit(0))
    )
    d_in = F.col("internal").cast("double")
    c_in = F.when(
        F.col("internal") >= 2, 2.0 * F.col("t_in") / (d_in * (d_in - 1.0))
    ).otherwise(F.lit(0.0))
    perm = (
        F.col("internal")
        / (F.coalesce(F.col("emax"), F.lit(1)).cast("double") * F.col("deg"))
    ) - (1.0 - c_in)
    return j.select("id", F.round(perm, 6).alias("permanence"))


def wavg_permanence(
    edges: DataFrame,
    assignments: DataFrame,
    num_partitions: int,
    lpa_iterations: int = 2,
) -> float:
    """Population-weighted average network permanence over per-partition
    induced subgraphs — the reference's wavg_max_perm shape
    (/root/reference/graph_partitioning/utils.py:602-627): for each
    partition, take the subgraph of intra-partition edges, find communities,
    average the per-vertex permanence, then weight each partition's mean by
    its (subgraph) population. The community-detection step uses the
    engine's bounded deterministic LPA instead of the MaxPerm binary's
    internal permanence maximizer (documented difference — the binary is
    the declared non-goal; the metric arithmetic is the published closed
    form via :func:`permanence`). Cut edges are gone from the subgraph, so
    one global LPA over the intra-partition edge list is per-partition
    detection — labels cannot cross partitions.
    """
    from ..graph.labelprop import label_propagation

    a = assignments.select("id", "partition").filter(
        (F.col("partition") >= 0) & (F.col("partition") < num_partitions)
    )
    e = (
        edges.select("src", "dst", "weight")
        .join(
            a.withColumnRenamed("id", "src").withColumnRenamed(
                "partition", "p_src"
            ),
            "src",
        )
        .join(
            a.withColumnRenamed("id", "dst").withColumnRenamed(
                "partition", "p_dst"
            ),
            "dst",
        )
        .filter(F.col("p_src") == F.col("p_dst"))
        .select("src", "dst", "weight", F.col("p_src").alias("p"))
        .persist()
    )
    try:
        intra = e.select("src", "dst", "weight")
        labels, _ = label_propagation(intra, max_iter=lpa_iterations)
        perm = permanence(intra, labels)
        vp = (
            e.select(F.col("src").alias("id"), "p")
            .union(e.select(F.col("dst").alias("id"), "p"))
            .distinct()
        )
        row = (
            perm.join(vp, "id")
            .groupBy("p")
            .agg(F.avg("permanence").alias("mp"), F.count("*").alias("n"))
            .agg(
                (F.sum(F.col("mp") * F.col("n")) / F.sum("n")).alias("wavg")
            )
            .first()
        )
        return float(row["wavg"]) if row["wavg"] is not None else 0.0
    finally:
        e.unpersist()


def partition_community_quality(
    edges: DataFrame,
    assignments: DataFrame,
    lpa_iterations: int = 4,
    use_csr_kernel: bool = False,
) -> dict[str, float]:
    """Node-weighted average of per-partition (Q, Qds, conductance) over the
    community structure *within* each partition — the reference's metric
    pipeline shape: per partition, detect communities on the induced
    subgraph, score the division, then population-weight the averages
    (/root/reference/graph_partitioning/utils.py:245-321; wavg at 310-321).

    Divergence (declared): the reference detects communities with
    Infomap/Louvain subprocesses; the engine uses its own synchronous label
    propagation (T3) on the intra-partition edge set — one LPA run covers
    every partition at once because communities cannot cross partitions when
    cut edges are removed. Assigned nodes untouched by any intra edge become
    singleton communities (label = own id), as in the reference where every
    subgraph node belongs to some community.
    """
    from ..graph.labelprop import label_propagation

    pair = None
    assigned = assignments.filter(F.col("partition") >= 0).select("id", "partition")
    a_src = assigned.select(F.col("id").alias("src"), F.col("partition").alias("p_src"))
    a_dst = assigned.select(F.col("id").alias("dst"), F.col("partition").alias("p_dst"))
    intra = (
        edges.select("src", "dst", "weight")
        .join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("p_src") == F.col("p_dst"))
        .select("src", "dst", "weight", F.col("p_src").alias("partition"))
        .persist()
    )
    try:
        if use_csr_kernel:
            # block-local vectorized LPA on per-partition CSR blocks
            # (plans/csr.local_label_propagation) — exact-parity with the
            # distributed path (tests/test_csr.py), one Arrow call per
            # partition instead of lpa_iterations shuffles
            from ..plans.csr import build_csr_blocks, local_label_propagation

            blocks = build_csr_blocks(edges, assigned)
            labels = local_label_propagation(blocks, max_iter=lpa_iterations)
        else:
            labels, _ = label_propagation(
                intra.select("src", "dst", "weight"), max_iter=lpa_iterations
            )
        full = (
            assigned.join(labels.select("id", "label"), "id", "left")
            .select(
                "id", "partition", F.coalesce(F.col("label"), F.col("id")).alias("label")
            )
        )
        l_src = full.select(F.col("id").alias("src"), F.col("label").alias("la"))
        l_dst = full.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
        e = (
            intra.select("partition", "src", "dst", "weight")
            .join(l_src, "src")
            .join(l_dst, "dst")
        )
        pair = (
            e.select(
                "partition",
                F.least("la", "lb").alias("c1"),
                F.greatest("la", "lb").alias("c2"),
                "weight",
            )
            .groupBy("partition", "c1", "c2")
            .agg(F.sum("weight").alias("w"))
            .persist()
        )
        m_p = pair.groupBy("partition").agg(F.sum("w").alias("m"))
        sizes = full.groupBy("partition", "label").agg(F.count("*").alias("n"))
        intra_c = pair.filter(F.col("c1") == F.col("c2")).select(
            "partition", F.col("c1").alias("label"), F.col("w").alias("w_in")
        )
        cross = pair.filter(F.col("c1") != F.col("c2"))
        out_per = (
            cross.select("partition", F.col("c1").alias("label"), "w")
            .union(cross.select("partition", F.col("c2").alias("label"), "w"))
            .groupBy("partition", "label")
            .agg(F.sum("w").alias("w_out"))
        )
        comm = (
            sizes.join(intra_c, ["partition", "label"], "left")
            .join(out_per, ["partition", "label"], "left")
            .join(m_p, "partition", "left")
            .select(
                "partition",
                "n",
                F.coalesce(F.col("w_in"), F.lit(0.0)).alias("w_in"),
                F.coalesce(F.col("w_out"), F.lit(0.0)).alias("w_out"),
                F.coalesce(F.col("m"), F.lit(0.0)).alias("m"),
            )
        )
        d_c = F.when(
            F.col("n") > 1, 2.0 * F.col("w_in") / (F.col("n") * (F.col("n") - 1.0))
        ).otherwise(F.lit(0.0))
        vol = F.when(
            F.col("m") > 0,
            (2.0 * F.col("w_in") + F.col("w_out")) / (2.0 * F.col("m")),
        ).otherwise(F.lit(0.0))
        q_term = F.when(F.col("m") > 0, F.col("w_in") / F.col("m")).otherwise(
            F.lit(0.0)
        ) - vol * vol
        qds_term = F.when(F.col("m") > 0, F.col("w_in") / F.col("m")).otherwise(
            F.lit(0.0)
        ) * d_c - (vol * d_c) * (vol * d_c)
        cond_term = F.when(
            2.0 * F.col("w_in") + F.col("w_out") > 0,
            F.col("w_out") / (2.0 * F.col("w_in") + F.col("w_out")),
        ).otherwise(F.lit(0.0))
        per_part = comm.groupBy("partition").agg(
            F.sum(q_term).alias("q_pos"),
            F.sum(qds_term).alias("qds_pos"),
            F.avg(cond_term).alias("cond"),
            F.sum("n").alias("pop"),
        )
        # per-partition split penalty
        s1 = sizes.select(
            "partition", F.col("label").alias("c1"), F.col("n").alias("n1")
        )
        s2 = sizes.select(
            "partition", F.col("label").alias("c2"), F.col("n").alias("n2")
        )
        sp = (
            cross.join(s1, ["partition", "c1"])
            .join(s2, ["partition", "c2"])
            .join(m_p, "partition")
            .groupBy("partition")
            .agg(
                F.sum(
                    F.col("w") * F.col("w") / (F.col("m") * F.col("n1") * F.col("n2"))
                ).alias("sp")
            )
        )
        rows = (
            per_part.join(sp, "partition", "left")
            .select(
                "partition",
                "q_pos",
                (F.col("qds_pos") - F.coalesce(F.col("sp"), F.lit(0.0))).alias("qds"),
                "cond",
                "pop",
            )
            .collect()
        )
        total = sum(r["pop"] for r in rows)
        if not total:
            return {"q_wavg": 0.0, "qds_wavg": 0.0, "conductance_wavg": 0.0}
        return {
            "q_wavg": float(sum(r["q_pos"] * r["pop"] for r in rows) / total),
            "qds_wavg": float(sum(r["qds"] * r["pop"] for r in rows) / total),
            "conductance_wavg": float(sum(r["cond"] * r["pop"] for r in rows) / total),
        }
    finally:
        if pair is not None:
            pair.unpersist()
        intra.unpersist()


def nmi(
    labels_a: DataFrame, labels_b: DataFrame, max_cells: int = 1_000_000
) -> float:
    """Normalized mutual information between two labelings ``(id, label)``.

    Contingency table via groupBy (k_a × k_b rows collected to the driver —
    tiny for partition labelings), entropy arithmetic matching sklearn's
    arithmetic-mean NMI used at
    /root/reference/graph_partitioning/graph_partitioning.py:322-339. Pairs
    where either label < 0 are excluded (reference filters unassigned).
    ``max_cells`` hard-caps the collect: two community-scale labelings
    (LPA output × LPA output) can produce O(communities²) cells, which
    would OOM the driver — above the cap this raises instead.
    """
    joined = (
        labels_a.select("id", F.col("label").alias("la"))
        .join(labels_b.select("id", F.col("label").alias("lb")), "id")
        .filter((F.col("la") >= 0) & (F.col("lb") >= 0))
    )
    cont = joined.groupBy("la", "lb").agg(F.count("*").alias("c")).take(max_cells + 1)
    if len(cont) > max_cells:
        raise ValueError(
            f"nmi: contingency table exceeds max_cells={max_cells} — the "
            "inputs look community-scale, not partition-scale; aggregate "
            "labels first or raise max_cells only if the driver can hold it"
        )
    n = sum(r["c"] for r in cont)
    if n == 0:
        return 0.0
    from collections import defaultdict

    ra, rb = defaultdict(int), defaultdict(int)
    for r in cont:
        ra[r["la"]] += r["c"]
        rb[r["lb"]] += r["c"]
    mi = 0.0
    for r in cont:
        pij = r["c"] / n
        mi += pij * math.log(pij / ((ra[r["la"]] / n) * (rb[r["lb"]] / n)))
    ha = -sum((c / n) * math.log(c / n) for c in ra.values())
    hb = -sum((c / n) * math.log(c / n) for c in rb.values())
    denom = (ha + hb) / 2.0
    if denom <= 0:
        return 1.0 if mi == 0 else 0.0
    return float(mi / denom)


def fscore(
    predicted: DataFrame,
    actual: DataFrame,
    relabel: bool = True,
    max_cells: int = 1_000_000,
) -> dict[str, float]:
    """Weighted F1 of predicted vs actual labels, plus the improvement from
    the best label permutation (Hungarian on the k×k confusion matrix).

    Reference: ``fscores2`` (/root/reference/graph_partitioning/utils.py:869-925)
    — weighted-average per-class F1, then ``linear_sum_assignment`` on
    (1 − pairwise-F1) to find the best relabeling. k is small, so the
    assignment problem runs on the driver (pure-NumPy Hungarian below; no
    scipy dependency). ``max_cells`` hard-caps the contingency collect —
    community-scale labelings would otherwise build an O(communities²)
    driver table; above the cap this raises instead of OOMing.
    """
    joined = (
        predicted.select("id", F.col("label").alias("pred"))
        .join(actual.select("id", F.col("label").alias("act")), "id")
        .filter((F.col("pred") >= 0) & (F.col("act") >= 0))
    )
    cont = (
        joined.groupBy("pred", "act").agg(F.count("*").alias("c")).take(max_cells + 1)
    )
    if len(cont) > max_cells:
        raise ValueError(
            f"fscore: contingency table exceeds max_cells={max_cells} — the "
            "inputs look community-scale, not partition-scale; aggregate "
            "labels first or raise max_cells only if the driver can hold it"
        )
    if not cont:
        return {"fscore": 0.0, "fscore_relabelled": 0.0, "improvement": 0.0}
    import numpy as np

    preds = sorted({r["pred"] for r in cont})
    acts = sorted({r["act"] for r in cont})
    k = max(len(preds), len(acts))
    pi = {p: i for i, p in enumerate(preds)}
    ai = {a: i for i, a in enumerate(acts)}
    cm = np.zeros((k, k))
    for r in cont:
        cm[pi[r["pred"]], ai[r["act"]]] = r["c"]

    def weighted_f1(conf):
        n = conf.sum()
        f1s, weights = [], []
        for j in range(conf.shape[1]):
            tp = conf[j, j] if j < conf.shape[0] else 0.0
            support = conf[:, j].sum()
            predicted_j = conf[j, :].sum() if j < conf.shape[0] else 0.0
            prec = tp / predicted_j if predicted_j else 0.0
            rec = tp / support if support else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            f1s.append(f1)
            weights.append(support)
        return float(np.average(f1s, weights=weights)) if n else 0.0

    base_f1 = weighted_f1(cm)
    if not relabel:
        return {"fscore": base_f1, "fscore_relabelled": base_f1, "improvement": 0.0}

    perm = _hungarian_max(cm)
    relabelled = cm[perm, :]
    best_f1 = weighted_f1(relabelled)
    return {
        "fscore": base_f1,
        "fscore_relabelled": best_f1,
        "improvement": best_f1 - base_f1,
    }


def _hungarian_max(cost: "np.ndarray") -> list[int]:  # noqa: F821
    """Row permutation maximizing the trace of cost[perm, :].

    k ≤ ~10 in practice (num_partitions), so exhaustive search for k ≤ 9 and
    a greedy fallback beyond keep this dependency-free (the reference uses
    scipy's linear_sum_assignment, utils.py:922).
    """
    import itertools

    import numpy as np

    k = cost.shape[0]
    if k <= 9:
        best, best_perm = -1.0, list(range(k))
        for perm in itertools.permutations(range(k)):
            s = sum(cost[perm[j], j] for j in range(k))
            if s > best:
                best, best_perm = s, list(perm)
        return best_perm
    remaining = set(range(k))
    perm = [0] * k
    for j in np.argsort(-cost.max(axis=0)):
        i = max(remaining, key=lambda r: cost[r, j])
        perm[j] = i
        remaining.discard(i)
    inv = [0] * k
    for j, i in enumerate(perm):
        inv[j] = i
    return inv


def quality_suite(
    edges: DataFrame,
    assignments: DataFrame,
    num_partitions: int,
    vertices: DataFrame | None = None,
    loneliness_score_param: float = 1.2,
    community_metrics: bool = True,
) -> dict[str, float]:
    """The reference's headline metric row (graph-partitioning-fennel.ipynb
    cell 0) in one call: WASTE, CUT RATIO, EDGES CUT, TOTAL COMM VOLUME,
    Qds, CONDUCTANCE, RBSE, LONELINESS, plus modularity Q.

    Qds/conductance come from ``partition_community_quality`` (communities
    via in-engine LPA instead of the reference's Infomap subprocess — the
    declared substitution) when ``community_metrics`` is on, as does MAXPERM
    (``wavg_permanence`` — the published permanence closed form with LPA
    detection instead of the MaxPerm binary's internal maximizer,
    utils.py:602-665); the division-level Q/Qds/conductance of the partition
    assignment itself come from ``community_quality``. Of the reference's 12
    columns only NMI/F-score (need a second labeling — separate
    ``nmi``/``fscore`` calls) are not in this row."""
    out = {"waste": waste(assignments, num_partitions, vertices)}
    out.update(cut_metrics(edges, assignments))
    out["rbse"] = rbse(edges, assignments)
    out["loneliness"] = loneliness_wavg(
        edges, assignments, num_partitions, loneliness_score_param
    )
    out["modularity"] = modularity(edges, assignments)
    cq = community_quality(
        edges, assignments.select("id", F.col("partition").alias("label"))
    )
    out["qds"] = cq["qds"]
    out["conductance"] = cq["conductance"]
    if community_metrics:
        out.update(partition_community_quality(edges, assignments))
        out["maxperm_wavg"] = wavg_permanence(edges, assignments, num_partitions)
    return out
