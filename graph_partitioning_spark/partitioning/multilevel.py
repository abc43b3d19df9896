"""Multilevel graph partitioning: coarsen → partition → refine (F6 role).

The reference delegates high-quality *static* partitioning to the external
SCOTCH multilevel C solver (`/root/reference/graph_partitioning/partitioners/
scotch/scotch.py:15-56`, driver `scotch_partitioner.py:99-211`). The solver
binary is out of scope here, but the algorithm it implements is published —
the multilevel scheme of Karypis & Kumar ("A Fast and High Quality Multilevel
Scheme for Partitioning Irregular Graphs", SIAM J. Sci. Comput. 20(1), 1998):

1. **Coarsening** — rounds of heavy-edge matching (HEM) contract the graph
   until it is small; each contracted supervertex carries the total weight
   of the vertices inside it, and parallel edges merge by summing weights.
2. **Initial partitioning** — partition the small coarse graph well.
3. **Uncoarsening** — project the assignment back level by level, running a
   cheap local refinement at each level.

This module re-expresses that scheme Spark-first:

* HEM uses the standard one-round **handshake** variant of distributed
  greedy matching (each vertex proposes to its heaviest neighbor; a pair
  matches iff the proposals are mutual — the parallel-matching folklore used
  by distributed multilevel partitioners, e.g. ParMETIS-style coarsening).
  One round = one struct-max aggregation + one self-join; fully
  deterministic via the (weight DESC, id ASC) tie-break, so an external SQL
  engine can replay it exactly (the `hem_matching` gate query).
* Contraction is two joins + two grouped aggregations (edge merge, vertex
  weight roll-up). Self-loops — edges fully inside a supervertex — drop out
  of the coarse edge table: they can never be cut, and FENNEL's balance term
  sees their mass through the rolled-up vertex weights instead.
* Initial partitioning and per-level refinement are the existing FENNEL
  restream loop (`fennel_partition`), which already honors weighted
  vertices, warm-start `initial=` assignments, and `fixed=` vertices — so
  multilevel inherits checkpointing, inflow capping, and the web-scale
  shuffle path for free.

Scale shape: every coarsening round is O(m) join/agg work on a graph that
shrinks geometrically (each round removes `matched` vertices), so the whole
coarsening pyramid costs a small constant times the finest level — the same
profile as the C solver, but elastic across executors. No step collects
vertex state to the driver; the only driver-side values are per-round
counters (n, matched).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager, Counters
from ..graph.edges import symmetrize
from ..graph.iterutil import materialize, materialize_static, release
from .fennel import FennelConfig, _votes, fennel_partition, modular_initial


@dataclass
class MultilevelConfig:
    """Knobs for the coarsening pyramid; partitioning knobs live in the
    wrapped :class:`FennelConfig`."""

    #: stop coarsening once the vertex count is at or below this
    coarsen_to: int = 50_000
    #: hard cap on coarsening rounds (each round is one matching + contract)
    max_levels: int = 10
    #: stop coarsening when a round matches fewer than this fraction of the
    #: remaining vertices (star-like graphs match one pair per hub per
    #: round; grinding further wastes passes for no shrink)
    min_shrink: float = 0.05
    #: FENNEL restream passes for the per-level refinement sweep (the
    #: coarsest level uses the wrapped config's own num_iterations)
    refine_iterations: int = 1
    #: per-level refinement flavor: "boundary" (boundary-vertex-only FM
    #: gain sweeps — the Karypis-Kumar §4 refinement role; touches only
    #: vertices with cut edges, so per-level cost tracks the boundary
    #: size, not the level size) or "restream" (warm-started FENNEL passes
    #: over the whole level — the round-4 default). Boundary is the
    #: measured winner on BOTH graph families (BENCH.md round 5: planted
    #: 0.294 vs restream-refine 0.588; community-free web 0.651 vs 0.706,
    #: also beating 2-pass seeded restream's 0.665), hence the default.
    refine: str = "boundary"
    #: FM sweeps per level when refine="boundary" (early-stops on a sweep
    #: with zero admitted moves; the planted/web sweep curves plateau by
    #: ~6, BENCH.md round 5)
    boundary_sweeps: int = 6
    #: balance slack for boundary-move admission: a target partition may
    #: grow to (1+slack)·total_weight/k
    boundary_slack: float = 0.1
    #: "hem" (pairwise heavy-edge handshake — mesh/community graphs) or
    #: "lpa" (size-constrained label-propagation clustering — the ParHIP
    #: scheme; use for power-law/web graphs, where pairwise matching
    #: shrinks ~13%/round but LPA collapses leaf neighborhoods into hubs)
    coarsener: str = "hem"
    #: LPA coarsening rounds per level
    lpa_rounds: int = 2
    #: max cluster weight as a fraction of one partition's share
    #: (total_weight / k); keeps every supervertex small enough that the
    #: coarse graph remains balanceable
    lpa_cluster_cap: float = 0.5
    extra: dict[str, Any] = field(default_factory=dict)


def _priority(col, seed: int):
    """Deterministic proposal-scatter priority — portable arithmetic (two
    LCG steps over a bounded residue) that an external SQL engine computes
    bit-identically, the same trick as FENNEL's ``mod`` stream order.

    Why not the id itself: with equal edge weights an id tie-break makes
    every vertex propose to its lowest-id neighbor, proposals herd onto a
    few vertices, and the mutual-handshake matching collapses (measured: 0
    matched pairs on a 180-vertex planted-partition graph). A pseudorandom
    priority scatters proposals — the standard randomized
    distributed-matching remedy, made deterministic. The second multiply
    makes the additive per-phase ``seed`` nonlinear (a single LCG step
    shifts every priority equally, which barely changes the *ordering*
    between neighbors). All intermediates stay < 2^47, so 64-bit engines
    agree exactly.
    """
    step1 = ((col % 1000003) * 1103515245 + 12345 + seed) % 2147483648
    return (step1 * 48271) % 2147483648


def hem_matching(
    edges: DataFrame,
    seed: int = 0,
    phases: int = 4,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Deterministic heavy-edge handshake matching (one coarsening round).

    ``edges`` is a canonical undirected edge list (src < dst, weight).
    Each *phase*: every unmatched vertex proposes to its best unmatched
    neighbor under the total order (weight DESC, priority DESC, neighbor
    id ASC) — ``priority`` a seeded deterministic hash, see
    :func:`_priority`; a pair matches iff the proposals are mutual. A
    single handshake phase only matches ~n/avg-degree vertices on dense
    graphs (the chance a vertex is its own argmax's argmax is ~1/degree),
    so matched vertices leave and the remainder re-propose for a fixed
    ``phases`` count — the standard multi-phase scheme of parallel
    multilevel coarseners. Returns ``(lo, hi)`` pairs with lo < hi.

    ``exclude`` (optional, one ``id`` column) removes vertices from
    matching entirely — they ride through contraction as singleton
    supervertices. Used for fixed vertices: matching a fixed vertex into
    a free one would force the pair to the fixed side's partition before
    partitioning even runs (and two fixed vertices with different target
    partitions must never merge), so the multilevel driver keeps them
    uncontracted, mirroring SCOTCH_graphMapFixed's parttab semantics
    (reference scotch_partitioner.py:99-211).

    Runs exactly ``phases`` phases with no data-dependent early exit, so
    an external SQL engine can replay it as a fixed CTE chain (the
    ``hem_matching`` gate query); an exhausted phase just contributes
    nothing. Per phase: one struct-max aggregation (argmax inside
    whole-stage codegen, no window sort), one self-equi-join on the
    one-row-per-vertex proposal table, two anti-joins to retire matched
    endpoints — all O(m) and shuffle-partitioned, nothing driver-side.

    Each phase's matched pairs are *materialized* (iterutil.materialize —
    lineage truncated to a leaf, not merely cached): phase k+1's remaining
    set embeds phase k's matched table three times (the anti-join pair plus
    the union), so an un-truncated chain grows the logical plan ~3^phases
    and driver-side analysis alone was measured at 85s for a 200-vertex
    graph at 4 phases. With leaf matched tables the plan grows linearly.
    The returned frame is itself a materialized leaf (the per-phase leaves
    are released before returning, so direct callers never leak them); it
    is tracked on itself as ``_hem_phase_caches`` so the multilevel loop
    can release the one remaining state after contraction.
    """
    remaining = symmetrize(edges)
    if exclude is not None:
        ex = exclude.select("id")
        remaining = remaining.join(
            ex, remaining.src == ex.id, "left_anti"
        )
        ex2 = exclude.select("id")
        remaining = remaining.join(
            ex2, remaining.dst == ex2.id, "left_anti"
        )
    phase_caches: list[DataFrame] = []
    out: DataFrame | None = None
    for ph in range(phases):
        prop = remaining.groupBy(F.col("src").alias("id")).agg(
            F.max(
                F.struct(
                    F.col("weight").alias("w"),
                    _priority(F.col("dst"), seed * 101 + ph).alias("p"),
                    (-F.col("dst")).alias("nd"),
                )
            ).alias("b")
        ).select("id", (-F.col("b.nd")).alias("best"))
        a, b = prop.alias("a"), prop.alias("b")
        matched = materialize(
            a.join(
                b,
                (F.col("a.best") == F.col("b.id"))
                & (F.col("b.best") == F.col("a.id"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("lo"), F.col("a.best").alias("hi"))
        )
        phase_caches.append(matched)
        out = matched if out is None else out.unionByName(matched)
        if ph < phases - 1:
            mv = matched.select(
                F.explode(F.array("lo", "hi")).alias("id")
            )
            remaining = remaining.join(
                mv, remaining.src == mv.id, "left_anti"
            )
            mv2 = matched.select(
                F.explode(F.array("lo", "hi")).alias("id")
            )
            remaining = remaining.join(
                mv2, remaining.dst == mv2.id, "left_anti"
            )
    final = materialize(out)
    for c in phase_caches:
        release(c)
    final._hem_phase_caches = [final]  # released by multilevel_partition
    return final


def lpa_coarsen(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    rounds: int = 2,
    max_weight: float | None = None,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Cluster-coarsening map via size-constrained label propagation.

    Pairwise matching coarsens scale-free graphs terribly: a degree-d hub
    can match only one neighbor per round (measured: 13% shrink/round on
    the synthetic power-law link graph), so the pyramid never forms. The
    published remedy — ParHIP's size-constrained label propagation
    coarsening (Meyerhenke, Sanders & Schulz, "Partitioning Complex
    Networks via Size-constrained Clustering") — lets whole leaf
    neighborhoods collapse into their hub in one round, capped so no
    cluster outgrows a fraction of a partition.

    Semantics per round (all deterministic): every vertex's candidate
    label is the neighbor label with max total incident edge weight
    (ties: smaller label) — the T3 LPA vote re-used; switches into each
    target cluster are then admitted in (votes DESC, id ASC) order under
    *first-fit-prefix* semantics: the running prefix weight (including any
    already-rejected movers earlier in the order) must stay under
    ``max_weight``, so one oversized mover blocks every later mover for
    that target this round. This deliberately mirrors
    FennelConfig.inflow_cap_slack's inflow-cap discipline (and reuses the
    same per-target-partitioned window plan — no global sort); it
    under-admits relative to a per-mover fit check but never violates the
    cap, and blocked movers simply retry next round.

    ``exclude``: ids never switch and never receive members (their edges
    leave the vote join) — fixed vertices stay singleton supervertices.

    Returns ``vmap(id, super_id)`` covering every vertex of the level;
    ``super_id`` is the final label (a vertex id, purely as a cluster
    name). Labels do not chase chains — a label owner that itself moved
    elsewhere still names its old cluster, which is fine for contraction.
    """
    sym = symmetrize(edges)
    if exclude is not None:
        ex = exclude.select("id")
        sym = sym.join(ex, sym.src == ex.id, "left_anti")
        ex2 = exclude.select("id")
        sym = sym.join(ex2, sym.dst == ex2.id, "left_anti")
    # materialize: the per-round vote join embeds this static frame's plan;
    # truncating here keeps each round's driver-side analysis constant even
    # when the caller hands in a deep-lineage edge frame
    sym = materialize_static(sym)

    ids = symmetrize(edges).select(F.col("src").alias("id")).distinct()
    if vertices is not None:
        ids = ids.unionByName(vertices.select("id")).distinct()
    if vertices is not None:
        w = ids.join(vertices.select("id", "weight"), "id", "left").select(
            "id", F.coalesce("weight", F.lit(1.0)).alias("w")
        )
    else:
        w = ids.select("id", F.lit(1.0).alias("w"))
    labels = materialize(w.select("id", F.col("id").alias("label"), "w"))

    for _ in range(rounds):
        nbr = labels.select(
            F.col("id").alias("dst"), F.col("label").alias("cand")
        )
        votes = (
            sym.join(nbr, "dst")
            .groupBy("src", "cand")
            .agg(F.sum("weight").alias("votes"))
        )
        best = votes.groupBy(F.col("src").alias("id")).agg(
            F.max(F.struct(F.col("votes"), (-F.col("cand")).alias("nc"))).alias("b")
        ).select("id", F.col("b.votes").alias("votes"), (-F.col("b.nc")).alias("cand"))
        cur = labels.select("id", "label", "w")
        cand = (
            cur.join(best, "id", "left")
            .select(
                "id",
                "label",
                "w",
                F.coalesce("cand", "label").alias("cand"),
                F.coalesce("votes", F.lit(0.0)).alias("votes"),
            )
        )
        if max_weight is not None:
            sizes = labels.groupBy(F.col("label").alias("cand")).agg(
                F.sum("w").alias("size")
            )
            movers = cand.where(F.col("cand") != F.col("label")).join(
                sizes, "cand", "left"
            )
            wdw = (
                Window.partitionBy("cand")
                .orderBy(F.desc("votes"), F.asc("id"))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            admitted = movers.select(
                "id",
                "cand",
                (
                    F.coalesce("size", F.lit(0.0)) + F.sum("w").over(wdw)
                    <= F.lit(float(max_weight))
                ).alias("_ok"),
            )
            new_labels = (
                cand.join(admitted.select("id", "_ok"), "id", "left")
                .select(
                    "id",
                    F.when(F.coalesce("_ok", F.lit(False)), F.col("cand"))
                    .otherwise(F.col("label"))
                    .alias("label"),
                    "w",
                )
            )
        else:
            new_labels = cand.select("id", F.col("cand").alias("label"), "w")
        old = labels
        labels = materialize(new_labels)
        release(old)

    vmap = labels.select("id", F.col("label").alias("super_id"))
    release(sym)
    return vmap


def contract_map(
    edges: DataFrame,
    vmap: DataFrame,
    vertices: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Contract ``edges`` through ``vmap(id, super_id)``.

    Returns ``(coarse_edges, coarse_vertices)``: canonical (src < dst)
    coarse edges with parallel edges summed and intra-supervertex
    self-loops dropped; vertex weights rolled up (default 1.0 per fine
    vertex) so balance constraints survive contraction.
    """
    vmap_s = vmap.select(F.col("id").alias("src"), F.col("super_id").alias("_s"))
    vmap_d = vmap.select(F.col("id").alias("dst"), F.col("super_id").alias("_d"))
    coarse_edges = (
        edges.join(vmap_s, "src")
        .join(vmap_d, "dst")
        .where(F.col("_s") != F.col("_d"))
        .select(
            F.least("_s", "_d").alias("src"),
            F.greatest("_s", "_d").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )

    if vertices is not None:
        w = vmap.join(vertices.select("id", "weight"), "id", "left").select(
            "super_id", F.coalesce("weight", F.lit(1.0)).alias("weight")
        )
    else:
        w = vmap.select("super_id", F.lit(1.0).alias("weight"))
    coarse_vertices = w.groupBy(F.col("super_id").alias("id")).agg(
        F.sum("weight").alias("weight")
    )
    return coarse_edges, coarse_vertices


def contract_matching(
    edges: DataFrame,
    matching: DataFrame,
    vertices: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Contract ``matching`` pairs into supervertices.

    Returns ``(coarse_edges, coarse_vertices, vmap)`` — vmap maps every
    vertex of this level (edge endpoints plus any extra ids in
    ``vertices``) to ``min(lo, hi)`` for matched pairs, itself otherwise;
    contraction semantics as :func:`contract_map`.
    """
    ids = symmetrize(edges).select(F.col("src").alias("id")).distinct()
    if vertices is not None:
        ids = ids.unionByName(vertices.select("id")).distinct()
    pair_map = matching.select(
        F.col("lo").alias("super_id"),
        F.explode(F.array("lo", "hi")).alias("id"),
    )
    vmap = (
        ids.join(pair_map, "id", "left")
        .select("id", F.coalesce("super_id", "id").alias("super_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    coarse_edges, coarse_vertices = contract_map(edges, vmap, vertices)
    return coarse_edges, coarse_vertices, vmap


def multilevel_partition(
    edges: DataFrame,
    config: FennelConfig,
    ml: MultilevelConfig | None = None,
    fixed_assignments: DataFrame | None = None,
    checkpointer: CheckpointManager | None = None,
    resume: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Multilevel FENNEL: coarsen, partition the coarse graph, refine up.

    Drop-in alternative to :func:`fennel_partition` for *static* (whole
    graph available) partitioning — the role the reference fills with
    SCOTCH. The coarse graph is small enough that the restream loop can
    run to convergence cheaply; each uncoarsening level then runs
    ``ml.refine_iterations`` warm-started restream passes, which only move
    vertices that improve the score — the batch-synchronous analogue of
    the classic per-level KL/FM refinement sweep.

    ``fixed_assignments`` (id, partition) mirrors SCOTCH_graphMapFixed's
    parttab (reference scotch_partitioner.py:99-211): those vertices are
    excluded from matching (they ride through every level uncontracted,
    so their ids — and therefore their pins — survive verbatim), seed the
    coarse-level FENNEL as its ``initial``, and are frozen via ``fixed=``
    at the coarse solve and every refinement sweep.

    Returns ``(assignments(id, partition), info)``; ``info['levels']``
    records the pyramid (n, matched per round) and ``info['coarse']`` the
    coarse-level FENNEL info.

    ``checkpointer``: optional :class:`CheckpointManager` — the run saves
    a durable milestone after every coarsening level (current coarse
    graph + all vertex maps), after the coarse solve, and after every
    uncoarsening refinement (assignment + the vertex maps still below
    it). A killed run re-invoked with the same manager CONTINUES from the
    newest milestone: the expensive phases (matching/LPA rounds, the
    coarse solve, refinement sweeps) are never recomputed — only the
    cheap contract_map join/agg chain is replayed to rebuild the level
    edges from the caller's input. The pipeline is deterministic, so a
    resumed run's final assignments are bit-identical to an uninterrupted
    one (pinned by tests/test_resume.py). Config must match the
    checkpoint (k / coarsener / refine) — mismatches raise.
    """
    ml = ml or MultilevelConfig()
    spark = edges.sparkSession
    cur_edges = edges.select("src", "dst", "weight").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cur_verts: DataFrame | None = None
    pyramid: list[tuple[DataFrame, DataFrame, DataFrame | None]] = []
    level_stats: list[dict[str, Any]] = []
    assign: DataFrame | None = None
    coarse_info: dict[str, Any] = {}
    coarse_n: int | None = None
    resumed_phase: str | None = None

    def _save(step: int, states: dict[str, DataFrame], phase: str, **extra):
        if checkpointer is None:
            return
        params = {
            "algorithm": "multilevel",
            "k": config.num_partitions,
            "coarsener": ml.coarsener,
            "refine": ml.refine,
            "levels": level_stats,
            "phase": phase,
        }
        params.update(extra)
        checkpointer.save(step, states, Counters(), params=params)

    mf = None
    if checkpointer is not None and resume:
        mf = checkpointer.latest_manifest()
        if mf is not None and mf.get("params", {}).get("algorithm") != "multilevel":
            mf = None
    if mf is not None:
        params = mf["params"]
        for pname, want in (
            ("k", config.num_partitions),
            ("coarsener", ml.coarsener),
            ("refine", ml.refine),
        ):
            have = params.get(pname)
            if have is not None and have != want:
                raise ValueError(
                    f"checkpoint was written with {pname}={have!r} but the "
                    f"resume config has {pname}={want!r}"
                )
        states = checkpointer.load_states(spark, mf)
        level_stats = [dict(d) for d in params.get("levels", [])]
        resumed_phase = params["phase"]
        n_vmaps = int(params.get("n_vmaps", 0))
        # Rebuild the pyramid from the saved vertex maps: matchings / LPA
        # rounds (the expensive coarsening work) are never recomputed;
        # each level's edges come back via the cheap contract_map
        # join/agg chain from the caller's input edges.
        lvl_e: DataFrame = cur_edges
        lvl_v: DataFrame | None = None
        for i in range(n_vmaps):
            vm = materialize(states[f"vmap_{i}"])
            pyramid.append((vm, lvl_e, lvl_v))
            if i + 1 < n_vmaps or resumed_phase == "coarsen":
                ce, cv = contract_map(lvl_e, vm, lvl_v)
                lvl_e, lvl_v = materialize(ce), materialize(cv)
        if resumed_phase == "coarsen":
            # prefer the saved coarse graph over the rebuilt chain's tail
            if n_vmaps:
                release(lvl_e)
                if lvl_v is not None:
                    release(lvl_v)
            cur_edges = materialize(states["cur_edges"])
            cur_verts = (
                materialize(states["cur_verts"]) if "cur_verts" in states else None
            )
            n = int(params["n_remaining"])
        else:  # "coarse_solved" or "uncoarsen"
            assign = materialize(states["assignments"])
            coarse_info = {"resumed": True}
            coarse_n = params.get("coarse_n")
            n = int(coarse_n or 0)
    else:
        n = symmetrize(cur_edges).select("src").distinct().count()

    total_w: float | None = None
    while assign is None and n > ml.coarsen_to and len(pyramid) < ml.max_levels:
        if ml.coarsener == "lpa":
            if total_w is None:
                if cur_verts is not None:
                    total_w = float(
                        cur_verts.agg(F.sum("weight")).first()[0] or 0.0
                    )
                else:
                    total_w = float(n)
            cap = ml.lpa_cluster_cap * total_w / config.num_partitions
            vmap = lpa_coarsen(
                cur_edges,
                cur_verts,
                rounds=ml.lpa_rounds,
                max_weight=cap,
                exclude=fixed_assignments,
            )
            n_coarse = vmap.select("super_id").distinct().count()
            matched = n - n_coarse
            if matched < ml.min_shrink * n:
                release(vmap)
                break
            coarse_edges, coarse_verts = contract_map(cur_edges, vmap, cur_verts)
            matching = None
        else:
            matching = hem_matching(
                cur_edges, seed=len(pyramid), exclude=fixed_assignments
            )
            matched = matching.count()  # union of per-phase leaves — cheap
            if matched < ml.min_shrink * n:
                for c in getattr(matching, "_hem_phase_caches", []):
                    release(c)
                break
            coarse_edges, coarse_verts, vmap = contract_matching(
                cur_edges, matching, cur_verts
            )
        # Truncate lineage at EVERY level boundary (iterutil.materialize,
        # not persist): level k's contraction references level k−1's edge
        # table several times (vertex set, both join sides, the weight
        # roll-up), so a merely-cached pyramid grows the logical plan
        # multiplicatively and driver-side analysis dominates within 3-4
        # levels (measured on a 180-vertex graph: matching 3.6s → 372s by
        # level 3 when only persisted). With leaf level states every
        # level's planning cost is constant.
        vmap_m = materialize(vmap)
        coarse_edges = materialize(coarse_edges)
        coarse_verts = materialize(coarse_verts)
        # only now is nothing lazy left referencing the coarsener's state
        if ml.coarsener == "lpa":
            release(vmap)  # lpa_coarsen's materialized label state
        else:
            vmap.unpersist()  # drop contract_matching's internal cache
        pyramid.append((vmap_m, cur_edges, cur_verts))
        level_stats.append({"n": n, "matched": matched})
        if matching is not None:
            for c in getattr(matching, "_hem_phase_caches", []):
                release(c)
        cur_edges, cur_verts = coarse_edges, coarse_verts
        n -= matched
        _save(
            len(pyramid),
            {
                "cur_edges": cur_edges,
                "cur_verts": cur_verts,
                **{f"vmap_{i}": pyramid[i][0] for i in range(len(pyramid))},
            },
            "coarsen",
            n_vmaps=len(pyramid),
            n_remaining=n,
        )

    fixed_ids = (
        fixed_assignments.select("id") if fixed_assignments is not None else None
    )
    solved_here = assign is None
    # Seed the coarse solve with the balanced modular cold start
    # (modular_initial's docstring: the batch-synchronous relaxation herds
    # from an UNASSIGNED start because first assignments bypass the inflow
    # cap — on the weighted coarse graph the rolled-up vote masses dwarf
    # α·size and one hub partition swallowed 57% of the graph, measured at
    # 200k pages / waste 3.69 projected). Seeded, every change is a capped
    # *move* and balance holds through projection. Fixed vertices override
    # their seed rows and stay frozen via ``fixed=``.
    if solved_here:
        if cur_verts is not None:
            coarse_ids = cur_verts.select("id")
        else:
            coarse_ids = symmetrize(cur_edges).select(
                F.col("src").alias("id")
            ).distinct()
        seed = modular_initial(coarse_ids, config.num_partitions)
        if fixed_assignments is not None:
            seed = seed.join(
                fixed_assignments.select("id"), "id", "left_anti"
            ).unionByName(fixed_assignments.select("id", "partition"))
        assign, coarse_info = fennel_partition(
            cur_edges,
            config,
            vertices=cur_verts,
            initial=seed,
            fixed=fixed_ids,
        )
        coarse_n = n
        _save(
            1000,
            {
                "assignments": assign,
                **{f"vmap_{i}": pyramid[i][0] for i in range(len(pyramid))},
            },
            "coarse_solved",
            n_vmaps=len(pyramid),
            coarse_n=coarse_n,
        )

        # The coarse solve's result is a materialized leaf; the
        # coarsest-level inputs are dead from here on. With a pyramid they
        # are materialized states (release frees the checkpoint RDD); with
        # no coarsening, cur_edges is still the initial persisted
        # projection — unpersist it.
        if pyramid:
            release(cur_edges)
            if cur_verts is not None:
                release(cur_verts)
        else:
            cur_edges.unpersist()

    if not solved_here and not pyramid:
        cur_edges.unpersist()  # resumed past the solve with no levels left

    refine_cfg = replace(config, num_iterations=ml.refine_iterations)
    for j in range(len(pyramid) - 1, -1, -1):
        vmap, lvl_edges, lvl_verts = pyramid[j]
        prev_assign = assign
        projected = (
            vmap.join(
                assign.withColumnRenamed("id", "super_id"), "super_id"
            ).select("id", "partition")
        )
        if ml.refine == "boundary" and ml.boundary_sweeps > 0:
            # refine_boundary materializes the projection as its first
            # step, so releasing vmap below never strands the result
            assign, _ = refine_boundary(
                lvl_edges,
                projected,
                config.num_partitions,
                slack=ml.boundary_slack,
                sweeps=ml.boundary_sweeps,
                vertices=lvl_verts,
                fixed=fixed_ids,
            )
        elif ml.refine == "restream" and ml.refine_iterations > 0:
            assign, _ = fennel_partition(
                lvl_edges,
                refine_cfg,
                vertices=lvl_verts,
                initial=projected,
                fixed=fixed_ids,
            )
        else:
            # Materialize BEFORE releasing vmap: `projected` is a lazy
            # join over vmap's checkpoint blocks — releasing first would
            # free them under the returned frame
            # (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on its first action).
            assign = materialize(projected)
        release(prev_assign)
        release(vmap)
        release(lvl_edges)
        if lvl_verts is not None:
            release(lvl_verts)
        if j > 0:
            _save(
                1000 + (len(level_stats) - j),
                {
                    "assignments": assign,
                    **{f"vmap_{i}": pyramid[i][0] for i in range(j)},
                },
                "uncoarsen",
                n_vmaps=j,
                coarse_n=coarse_n,
            )

    info = {
        "levels": level_stats,
        "coarse_n": coarse_n if coarse_n is not None else n,
        "coarse": coarse_info,
    }
    if resumed_phase is not None:
        info["resumed_from"] = resumed_phase
    return assign, info


def refine_boundary(
    edges: DataFrame,
    assign: DataFrame,
    k: int,
    slack: float = 0.1,
    sweeps: int = 2,
    vertices: DataFrame | None = None,
    fixed: DataFrame | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Boundary-vertex-only FM refinement sweeps (Karypis & Kumar §4).

    The classic multilevel win comes from *local* refinement at each
    uncoarsening level: only vertices on the cut boundary can improve the
    edge-cut, so each sweep touches the boundary, not the graph. The
    batch-synchronous sweep (all deterministic, no driver-side state):

    1. neighbor-vote join (`fennel._votes`, weight≤0→1 — the J1 rule):
       per (vertex, partition) incident vote mass; only vertices with ≥1
       assigned neighbor appear, and only those with votes OUTSIDE their
       own partition can have positive gain — the boundary set.
    2. gain = best external vote mass − internal vote mass (the FM gain:
       moving v from A to argmax-B changes the weighted cut by exactly
       −gain). Ties on vote mass break to the smaller partition id.
    3. balance-capped admission: movers are admitted per target partition
       in (gain DESC, id ASC) order while the target's weight stays under
       (1+slack)·total_weight/k — the same first-fit-prefix window
       discipline as lpa_coarsen / FENNEL's inflow cap, one
       per-target-partitioned window, no global sort.
    4. apply admitted moves; stop early when a sweep admits nothing.

    Every sweep is one vote shuffle + one window — O(m + boundary) —
    versus a full restream pass's superstep loop over all micro-batches.
    ``fixed`` ids never move. Returns (assignments, info) where
    ``info['moves']`` lists admitted-move counts per sweep and
    ``info['gain_admitted']`` the summed admitted gain.
    """
    # materialize: each sweep's vote join embeds this static frame's plan
    sym = materialize_static(symmetrize(edges))
    w_col = (
        vertices.select("id", F.col("weight").alias("_w"))
        if vertices is not None
        else None
    )
    if vertices is not None:
        total_w = float(vertices.agg(F.sum("weight")).first()[0] or 0.0)
    else:
        total_w = float(
            sym.select("src").distinct().count()
        )
    capacity = (1.0 + slack) * total_w / k

    state = materialize(assign.select("id", "partition"))
    moves: list[int] = []
    gains: list[float] = []
    for _ in range(sweeps):
        votes = _votes(sym, state, salt_buckets=1)
        cur = state.select("id", F.col("partition").alias("p"))
        agg = (
            votes.join(cur, "id")
            .groupBy("id", "p")
            .agg(
                F.coalesce(
                    F.max(
                        F.when(F.col("partition") == F.col("p"), F.col("votes"))
                    ),
                    F.lit(0.0),
                ).alias("int_w"),
                F.max(
                    F.when(
                        F.col("partition") != F.col("p"),
                        F.struct(
                            F.col("votes").alias("w"),
                            (-F.col("partition")).alias("np"),
                        ),
                    )
                ).alias("best"),
            )
        )
        movers = agg.filter(
            F.col("best").isNotNull() & (F.col("best.w") > F.col("int_w"))
        ).select(
            "id",
            F.col("p").alias("from_p"),
            (-F.col("best.np")).cast("int").alias("to_p"),
            (F.col("best.w") - F.col("int_w")).alias("gain"),
        )
        if fixed is not None:
            movers = movers.join(fixed.select("id"), "id", "left_anti")
        if w_col is not None:
            movers = movers.join(w_col, "id", "left").select(
                "id", "from_p", "to_p", "gain",
                F.coalesce("_w", F.lit(1.0)).alias("w"),
            )
            sizes = (
                cur.join(w_col, "id", "left")
                .groupBy(F.col("p").alias("to_p"))
                .agg(F.sum(F.coalesce("_w", F.lit(1.0))).alias("size"))
            )
        else:
            movers = movers.withColumn("w", F.lit(1.0))
            sizes = cur.groupBy(F.col("p").alias("to_p")).agg(
                F.count("*").cast("double").alias("size")
            )
        wdw = (
            Window.partitionBy("to_p")
            .orderBy(F.desc("gain"), F.asc("id"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        admitted = (
            movers.join(sizes, "to_p", "left")
            .withColumn(
                "_ok",
                F.coalesce("size", F.lit(0.0)) + F.sum("w").over(wdw)
                <= F.lit(float(capacity)),
            )
            .filter(F.col("_ok"))
            .select("id", "to_p", "gain")
        )
        new_state = (
            state.join(admitted.select("id", "to_p"), "id", "left")
            .select(
                "id",
                F.coalesce("to_p", "partition").cast("int").alias("partition"),
            )
        )
        prev = state
        state = materialize(new_state)
        stats = admitted.agg(
            F.count("*").alias("n"), F.sum("gain").alias("g")
        ).first()
        release(prev)
        n_moved = int(stats["n"] or 0)
        moves.append(n_moved)
        gains.append(float(stats["g"] or 0.0))
        if n_moved == 0:
            break
    release(sym)
    return state, {"moves": moves, "gain_admitted": sum(gains)}
