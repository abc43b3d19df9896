"""FENNEL / LDG balanced streaming partitioning as DataFrame supersteps.

Semantics matched to the reference kernel
(/root/reference/graph_partitioning/fennel.pyx):

- vote mass (J1): for node v and partition p, ``votes[p] = Σ w(v,u)`` over
  neighbors u with ``partition[u] ≥ 0``; weights ≤ 0 coerced to 1.0
  (fennel.pyx:19-38).
- FENNEL score: ``votes[p] − α·size[p]``, where size is the *weighted*
  occupancy (bincount_assigned, utils.py:107-118); a node's previous
  partition gets ``+α`` credit (fennel.pyx:83-87,102-104) — removing the
  node before deciding to re-add it.
- argmax with first-index tie-break: strict ``>`` scan from partition 0
  (fennel.pyx:89-107) → smallest partition id wins ties.
- degree-0 nodes are deferred and placed into the smallest partition
  (fennel.pyx:133-148).
- α schedule: ``α = m·k/n²`` recomputed from the (sub)graph being
  partitioned (graph_partitioning.py:60,579-586); ``one_shot_alpha``
  override supported (graph_partitioning.py:62-63).
- LDG variant: ``votes[p] · (capacity − size[p] − w(v))`` with
  ``capacity = Σw/k`` (graph-partitioning-ldg.ipynb cell 2); no previous-
  partition credit, same tie-break.

Execution model — the one deliberate divergence: the reference streams
nodes one at a time, mutating ``assignments``/sizes in place, and restreams
``num_iterations`` times. A distributed engine cannot stream sequentially,
so each restream iteration here processes the unfixed nodes in
``micro_batches`` deterministic id-hash buckets; within a bucket all nodes
decide *synchronously* against the assignment snapshot, then sizes are
refreshed before the next bucket. This is exactly the reference's own
``restream_batches`` arrival mode (graph_partitioning.py:462-519) promoted
to the partitioner's inner loop, and it converges to the same fixed-point
behavior the reference measures (metrics distributions, not per-node
placements — which are order-dependent even between two reference runs
with different arrival files).

Scale notes:
- The votes join shuffles edges (src,dst,weight both directions) against
  the (id, partition) table — the same J1 shape PageRank uses. Map-side
  partial aggregation pre-combines hub traffic; AQE skew-join splits the
  残り. ``salt_buckets > 0`` additionally salts the assignment side
  explicitly for power-law hubs (north-star requirement).
- Candidate pruning: a node's best partition is either one a neighbor
  votes for, its previous partition (+α credit), or the globally smallest
  partition (the best zero-vote score). So each node scores
  O(assigned-neighbor-partitions) candidates, never k — the n×k candidate
  cross-join a naive translation would do never materializes.
- Sizes are k rows — collected to the driver and broadcast back as a
  literal map each bucket step (k ≤ hundreds; cost is nil).
- Assignment state is localCheckpoint'ed each bucket step (constant-size
  plans) and durably checkpointed per restream iteration when a
  CheckpointManager is supplied (resume mid-run).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager, Counters
from ..graph.edges import symmetrize
from ..graph.iterutil import materialize, release


@dataclass
class FennelConfig:
    num_partitions: int
    num_iterations: int = 5
    micro_batches: int = 8
    alpha: float | None = None          # None → m·k/n² recomputed per run
    strategy: str = "fennel"            # "fennel" | "ldg"
    salt_buckets: int = 0               # 0 → rely on AQE skew handling
    converge_early: bool = True
    checkpoint_every: int = 1           # restream iterations between durable checkpoints
    foaf: bool = False                  # friend-of-a-friend lonely-node pass (F4)
    # micro-batch order (F11): "hash" (default), "mod" (id+seed mod buckets —
    # portable arithmetic an external SQL oracle can reproduce exactly),
    # "degree_hl" / "leverage_hl" (high-first centrality buckets)
    bucket_by: str = "hash"
    bucket_seed: int = 0                # varies the stream order (best-of-N runs)
    extra: dict[str, Any] = field(default_factory=dict)


def _bucket_expr(id_col, config: FennelConfig):
    """Deterministic micro-batch bucket as a pure expression over the id.

    Being id-computable (no join) lets the superstep filter the *edge* table
    to the active bucket's sources for free — see the votes pruning in the
    main loop. "mod" is plain modular arithmetic so a non-Spark SQL oracle
    (the driver's DuckDB gate) can replay the exact bucket schedule.
    """
    if config.bucket_by == "mod":
        return F.pmod(id_col + F.lit(config.bucket_seed), F.lit(config.micro_batches)).cast("int")
    if config.bucket_seed == 0:
        return F.pmod(F.xxhash64(id_col), F.lit(config.micro_batches)).cast("int")
    return F.pmod(
        F.xxhash64(id_col, F.lit(config.bucket_seed)), F.lit(config.micro_batches)
    ).cast("int")


def _sizes_map(assignments: DataFrame, weights: DataFrame | None, k: int) -> list[float]:
    a = assignments.filter(F.col("partition") >= 0)
    if weights is not None:
        a = a.join(weights, "id", "left").withColumn(
            "w", F.coalesce(F.col("weight"), F.lit(1.0))
        )
    else:
        a = a.withColumn("w", F.lit(1.0))
    rows = a.groupBy("partition").agg(F.sum("w").alias("s")).collect()
    sizes = [0.0] * k
    for r in rows:
        sizes[r["partition"]] = float(r["s"])
    return sizes


def _votes(sym_edges: DataFrame, assignments: DataFrame, salt_buckets: int) -> DataFrame:
    """(id, partition, votes) for every node with ≥1 assigned neighbor."""
    nbr = assignments.filter(F.col("partition") >= 0).select(
        F.col("id").alias("dst"), F.col("partition")
    )
    e = sym_edges.withColumn(
        "w", F.when(F.col("weight") <= 0.0, F.lit(1.0)).otherwise(F.col("weight"))
    )
    if salt_buckets > 1:
        # explicit hub salting: replicate the assignment side per salt bucket,
        # spread each hub's edge rows across buckets by src hash
        salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        nbr = nbr.withColumn("_salt", salts)
        e = e.withColumn("_salt", F.pmod(F.xxhash64("src"), F.lit(salt_buckets)).cast("int"))
        joined = e.join(nbr, ["dst", "_salt"])
    else:
        joined = e.join(nbr, "dst")
    return joined.groupBy(F.col("src").alias("id"), "partition").agg(
        F.sum("w").alias("votes")
    )


def fennel_partition(
    edges: DataFrame,
    config: FennelConfig,
    vertices: DataFrame | None = None,
    initial: DataFrame | None = None,
    fixed: DataFrame | None = None,
    checkpointer: CheckpointManager | None = None,
    resume: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Partition the canonical undirected ``edges`` into k balanced parts.

    ``vertices``: optional (id, weight) node weights (default 1.0).
    ``initial``: optional starting ``(id, partition)`` (e.g. a prediction
    model); missing/−1 rows start unassigned.
    ``fixed``: optional (id) set whose assignment in ``initial`` is frozen
    (the reference's ``fixed`` vector, fennel.pyx:128-131).

    Returns (assignments(id, partition), info).
    """
    spark = edges.sparkSession
    k = config.num_partitions

    sym = symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    all_ids = (
        sym.select(F.col("src").alias("id")).distinct()
    )
    if vertices is not None:
        all_ids = all_ids.join(vertices.select("id"), "id", "full").select("id").distinct()
    weights = (
        vertices.select("id", "weight") if vertices is not None else None
    )

    n = all_ids.count()
    m = edges.count()
    if n == 0:
        return spark.createDataFrame([], "id long, partition int"), {
            "iterations": 0, "alpha": 0.0, "counters": {}
        }
    alpha = config.alpha if config.alpha is not None else (m * k) / (n * n)
    if config.strategy == "ldg":
        if weights is not None:
            total_w = all_ids.join(weights, "id", "left").agg(
                F.sum(F.coalesce(F.col("weight"), F.lit(1.0)))
            ).first()[0]
        else:
            total_w = float(n)
        capacity = total_w / k
    else:
        capacity = None

    # fixed / initial state
    if initial is not None:
        # validate up front: a caller-supplied assignment (or stale
        # checkpoint) with partition ids ≥ k would otherwise surface as an
        # IndexError deep inside the bucket loop's sizes arithmetic
        bad = initial.filter(F.col("partition") >= k).limit(1).count()
        if bad:
            raise ValueError(
                f"initial assignment contains partition ids >= num_partitions={k}; "
                "was the checkpoint written with a different k?"
            )
        state = all_ids.join(initial.select("id", "partition"), "id", "left").select(
            "id", F.coalesce(F.col("partition"), F.lit(-1)).alias("partition")
        )
    else:
        state = all_ids.select("id", F.lit(-1).alias("partition"))
    if fixed is not None:
        fixed_ids = fixed.select("id", F.lit(True).alias("fixed"))
        state = state.join(fixed_ids, "id", "left").select(
            "id", "partition", F.coalesce(F.col("fixed"), F.lit(False)).alias("fixed")
        )
    else:
        state = state.withColumn("fixed", F.lit(False))
    # deterministic micro-batch bucket per node
    # degree-0 nodes are deferred out of the stream entirely (the reference
    # skips them and places them last, fennel.pyx:133-137) — otherwise every
    # one of them would chase ``best_empty`` during the iterations
    with_edges = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "_has_edge", F.lit(True)
    )
    state = (
        state.join(with_edges, "id", "left")
        .withColumn("has_edge", F.coalesce(F.col("_has_edge"), F.lit(False)))
        .drop("_has_edge")
    )
    if config.bucket_by in ("degree_hl", "leverage_hl"):
        # F11 DEGREE_HL / LEVERAGE_HL: stream high-centrality nodes first —
        # bucket 0 gets the highest slice (reference reorder schemes,
        # graph_partitioning/utils.py:999-1008 degree and :1010-1061
        # leverage centrality high-low). Global ntile is a single-task sort
        # of (id, score) pairs only — acceptable for the opt-in reorder
        # modes; the default hash bucketing has no such point.
        if config.bucket_by == "leverage_hl":
            from ..graph.centrality import leverage_centrality

            score = leverage_centrality(edges).select(
                "id", F.col("leverage").alias("_score")
            )
        else:
            score = sym.groupBy(F.col("src").alias("id")).agg(
                F.count("*").cast("double").alias("_score")
            )
        state = (
            state.join(score, "id", "left")
            .withColumn("_score", F.coalesce(F.col("_score"), F.lit(0.0)))
            .withColumn(
                "bucket",
                F.ntile(config.micro_batches).over(
                    Window.orderBy(F.desc("_score"), F.asc("id"))
                ) - 1,
            )
            .drop("_score")
        )
    else:
        state = state.withColumn("bucket", _bucket_expr(F.col("id"), config))
    state = state.withColumn("_changed", F.lit(False))

    counters = Counters()
    start_iter = 0
    if checkpointer is not None and resume:
        manifest = checkpointer.latest_manifest()
        if manifest is not None and manifest.get("params", {}).get("algorithm") == "fennel":
            start_iter = manifest["superstep"]
            counters = Counters.from_dict(manifest["counters"])
            state = checkpointer.load_states(spark, manifest)["assignments"]
    state = materialize(state)

    deg_stats = (
        sym.groupBy("src").agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("mx"), F.avg("d").alias("av")).first()
    )
    counters.skew_ratio = float(deg_stats["mx"]) / max(float(deg_stats["av"]), 1e-12)

    node_w = (
        F.coalesce(F.col("node_weight"), F.lit(1.0))
        if weights is not None
        else F.lit(1.0)
    )

    import os as _os
    import time as _time

    _debug = bool(_os.environ.get("SPARK_GRAFT_DEBUG"))
    it = start_iter
    changed_last = -1
    while it < config.num_iterations:
        it += 1
        changed_this_iter = 0
        for b in range(config.micro_batches):
            _t0 = _time.time()
            sizes = _sizes_map(state, weights, k)
            _t1 = _time.time()
            # best zero-vote partition: smallest size, smallest index on ties
            best_empty = min(range(k), key=lambda p: (sizes[p], p))

            movable = state.filter(
                (~F.col("fixed")) & (F.col("bucket") == b) & F.col("has_edge")
            )
            # votes pruning: only bucket-b movable nodes consume votes, so
            # restrict the vote aggregation's *input edges* to that bucket's
            # sources BEFORE the join+agg — otherwise every bucket step pays
            # the full-graph shuffle and discards (micro_batches−1)/micro of
            # it (Catalyst cannot push the bucket predicate through the
            # aggregation). For id-computable bucketings this is a free
            # filter on the cached edge table (no extra shuffle); fixed
            # nodes sharing the bucket still aggregate — the movable join
            # below discards those few rows, which is far cheaper than a
            # semi-join shuffle to exclude them. Centrality bucketings fall
            # back to a semi-join against the movable ids.
            if config.bucket_by in ("hash", "mod"):
                active_edges = sym.filter(_bucket_expr(F.col("src"), config) == b)
            else:
                active_edges = sym.join(
                    movable.select(F.col("id").alias("src")), "src", "left_semi"
                )
            votes = _votes(active_edges, state, config.salt_buckets).select(
                "id", F.col("partition").alias("vp"), "votes"
            )
            cand = movable.join(votes, "id", "left").select(
                "id",
                F.col("partition").alias("prev"),
                F.coalesce(F.col("vp"), F.lit(best_empty)).alias("cand"),
                F.coalesce(F.col("votes"), F.lit(0.0)).alias("votes"),
            )
            # add prev partition + best-empty as explicit candidates (0 votes
            # unless the votes join already produced them — dedup keeps max)
            extra_prev = movable.filter(F.col("partition") >= 0).select(
                "id", F.col("partition").alias("prev"),
                F.col("partition").alias("cand"), F.lit(0.0).alias("votes"),
            )
            extra_empty = movable.select(
                "id", F.col("partition").alias("prev"),
                F.lit(best_empty).alias("cand"), F.lit(0.0).alias("votes"),
            )
            cand = (
                cand.unionByName(extra_prev).unionByName(extra_empty)
                .groupBy("id", "prev", "cand")
                .agg(F.max("votes").alias("votes"))
            )
            if weights is not None:
                cand = cand.join(
                    weights.select("id", F.col("weight").alias("node_weight")), "id", "left"
                )

            size_arr = F.array(*[F.lit(s) for s in sizes])
            size_of_cand = F.element_at(size_arr, F.col("cand").cast("int") + 1)
            if config.strategy == "ldg":
                score = F.col("votes") * (F.lit(capacity) - size_of_cand - node_w)
            else:
                score = (
                    F.col("votes")
                    - F.lit(alpha) * size_of_cand
                    + F.when(F.col("cand") == F.col("prev"), F.lit(alpha)).otherwise(F.lit(0.0))
                )
            pick = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("cand"))
            decided = (
                cand.withColumn("score", score)
                .withColumn("rn", F.row_number().over(pick))
                .filter(F.col("rn") == 1)
                .select("id", F.col("cand").alias("new_partition"), "prev")
            )
            _t2 = _time.time()
            # one materialization per superstep: the changed flag rides along
            # so counting it afterwards hits the cached state, not the join
            new_state = materialize(
                state.join(decided, "id", "left").select(
                    "id",
                    F.coalesce(F.col("new_partition"), F.col("partition")).alias("partition"),
                    "fixed",
                    "bucket",
                    "has_edge",
                    F.coalesce(
                        F.col("new_partition") != F.col("prev"), F.lit(False)
                    ).alias("_changed"),
                )
            )
            _t3 = _time.time()
            changed = new_state.filter(F.col("_changed")).count()
            if _debug:
                print(
                    f"[fennel] iter={it} bucket={b} changed={changed} "
                    f"sizes={_t1 - _t0:.2f} build={_t2 - _t1:.2f} "
                    f"mat={_t3 - _t2:.2f} cnt={_time.time() - _t3:.2f}",
                    flush=True,
                )
            changed_this_iter += changed
            counters.edges_scanned += m * 2
            counters.messages_exchanged += changed
            release(state)
            state = new_state

        if checkpointer is not None and (
            it % config.checkpoint_every == 0 or it == config.num_iterations
        ):
            checkpointer.save(
                it,
                {"assignments": state},
                counters,
                params={
                    "algorithm": "fennel",
                    "strategy": config.strategy,
                    "alpha": alpha,
                    "k": k,
                    "changed": changed_this_iter,
                },
            )
        changed_last = changed_this_iter
        if config.converge_early and changed_this_iter == 0:
            break

    # singleton placement (degree-0, still unassigned): the reference
    # re-finds the min-size partition after *each* placement
    # (fennel.pyx:142-148). Sizes are k scalars, so the greedy min-fill is
    # simulated exactly on the driver with a heap over (size, partition) —
    # ties break to the smallest partition id, matching
    # ``parts.index(min(parts))``. Singletons are consumed in ascending-id
    # order (our canonical stream order). The collect is bounded by the
    # degree-0 node count — at web scale isolated vertices are filtered at
    # extraction (P7), so this set is small by construction.
    lonely = state.filter(F.col("partition") < 0)
    if lonely.limit(1).count() > 0:
        import heapq

        if weights is not None:
            lonely_w = lonely.join(
                weights.select("id", F.col("weight").alias("_w")), "id", "left"
            ).select("id", F.coalesce(F.col("_w"), F.lit(1.0)).alias("_w"))
        else:
            lonely_w = lonely.select("id", F.lit(1.0).alias("_w"))
        rows = lonely_w.orderBy("id").collect()
        sizes = _sizes_map(state, weights, k)
        heap = [(sizes[p], p) for p in range(k)]
        heapq.heapify(heap)
        placements = []
        for r in rows:
            s, p = heapq.heappop(heap)
            placements.append((int(r["id"]), p))
            heapq.heappush(heap, (s + float(r["_w"]), p))
        placed_df = spark.createDataFrame(placements, "id long, _np int")
        state = materialize(
            state.join(placed_df, "id", "left").select(
                "id",
                F.coalesce(F.col("_np"), F.col("partition")).alias("partition"),
                "fixed",
                "bucket",
                "has_edge",
                "_changed",
            )
        )

    if config.foaf:
        state = _foaf_pass(sym, state, alpha, k, weights)

    result = state.select("id", "partition")
    info = {
        "iterations": it,
        "alpha": alpha,
        "capacity": capacity,
        "changed_last_iteration": changed_last,
        "counters": counters.to_dict(),
        "n_vertices": n,
        "n_edges": m,
    }
    release(sym)
    return result, info


def _foaf_pass(
    sym: DataFrame,
    state: DataFrame,
    alpha: float,
    k: int,
    weights: DataFrame | None,
) -> DataFrame:
    """Friend-of-a-friend lonely-node reassignment (F4).

    Reference: ``friend_of_friend_lonely_node_partition_assignment``
    (/root/reference/graph_partitioning/fennel.pyx:188-297). A *lonely*
    node has zero vote mass — no neighbor sits in any partition it can see
    (its neighbors are themselves unassigned / just-moved). Two stages over
    the full graph, batch-synchronous:

      (a) move each lonely node v to the partition maximizing the summed
          vote mass of v's (unfixed) neighbors (fennel.pyx:257-268) —
          votes computed with every lonely node's own assignment masked
          out, the translation of the reference's ``assignments[v] = -1``
          before scoring;
      (b) where possible, override with the plurality of the neighbors'
          *hypothetical* FENNEL assignments (votes − α·size argmax;
          fennel.pyx:272-297).

    Ties break (score desc, partition asc) — the reference's dict-order
    tie is nondeterministic, so we canonicalize.
    """
    movable = state.filter(~F.col("fixed"))
    # lonely = movable nodes with zero vote mass under the current state
    v_all = _votes(sym, state, 0)
    lonely = (
        movable.join(
            v_all.groupBy("id").agg(F.sum("votes").alias("mass")), "id", "left"
        )
        .filter(F.coalesce(F.col("mass"), F.lit(0.0)) <= 0.0)
        .select("id")
    )
    if lonely.limit(1).count() == 0:
        return state

    # votes with all lonely assignments masked out
    masked = state.join(
        lonely.withColumn("_l", F.lit(True)), "id", "left"
    ).select(
        "id",
        F.when(F.coalesce(F.col("_l"), F.lit(False)), F.lit(-1))
        .otherwise(F.col("partition"))
        .alias("partition"),
    )
    nbr_votes = _votes(sym, masked, 0).select(
        F.col("id").alias("u"), F.col("partition").alias("p"), "votes"
    )
    # unfixed neighbors u of each lonely node v
    nbrs = (
        sym.join(lonely.withColumnRenamed("id", "src"), "src", "left_semi")
        .select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .join(
            state.filter(~F.col("fixed")).select(F.col("id").alias("u")),
            "u",
            "left_semi",
        )
        .distinct()
    )

    # stage (a): total neighbor vote mass per (v, p)
    stage_a = (
        nbrs.join(nbr_votes, "u")
        .groupBy("v", "p")
        .agg(F.sum("votes").alias("score"))
        .filter(F.col("score") > 0)
    )
    pick_a = Window.partitionBy("v").orderBy(F.desc("score"), F.asc("p"))
    a_best = (
        stage_a.withColumn("rn", F.row_number().over(pick_a))
        .filter(F.col("rn") == 1)
        .select(F.col("v").alias("id"), F.col("p").alias("foaf_a"))
    )

    # stage (b): hypothetical FENNEL assignment of each voting neighbor
    sizes = _sizes_map(masked.withColumn("fixed", F.lit(False)), weights, k)
    size_arr = F.array(*[F.lit(s) for s in sizes])
    hyp = (
        nbr_votes.withColumn(
            "score",
            F.col("votes") - F.lit(alpha) * F.element_at(size_arr, F.col("p").cast("int") + 1),
        )
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("u").orderBy(F.desc("score"), F.asc("p")))
        )
        .filter(F.col("rn") == 1)
        .select("u", F.col("p").alias("hyp_p"))
    )
    stage_b = (
        nbrs.join(hyp, "u")
        .groupBy("v", "hyp_p")
        .agg(F.count("*").alias("cnt"))
    )
    pick_b = Window.partitionBy("v").orderBy(F.desc("cnt"), F.asc("hyp_p"))
    b_best = (
        stage_b.withColumn("rn", F.row_number().over(pick_b))
        .filter(F.col("rn") == 1)
        .select(F.col("v").alias("id"), F.col("hyp_p").alias("foaf_b"))
    )

    out = (
        state.join(a_best, "id", "left")
        .join(b_best, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("foaf_b"), F.col("foaf_a"), F.col("partition")).alias("partition"),
            "fixed",
            "bucket",
            "has_edge",
            "_changed",
        )
    )
    return materialize(out)
