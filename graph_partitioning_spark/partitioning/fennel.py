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
  rest. ``salt_buckets > 0`` additionally salts the assignment side
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
from ..graph.iterutil import materialize, materialize_static, release


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
    # below this vertex count the per-step joins broadcast the (small)
    # state/decision sides instead of shuffling — a barrier-count
    # optimization for modest graphs; web-scale runs exceed it and take the
    # shuffle path with AQE skew handling
    broadcast_state_max: int = 5_000_000
    # the per-bucket decision frames (votes, decided) hold ~n/micro_batches
    # rows *regardless of total n*; below this row count they broadcast even
    # on the web-scale shuffle-state path, so each bucket step shuffles only
    # the bucket's edges — never the full n-row state. At true web scale
    # raise micro_batches so buckets stay under the gate: smaller buckets
    # also tighten the batch-synchronous relaxation (fresher sizes between
    # steps → less same-bucket herding). Measured on the 19.5M-edge synthetic
    # graph (local[32]): per-pass wall 37.4s → see BENCH.md round-3 row.
    decision_broadcast_max: int = 2_000_000
    # Bounded inflow (None = off, reference-faithful): with a value s, a
    # partition accepts per bucket step at most max(0, (1+s)·W/k − size_p)
    # total node weight of *movers* (nodes changing partition), admitted in
    # (score DESC, id ASC) order; the rest stay at their previous partition.
    # Unassigned nodes (prev = −1) are always admitted — placement is
    # mandatory — so pair this with ``modular_initial`` for a cold start.
    # This is the deterministic batch-synchronous analogue of Spinner's
    # probabilistic migration damping (Martella et al., "Spinner: Scalable
    # graph partitioning in the cloud", ICDE'17): the reference's sequential
    # stream updates sizes after every node (fennel.pyx:140-149) and so
    # never over-admits, but a synchronous step deciding n/micro_batches
    # nodes against one size snapshot will herd into the currently-smallest
    # partition unless inflow is bounded (measured: waste 6.25 at
    # micro_batches=1 on the 195M-edge graph without the cap).
    inflow_cap_slack: float | None = None
    # singleton placement collects (id, w) rows to replay the reference's
    # sequential min-fill heap exactly; above this row count the collect
    # would OOM the driver (an adversarial crawl snapshot can hold 10^8
    # isolated vertices), so ``place_singletons`` switches to the
    # distributed merged-stream greedy instead of collecting
    singleton_collect_max: int = 1_000_000
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


def centrality_bucketed(
    state: DataFrame, score: DataFrame, micro_batches: int, n: int
) -> DataFrame:
    """Attach an ntile-equivalent high-centrality-first ``bucket`` column
    WITHOUT a global window (F11 reorder modes).

    ``score``: (id, _score) — higher streams earlier. Ranks come from the
    range-partition + per-partition row_number pattern (assign_dense_ids),
    never a partition-less ``ntile().over(Window.orderBy(...))`` whose
    single-task sort OOMs at 10^9 vertices; the arithmetic below reproduces
    ntile's split exactly (first n % micro_batches buckets one row larger).
    Audited by tools/audit_plans.py (no SinglePartition exchange).
    """
    from ..graph.edges import assign_dense_ids

    ranked = assign_dense_ids(
        state.join(score, "id", "left")
        .withColumn("_score", F.coalesce(F.col("_score"), F.lit(0.0)))
        .withColumn("_ns", -F.col("_score")),
        ["_ns", "id"],
        id_col="_rank",
    )
    q, rem = n // micro_batches, n % micro_batches
    r = F.col("_rank")
    head = F.lit(rem * (q + 1))

    def _intdiv(num, d: int):
        # exact integer division as Column arithmetic: the numerator is
        # made exactly divisible first, so the double division is exact
        return ((num - num % F.lit(d)) / F.lit(d)).cast("int")

    bucket = F.when(r < head, _intdiv(r, q + 1)).otherwise(
        F.lit(rem) + _intdiv(r - head, max(q, 1))
    )
    return ranked.withColumn("bucket", bucket).drop("_score", "_ns", "_rank")


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


def _votes(
    sym_edges: DataFrame,
    assignments: DataFrame,
    salt_buckets: int,
    broadcast: bool = False,
) -> DataFrame:
    """(id, partition, votes) for every node with ≥1 assigned neighbor.

    ``broadcast``: hint the (id, partition) side into a broadcast hash join
    — the caller enables it only when the vertex count is small enough
    (fennel_partition's ``n <= BROADCAST_STATE_MAX``); at web scale the
    state is billions of rows and the join must shuffle (with AQE skew
    handling + optional salting).
    """
    nbr = assignments.filter(F.col("partition") >= 0).select(
        F.col("id").alias("dst"), F.col("partition")
    )
    if broadcast:
        nbr = F.broadcast(nbr)
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

    Conf scoping (AQE off + few shuffle partitions for the dozens of tiny
    bounded superstep queries, measured 2.7x wall-clock at sf0.1) happens
    inside the superstep loop, gated on ONE variable: the vertex count ``n``
    against ``broadcast_state_max``. Web-scale runs (n above the gate) keep
    AQE + full parallelism + the shuffle join paths.
    """
    return _fennel_partition_impl(
        edges, config, vertices, initial, fixed, checkpointer, resume
    )


def _fennel_partition_impl(
    edges: DataFrame,
    config: FennelConfig,
    vertices: DataFrame | None,
    initial: DataFrame | None,
    fixed: DataFrame | None,
    checkpointer: CheckpointManager | None,
    resume: bool,
) -> tuple[DataFrame, dict[str, Any]]:
    spark = edges.sparkSession
    k = config.num_partitions

    sym = symmetrize(edges)
    # For id-computable bucketings, lay the cached symmetrized edges out
    # clustered BY BUCKET: each in-memory columnar batch then holds one
    # bucket's rows only, so the per-bucket-step filter prunes the cache via
    # batch min/max stats instead of scanning all m rows micro_batches times
    # per pass (the in-memory scan was 8/9 wasted work at micro_batches=8).
    # RANGE partitioning on (_eb, src) — NOT hash on _eb alone, which would
    # collapse each bucket into a single cached partition and serialize its
    # scan — keeps every batch bucket-homogeneous while spreading each
    # bucket over ~n_parts/micro_batches partitions. One extra up-front
    # shuffle of the edge table, amortized over every bucket step of every
    # restream pass.
    if config.bucket_by in ("hash", "mod") and config.micro_batches > 1:
        try:
            base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            base_parts = spark.sparkContext.defaultParallelism
        n_parts = max(base_parts, 4 * config.micro_batches)
        sym = sym.withColumn(
            "_eb", _bucket_expr(F.col("src"), config)
        ).repartitionByRange(n_parts, "_eb", "src")
    # materialize, not just persist: every bucket step's vote join embeds
    # this static frame's logical plan, so a deep caller lineage (pages →
    # extract → edges) would be re-analyzed by the driver on every step.
    # The LogicalRDD keeps the (_eb, src) range partitioning the bucket
    # pruning relies on.
    sym = materialize_static(sym)
    # ONE degree aggregation serves four pre-loop needs that a naive setup
    # pays separate shuffles for: the edge-vertex set (all_ids /
    # has_edge), the vertex count, and the skew ratio
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("_deg"))
    deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    deg_row = deg.agg(
        F.count("*").alias("n"), F.max("_deg").alias("mx"), F.avg("_deg").alias("av")
    ).first()
    n_edge_verts = int(deg_row["n"] or 0)
    edge_ids = deg.select("id")

    all_ids = edge_ids
    if vertices is not None:
        all_ids = all_ids.join(vertices.select("id"), "id", "full").select("id").distinct()
    weights = (
        vertices.select("id", "weight") if vertices is not None else None
    )

    n = all_ids.count() if vertices is not None else n_edge_verts
    m = edges.count()
    if n == 0:
        return spark.createDataFrame([], "id long, partition int"), {
            "iterations": 0, "alpha": 0.0, "counters": {}
        }
    alpha = config.alpha if config.alpha is not None else (m * k) / (n * n)
    if config.strategy == "ldg" or config.inflow_cap_slack is not None:
        if weights is not None:
            total_w = all_ids.join(weights, "id", "left").agg(
                F.sum(F.coalesce(F.col("weight"), F.lit(1.0)))
            ).first()[0]
        else:
            total_w = float(n)
    else:
        total_w = float(n)
    capacity = total_w / k if config.strategy == "ldg" else None

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
    with_edges = edge_ids.withColumn("_has_edge", F.lit(True))
    state = (
        state.join(with_edges, "id", "left")
        .withColumn("has_edge", F.coalesce(F.col("_has_edge"), F.lit(False)))
        .drop("_has_edge")
    )
    if config.bucket_by in ("degree_hl", "leverage_hl"):
        # F11 DEGREE_HL / LEVERAGE_HL: stream high-centrality nodes first —
        # bucket 0 gets the highest slice (reference reorder schemes,
        # graph_partitioning/utils.py:999-1008 degree and :1010-1061
        # leverage centrality high-low).
        if config.bucket_by == "leverage_hl":
            from ..graph.centrality import leverage_centrality

            score = leverage_centrality(edges).select(
                "id", F.col("leverage").alias("_score")
            )
        else:
            score = sym.groupBy(F.col("src").alias("id")).agg(
                F.count("*").cast("double").alias("_score")
            )
        state = centrality_bucketed(state, score, config.micro_batches, n)
    else:
        state = state.withColumn("bucket", _bucket_expr(F.col("id"), config))
    state = state.withColumn("_changed", F.lit(False))
    # the node weight rides IN the state so per-step size/stat aggregations
    # and the LDG score never re-join the vertices table
    if weights is not None:
        state = state.join(
            weights.select("id", F.col("weight").alias("_w")), "id", "left"
        ).withColumn("w", F.coalesce(F.col("_w"), F.lit(1.0))).drop("_w")
    else:
        state = state.withColumn("w", F.lit(1.0))

    counters = Counters()
    start_iter = 0
    if checkpointer is not None and resume:
        manifest = checkpointer.latest_manifest()
        if manifest is not None and manifest.get("params", {}).get("algorithm") == "fennel":
            # a checkpointed state keeps the bucket column it was written
            # with — resuming under a different bucket schedule would make
            # the bucket-pruned vote input silently disagree with the
            # movable set (movable nodes see zero votes and fall back to
            # prev/best_empty). Refuse loudly instead.
            params = manifest.get("params", {})
            for pname, want in (
                ("k", k),
                ("bucket_by", config.bucket_by),
                ("bucket_seed", config.bucket_seed),
                ("micro_batches", config.micro_batches),
                ("inflow_cap_slack", config.inflow_cap_slack),
            ):
                have = params.get(pname)
                if have is not None and have != want:
                    raise ValueError(
                        f"checkpoint was written with {pname}={have!r} but the "
                        f"resume config has {pname}={want!r}; the bucket "
                        "schedule/partition count must match the original run"
                    )
            start_iter = manifest["superstep"]
            counters = Counters.from_dict(manifest["counters"])
            state = checkpointer.load_states(spark, manifest)["assignments"]
            if "w" not in state.columns:  # checkpoint from an older layout
                if weights is not None:
                    state = state.join(
                        weights.select("id", F.col("weight").alias("_w")), "id", "left"
                    ).withColumn("w", F.coalesce(F.col("_w"), F.lit(1.0))).drop("_w")
                else:
                    state = state.withColumn("w", F.lit(1.0))
    state = materialize(state)
    release(deg)

    counters.skew_ratio = float(deg_row["mx"] or 0.0) / max(float(deg_row["av"] or 0.0), 1e-12)

    node_w = F.col("node_weight")

    def _stats(s: DataFrame) -> tuple[list[float], int]:
        """Weighted partition sizes AND changed-count in ONE aggregation —
        per bucket step this replaces two separate jobs (the dominant
        fixed cost of a step once the votes join is bucket-pruned)."""
        rows = s.groupBy("partition").agg(
            F.sum("w").alias("sz"),
            F.sum(F.col("_changed").cast("long")).alias("ch"),
        ).collect()
        sizes = [0.0] * k
        changed = 0
        for r in rows:
            p_ = r["partition"]
            if p_ is not None and p_ >= 0:
                if p_ >= k:
                    raise ValueError(
                        f"assignment state contains partition id {p_} >= "
                        f"num_partitions={k} — was the checkpoint written "
                        "with a different k?"
                    )
                sizes[p_] = float(r["sz"])
            changed += int(r["ch"])
        return sizes, changed

    import os as _os
    import time as _time

    _debug = bool(_os.environ.get("SPARK_GRAFT_DEBUG"))
    it = start_iter
    changed_last = -1
    changed_history: list[int] = []
    sizes, _ = _stats(state)
    # Micro-batch supersteps are many tiny bounded queries; per-stage AQE
    # re-planning and wide shuffles cost more than they save at that shape
    # (measured 2.7x wall-clock at sf0.1), so under the same size gate as
    # the broadcast fast path the loop runs with AQE off and few shuffle
    # partitions, restoring the session conf afterwards. Web-scale runs
    # (n > broadcast_state_max) keep AQE + full parallelism.
    small = n <= config.broadcast_state_max
    # per-bucket decision frames are ~n/micro_batches rows however big n is
    bucket_small = (n // max(1, config.micro_batches)) <= config.decision_broadcast_max
    _saved_conf = {}
    if small:
        try:
            # value can be non-numeric on some platforms (e.g. "auto")
            cur_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            cur_shuffle = 8
        for key, val in (
            ("spark.sql.adaptive.enabled", "false"),
            ("spark.sql.shuffle.partitions", str(min(cur_shuffle, 8))),
        ):
            _saved_conf[key] = spark.conf.get(key)
            spark.conf.set(key, val)
    try:
        while it < config.num_iterations:
            it += 1
            changed_this_iter = 0
            for b in range(config.micro_batches):
                _t0 = _time.time()
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
                if "_eb" in sym.columns:
                    # filter on the STORED bucket column (not the recomputed
                    # expression) so the cached-batch min/max stats prune
                    active_edges = sym.filter(F.col("_eb") == b).drop("_eb")
                elif config.bucket_by in ("hash", "mod"):
                    active_edges = sym.filter(_bucket_expr(F.col("src"), config) == b)
                else:
                    active_edges = sym.join(
                        movable.select(F.col("id").alias("src")), "src", "left_semi"
                    )
                votes = _votes(
                    active_edges, state, config.salt_buckets, broadcast=small
                ).select("id", F.col("partition").alias("vp"), "votes")
                # candidate set per node = voted partitions ∪ {prev} ∪
                # {best_empty}. The argmax by (score DESC, partition ASC) is
                # computed WITHOUT materializing explicit candidate rows: vote
                # rows fold to a per-node max struct (score, −cand) in the same
                # aggregation pass, and the two synthetic candidates (prev with
                # 0 votes, globally-smallest partition with 0 votes) enter as
                # expression structs via `greatest` — saving the union + second
                # groupBy + window sort the naive plan pays per superstep.
                # For FENNEL a (cand == prev) vote row always scores ≥ the
                # synthetic prev candidate (votes ≥ 0 and the +α credit applies
                # to both), so including both never changes the winner; struct
                # ordering (score, −cand) reproduces the reference's first-max
                # tie-break (fennel.pyx:89-107) exactly. LDG has NO previous-
                # partition credit (the reference kernel scores all partitions
                # afresh each stream, graph-partitioning-ldg.ipynb cell 2), so
                # the synthetic prev candidate is dropped there — otherwise its
                # 0 score would pin nodes to an over-capacity prev partition
                # whose real vote row scores negative.
                size_arr = F.array(*[F.lit(s) for s in sizes])

                def _score(cand_col, votes_col, prev_col, w_col):
                    size_of_cand = F.element_at(size_arr, cand_col.cast("int") + 1)
                    if config.strategy == "ldg":
                        return votes_col * (F.lit(capacity) - size_of_cand - w_col)
                    return (
                        votes_col
                        - F.lit(alpha) * size_of_cand
                        + F.when(cand_col == prev_col, F.lit(alpha)).otherwise(F.lit(0.0))
                    )

                def _cand_struct(cand_col, votes_col, prev_col, w_col):
                    return F.struct(
                        _score(cand_col, votes_col, prev_col, w_col).alias("s"),
                        (-cand_col).cast("int").alias("nc"),
                    )

                mv = movable.select(
                    "id", F.col("partition").alias("prev"), F.col("w").alias("node_weight")
                )
                # The votes frame is degree-multiplied (up to ~avg-degree
                # rows per movable node) — never broadcast or driver-collect
                # it. Instead: (1) inner-join votes against the NARROW
                # bucket-sized mv frame (broadcast build side when the
                # bucket is small), (2) fold to one best-struct row per
                # node (≤ bucket rows), (3) left-join that small result
                # back onto mv — both broadcasts are O(n/micro_batches)
                # regardless of degree skew. Movable nodes with no votes
                # fall through with bv = NULL exactly as the old
                # outer-join shape produced (greatest() skips NULLs), and
                # vote rows for fixed nodes sharing the bucket die in the
                # inner join.
                mv_b = F.broadcast(mv) if (small or bucket_small) else mv
                voted = votes.join(mv_b, "id")
                best_vote = voted.groupBy("id").agg(
                    F.max(
                        _cand_struct(F.col("vp"), F.col("votes"), F.col("prev"), node_w)
                    ).alias("bv")
                )
                bv_b = (
                    F.broadcast(best_vote) if (small or bucket_small) else best_vote
                )
                vj = mv.join(bv_b, "id", "left")
                empty_struct = _cand_struct(
                    F.lit(best_empty), F.lit(0.0), F.col("prev"), node_w
                )
                if config.strategy == "ldg":
                    best = F.greatest(F.col("bv"), empty_struct)
                else:
                    prev_struct = F.when(
                        F.col("prev") >= 0,
                        _cand_struct(F.col("prev"), F.lit(0.0), F.col("prev"), node_w),
                    )
                    best = F.greatest(F.col("bv"), prev_struct, empty_struct)
                if config.inflow_cap_slack is not None:
                    # bounded inflow: movers admitted to their target
                    # partition in (score DESC, id ASC) order while the
                    # cumulative admitted weight stays under the target's
                    # remaining capacity; the rest keep their previous
                    # partition. The window runs over the bucket-sized
                    # decided frame, never the full state.
                    cap_target = (1.0 + config.inflow_cap_slack) * total_w / k
                    cap_arr = F.array(*[F.lit(max(0.0, cap_target - s)) for s in sizes])
                    staged = vj.select(
                        "id",
                        (-best["nc"]).alias("new_partition"),
                        "prev",
                        best["s"].alias("_score"),
                        F.col("node_weight").alias("_w"),
                    )
                    mover = (F.col("new_partition") != F.col("prev")) & (
                        F.col("prev") >= 0
                    )
                    cum_w = F.sum(
                        F.when(mover, F.col("_w")).otherwise(F.lit(0.0))
                    ).over(
                        Window.partitionBy("new_partition")
                        .orderBy(F.desc("_score"), F.asc("id"))
                        .rowsBetween(Window.unboundedPreceding, 0)
                    )
                    admitted = cum_w <= F.element_at(
                        cap_arr, F.col("new_partition").cast("int") + 1
                    )
                    decided = staged.select(
                        "id",
                        F.when(~mover, F.col("new_partition"))
                        .when(admitted, F.col("new_partition"))
                        .otherwise(F.col("prev"))
                        .alias("new_partition"),
                        "prev",
                    )
                else:
                    decided = vj.select(
                        "id", (-best["nc"]).alias("new_partition"), "prev"
                    )
                _t2 = _time.time()
                # two jobs per superstep: (1) cache fill (count — must precede
                # the localCheckpoint so it carries the cache's real stats, not
                # compounding plan estimates), (2) the stats aggregation, which
                # doubles as the LAZY checkpoint's materializing action — the
                # dedicated eager-checkpoint job the naive loop pays is folded
                # away. The changed flag rides in the state so no third job.
                plan = state.join(
                    F.broadcast(decided) if (small or bucket_small) else decided,
                    "id", "left",
                ).select(
                    "id",
                    F.coalesce(F.col("new_partition"), F.col("partition")).alias("partition"),
                    "fixed",
                    "bucket",
                    "has_edge",
                    F.coalesce(
                        F.col("new_partition") != F.col("prev"), F.lit(False)
                    ).alias("_changed"),
                    "w",
                )
                cached = plan.persist(StorageLevel.MEMORY_AND_DISK)
                if small:
                    # with AQE off, downstream broadcast decisions come from
                    # static plan stats — the count fills the cache first so
                    # the checkpoint carries real sizes, not compounding
                    # join estimates
                    cached.count()
                # on the web-scale path (AQE on, runtime stats) the stats
                # aggregation below doubles as the materializing action —
                # the dedicated cache-fill job would scan the full n-row
                # state once more per bucket step for nothing
                new_state = cached.localCheckpoint(eager=False)
                _t3 = _time.time()
                # ONE aggregation delivers this step's changed-count AND the
                # next step's sizes (and materializes the checkpoint)
                sizes, changed = _stats(new_state)
                cached.unpersist()
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
                        "bucket_by": config.bucket_by,
                        "bucket_seed": config.bucket_seed,
                        "micro_batches": config.micro_batches,
                        "inflow_cap_slack": config.inflow_cap_slack,
                        "changed": changed_this_iter,
                    },
                )
            changed_last = changed_this_iter
            changed_history.append(changed_this_iter)
            # observability hook (extra={"on_pass": fn}): fn(iteration,
            # assignments_df, {"changed", "sizes"}) after every restream
            # pass — the convergence bench records per-pass cut/waste
            # without re-running the whole partition per pass count. The
            # state frame is materialized (localCheckpoint), safe to query.
            on_pass = config.extra.get("on_pass")
            if on_pass is not None:
                on_pass(it, state.select("id", "partition"),
                        {"changed": changed_this_iter, "sizes": list(sizes)})
            if config.converge_early and changed_this_iter == 0:
                break

        # singleton placement (degree-0, still unassigned): the reference
        # re-finds the min-size partition after *each* placement
        # (fennel.pyx:142-148) — see ``place_singletons``. The driver-heap
        # replay is hard-capped at config.singleton_collect_max rows; above
        # it the distributed merged-stream greedy takes over (an adversarial
        # crawl snapshot can hold 10^8 isolated vertices even though P7
        # filters them at extraction in the normal pipeline).
        lonely = state.filter(F.col("partition") < 0)
        n_lonely = lonely.count()
        if n_lonely > 0:
            placed_df = place_singletons(
                lonely, sizes, k, config.singleton_collect_max, count=n_lonely
            )
            state = materialize(
                state.join(placed_df, "id", "left").select(
                    "id",
                    F.coalesce(F.col("_np"), F.col("partition")).alias("partition"),
                    "fixed",
                    "bucket",
                    "has_edge",
                    "_changed",
                    "w",
                )
            )

        if config.foaf:
            state = _foaf_pass(sym.drop("_eb"), state, alpha, k, weights)


    finally:
        for key, val in _saved_conf.items():
            spark.conf.set(key, val)

    result = state.select("id", "partition")
    info = {
        "iterations": it,
        "alpha": alpha,
        "capacity": capacity,
        "changed_last_iteration": changed_last,
        "changed_per_iteration": changed_history,
        "counters": counters.to_dict(),
        "n_vertices": n,
        "n_edges": m,
    }
    release(sym)
    return result, info


def _singleton_placements_heap(
    rows, sizes: list[float], k: int
) -> list[tuple[int, int]]:
    """The reference's sequential greedy min-fill, replayed exactly.

    After every placement the min-size partition is re-found
    (/root/reference/graph_partitioning/partitioners/fennel/fennel.pyx:142-148);
    sizes are k scalars so a heap over (size, partition) simulates it —
    ties break to the smallest partition id, matching
    ``parts.index(min(parts))``. ``rows``: (id, _w) in stream (id) order.
    """
    import heapq

    heap = [(sizes[p], p) for p in range(k)]
    heapq.heapify(heap)
    placements = []
    for r in rows:
        s, p = heapq.heappop(heap)
        placements.append((int(r["id"]), p))
        heapq.heappush(heap, (s + float(r["_w"]), p))
    return placements


def place_singletons(
    lonely: DataFrame,
    sizes: list[float],
    k: int,
    max_collect: int = 1_000_000,
    count: int | None = None,
) -> DataFrame:
    """Place degree-0 unassigned nodes; returns ``(id, _np)`` placements.

    Up to ``max_collect`` rows the driver-heap replay runs (exact reference
    parity, ``_singleton_placements_heap``); above it the rows are NOT
    collected — ``_place_singletons_distributed`` takes over, so an
    adversarial input with 10^8 isolated vertices degrades to a distributed
    plan instead of an driver OOM. ``lonely`` needs (id, w) columns.
    """
    spark = lonely.sparkSession
    t = count if count is not None else lonely.count()
    if t <= max_collect:
        rows = lonely.select("id", F.col("w").alias("_w")).orderBy("id").collect()
        return spark.createDataFrame(
            _singleton_placements_heap(rows, list(sizes), k), "id long, _np int"
        )
    return _place_singletons_distributed(lonely, sizes, k, t)


def _place_singletons_distributed(
    lonely: DataFrame, sizes: list[float], k: int, t: int
) -> DataFrame:
    """Distributed greedy min-fill — no driver collect, no global window.

    Equal-weight case (the common one; node weights default to 1): the heap
    greedy is the merge of k arithmetic streams v(p, j) = sizes[p] + j·w
    ordered lexicographically by (v, p), so the singleton at stream rank r
    goes to the partition of the (r+1)-th smallest stream element. That
    element is found without materializing k·t candidates: a driver-side
    bisection over the closed-form counting function bounds the t-th
    smallest value, each stream generates only its candidates below the
    bound (≤ t + 2k rows total, chunk-exploded so no single task
    materializes a giant sequence), then one range-partitioned rank
    (``assign_dense_ids`` — never a SinglePartition sort) plus an equi-join
    on rank places every node. Bit-parity with the heap holds whenever
    sizes[p] + j·w multiplication equals the heap's repeated addition
    (integer-valued sizes/weights — the parity pytest pins it); with
    arbitrary floats the result is still deterministic and greedy under
    the multiplicative form.

    Mixed-weight case: the sequential greedy consumes each node's own
    weight in stream order and cannot be replayed in parallel; nodes go
    round-robin (stream rank mod k) over partitions ordered by
    (size, partition) — identical to the heap when weights are equal and
    balanced within one max-weight otherwise.
    """
    import math

    from ..graph.edges import assign_dense_ids

    spark = lonely.sparkSession
    singles = assign_dense_ids(lonely.select("id"), "id", id_col="_rank")
    wmin, wmax = lonely.agg(F.min("w"), F.max("w")).first()
    if wmin == wmax and float(wmin) > 0:
        w = float(wmin)

        def count_le(v: float) -> int:
            return sum(int(math.floor((v - s) / w)) + 1 for s in sizes if v >= s)

        # hi ≥ the t-th smallest value: count_le(hi) ≥ Σ max(0,(hi−s)/w)
        # ≥ (k·hi − Σ sizes)/w ≥ t at hi = (Σ sizes + w·t)/k, then bisect
        # down to within one step so over-generation stays ≤ ~2k rows
        lo, hi = min(sizes), (sum(sizes) + w * t) / k + 2.0 * w
        for _ in range(200):
            if hi - lo <= w:
                break
            mid = lo + (hi - lo) / 2.0
            if count_le(mid) >= t:
                hi = mid
            else:
                lo = mid
        jub = [int(math.floor((hi - s) / w)) + 1 if hi >= s else 0 for s in sizes]
        chunk = 1 << 20
        base = spark.createDataFrame(
            [(p, float(sizes[p]), int(jub[p])) for p in range(k) if jub[p] > 0],
            "p int, s double, jn long",
        )
        starts = base.select(
            "p",
            "s",
            "jn",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("jn") - 1, F.lit(chunk))
            ).alias("j0"),
        ).repartition(spark.sparkContext.defaultParallelism)
        cand = starts.select(
            "p",
            "s",
            F.explode(
                F.sequence(
                    F.col("j0"), F.least(F.col("j0") + (chunk - 1), F.col("jn") - 1)
                )
            ).alias("j"),
        ).select(
            "p", (F.col("s") + F.col("j").cast("double") * F.lit(w)).alias("v")
        )
        picks = assign_dense_ids(cand, ["v", "p"], id_col="_rank").filter(
            F.col("_rank") < t
        )
        return singles.join(
            picks.select("_rank", F.col("p").cast("int").alias("_np")), "_rank"
        ).select("id", "_np")
    order = sorted(range(k), key=lambda p: (sizes[p], p))
    arr = F.array(*[F.lit(p) for p in order])
    return singles.select(
        "id",
        F.element_at(arr, (F.col("_rank") % k).cast("int") + 1).alias("_np"),
    )


def modular_initial(ids: DataFrame, num_partitions: int, seed: int = 0) -> DataFrame:
    """Balanced deterministic cold-start assignment ``(id + seed) mod k``.

    The batch-synchronous relaxation herds at a cold start: the first bucket's
    nodes all have zero votes, so every one of them picks the single
    ``best_empty`` partition — at web scale that is 10^8 nodes into one
    partition, and the restream loop spends its iterations unwinding the
    pile-up (measured on the 19.5M-edge synthetic graph: waste 0.98 with
    half the partitions near-empty after 2 cold-start passes). The reference
    never hits this because its sequential stream updates sizes after every
    single node (fennel.pyx:140-149). Seeding the restream from a balanced
    modular spread is the standard restreaming cold start (Nishimura &
    Ugander, "Restreaming graph partitioning", KDD'13 — restream passes are
    refinement over *some* existing assignment): sizes start equal, votes are
    real from bucket 0, and the loop only ever *moves* nodes. Plain modular
    arithmetic keeps the schedule replayable by a non-Spark SQL oracle
    (the driver's DuckDB gate), like ``bucket_by="mod"``.

    ``ids``: any DataFrame with an ``id`` column. Pass the result as
    ``fennel_partition(..., initial=...)``.
    """
    return ids.select(
        "id",
        F.pmod(F.col("id") + F.lit(seed), F.lit(num_partitions))
        .cast("int")
        .alias("partition"),
    )


def foaf_reassign(
    edges: DataFrame,
    assignments: DataFrame,
    num_partitions: int,
    alpha: float | None = None,
    vertices: DataFrame | None = None,
    fixed: DataFrame | None = None,
) -> DataFrame:
    """Standalone friend-of-a-friend lonely-node reassignment (F4) over an
    arbitrary — typically partial — ``(id, partition)`` assignment.

    Reference: ``friend_of_friend_lonely_node_partition_assignment``
    (/root/reference/graph_partitioning/fennel.pyx:188-297), which the
    reference invokes mid-arrival when many neighbors are still unassigned.
    ``fennel_partition(config.foaf=True)`` runs the same pass on its own
    final state; this entry point runs it directly so partial assignments
    (arrival snapshots, prediction models) can be repaired without a
    partitioner run — and so the pass is oracle-checkable in isolation.

    ``alpha``: FENNEL balance weight for stage (b)'s hypothetical
    assignments; default ``m·k/n²`` recomputed from this graph.
    Returns ``(id, partition)``.
    """
    k = num_partitions
    # materialize: cut the caller's lineage out of the two FOAF vote joins
    sym = materialize_static(symmetrize(edges))
    try:
        edge_ids = sym.select(F.col("src").alias("id")).distinct()
        all_ids = (
            edge_ids.union(assignments.select("id")).distinct()
        )
        state = all_ids.join(
            assignments.select("id", "partition"), "id", "left"
        ).select(
            "id", F.coalesce(F.col("partition"), F.lit(-1)).alias("partition")
        )
        if fixed is not None:
            state = state.join(
                fixed.select("id").withColumn("_f", F.lit(True)), "id", "left"
            ).withColumn("fixed", F.coalesce(F.col("_f"), F.lit(False))).drop("_f")
        else:
            state = state.withColumn("fixed", F.lit(False))
        weights = vertices.select("id", "weight") if vertices is not None else None
        if weights is not None:
            state = state.join(
                weights.select("id", F.col("weight").alias("_w")), "id", "left"
            ).withColumn("w", F.coalesce(F.col("_w"), F.lit(1.0))).drop("_w")
        else:
            state = state.withColumn("w", F.lit(1.0))
        # _foaf_pass carries the partitioner's state layout through
        state = state.withColumn("bucket", F.lit(0)).withColumn(
            "has_edge", F.lit(True)
        ).withColumn("_changed", F.lit(False))
        state = materialize(state)
        if alpha is None:
            n = state.count()
            m = edges.count()
            alpha = (m * k) / (n * n) if n else 0.0
        out = _foaf_pass(sym, state, alpha, k, weights)
        return out.select("id", "partition")
    finally:
        release(sym)


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
            "w",
        )
    )
    return materialize(out)
