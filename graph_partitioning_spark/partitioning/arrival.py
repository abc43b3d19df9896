"""Arrival-simulation pipeline: the reference's D1-D6 driver re-expressed.

The reference streams "arriving" nodes into a fixed partitioning in
micro-batches (graph_partitioning.py:462-519), optionally pre-seeded by a
full-graph *prediction model* whose assignments are frozen for the first
``cut_off`` fraction of arrivals (assign_cut_off, :363-406). Each batch
re-runs the partitioner on the induced subgraph of arrived nodes with the
already-arrived set fixed, then freezes the batch (process_batch,
:522-626). Graph-modification functions (edge expansion :409-459, virtual
nodes :269-291) reweight/augment the graph between batches.

Spark mapping: the arrival table ``(id, arrived, seq)`` replaces the
arrival files; batches are deterministic ``seq`` ranges; the per-batch
subgraph is two semi-joins; α is recomputed from subgraph counts
(``α = m_sub·k/(n_fixed+|batch|)²``, :579-586); per-batch metric rows are
collected into a metrics DataFrame (the reference's 12-column CSV rows).
Every batch boundary is checkpointable (superstep id = batch index).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoint import CheckpointManager
from ..graph.iterutil import materialize, release
from .fennel import FennelConfig, fennel_partition
from .metrics import cut_metrics, waste

EXPANSION_MODES = (
    "minimum", "maximum", "product", "product_squared",
    "sqrt_product", "average", "total", "default",
)


def edge_expansion(
    edges: DataFrame,
    node_weights: DataFrame,
    mode: str = "default",
    prediction_model_emphasis: float = 1.0,
    arrived: DataFrame | None = None,
) -> DataFrame:
    """Recompute edge weights from endpoint node weights (F9).

    Reference: ``_edge_expansion`` (graph_partitioning.py:409-459). Modes:
    minimum, maximum, product, product_squared, sqrt_product, average,
    total; default = ``(w1·e)·(w2·e)`` with e = original edge weight.
    Edges touching an arrived node are multiplied by
    ``prediction_model_emphasis``.
    """
    if mode not in EXPANSION_MODES:
        raise ValueError(f"unknown edge expansion mode {mode!r}")
    w = node_weights.select("id", "weight")
    e = (
        edges.withColumnRenamed("weight", "weight_orig")
        .join(w.select(F.col("id").alias("src"), F.col("weight").alias("w1")), "src", "left")
        .join(w.select(F.col("id").alias("dst"), F.col("weight").alias("w2")), "dst", "left")
        .withColumn("w1", F.coalesce(F.col("w1"), F.lit(1.0)))
        .withColumn("w2", F.coalesce(F.col("w2"), F.lit(1.0)))
    )
    w1, w2, orig = F.col("w1"), F.col("w2"), F.col("weight_orig")
    new_w = {
        "minimum": F.least(w1, w2),
        "maximum": F.greatest(w1, w2),
        "product": w1 * w2,
        "product_squared": F.pow(w1 * w2, 2.0),
        "sqrt_product": F.sqrt(w1 * w2),
        "average": (w1 + w2) * 0.5,
        "total": w1 + w2,
        "default": (w1 * orig) * (w2 * orig),
    }[mode]
    e = e.withColumn("weight", new_w)
    if arrived is not None and prediction_model_emphasis != 1.0:
        a_src = arrived.select(F.col("id").alias("src"), F.lit(True).alias("_a1"))
        a_dst = arrived.select(F.col("id").alias("dst"), F.lit(True).alias("_a2"))
        e = (
            e.join(a_src, "src", "left")
            .join(a_dst, "dst", "left")
            .withColumn(
                "weight",
                F.when(
                    F.coalesce(F.col("_a1"), F.lit(False))
                    | F.coalesce(F.col("_a2"), F.lit(False)),
                    F.col("weight") * prediction_model_emphasis,
                ).otherwise(F.col("weight")),
            )
            .drop("_a1", "_a2")
        )
    return e.select("src", "dst", "weight", "weight_orig")


def virtual_node_id(partition: int) -> int:
    """Virtual nodes use negative ids −(p+1) — collision-free with real
    (non-negative) vertex ids."""
    return -(partition + 1)


def add_virtual_nodes(
    edges: DataFrame,
    prediction: DataFrame,
    num_partitions: int,
    virtual_edge_weight: float = 1.0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """F8: add one pseudo-node per partition, fixed to it, and connect every
    predicted node to its partition's virtual node.

    Reference: graph_partitioning.py:269-291 (+removal :639-649).
    Returns (edges+virtual, virtual_assignments(id, partition), virtual_ids).
    """
    spark = edges.sparkSession
    virt = spark.createDataFrame(
        [(virtual_node_id(p), p) for p in range(num_partitions)], "id long, partition int"
    )
    v_edges = (
        prediction.filter(F.col("partition") >= 0)
        .select(
            F.col("id").alias("src"),
            (-(F.col("partition") + 1)).cast("long").alias("dst"),
            F.lit(float(virtual_edge_weight)).alias("weight"),
        )
    )
    extra_cols = [c for c in edges.columns if c not in ("src", "dst", "weight")]
    for c in extra_cols:
        v_edges = v_edges.withColumn(c, F.lit(None).cast(edges.schema[c].dataType))
    return edges.unionByName(v_edges), virt, virt.select("id")


def remove_virtual_nodes(assignments: DataFrame) -> DataFrame:
    """Strip virtual pseudo-nodes (negative ids) from an assignment table."""
    return assignments.filter(F.col("id") >= 0)


@dataclass
class ArrivalConfig:
    num_partitions: int
    restream_batches: int = 50              # nodes per micro-batch
    num_iterations: int = 2                 # fennel restreams per batch
    micro_batches: int = 2                  # fennel buckets per restream
    prediction_model_cut_off: float = 0.0   # fraction of arrivals pre-fixed
    prediction_iterations: int = 4          # fennel iterations for the model
    sliding_window: bool = False
    use_one_shot_alpha: bool = False
    one_shot_alpha: float = 0.5
    use_virtual_nodes: bool = False
    virtual_edge_weight: float = 1.0
    edge_expansion_mode: str | None = None
    prediction_model_emphasis: float = 1.0
    compute_metrics: bool = True
    # forwarded to the per-batch FennelConfig; "mod" + seed makes every
    # batch's restream schedule replayable by an external SQL oracle
    bucket_by: str = "hash"
    bucket_seed: int = 0
    extra: dict[str, Any] = field(default_factory=dict)


def simulate_arrivals(
    edges: DataFrame,
    arrivals: DataFrame,
    config: ArrivalConfig,
    vertices: DataFrame | None = None,
    prediction: DataFrame | None = None,
    checkpointer: CheckpointManager | None = None,
) -> tuple[DataFrame, DataFrame, dict[str, Any]]:
    """Run the full arrival simulation.

    ``arrivals``: (id, arrived int 0/1, seq long) — the arrival order and
    the simulated-arrival mask (reference's arrival files, S3/S4).
    ``prediction``: optional precomputed prediction-model assignments; if
    None and cut_off > 0, one is computed by running FENNEL on the full
    graph for ``prediction_iterations``.

    Returns (assignments(id, partition), metrics(batch, ...), info).
    """
    spark = edges.sparkSession
    k = config.num_partitions

    # arrival ranking without a global window (which funnels the whole
    # arrival table through one task): range-partition by (seq, id) +
    # per-partition row_number + driver offsets — the same scalable pattern
    # as graph.edges.assign_dense_ids; id breaks seq ties deterministically
    from ..graph.edges import assign_dense_ids

    arriving = assign_dense_ids(
        arrivals.filter(F.col("arrived") == 1).select("id", "seq"),
        ["seq", "id"],
        id_col="arrival_rank",
    )
    arriving = materialize(arriving)
    n_arrivals = arriving.count()

    # D3: prediction model over the full graph
    if prediction is None and config.prediction_model_cut_off > 0:
        prediction, _ = fennel_partition(
            edges,
            FennelConfig(
                num_partitions=k,
                num_iterations=config.prediction_iterations,
                micro_batches=max(config.micro_batches, 4),
            ),
            vertices=vertices,
        )

    work_edges = edges
    if config.use_virtual_nodes and prediction is not None:
        work_edges, virt_assign, _ = add_virtual_nodes(
            edges, prediction, k, config.virtual_edge_weight
        )

    # D4: fix the first cut_off·n arrivals at their predicted partition
    cut_off_value = int(config.prediction_model_cut_off * n_arrivals)
    fixed_now = arriving.filter(F.col("arrival_rank") < cut_off_value).select("id")
    if prediction is not None:
        current = prediction.join(fixed_now, "id", "left_semi")
    else:
        current = spark.createDataFrame([], "id long, partition int")
    if config.use_virtual_nodes and prediction is not None:
        current = current.unionByName(virt_assign)
        fixed_ids = fixed_now.unionByName(virt_assign.select("id"))
    else:
        fixed_ids = fixed_now
    current = materialize(current)
    fixed_ids = materialize(fixed_ids)

    remaining = arriving.filter(F.col("arrival_rank") >= cut_off_value)
    n_remaining = n_arrivals - cut_off_value
    batch_size = config.restream_batches
    n_batches = (n_remaining + batch_size - 1) // batch_size if n_remaining else 0

    start_batch = 0
    metrics_rows: list[tuple] = []
    if checkpointer is not None:
        manifest = checkpointer.latest_manifest()
        if manifest is not None and manifest.get("params", {}).get("algorithm") == "arrival":
            start_batch = manifest["superstep"]
            states = checkpointer.load_states(spark, manifest)
            current = states["assignments"]
            fixed_ids = states["fixed"]
            metrics_rows = [tuple(r) for r in states["metrics"].collect()]

    # D5: micro-batch loop
    for b in range(start_batch, n_batches):
        lo = cut_off_value + b * batch_size
        hi = min(lo + batch_size, n_arrivals)
        batch_ids = remaining.filter(
            (F.col("arrival_rank") >= lo) & (F.col("arrival_rank") < hi)
        ).select("id")

        arrived_ids = fixed_ids.select("id").unionByName(batch_ids).distinct()
        sub = (
            work_edges.join(arrived_ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(arrived_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        if config.edge_expansion_mode is not None and vertices is not None:
            sub = edge_expansion(
                sub.select("src", "dst", "weight"),
                vertices,
                config.edge_expansion_mode,
                config.prediction_model_emphasis,
                arrived=fixed_ids,
            ).select("src", "dst", "weight")
        sub = sub.persist()
        m_sub = sub.count()
        n_fixed = fixed_ids.count()
        batch_n = hi - lo
        if config.use_one_shot_alpha:
            alpha = config.one_shot_alpha
        else:
            denom = max(n_fixed + batch_n, 1)
            alpha = m_sub * k / (denom * denom)

        # vertices = every arrived node (isolated batch nodes included —
        # the reference's G.subgraph keeps them and fennel defers them to
        # singleton placement, fennel.pyx:133-148)
        if vertices is not None:
            sub_verts = arrived_ids.join(vertices.select("id", "weight"), "id", "left").select(
                "id", F.coalesce(F.col("weight"), F.lit(1.0)).alias("weight")
            )
        else:
            sub_verts = arrived_ids.withColumn("weight", F.lit(1.0))
        assign, _ = fennel_partition(
            sub,
            FennelConfig(
                num_partitions=k,
                num_iterations=config.num_iterations,
                micro_batches=config.micro_batches,
                alpha=alpha,
                bucket_by=config.bucket_by,
                bucket_seed=config.bucket_seed,
            ),
            vertices=sub_verts,
            initial=current,
            fixed=fixed_ids,
        )
        # merge: nodes absent from the subgraph keep their previous state
        merged = (
            current.withColumnRenamed("partition", "old_p")
            .join(assign.withColumnRenamed("partition", "new_p"), "id", "full")
            .select("id", F.coalesce(F.col("new_p"), F.col("old_p")).alias("partition"))
        )

        # freeze the batch (sliding window: only the earliest arrival)
        if config.sliding_window and hi < n_arrivals:
            first_of_batch = (
                remaining.filter(
                    (F.col("arrival_rank") >= lo) & (F.col("arrival_rank") < hi)
                )
                .orderBy("arrival_rank")
                .limit(1)
                .select("id")
            )
            new_fixed = fixed_ids.select("id").unionByName(first_of_batch).distinct()
        else:
            new_fixed = fixed_ids.select("id").unionByName(batch_ids).distinct()

        old_cur, old_fixed = current, fixed_ids
        current = materialize(merged)
        fixed_ids = materialize(new_fixed)
        # NB: old_cur/old_fixed stay alive until the end of this iteration —
        # arrived_ids/sub still reference their checkpoint RDDs lazily

        if config.compute_metrics:
            cm = cut_metrics(sub.select("src", "dst"), current)
            w = waste(
                current.filter(F.col("id") >= 0), k,
                vertices=vertices,
                n_nodes=arrived_ids.filter(F.col("id") >= 0).count(),
            )
            metrics_rows.append(
                (b, float(w), float(cm["edges_cut"]), float(cm["cut_ratio"]),
                 float(cm["total_comm_volume"]), float(m_sub), float(n_fixed))
            )
        sub.unpersist()
        release(old_cur)
        release(old_fixed)

        if checkpointer is not None:
            metrics_df = spark.createDataFrame(
                metrics_rows,
                "batch int, waste double, edges_cut double, cut_ratio double, "
                "tcv double, m_sub double, n_fixed double",
            )
            from ..checkpoint import Counters

            checkpointer.save(
                b + 1,
                {"assignments": current, "fixed": fixed_ids.select("id"), "metrics": metrics_df},
                Counters(edges_scanned=int(m_sub)),
                params={"algorithm": "arrival", "n_batches": n_batches},
            )

    # final hygiene: anything never fixed is unassigned (reference
    # batch_arrival tail, :507-509); drop virtual nodes
    final = (
        current.join(fixed_ids.select("id").withColumn("_f", F.lit(True)), "id", "left")
        .select(
            "id",
            F.when(F.col("_f"), F.col("partition")).otherwise(F.lit(-1)).alias("partition"),
        )
    )
    final = remove_virtual_nodes(final)

    metrics_df = spark.createDataFrame(
        metrics_rows or [(0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)],
        "batch int, waste double, edges_cut double, cut_ratio double, "
        "tcv double, m_sub double, n_fixed double",
    )
    info = {
        "n_arrivals": n_arrivals,
        "cut_off_value": cut_off_value,
        "n_batches": n_batches,
    }
    return final, metrics_df, info


def bottleneck_arrival_order(
    edges: DataFrame,
    arrivals: DataFrame,
    batch_size: int,
    max_component: int = 200_000,
) -> DataFrame:
    """Re-sequence each arrival batch by bottleneck centrality (F11).

    The reference's ``bottleneck_node_ordering`` (utils.py:1285-1354 +
    ``_prepareGraphForRCentrality``): take the subgraph induced by the
    batch's nodes, score each connected sub-network with BN centrality
    (there via an R centiserve subprocess per sub-network, here via the
    in-engine ``bottleneck_centrality`` kernel), stream high scores first,
    and append the batch's degree-0 ("alone") nodes at the end. Ties and
    sub-network interleave order are not reproducible from the reference
    (R's print order); ours is documented: (alone ASC, bn DESC, id ASC)
    within a batch.

    Spark-first shape: instead of a per-batch driver loop, EVERY batch's
    induced subgraph is scored in one shot — vertices get composite ids
    ``batch·(max_id+1) + id``, one connected-components pass labels all
    sub-networks of all batches simultaneously, and one
    ``applyInPandas`` kernel scores them all in parallel.

    Returns the re-sequenced ``(id, arrived, seq, batch, bottleneck)``
    rows for arrived nodes; ``seq`` is the new global stream position
    (batch-major). Rows with ``arrived = 0`` are not returned (their seq
    is never consumed downstream).
    """
    from ..graph.centrality import bottleneck_centrality
    from ..graph.edges import assign_dense_ids

    ranked = assign_dense_ids(
        arrivals.filter(F.col("arrived") == 1).select("id", "seq"),
        ["seq", "id"],
        id_col="_rank",
    ).withColumn(
        "batch",
        ((F.col("_rank") - F.col("_rank") % batch_size) / batch_size).cast("long"),
    )
    ranked = materialize(ranked)
    off = int(ranked.agg(F.max("id")).first()[0] or 0) + 1

    bsrc = ranked.select(F.col("id").alias("src"), F.col("batch").alias("_bs"))
    bdst = ranked.select(F.col("id").alias("dst"), F.col("batch").alias("_bd"))
    batch_edges = (
        edges.select("src", "dst")
        .join(bsrc, "src")
        .join(bdst, "dst")
        .filter(F.col("_bs") == F.col("_bd"))
        .select(
            F.col("_bs").alias("_g"),
            (F.col("_bs") * off + F.col("src")).alias("src"),
            (F.col("_bs") * off + F.col("dst")).alias("dst"),
        )
    )
    # batches are a known bounded partitioning, so the kernel groups by
    # batch directly — no connected-components pass needed (the BFS never
    # leaves a component, so multi-component batches score identically)
    bn = bottleneck_centrality(
        batch_edges, max_component=max_component, group_col="_g"
    ).select(
        (F.col("id") % off).alias("id"),
        ((F.col("id") - F.col("id") % off) / off).cast("long").alias("batch"),
        "bottleneck",
    )
    scored = ranked.join(bn, ["id", "batch"], "left").select(
        "id",
        "batch",
        F.col("bottleneck").isNull().alias("_alone"),
        F.coalesce("bottleneck", F.lit(0)).alias("bottleneck"),
    )
    w = Window.partitionBy("batch").orderBy(
        F.col("_alone").asc(), F.col("bottleneck").desc(), F.col("id").asc()
    )
    return scored.select(
        "id",
        F.lit(1).alias("arrived"),
        (F.col("batch") * batch_size + F.row_number().over(w) - 1).alias("seq"),
        "batch",
        "bottleneck",
    )
