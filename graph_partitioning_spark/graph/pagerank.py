"""PageRank as iterative DataFrame joins + grouped aggregations (north-star T1).

Semantics (matched 1e-6 allclose by tests/test_pagerank.py against a NumPy
power-iteration oracle):

    r'(v) = (1-d)/n + d * ( Σ_{u→v} r(u)/outdeg(u)  +  dangling_mass/n )

with dangling_mass = Σ r(u) over vertices with outdeg 0, convergence when
max_v |r'(v) − r(v)| < tol.

Plan shape per superstep (the reference's vote join J1 shape,
/root/reference/graph_partitioning/fennel.pyx:19-38, re-expressed relationally):
  links ⋈ ranks on src  →  groupBy(dst).sum  →  left join back onto ranks.

Scale notes:
- ``links`` (edge table with per-edge contribution share) is repartitioned by
  src once and persisted — only the (small, 2-column) rank table shuffles per
  iteration.
- The groupBy(dst) aggregation is a partial (map-side) + final hash agg, so a
  power-law hub vertex receives pre-combined partial sums, one per shuffle
  partition, not one message per in-edge — the classic combiner answer to
  skew; AQE skew-join handles the join side.
- Dangling mass is a single column-pruned scan over ranks (a static
  ``is_dangling`` flag avoids a per-iteration anti-join).
- Every ``checkpoint_every`` supersteps the rank state is written durably
  with a manifest (counters: edges_scanned, messages_exchanged, skew_ratio)
  and re-read, breaking lineage; a killed run resumes from the last manifest.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointManager, Counters
from .iterutil import materialize, materialize_static, release


def _prepare(edges: DataFrame, weighted: bool, num_partitions: int):
    """links(src, dst, share), vertices(id), dangling flags — all static."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", "weight")
    if weighted:
        totals = e.groupBy("src").agg(F.sum("weight").alias("w_out"))
        links = e.join(totals, "src").select(
            "src", "dst", (F.col("weight") / F.col("w_out")).alias("share")
        )
    else:
        outdeg = e.groupBy("src").agg(F.count("*").alias("out_degree"))
        links = e.join(outdeg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("share")
        )
    # plan-truncation barrier for deep caller lineage, plain persist for
    # shallow plans (see iterutil.materialize_static): every superstep's
    # logical plan embeds these static frames, and un-truncated, a deep
    # lineage (pages → extraction → edges) is re-analyzed per superstep —
    # analysis grew ~2.5× per iteration (1.3s → 11.4s by superstep 4 on a
    # 2,000-page graph). Either variant keeps the hash partitioning, so
    # the per-superstep join still shuffles only the rank table.
    links = materialize_static(links.repartition(num_partitions, "src"))

    # vertices derive FROM LINKS, not from e: the share join is inner on
    # src with every src present in its own degree table, so links carries
    # exactly e's edge set — and reading the just-cached/truncated links
    # costs one cache scan where a second derivation from e would replay
    # the caller's whole edge pipeline (measured −1.5s cold at sf0.1).
    # One aggregation replaces the old union→distinct + distinct + left-join
    # chain (three shuffles over the endpoint multiset, plus a join): an id
    # is dangling iff it never appears as src, so has_out = max over a
    # per-endpoint flag — partial (map-side) agg collapses the 2|E| rows
    # before the single shuffle. Same id set, same booleans.
    endpoints = links.select(
        F.col("src").alias("id"), F.lit(True).alias("has_out")
    ).unionAll(links.select(F.col("dst").alias("id"), F.lit(False).alias("has_out")))
    # plain persist, no truncation barrier: unlike links, vertices never
    # enters the superstep loop — it is analyzed exactly twice (the n count
    # and the initial ranks frame), and its plan reads the links barrier,
    # not the caller's lineage
    vertices = (
        endpoints.groupBy("id")
        .agg(F.max("has_out").alias("has_out"))
        .repartition(num_partitions, "id")
        .persist()
    )
    return links, vertices


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    num_partitions: int | None = None,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Run PageRank to convergence. Returns (ranks(id, pagerank), info).

    info: {"iterations", "converged", "delta", "counters": {...}}.
    With a ``checkpointer``, state + manifest land every ``checkpoint_every``
    supersteps and an interrupted run restarts from the last manifest.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    import time as _t

    _prep0 = _t.time()
    links, vertices = _prepare(edges, weighted, num_partitions)
    # ONE job fills the links barrier AND returns m + the in-degree skew:
    # m = Σ per-dst counts, so a separate links.count() plus a skew pass
    # would scan the edge table twice more for numbers this aggregation
    # already has (−2 full passes over E in the prepare phase)
    indeg_stats = (
        links.groupBy("dst").agg(F.count("*").alias("d"))
        .agg(
            F.sum("d").alias("m"),
            F.max("d").alias("mx"),
            F.avg("d").alias("av"),
        )
        .first()
    )
    m = int(indeg_stats["m"] or 0)
    n = vertices.count()
    if n == 0:
        empty = spark.createDataFrame([], "id long, pagerank double")
        return empty, {"iterations": 0, "converged": True, "delta": 0.0, "counters": {}}

    skew_ratio = float(indeg_stats["mx"]) / max(float(indeg_stats["av"]), 1e-12)

    counters = Counters(skew_ratio=skew_ratio)
    _prep_sec = _t.time() - _prep0
    _loop0 = _t.time()
    start_step = 0
    ranks = None
    if checkpointer is not None and resume:
        manifest = checkpointer.latest_manifest()
        if manifest is not None and manifest.get("params", {}).get("algorithm") == "pagerank":
            start_step = manifest["superstep"]
            counters = Counters.from_dict(manifest["counters"])
            ranks = checkpointer.load_states(spark, manifest)["ranks"]
    fresh_start = ranks is None
    if fresh_start:
        # fill the initial-state cache with the dangling aggregate itself
        # (an aggregate scans every partition), then harden to a
        # LogicalRDD below — materialize()'s separate count here was a
        # redundant prep job over state the aggregate evaluates anyway.
        # The hard truncation still matters: left as a projection over
        # the vertices InMemoryRelation, every superstep's analyzed plan
        # would chain through the vertices/links derivations back to the
        # caller's lineage, and the convergence-superstep analysis was
        # measured ~2s slower at sf0.1 for exactly that reason.
        ranks = vertices.select(
            "id", F.lit(1.0 / n).alias("rank"), "has_out"
        ).persist()
    else:
        ranks = materialize(ranks)

    delta = float("inf")
    it = start_step
    converged = False
    base = (1.0 - damping) / n
    iter_secs: list[float] = []
    import os as _os
    import time as _time

    _debug = bool(_os.environ.get("SPARK_GRAFT_DEBUG"))
    # ONE job per superstep: the new rank state is persisted lazily and the
    # combined delta+dangling aggregate both populates the cache (an
    # aggregate scans every partition) and returns the convergence delta and
    # the next iteration's dangling mass. A separate materialize-count job
    # would re-analyze the same deep plan on the driver a second time —
    # planning + scheduling are serial, so at high core counts that second
    # job is what caps scaling efficiency, not the superstep's real work.
    # States are persisted (real stats, constant digits); the plan is
    # hard-truncated via localCheckpoint only every few supersteps (reading
    # from the already-populated cache), which bounds plan depth while
    # keeping the common path at a single job.
    TRUNCATE_EVERY = 4
    dangling = (
        ranks.filter(~F.col("has_out")).agg(F.sum("rank")).first()[0] or 0.0
    )
    if fresh_start:
        # cache populated by the aggregate above — the eager checkpoint is
        # a cache→checkpoint copy yielding the flat LogicalRDD the loop's
        # analysis cost depends on (see the fresh_start note)
        cached = ranks
        ranks = cached.localCheckpoint(eager=True)
        cached.unpersist()
    # `state` is always the EXACT frame that was persisted/materialized —
    # non-cascading unpersist only frees a cache whose plan is sameResult
    # with the argument, so releasing a Project over it (ranks =
    # state.drop('_old')) would silently leak every persist-only superstep's
    # MEMORY_AND_DISK blocks for the job lifetime.
    state = ranks
    pending_release: list[DataFrame] = []
    while it < max_iter:
        it += 1
        _t0 = _time.time()
        contribs = (
            links.join(ranks.select("id", "rank"), links.src == F.col("id"))
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("rank")).alias("contrib"))
        )
        new_ranks = (
            ranks.join(contribs, ranks.id == contribs.dst, "left")
            .select(
                ranks.id,
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
                F.col("has_out"),
                F.col("rank").alias("_old"),
            )
        )
        truncate = (it % TRUNCATE_EVERY == 0) or checkpointer is not None
        new_ranks = new_ranks.persist(StorageLevel.MEMORY_AND_DISK)
        row = new_ranks.agg(
            F.max(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
            F.sum(F.when(~F.col("has_out"), F.col("rank"))).alias("dangling"),
        ).first()
        delta = row["delta"]
        dangling = row["dangling"] or 0.0
        _t1 = _time.time()
        if truncate:
            # cache is already populated by the aggregate scan above, so the
            # eager checkpoint is a cache→checkpoint copy with real (small)
            # carried stats — the compounding-sizeInBytes trap documented in
            # iterutil.materialize never arises
            cached = new_ranks
            new_ranks = cached.localCheckpoint(eager=True)
            cached.unpersist()
        if _debug:
            print(
                f"[pagerank] iter={it} job={_t1 - _t0:.2f}s "
                f"trunc={_time.time() - _t1:.2f}s delta={delta:.2e}",
                flush=True,
            )
        counters.edges_scanned += m
        counters.messages_exchanged += m
        iter_secs.append(round(_time.time() - _t0, 3))

        old_state = state
        state = new_ranks
        ranks = new_ranks.drop("_old")
        if checkpointer is not None and (it % checkpoint_every == 0 or delta < tol):
            checkpointer.save(
                it,
                {"ranks": ranks},
                counters,
                params={"algorithm": "pagerank", "damping": damping, "tol": tol, "delta": delta},
            )
        if truncate:
            # the new state is self-contained — everything older can go
            release(old_state)
            for df in pending_release:
                release(df)
            pending_release = []
        else:
            # old state may still back new_ranks' un-truncated lineage;
            # defer its release until the next hard truncation
            pending_release.append(old_state)
        if delta < tol:
            converged = True
            break

    if pending_release:
        # exited on a persist-only superstep: cut the final state loose from
        # its un-truncated lineage, then drain every deferred ancestor —
        # otherwise their caches outlive the call. The state's cache is
        # already populated (the delta aggregate scanned every partition),
        # so the eager checkpoint is a cache→checkpoint copy with real
        # stats — materialize()'s persist+count here would re-run a
        # redundant count job over the same populated cache.
        final_state = state.localCheckpoint(eager=True)
        release(state)
        for df in pending_release:
            release(df)
        pending_release = []
        state = final_state
        ranks = state.drop("_old") if "_old" in state.columns else state

    if it == start_step and start_step == 0:
        # zero supersteps ran (max_iter=0): the state is still the initial
        # projection over the static frames — make it self-contained before
        # their blocks are released below
        state = materialize(state)
        ranks = state

    # the final state is self-contained (materialized above or at the last
    # truncation), so the static frames' checkpoint blocks can go now —
    # previously they stayed pinned for the session lifetime
    release(links)
    release(vertices)

    result = ranks.select("id", F.col("rank").alias("pagerank"))
    info = {
        "prepare_sec": round(_prep_sec, 3),
        "loop_sec": round(_t.time() - _loop0, 3),
        "iterations": it,
        "converged": converged,
        "delta": float(delta),
        "counters": counters.to_dict(),
        # per-superstep wall clock: superstep 1 carries one-time JVM JIT /
        # codegen warmup (measured ~40% over steady state at 195M edges);
        # steady-state throughput reads iter_secs[1:]
        "iter_secs": iter_secs,
        "n_vertices": n,
        "n_edges": m,
    }
    return result, info
