"""Clique/hyperedge construction for hypergraph partitioning (J3).

The reference turns the batch graph into PaToH's hypergraph model —
maximal cliques become nets, each net weighted by an "expansion" over its
member node weights (``partitioners/patoh/patoh_data.py:62-270``,
``nx.find_cliques`` at ``:151-154``). The C solver itself is the declared
F7 non-goal; this module re-expresses the *data construction* Spark-first:

- ``maximal_cliques``: per-group Bron–Kerbosch-with-pivot Arrow kernel
  (deterministic enumeration order), same bounded-group contract as
  ``bottleneck_centrality`` — the reference only ever runs it on batch
  graphs, because maximal-clique enumeration is exponential in general.
- ``hyperedge_weights``: the reference's 8 expansion modes (avg / total /
  smallest / largest / product over member node weights, ``±squared`` /
  ``±sqrt``, ``no_expansion``) and the ``_complete`` pairwise-min variant,
  all as JVM-side higher-order-function arithmetic over the id-sorted
  member-weight array — no Python in the weight path.
- ``patoh_arrays``: the xpins/pins/cwghts/nwghts CSR export the solver
  handoff needs (driver-side, bounded by the batch contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clique_kernel(max_component: int):
    """Per-group maximal-clique enumerator for ``applyInPandas``.

    Bron–Kerbosch with pivoting; candidates are iterated in ascending id
    order and the pivot is the (P ∪ X)-vertex covering the most of P
    (ties → smallest id), so the enumeration — and therefore the emitted
    clique list — is deterministic. Cliques are emitted with an
    ascending-sorted ``members`` array and ordered by that array.
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
                f"maximal_cliques: group has {n} nodes "
                f"(max_component={max_component}); enumerate per-batch "
                "subgraphs — maximal-clique enumeration is exponential on "
                "arbitrary graphs"
            )
        idx = {int(v): i for i, v in enumerate(ids)}
        adj: list[set] = [set() for _ in range(n)]
        for a, b in zip(src, dst):
            if a != b:
                ia, ib = idx[int(a)], idx[int(b)]
                adj[ia].add(ib)
                adj[ib].add(ia)

        out: list[list[int]] = []

        def bk(r: list, p: set, x: set) -> None:
            if not p and not x:
                out.append(sorted(int(ids[v]) for v in r))
                return
            pivot = min(
                sorted(p | x), key=lambda u: (-len(p & adj[u]), u)
            )
            for v in sorted(p - adj[pivot]):
                bk(r + [v], p & adj[v], x & adj[v])
                p = p - {v}
                x = x | {v}

        bk([], set(range(n)), set())
        out.sort()
        return pd.DataFrame({"members": out if out else pd.Series([], dtype=object)})

    return fn


def maximal_cliques(
    edges: DataFrame, max_component: int = 10_000, group_col: str | None = None
) -> DataFrame:
    """``(members: array<long>)`` — one row per maximal clique.

    ``group_col`` names a column of ``edges`` giving a bounded grouping
    (e.g. the arrival batch); cliques never span groups because the input
    edges never do. Without it the whole input is one group — callers own
    the boundedness (the ``max_component`` guard raises otherwise).
    Isolated vertices (absent from ``edges``) are their own trivial
    cliques by definition; callers append them if needed — same
    convention as ``connected_components``.
    """
    canon = (
        edges.select(
            *([F.col(group_col)] if group_col else [F.lit(0).alias("_g")]),
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return (
        canon.groupBy(group_col or "_g")
        .applyInPandas(_clique_kernel(max_component), "members array<long>")
        .select("members")
    )


EXPANSION_MODES = (
    "no_expansion",
    "avg_node_weight",
    "total_node_weight",
    "smallest_node_weight",
    "largest_node_weight",
    "product_node_weight",
)


def _expand(arr, mode: str):
    """Base expansion over a weight array (reference
    ``patoh_data.py:217-270``): aggregate, optional square/sqrt, banker's
    round, floor 1. An empty array yields 1 (the reference's loop never
    initializes and 0 floors to 1)."""
    n = F.size(arr)
    if "avg_node_weight" in mode:
        agg = F.aggregate(arr, F.lit(0.0), lambda a, w: a + w) / n
    elif "total_node_weight" in mode:
        agg = F.aggregate(arr, F.lit(0.0), lambda a, w: a + w)
    elif "smallest_node_weight" in mode:
        agg = F.array_min(arr)
    elif "largest_node_weight" in mode:
        agg = F.array_max(arr)
    elif "product_node_weight" in mode:
        agg = F.aggregate(arr, F.lit(1.0), lambda a, w: a * w)
    elif "no_expansion" in mode:
        return F.lit(1).cast("long")
    else:
        raise ValueError(f"unknown hyperedge expansion mode: {mode}")
    agg = F.when(n == 0, F.lit(0.0)).otherwise(agg.cast("double"))
    if "squared" in mode:
        agg = agg * agg
    if "sqrt" in mode:
        agg = F.sqrt(agg)
    rounded = F.bround(agg, 0)  # Python round() is banker's — so is bround
    return F.greatest(rounded, F.lit(1.0)).cast("long")


def hyperedge_weights(
    cliques: DataFrame,
    vertices: DataFrame | None = None,
    mode: str = "no_expansion",
) -> DataFrame:
    """``(members, hyperedge_weight)`` — net weights for PaToH's model.

    ``vertices``: optional ``(id, weight)``; members missing from it
    weigh 1 (the reference's node-weight try/except default).
    ``mode`` is any reference mode string, e.g.
    ``"avg_node_weight_squared"``, ``"product_node_weight_sqrt"``,
    ``"smallest_node_weight_complete"``. The ``_complete`` variant first
    replaces the member-weight list with the pairwise **min** over all
    unordered member pairs (reference ``:173-214``: the commented-out
    sqrt/square pairings are dead code; ``min(w1, w2)`` is live), then
    applies the base expansion. Sorting the weight array ascending makes
    the pairwise-min multiset a closed form: the i-th smallest weight
    appears (n−1−i) times — no pair explosion, still pure JVM
    arithmetic.
    """
    w_arr = F.col("_ws")
    if vertices is not None:
        exploded = (
            cliques.withColumn("_cid", F.monotonically_increasing_id())
            .select("_cid", "members", F.explode("members").alias("id"))
            .join(
                vertices.select("id", F.col("weight").alias("_w")), "id", "left"
            )
            .groupBy("_cid")
            .agg(
                F.first("members").alias("members"),
                F.sort_array(
                    F.collect_list(F.coalesce(F.col("_w"), F.lit(1.0)))
                ).alias("_ws"),
            )
        )
        base = exploded
    else:
        base = cliques.withColumn(
            "_ws", F.transform("members", lambda _: F.lit(1.0))
        )
    if "_complete" in mode:
        # pairwise-min multiset of the ascending array: element i repeats
        # (n-1-i) times
        n = F.size(w_arr)
        pair_arr = F.flatten(
            F.transform(
                w_arr,
                lambda w, i: F.array_repeat(
                    w, F.greatest(n - i - 1, F.lit(0)).cast("int")
                ),
            )
        )
        base = base.withColumn("_ws", pair_arr)
    out = base.withColumn("hyperedge_weight", _expand(w_arr, mode))
    return out.select("members", "hyperedge_weight")


def patoh_arrays(
    cliques_weighted: DataFrame, n_vertices: int, vertices: DataFrame | None = None
):
    """Driver-side CSR export (xpins, pins, cwghts, nwghts) for a solver
    handoff — the exact arrays ``patoh_data._exportArrays`` builds. Bounded
    by the batch contract (collect of the enumerated cliques)."""
    import numpy as np

    rows = (
        cliques_weighted.select("members", "hyperedge_weight")
        .orderBy(F.col("members"))
        .collect()
    )
    xpins = np.zeros(len(rows) + 1, dtype=np.int64)
    pins: list[int] = []
    nwghts = np.ones(len(rows), dtype=np.int64)
    for i, r in enumerate(rows):
        xpins[i] = len(pins)
        pins.extend(r["members"])
        nwghts[i] = r["hyperedge_weight"]
    xpins[len(rows)] = len(pins)
    cwghts = np.ones(n_vertices, dtype=np.int64)
    if vertices is not None:
        for r in vertices.select("id", "weight").collect():
            if 0 <= r["id"] < n_vertices:
                cwghts[r["id"]] = int(r["weight"])
    return xpins, np.asarray(pins, dtype=np.int64), cwghts, nwghts


def clique_pins(cliques: DataFrame) -> DataFrame:
    """``(net: long, pin: long)`` — flatten cliques to hypergraph pins.

    The net id is the xxhash64 of the sorted member list: deterministic
    (stable across runs/partitionings, unlike monotonically_increasing_id)
    and collision-safe at gate scale; maximal cliques are distinct sets so
    the key is unique with overwhelming probability.
    """
    return cliques.select(
        F.xxhash64(F.concat_ws(",", F.transform(F.array_sort("members"),
                                                lambda m: m.cast("string"))))
        .alias("net"),
        F.explode("members").alias("pin"),
    )


def hypergraph_tcv(pins: DataFrame, assignments: DataFrame) -> float:
    """Connectivity-1 objective: Σ_nets (λ(net) − 1), λ = number of
    distinct partitions among the net's pins — PaToH's PATOH_CONPART
    objective (reference patoh.py:49-146 selects min-TCV solutions)."""
    j = pins.join(
        assignments.select(F.col("id").alias("pin"), "partition"), "pin"
    )
    lam = j.groupBy("net").agg(F.count_distinct("partition").alias("lam"))
    row = lam.agg(F.sum(F.col("lam") - 1).alias("t")).first()
    return float(row["t"] or 0.0)


def refine_tcv(
    pins: DataFrame,
    assign: DataFrame,
    k: int,
    slack: float = 0.1,
    sweeps: int = 2,
    vertices: DataFrame | None = None,
    fixed: DataFrame | None = None,
) -> tuple[DataFrame, "dict[str, Any]"]:
    """Connectivity-objective (λ−1) local move sweeps over a hypergraph —
    the in-engine answer to the PaToH role's OPTIMIZATION step (the
    best-of-N harness only *selects* by min TCV; this pass *improves* it).

    Exact move gain, derived per net containing v (move v: A→B):
    the net drops A from its span iff v is its only A-pin, and adds B iff
    it has no B-pin, so

        ΔTCV(v→B) = #nets∋v with no B-pin − #nets∋v where v is the sole A-pin
        gain(v→B) = only_A(v) + presence_B(v) − nets(v)   (= −ΔTCV)

    where presence_B(v) = #nets∋v with ≥1 B-pin. Everything is two
    grouped aggregations (net×partition pin counts, then per-vertex
    presence) plus joins — no per-net Python. Best target per vertex by
    (gain DESC, partition ASC); moves admitted per target in (gain DESC,
    id ASC) first-fit-prefix order while the target's weight stays under
    (1+slack)·total/k — the same admission discipline as
    multilevel.refine_boundary, pinned by the same style of sequential
    oracle in tests. Early-stops on a sweep with zero admitted moves.
    """
    from pyspark.sql import Window
    from ..graph.iterutil import materialize, release

    pins = pins.persist()
    w_col = (
        vertices.select("id", F.col("weight").alias("_w"))
        if vertices is not None
        else None
    )
    if vertices is not None:
        total_w = float(vertices.agg(F.sum("weight")).first()[0] or 0.0)
    else:
        total_w = float(assign.count())
    capacity = (1.0 + slack) * total_w / k

    state = materialize(assign.select("id", "partition"))
    moves: list[int] = []
    for _ in range(sweeps):
        a_pin = state.select(F.col("id").alias("pin"), "partition")
        pj = pins.join(a_pin, "pin")
        pincnt = pj.groupBy("net", "partition").agg(F.count("*").alias("c"))
        nets_v = pins.groupBy("pin").agg(F.count("*").alias("nv"))
        presence = (
            pins.join(pincnt.withColumnRenamed("partition", "q"), "net")
            .groupBy("pin", "q")
            .agg(F.count("*").alias("pres"))
        )
        only_a = (
            pj.join(pincnt, ["net", "partition"])
            .filter(F.col("c") == 1)
            .groupBy("pin")
            .agg(F.count("*").alias("oa"))
        )
        cand = (
            presence.join(a_pin, "pin")
            .filter(F.col("q") != F.col("partition"))
            .join(nets_v, "pin")
            .join(only_a, "pin", "left")
            .select(
                F.col("pin").alias("id"),
                F.col("partition").alias("from_p"),
                F.col("q").alias("to_p"),
                (
                    F.coalesce("oa", F.lit(0)) + F.col("pres") - F.col("nv")
                ).cast("double").alias("gain"),
            )
        )
        best = cand.groupBy("id", "from_p").agg(
            F.max(
                F.struct(F.col("gain"), (-F.col("to_p")).alias("np"))
            ).alias("b")
        )
        movers = best.filter(F.col("b.gain") > 0).select(
            "id",
            "from_p",
            (-F.col("b.np")).cast("int").alias("to_p"),
            F.col("b.gain").alias("gain"),
        )
        if fixed is not None:
            movers = movers.join(fixed.select("id"), "id", "left_anti")
        if w_col is not None:
            movers = movers.join(w_col, "id", "left").select(
                "id", "to_p", "gain", F.coalesce("_w", F.lit(1.0)).alias("w")
            )
            sizes = (
                state.join(w_col, "id", "left")
                .groupBy(F.col("partition").alias("to_p"))
                .agg(F.sum(F.coalesce("_w", F.lit(1.0))).alias("size"))
            )
        else:
            movers = movers.select("id", "to_p", "gain", F.lit(1.0).alias("w"))
            sizes = state.groupBy(F.col("partition").alias("to_p")).agg(
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
            .select("id", "to_p")
        )
        new_state = state.join(admitted, "id", "left").select(
            "id", F.coalesce("to_p", "partition").cast("int").alias("partition")
        )
        prev = state
        state = materialize(new_state)
        n_moved = admitted.count()
        release(prev)
        moves.append(int(n_moved))
        if n_moved == 0:
            break
    pins.unpersist()
    return state, {"moves": moves}
