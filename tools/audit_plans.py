"""Regenerate PLANS.md — physical-plan audit of headline queries."""

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as e
    from graph_partitioning_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    sections = []

    def grab(name, df, note):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        keep = [
            l
            for l in buf.getvalue().splitlines()
            if any(
                k in l
                for k in (
                    "ReadSchema", "PushedFilters", "Join", "Exchange",
                    "HashAggregate", "Scan parquet", "WholeStageCodegen",
                    "AdaptiveSparkPlan", "Window", "Sort ",
                )
            )
        ]
        sections.append(f"## {name}\n\n{note}\n\n```\n" + "\n".join(keep[:30]) + "\n```\n")

    # --- hard assertions: plans that must NOT contain a single-task funnel ---
    # arrival ranking (partitioning/arrival.py) must use the range-partition
    # + per-partition row_number pattern, never a global window: a global
    # ORDER BY materializes as Exchange SinglePartition
    import io as _io

    from pyspark.sql import functions as F
    from graph_partitioning_spark.graph.edges import assign_dense_ids

    arrivals = spark.range(0, 50_000).select(
        F.col("id"), F.lit(1).alias("arrived"), (F.col("id") * 7 % 50_000).alias("seq")
    )
    ranked = assign_dense_ids(
        arrivals.filter(F.col("arrived") == 1).select("id", "seq"),
        ["seq", "id"],
        id_col="arrival_rank",
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        ranked.explain("formatted")
    plan_txt = buf.getvalue()
    assert "SinglePartition" not in plan_txt, (
        "arrival ranking plan regressed to a single-task global sort:\n" + plan_txt
    )
    print("[audit] arrival ranking: no SinglePartition exchange — OK")

    # fennel centrality reorder (degree_hl/leverage_hl bucketing) must use
    # the same pattern — a partition-less ntile window would show up as an
    # Exchange SinglePartition funneling every (id, score) pair into one task
    from graph_partitioning_spark.partitioning.fennel import centrality_bucketed

    fake_state = spark.range(0, 100_000).select(
        F.col("id"), F.lit(-1).alias("partition"), F.lit(False).alias("fixed")
    )
    fake_score = spark.range(0, 100_000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("_score")
    )
    bucketed = centrality_bucketed(fake_state, fake_score, 8, 100_000)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        bucketed.explain("formatted")
    plan_txt = buf.getvalue()
    assert "SinglePartition" not in plan_txt, (
        "fennel centrality bucketing regressed to a single-task global sort:\n"
        + plan_txt
    )
    print("[audit] fennel centrality bucketing: no SinglePartition exchange — OK")

    # CSR block build: the explicit repartition("partition") +
    # sortWithinPartitions(partition, src, dst) must SATISFY the grouped-map
    # operator's distribution+ordering — exactly one Exchange
    # (REPARTITION_BY_COL) and one Sort in the executed plan. A second
    # exchange/sort means applyInPandas stopped reusing them and the
    # "kernel receives shuffle-sorted adjacency" invariant silently broke.
    from graph_partitioning_spark.plans.csr import build_csr_blocks
    from graph_partitioning_spark.sources import synthetic_edges

    csr_edges = synthetic_edges(spark, 2000)
    csr_assign = spark.range(2000).select(
        "id", F.pmod("id", F.lit(2)).cast("int").alias("partition")
    )
    csr_plan = (
        build_csr_blocks(csr_edges, csr_assign)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_shuffle_ex = csr_plan.count("Exchange hashpartitioning")
    n_sorts = csr_plan.count("Sort [")
    assert n_shuffle_ex == 1 and n_sorts == 1, (
        f"CSR build plan regressed: {n_shuffle_ex} shuffle exchanges / "
        f"{n_sorts} sorts (want 1/1 — grouped-map must reuse the explicit "
        "repartition+sort):\n" + csr_plan
    )
    print("[audit] CSR build: grouped-map reuses the one explicit shuffle+sort — OK")

    # cosine_near_dup: the LSH-bucketed near-dup path must never plan a
    # cartesian/broadcast-nested-loop product — the whole point of banding
    # is that candidates come from a (band, key) equi-join
    from graph_partitioning_spark.data import cosine_near_dup_pairs

    nd_emb = spark.range(0, 5_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 3) % 17).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    nd_plan = (
        cosine_near_dup_pairs(nd_emb, threshold=0.9, bits=8, bands=2, max_bucket=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in nd_plan, (
            f"cosine_near_dup_pairs plan contains {bad} — the banded LSH "
            "equi-join regressed to an all-pairs product:\n" + nd_plan
        )
    print("[audit] cosine_near_dup: equi-join only, no all-pairs product — OK")

    # bottleneck arrival reorder (r3): the only windows allowed are
    # per-batch partitioned ones — a partition-less window would funnel the
    # whole arrival stream through one task
    from graph_partitioning_spark.partitioning.arrival import (
        bottleneck_arrival_order,
    )

    bn_edges = spark.range(0, 5_000).select(
        F.col("id").alias("src"), ((F.col("id") * 13 + 1) % 5_000).alias("dst")
    ).withColumn("weight", F.lit(1.0))
    bn_arr = spark.range(0, 5_000).select(
        "id", F.lit(1).alias("arrived"), F.col("id").alias("seq")
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        bottleneck_arrival_order(bn_edges, bn_arr, 500).explain("formatted")
    plan_txt = buf.getvalue()
    n_single = plan_txt.count("SinglePartition")
    # assign_dense_ids contributes zero; the k-scalar offsets join is a
    # broadcast. Any SinglePartition here means a global window snuck in.
    assert n_single == 0, (
        f"bottleneck_arrival_order plan has {n_single} SinglePartition "
        "exchange(s) — a global window/sort snuck in:\n" + plan_txt
    )
    print("[audit] bottleneck reorder: no SinglePartition exchange — OK")

    # round 4: dedup_clusters must build pairs via banded equi-joins only —
    # a cartesian/BNLJ in the pair path would be quadratic at corpus scale
    dc = e.q_dedup_clusters(spark, sf)
    dc_plan = io.StringIO()
    with redirect_stdout(dc_plan):
        dc.explain("formatted")
    dc_txt = dc_plan.getvalue()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in dc_txt, f"dedup_clusters plans a {bad} — quadratic pair path"
    print("[audit] dedup_clusters: banded equi-joins only, no all-pairs product — OK")

    # round 4: the ann_kmeans probe join must be an equi-join on centroid id
    # (quantizer fit is driver-bounded k-row handoffs; the SCAN-side work is
    # the probe join, and that is what must stay hash-partitioned)
    ak = e.q_ann_kmeans(spark, sf)
    ak_plan = io.StringIO()
    with redirect_stdout(ak_plan):
        ak.explain("formatted")
    ak_txt = ak_plan.getvalue()
    assert "CartesianProduct" not in ak_txt, "ann_kmeans probe plans a cartesian product"
    print("[audit] ann_kmeans: probe path equi-join on centroid id, no cartesian — OK")

    # round 4: single-parse ingest — with the weighted link frame supplied,
    # the edge path must contain NO second Arrow parse (no python eval node)
    from graph_partitioning_spark.graph import (
        build_vertex_dictionary, extract_edges, extract_links, weight_links,
    )
    from graph_partitioning_spark.sources import generate_pages
    pages = generate_pages(spark, n_pages=500)
    weighted = weight_links(extract_links(pages)).persist()
    weighted.count()  # materialize: downstream plans read the cache, not the parse
    verts = build_vertex_dictionary(pages, links=weighted)
    edges4 = extract_edges(pages, verts, weighted=weighted)
    # Text explain can't be used here: InMemoryRelation prints its *stored*
    # plan (which legitimately contains the original Arrow parse) inline.
    # Traverse the executed plan instead — InMemoryTableScan is a leaf, so
    # the walk only sees nodes that would actually run.
    def count_arrow(jplan):
        name = jplan.nodeName()
        n = 1 if ("ArrowEval" in name or "MapInPandas" in name) else 0
        for i in range(jplan.children().size()):
            n += count_arrow(jplan.children().apply(i))
        return n

    n_arrow = count_arrow(edges4._jdf.queryExecution().executedPlan())
    assert n_arrow == 0, (
        f"extract_edges with a supplied link frame executes {n_arrow} "
        "Arrow parse node(s) — the single-parse contract is broken"
    )
    weighted.unpersist()
    print("[audit] single-parse ingest: edge path has zero Arrow parse nodes — OK")

    e._EDGE_CACHE.clear()
    # round 5: embed_text's feature hashing is one projection over the
    # scan. The ONLY admissible Exchange is embed_text's own deliberate
    # small-scan fan-out (hash repartition on doc_id when the scan has
    # fewer splits than cores — a no-op at cluster scale, see
    # embed.py min_tasks); anything else means a real shuffle snuck into
    # what should fuse with the parquet read at 10^12 docs
    import re as _re

    et = e.q_embed_text(spark, sf)
    et_plan = io.StringIO()
    with redirect_stdout(et_plan):
        et.explain("formatted")
    et_txt = et_plan.getvalue()
    et_ex = [
        l for l in et_txt.splitlines() if _re.match(r"^\(\d+\) Exchange", l.strip())
    ]
    assert len(et_ex) <= 1, f"embed_text plans {len(et_ex)} Exchanges:\n{et_txt}"
    if et_ex:
        assert (
            "REPARTITION_BY_NUM" in et_txt or "REPARTITION_BY_COL" in et_txt
        ) and "hashpartitioning(doc_id" in et_txt, (
            "embed_text's single Exchange is not the deliberate doc_id "
            "fan-out repartition:\n" + et_txt
        )
    print(
        "[audit] embed_text: map-only fold; only the deliberate small-scan "
        "fan-out exchange — OK"
    )

    # round 5: refine_level (boundary FM sweep) — admission windows must be
    # per-target partitioned, never a global sort; no all-pairs product
    rl = e.q_refine_level(spark, sf)
    rl_plan = io.StringIO()
    with redirect_stdout(rl_plan):
        rl.explain("formatted")
    rl_txt = rl_plan.getvalue()
    assert "SinglePartition" not in rl_txt, (
        "refine_level plans a SinglePartition exchange — a global window/sort"
    )
    assert "CartesianProduct" not in rl_txt, "refine_level plans a cartesian"
    print("[audit] refine_level: per-target windows, no global sort — OK")

    # round 5: the text->embedding->IVF pipeline keeps the probe equi-join
    em = e.q_embed_kmeans(spark, sf)
    em_plan = io.StringIO()
    with redirect_stdout(em_plan):
        em.explain("formatted")
    em_txt = em_plan.getvalue()
    assert "CartesianProduct" not in em_txt, "embed_kmeans plans a cartesian"
    print("[audit] embed_kmeans: equi-join probe over derived vectors — OK")

    # hash_split must be a pure map-only projection — any Exchange means
    # the "carving a hold-out is one scan" claim broke
    hs = e.q_hash_split(spark, sf)
    hs_txt = hs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in hs_txt, "hash_split plans a shuffle:\n" + hs_txt
    print("[audit] hash_split: map-only projection, zero exchanges — OK")

    # decontaminate: the eval gram set must come in as a BROADCAST join —
    # a sort-merge join here would shuffle the full train-side n-gram
    # explode (corpus × ~30 rows) against a 10^5-row set
    dc = e.q_decontaminate(spark, sf)
    dc_txt = dc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in dc_txt, (
        "decontaminate lost the broadcast eval-gram join:\n" + dc_txt
    )
    assert "CartesianProduct" not in dc_txt, "decontaminate plans a cartesian"
    print("[audit] decontaminate: eval grams broadcast, no cartesian — OK")

    # corpus_funnel: the composed 4-stage pipeline must keep the broadcast
    # eval-gram join and plan no cartesian anywhere in the composition
    cf = e.q_corpus_funnel(spark, sf)
    cf_txt = cf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cf_txt, (
        "corpus_funnel lost the broadcast eval-gram join:\n" + cf_txt
    )
    assert "CartesianProduct" not in cf_txt, "corpus_funnel plans a cartesian"
    print("[audit] corpus_funnel: broadcast decontam stage, no cartesian — OK")

    grab("copurchase_edges", e.copurchase_edges(spark, sf),
         "Basket shape: 2-column pruned scan, partial collect_set map-side, one orderkey shuffle, chained-generator pair expansion (posexplode + suffix explode — quadratic pair stream never materialized as one value), partial+final pair agg — 2 exchanges total (self-join shape needed 4).")
    grab("doc_quality", e.q_doc_quality(spark, sf),
         "Single pruned scan (doc_id, text); all scoring in one WholeStageCodegen projection.")
    grab("ann_topk", e.q_ann_topk(spark, sf),
         "vec_id<8 predicate pushed to the query-side scan; broadcast nested loop over corpus; per-query top-k window.")
    grab("tpch_q1", e.q_tpch_q1(spark, sf),
         "shipdate filter pushed to parquet; map-side partial aggregation before the 6-group shuffle.")
    grab("revenue_by_nation", e.q_revenue_by_nation(spark, sf),
         "Dimension tables broadcast (no shuffle on the fact side until the final small agg).")
    grab("minhash", e.q_minhash(spark, sf),
         "One md5 per shingle; 16 min-aggregates partial-combined map-side; shuffle is 16 longs per doc.")
    grab("media_features", e.q_media_features(spark, sf),
         "Pruned (doc_id, text) scan into one Arrow mapInPandas featurize pass; posexplode JVM-side.")
    grab("embed_text", et,
         "Map-only feature hashing: one pruned (doc_id, text) scan, "
         "md5+fold+normalize as narrow projections; the single Exchange is "
         "the deliberate small-scan fan-out repartition on doc_id (asserted "
         "above — a no-op once the scan has >= cores splits), so the shape "
         "still fuses with the parquet read at 10^12 documents.")
    grab("refine_level", rl,
         "Boundary FM sweep: vote equi-join, struct-max gain argmax, "
         "per-target admission windows (asserted: no SinglePartition).")
    grab("hash_split", hs,
         "Deterministic corpus split: md5-bucket arithmetic in one codegen "
         "projection over a pruned (doc_id) scan — zero exchanges "
         "(asserted above).")
    grab("decontaminate", dc,
         "Eval-set n-gram contamination: train-side n-gram explode feeds a "
         "BROADCAST hash join against the (tiny) distinct eval gram set "
         "(asserted above), then one partial-combined per-doc aggregate — "
         "the only shuffle is two longs per document.")
    grab("corpus_funnel", cf,
         "Composed 4-stage pretraining funnel: quality + langid + md5 "
         "fingerprint in ONE map-only pass over the scan, fingerprint "
         "groupBy + same-key join for exact dedup, decontamination's "
         "broadcast stage joined back on doc_id — the wide text column "
         "never enters a shuffle (asserted: broadcast kept, no cartesian).")

    header = (
        "# PLANS — physical-plan audit of headline queries\n\n"
        "Evidence that the declarative plans hit the optimizations the design\n"
        "promises: predicate pushdown (`PushedFilters`), column pruning\n"
        "(`ReadSchema`), broadcast joins for small sides, map-side partial\n"
        "aggregation, and whole-stage codegen. Regenerate with\n"
        "`python tools/audit_plans.py` (this file's generator).\n\n"
    )
    with open("PLANS.md", "w") as f:
        f.write(header + "\n".join(sections))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
