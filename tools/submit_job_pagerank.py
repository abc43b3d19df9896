"""spark-submit smoke job: synthetic link graph → PageRank → one JSON line.

Runs with the package shipped via --py-files (tools/run_spark_submit.sh) —
no repo checkout needed on the executors, proving the cluster launch path.
"""

import json
import os

from pyspark.sql import SparkSession

from graph_partitioning_spark.graph import pagerank
from graph_partitioning_spark.sources import synthetic_edges


def main() -> None:
    spark = SparkSession.builder.appName("gps-submit-smoke").getOrCreate()
    n_pages = int(os.environ.get("SPARK_GRAFT_SUBMIT_PAGES", "200000"))
    edges = synthetic_edges(spark, n_pages=n_pages).persist()
    m = edges.count()
    ranks, info = pagerank(edges, tol=1e-6, max_iter=30)
    top = ranks.orderBy(ranks.pagerank.desc()).limit(1).collect()[0]
    print(
        json.dumps(
            {
                "edges": m,
                "iterations": info["iterations"],
                "converged": info["converged"],
                "top_vertex": int(top["id"]),
                "top_rank": round(float(top["pagerank"]), 8),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
