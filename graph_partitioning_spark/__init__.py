"""graph_partitioning_spark — a PySpark-native link-graph analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
reference research codebase (sbarakat/graph-partitioning): hyperlink-edge
extraction from Common-Crawl-style page tables, FENNEL-style balanced
streaming partitioning, iterative graph algorithms (PageRank, connected
components, label propagation, triangle counting), the reference's full
partition-quality metric suite, and large-scale training-data pipeline
operators (dedup, similarity search, text analysis).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized pandas UDFs for the few kernels built-ins cannot
express, per-superstep parquet checkpoints with manifests for resumability.
"""

__version__ = "0.1.0"
