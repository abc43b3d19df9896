#!/usr/bin/env bash
# Launch the engine via spark-submit --py-files, the cluster deployment path
# the north rule names. Packages graph_partitioning_spark into a zip, ships
# it to the (local-mode stand-in for a) cluster, and runs a supplied job
# script — default: a PageRank smoke over the synthetic link graph.
#
# Usage: tools/run_spark_submit.sh [job.py] [extra spark-submit args...]
# On a real cluster swap --master for yarn/k8s and size executors, e.g.:
#   --master k8s://... --num-executors 1000 --executor-cores 5 \
#   --conf spark.sql.shuffle.partitions=10000
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:-$REPO/tools/submit_job_pagerank.py}"
shift || true
ZIP="$(mktemp -d)/graph_partitioning_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" graph_partitioning_spark -x '*__pycache__*')
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-16}" \
  "$@" "$JOB"
