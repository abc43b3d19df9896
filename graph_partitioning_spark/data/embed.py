"""Deterministic text embeddings: hashed-token random projection.

A real similarity pipeline derives its vectors FROM the corpus text; the
reference's data model stops at token statistics, so this module supplies
the published baseline that needs no model weights: feature hashing
(Weinberger et al., ICML'09 "Feature Hashing for Large Scale Multitask
Learning") — every token hashes to one of ``dims`` buckets with a ±1 sign,
the bucket sums form the raw vector, and the result is unit-normalized.
Sign-hash projections preserve cosine similarity in expectation, which is
exactly what the downstream ANN / near-dup operators consume.

Everything is a pure JVM expression over one corpus scan — split, md5,
higher-order array fold — no shuffle, no Python row path, so at 10^12
documents this is a map-only stage that fuses with the parquet scan.

Determinism contract (the ``embed_text`` gate): the token hash is the
md5-prefix arithmetic every other hash in this repo uses (DuckDB replays
it verbatim); bucket sums are integers; the squared norm is a sum of
integer-valued doubles < 2^53, exact at any summation order; sqrt and the
final division are single IEEE ops on identical inputs — so Spark and the
DuckDB oracle produce bit-identical doubles, no rounding tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMBED_DIMS = 32
# which hash bit supplies the ±1 sign; well above log2(dims) so bucket and
# sign stay independent for any dims ≤ 2^20
SIGN_BIT = 20


def _h32(w):
    """32-bit token hash: first 8 hex chars of md5 — the idiom shared with
    simhash/minhash (dedup.py) and replayed by every DuckDB twin as
    ``('0x' || substr(md5(w), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(w.cast("binary")), 1, 8), 16, 10).cast("long")


def embed_text(
    documents: DataFrame,
    dims: int = EMBED_DIMS,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tasks: int | None = None,
) -> DataFrame:
    """(doc_id, embedding: array<double>) — unit-normalized hashed
    projection of the document's whitespace tokens.

    Per token occurrence (term frequency falls out of iterating
    occurrences, not distinct tokens): bucket = h32 % dims, sign = +1/−1
    from hash bit ``SIGN_BIT``. The per-document fold builds the
    ``dims``-long integer vector in one ``aggregate`` over the token
    array — md5 runs ONCE per token (hashes are precomputed into an array
    before the fold; a naive per-dim lambda would re-hash dims× per
    token). All-empty documents embed as the zero vector.

    ``min_tasks``: the fold is a CPU-heavy NARROW projection, so its
    parallelism is whatever the input scan provides — and a small parquet
    table arrives as ONE split, serializing the entire corpus's token
    hashing onto one core (measured: 26s single-task vs <1.5s at 32 at
    sf0.1). When the input has fewer partitions than
    ``sc.defaultParallelism`` the input is hash-repartitioned on
    ``id_col`` first (hash, not round-robin: no sort-for-determinism
    pass over the wide text column). At cluster scale a 10^12-doc scan
    already has ≥ cores splits and this is a no-op; pass ``min_tasks=0``
    to disable.

    Consumers that reference the embedding column MORE THAN ONCE in a
    single downstream expression (k centroid distances, per-bit
    hyperplane dot products) or explode it must put a materialization
    barrier (``persist``/checkpoint) on this frame first: higher-order
    folds are CodegenFallback expressions that get NO common-subexpression
    elimination, so each extra reference re-runs the whole token fold
    (BENCH.md "interpreted-lambda evaluation cliffs").
    """
    spark = documents.sparkSession
    if min_tasks is None:
        min_tasks = spark.sparkContext.defaultParallelism
    if min_tasks and documents.rdd.getNumPartitions() < min_tasks:
        documents = documents.repartition(min_tasks, F.col(id_col))
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda w: w != ""
    )
    hashes = F.transform(words, _h32)
    zero = F.array_repeat(F.lit(0).cast("long"), dims)
    raw = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.transform(
            acc,
            lambda v, i: v
            + F.when(
                i.cast("long") == F.pmod(h, F.lit(dims)),
                F.when(
                    F.shiftright(h, SIGN_BIT).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ).otherwise(F.lit(0)).cast("long"),
        ),
    )
    # Stage the fold → norm → division as three PROJECTIONS. Inlined, the
    # division lambda's reference to `norm` (which contains the whole token
    # fold) re-evaluates the fold once per output dimension — dims× the
    # work, since higher-order-function lambdas get no common-subexpression
    # elimination. Values are identical; only evaluation structure changes.
    folded = documents.select(F.col(id_col).alias("doc_id"), raw.alias("_raw"))
    # integer-valued doubles: exact at any summation order below 2^53
    norm = F.sqrt(
        F.aggregate(
            F.col("_raw"), F.lit(0.0), lambda a, v: a + (v * v).cast("double")
        )
    )
    normed = folded.select("doc_id", "_raw", norm.alias("_nrm"))
    nrm = F.col("_nrm")
    embedding = F.when(
        nrm > 0, F.transform(F.col("_raw"), lambda v: v.cast("double") / nrm)
    ).otherwise(F.transform(F.col("_raw"), lambda v: F.lit(0.0)))
    return normed.select("doc_id", embedding.alias("embedding"))


def embed_text_sql(
    dims: int = EMBED_DIMS,
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB CTE chain replaying :func:`embed_text` bit-for-bit; yields a
    relation ``embedded(doc_id, embedding)`` the caller can select from or
    splice as the vector source of a downstream similarity oracle.

    DuckDB has no per-row array fold, so the twin takes the relational
    route to the same integers: unnest token occurrences, GROUP BY
    (doc, bucket) sums, then assemble the dense vector against a
    ``range(dims)`` spine — identical bucket sums, identical exact norm,
    identical IEEE division.
    """
    return f"""toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(regexp_split_to_array(lower({text_col}), '\\s+'),
                            x -> x <> '')) AS w
  FROM {source}
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
  FROM toks
),
bucket_sums AS (
  SELECT doc_id, h % {dims} AS b,
         SUM(CASE WHEN (h >> {SIGN_BIT}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS s
  FROM hashed GROUP BY doc_id, h % {dims}
),
spine AS (
  SELECT d.doc_id, r.b
  FROM (SELECT DISTINCT {id_col} AS doc_id FROM {source}) d
  CROSS JOIN (SELECT unnest(range({dims})) AS b) r
),
dense AS (
  SELECT spine.doc_id, spine.b,
         COALESCE(bucket_sums.s, 0)::BIGINT AS v
  FROM spine LEFT JOIN bucket_sums
    ON spine.doc_id = bucket_sums.doc_id AND spine.b = bucket_sums.b
),
norms AS (
  SELECT doc_id, sqrt(SUM(CAST(v * v AS DOUBLE))) AS nrm
  FROM dense GROUP BY doc_id
),
embedded AS (
  SELECT dense.doc_id,
         list(CASE WHEN norms.nrm > 0 THEN CAST(dense.v AS DOUBLE) / norms.nrm
                   ELSE 0.0 END ORDER BY dense.b) AS embedding
  FROM dense JOIN norms ON dense.doc_id = norms.doc_id
  GROUP BY dense.doc_id
)"""
