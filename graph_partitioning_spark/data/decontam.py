"""Eval-set decontamination and deterministic corpus splits.

Two operators every large-scale training-data pipeline runs before a
token reaches a model, both pure JVM-expression DataFrame transformations
with exact ANSI-SQL twins (``__spark_entry__.oracle_sql`` gates them
value-for-value against DuckDB):

- :func:`contamination` — the published n-gram decontamination scheme
  (GPT-3 appendix C / PaLM §C: flag a training document when a word
  n-gram it contains also occurs in a held-out evaluation document).
- :func:`hash_split` — deterministic train/validation/test assignment by
  seeded content-independent hash bucketing, so splits are reproducible
  across runs, engines and re-shards.

Reference analogue: the reference has no corpus ops (its payload is graph
files); these extend the data-pipeline layer next to dedup/textstats.

Scale shape (the 100 TB lens): the eval side of decontamination is tiny
by construction (eval sets are 10^3–10^5 documents), so its distinct
n-gram set broadcasts and the train side stays a map-only scan + one
per-document partial aggregate — no train-side shuffle of n-gram rows
against anything big, and no driver-side state. ``hash_split`` is a
map-only projection (zero shuffles, zero joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import fan_out

#: bucket granularity for hash_split fractions (0.01% resolution)
SPLIT_BUCKETS = 10_000


def word_ngrams(
    documents: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, gram) — one row per DISTINCT word ``n``-gram of the
    casefolded, whitespace-collapsed text.

    A document with fewer than ``n`` words contributes its whole word
    sequence as a single gram (so short eval answers still participate,
    matching the published scheme's "whole-example" fallback); empty
    documents contribute nothing.

    The normalized word array is PROJECTED to a column before the
    per-position ``transform`` lambda touches it — higher-order-function
    lambdas are interpreted with no common-subexpression elimination, so
    referencing the regexp pipeline inside the lambda would re-run it once
    per gram (the measured 29× cliff documented at dedup._shingle_rows).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    words = F.filter(F.split(norm, " "), lambda w: w != "")
    d = fan_out(documents.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"), words.alias("_w")
    )
    w = F.col("_w")
    nw = F.size(w)
    grams = F.when(
        nw >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nw - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))
    return (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
    )


def contamination(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    threshold: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-training-document eval-set n-gram contamination.

    Returns (doc_id, n_ngrams, eval_hits, contamination, contaminated):
    ``n_ngrams`` = the document's distinct word n-grams, ``eval_hits`` =
    how many of those also occur in ANY ``eval_docs`` document,
    ``contamination`` = eval_hits / n_ngrams (rounded to 6 places, 0.0
    for gram-less documents), ``contaminated`` = contamination ≥
    ``threshold``.

    Plan: the eval n-gram set is deduplicated globally and BROADCAST
    (eval sets are small by construction — the asymmetry is the whole
    point of the published scheme), so the train side is one n-gram
    explode feeding a broadcast-hash semi-join and a per-document partial
    aggregate: a single shuffle of two longs per document regardless of
    corpus size. Grams join as strings for exactness; at extreme eval
    sizes hash the gram to a 60-bit md5 prefix on both sides first
    (shrinks the broadcast ~6×, same join shape).
    """
    tg = word_ngrams(documents, n=n, text_col=text_col, id_col=id_col)
    eg = (
        word_ngrams(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select("gram")
        .distinct()
    )
    per_doc = (
        tg.join(F.broadcast(eg.withColumn("_hit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("eval_hits"),
        )
    )
    ids = documents.select(F.col(id_col).alias("doc_id")).distinct()
    contam = F.round(
        F.col("eval_hits") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
    )
    return (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("eval_hits", F.lit(0)).alias("eval_hits"),
            F.coalesce(contam, F.lit(0.0)).alias("contamination"),
            (F.coalesce(contam, F.lit(0.0)) >= threshold).alias("contaminated"),
        )
    )


def with_split(
    documents: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """``documents`` plus deterministic ``bucket`` and ``split`` columns.

    ``bucket`` = first 8 hex chars of md5("<id>:<seed>") as an integer,
    mod :data:`SPLIT_BUCKETS`; ``split`` = the name whose cumulative
    fraction window (in the given dict order) contains the bucket.
    Content-independent (keyed on the id, not the text), engine-portable
    (DuckDB computes the identical md5 prefix), and stable under
    re-sharding — the properties a reproducible corpus split needs. A
    pure projection: filtering on ``split`` costs zero joins and zero
    shuffles, so carving a hold-out out of a 100 TB corpus is one scan.
    Fractions must sum to 1 (±1e-9); default 90/5/5 train/val/test.
    """
    fractions = fractions or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    # F.concat (not concat_ws): a NULL id must propagate to a NULL bucket
    # and fall to the LAST split name, matching the SQL twin's
    # CAST(id AS VARCHAR) || ':<seed>' — concat_ws would silently skip the
    # NULL and hash every NULL id into one shared real bucket
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % SPLIT_BUCKETS
    )
    expr = None
    cum = 0.0
    names = list(fractions.items())
    for name, frac in names[:-1]:
        cum += frac
        edge = int(round(cum * SPLIT_BUCKETS))
        branch = F.when(F.col("bucket") < edge, F.lit(name))
        expr = branch if expr is None else expr.when(F.col("bucket") < edge, F.lit(name))
    last = F.lit(names[-1][0])
    split = last if expr is None else expr.otherwise(last)
    return documents.withColumn("bucket", bucket).withColumn("split", split)


def hash_split(
    documents: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic (doc_id, bucket, split) assignment — the projection
    of :func:`with_split` down to the assignment triple."""
    return with_split(documents, fractions, seed, id_col).select(
        F.col(id_col).alias("doc_id"), "bucket", "split"
    )
