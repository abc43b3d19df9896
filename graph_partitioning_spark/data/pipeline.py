"""Composed pre-training corpus funnel: quality → language → dedup →
decontamination, as one DataFrame program.

A real training-data run chains the individual operators this package
provides; :func:`pretraining_funnel` is that chain, composed the way the
operators are meant to be composed at 100 TB:

- the three per-document text signals (quality composite, language id,
  exact-dup fingerprint) are computed in ONE map-only pass over the
  corpus scan — the expression builders are shared with
  :mod:`textstats` (``quality_parts``, ``lang_score_columns``), so the
  funnel's numbers are bit-identical to the standalone operators and to
  their DuckDB oracle twins;
- exact dedup is one fingerprint groupBy (min doc_id = canonical) and a
  same-key join back;
- decontamination reuses :func:`decontam.contamination`'s broadcast
  semi-join plan.

Every document comes out with its scores and a single ``reason`` — the
FIRST funnel stage that rejected it (pipeline order: low_quality,
language, duplicate, contaminated) or ``kept``. Attaching a reason to
every drop is what makes a corpus run auditable; silent filtering is the
classic pipeline bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import fan_out
from .decontam import contamination
from .textstats import _words, lang_pred_exprs, lang_score_columns, quality_parts


def pretraining_funnel(
    documents: DataFrame,
    eval_docs: DataFrame | None = None,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    ngram: int = 8,
    contamination_threshold: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, quality, pred_lang, is_duplicate, contamination, reason,
    keep) — the composed corpus funnel.

    ``reason`` is the first rejecting stage in pipeline order
    ('low_quality' < ``min_quality`` → 'language' not in ``langs`` →
    'duplicate' exact-dup non-canonical → 'contaminated' ≥
    ``contamination_threshold``) or 'kept'; ``keep`` = 1 iff 'kept'.
    Rejected documents still carry ALL their scores — later stages are
    computed for every document (they share the same passes; skipping
    them would save nothing and lose auditability).

    With ``eval_docs=None`` the contamination stage is skipped
    (contamination 0.0 for every document).

    Scale shape: one map-only scoring pass over the corpus scan, one
    fingerprint aggregate + same-key join (exact dedup), and
    contamination's broadcast plan joined back on ``doc_id`` — the wide
    text column never enters a shuffle.

    NULL text is normalized to '' up front: a NULL md5 fingerprint would
    silently drop the row at the dedup equi-join — exactly the silent
    filtering this funnel exists to prevent — so NULL-text documents
    score as empty (quality 0.3 from the punct term, lang 'und',
    contamination 0.0) and keep their reason row.
    """
    documents = documents.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    d = fan_out(documents.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        _words(text_col).alias("_w"),
    )
    # derive the lowered words from the PROJECTED array — re-deriving from
    # text would run the split+filter twice per row (no CSE across uses)
    d = d.select(
        "doc_id", "_t", "_w",
        F.transform(F.col("_w"), lambda w: F.lower(w)).alias("_wl"),
    )
    p = quality_parts(F.col("_t"), F.col("_w"))
    s = d.select(
        "doc_id",
        F.round(p["quality"], 6).alias("quality"),
        F.md5(F.col("_t")).alias("_fp"),
        *lang_score_columns(F.col("_wl")),
    )
    pred, _hits = lang_pred_exprs()
    s = s.select("doc_id", "quality", "_fp", pred.alias("pred_lang"))

    canon = s.groupBy("_fp").agg(F.min("doc_id").alias("_canon"))
    s = s.join(canon, "_fp")

    if eval_docs is not None:
        c = contamination(
            documents,
            eval_docs,
            n=ngram,
            threshold=contamination_threshold,
            text_col=text_col,
            id_col=id_col,
        ).select("doc_id", "contamination")
        s = s.join(c, "doc_id", "left")
    else:
        s = s.withColumn("contamination", F.lit(0.0))

    contam = F.coalesce(F.col("contamination"), F.lit(0.0))
    reason = (
        F.when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~F.col("pred_lang").isin(*langs), F.lit("language"))
        .when(F.col("doc_id") != F.col("_canon"), F.lit("duplicate"))
        .when(contam >= contamination_threshold, F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return s.select(
        "doc_id",
        "quality",
        "pred_lang",
        (F.col("doc_id") != F.col("_canon")).cast("int").alias("is_duplicate"),
        contam.alias("contamination"),
        reason.alias("reason"),
        (reason == "kept").cast("int").alias("keep"),
    )
