"""Text analysis over a ``documents(doc_id, text, ...)`` table.

Every function is a pure DataFrame transformation built from JVM-side
expressions (split/regexp/aggregate/transform) — no Python in the row path
— and each has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so
the driver's DuckDB gate checks it value-for-value.

Reference analogue: the reference has no text ops (its payload is graph
files), but the north star's web-page payload makes these the
training-data-pipeline layer; the loneliness/quality *scoring* shape
(per-row scalar score then aggregate, utils.py:565-600) is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import fan_out

# small multilingual stopword inventory for the language-id heuristic;
# deliberately tiny + deterministic (a real pipeline plugs in fastText)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "von", "zu", "ein", "ist", "mit", "für"],
    "fr": ["le", "la", "les", "et", "de", "un", "est", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "de", "un", "es", "para", "en", "que"],
    "it": ["il", "la", "di", "e", "un", "per", "che", "con", "del", "si"],
}

_TOKEN_SPLIT = "\\s+"
# BPE-ish subword segmentation: word-ish runs, number runs, single punct
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _words(col):
    """Whitespace word array with empties removed (split on ^ or trailing
    whitespace yields '' entries in both Spark and DuckDB — filter them the
    same way on both sides)."""
    return F.filter(F.split(F.col(col), _TOKEN_SPLIT), lambda w: w != "")


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens, n_chars_measured).

    - ``n_words``: whitespace tokens.
    - ``n_bpe_tokens``: count of BPE-ish units (letter runs + digit runs +
      single punctuation) — a deterministic stand-in for a real tokenizer's
      token count, computed by stripping all token characters and comparing
      lengths (pure string arithmetic, no UDF).
    """
    letters = F.regexp_replace(F.col(text_col), "[^a-zA-Z]+", " ")
    digits = F.regexp_replace(F.col(text_col), "[^0-9]+", " ")
    punct = F.regexp_replace(F.col(text_col), "[a-zA-Z0-9\\s]+", "")
    return documents.select(
        "doc_id",
        F.size(F.filter(F.split(F.col(text_col), _TOKEN_SPLIT), lambda w: w != "")).alias(
            "n_words"
        ),
        (
            F.size(F.filter(F.split(letters, " "), lambda w: w != ""))
            + F.size(F.filter(F.split(digits, " "), lambda w: w != ""))
            + F.length(punct)
        ).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
    )


def quality_parts(t, words) -> dict:
    """Unrounded quality-signal Column expressions over a projected text
    column ``t`` and (unlowered) word-array column ``words`` — shared by
    :func:`quality_scores` and the pipeline funnel so both compute the
    IDENTICAL composite the DuckDB oracles replay. Callers must pass
    plain column references (the projection guard — see quality_scores)."""
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_words = F.size(words)
    n_chars = F.length(t)
    punct_ratio = F.when(n_chars > 0,
        F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]+", "")) / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0,
        F.size(F.filter(words, lambda w: F.array_contains(en_stop, F.lower(w)))) / n_words
    ).otherwise(F.lit(0.0))
    mean_wl = F.when(n_words > 0,
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality": quality,
    }


def quality_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars_measured, n_words, mean_word_len, punct_ratio,
    stopword_ratio, quality) — the classic cheap quality signals
    (Gopher/C4-style length & symbol heuristics), all closed-form.

    ``quality`` is a deterministic composite in [0,1]:
      0.4·min(n_words/100, 1) + 0.3·(1 − punct_ratio) + 0.3·min(stopword_ratio·5, 1)
    rounded to 6 decimals for cross-engine stability.
    """
    # Project the split once: `words` feeds size/filter/aggregate and the
    # divisor of three ratios — inlined, the split+filter re-runs ~8× per
    # row (no common-subexpression elimination across these uses).
    d = documents.select(
        "doc_id", F.col(text_col).alias("_t"), _words(text_col).alias("_w")
    )
    p = quality_parts(F.col("_t"), F.col("_w"))
    return d.select(
        "doc_id",
        p["n_chars"].alias("n_chars_measured"),
        p["n_words"].alias("n_words"),
        F.round(p["mean_word_len"], 6).alias("mean_word_len"),
        F.round(p["punct_ratio"], 6).alias("punct_ratio"),
        F.round(p["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(p["quality"], 6).alias("quality"),
    )


def lang_score_columns(lowered_words) -> list:
    """One aliased ``_s_<lang>`` stopword-hit-count Column per candidate
    language, over a projected LOWERCASED word-array column. The scores
    must be PROJECTED before :func:`lang_pred_exprs` consumes them — each
    score is referenced twice there, and the filter lambdas get no
    common-subexpression elimination."""
    cols = []
    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        cols.append(
            F.size(
                F.filter(lowered_words, lambda w: F.array_contains(arr, w))
            ).alias(f"_s_{lang}")
        )
    return cols


def lang_pred_exprs() -> tuple:
    """(pred_lang, best_hits) Column expressions over the projected
    ``_s_<lang>`` columns: highest count wins, ties broken by language
    code ascending, zero hits everywhere → 'und'."""
    langs = sorted(STOPWORDS)
    best_hits = F.greatest(*[F.col(f"_s_{lg}") for lg in langs])
    pred = F.lit("und")
    # reverse order so earlier (ascending) languages win ties
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"_s_{lg}") == best_hits) & (best_hits > 0), F.lit(lg)
        ).otherwise(pred)
    return pred, best_hits


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, pred_hits) — stopword-overlap language guess.

    Scores each candidate language by the count of its stopwords among the
    document's lowercased words; highest count wins, ties broken by
    language code ascending; zero hits everywhere → 'und'. Deterministic and
    exactly expressible in SQL (the oracle mirrors it with CASE chains).
    """
    words = F.transform(_words(text_col), lambda w: F.lower(w))
    out = documents.select("doc_id", words.alias("_w"))
    out = out.select("doc_id", *lang_score_columns(F.col("_w")))
    pred, best_hits = lang_pred_exprs()
    return out.select("doc_id", pred.alias("pred_lang"), best_hits.alias("pred_hits"))


def fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp_md5, fp_norm_md5, fp_first_shingle).

    - fp_md5: md5 of the raw text (byte-exact identity).
    - fp_norm_md5: md5 of the casefolded, whitespace-collapsed text
      (content identity robust to spacing).
    - fp_first_shingle: lexicographically smallest md5 among the document's
      5-gram character shingles — a 1-hash winnowing-style content
      fingerprint (rolling-hash document sketch).
    """
    # Project the normalization once: referenced inside the per-position
    # lambda it would re-run the regexp per shingle (~n_chars× per row —
    # the 29× cliff measured on the dedup shingle path).
    d = fan_out(documents).select(
        "doc_id",
        F.col(text_col).alias("_t"),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")).alias("_norm"),
    )
    norm = F.col("_norm")
    n = F.length(norm)
    shingles = F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(1), n - 4), lambda i: F.md5(norm.substr(i, F.lit(5)).cast("binary"))
        ),
    ).otherwise(F.array(F.md5(norm.cast("binary"))))
    # ~n_chars md5s per row inside the transform — fan out a narrow scan
    return d.select(
        "doc_id",
        F.md5(F.col("_t").cast("binary")).alias("fp_md5"),
        F.md5(norm.cast("binary")).alias("fp_norm_md5"),
        F.array_min(shingles).alias("fp_first_shingle"),
    )
