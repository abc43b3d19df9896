"""Composed pre-training funnel vs a brute-force Python oracle."""

import re

import pytest

from graph_partitioning_spark.data import pretraining_funnel
from graph_partitioning_spark.data.textstats import STOPWORDS

# Planted so every reason branch fires, including priority overlaps:
#   0 kept (clean english, long enough)
#   1 low_quality (pure punctuation soup)
#   2 language (german)
#   3 duplicate (exact copy of 0)
#   4 contaminated (verbatim copy of the eval doc)
#   5 low_quality AND duplicate of 1 -> priority says 'low_quality'
#   6 kept (different clean english)
EN = (
    "the quick brown fox jumps over the lazy dog and that is for the "
    "record a fine thing to do with a dog in the sun"
)
EN2 = (
    "a dog and a fox met in the park and the dog said that the fox is "
    "welcome to jump over the fence for fun"
)
JUNK = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
# long enough to clear the quality bar so the LANGUAGE stage rejects it
DE = (
    "der hund und die katze sind mit der maus in dem haus und der garten "
    "ist ein schoener ort fuer die tiere von dem dorf zu dem wald in dem "
    "sommer"
)
EVAL_TEXT = (
    "every good boy deserves fudge and the fox knows it is the best "
    "phrase in the whole music book"
)

TRAIN = [
    (0, EN),
    (1, JUNK),
    (2, DE),
    (3, EN),
    (4, EVAL_TEXT),
    (5, JUNK),
    (6, EN2),
]
EVAL = [(100, EVAL_TEXT)]

MIN_Q = 0.5
LANGS = ("en",)
NGRAM = 3
THR = 0.1


def _py_words(text):
    return [w for w in re.split(r"\s+", text) if w]


def _py_quality(text):
    w = _py_words(text)
    n_words = len(w)
    n_chars = len(text)
    punct = len(re.sub(r"[a-zA-Z0-9\s]+", "", text)) / n_chars if n_chars else 0.0
    stop = (
        sum(1 for x in w if x.lower() in STOPWORDS["en"]) / n_words if n_words else 0.0
    )
    return round(
        0.4 * min(n_words / 100.0, 1.0) + 0.3 * (1 - punct) + 0.3 * min(stop * 5, 1.0),
        6,
    )


def _py_lang(text):
    w = [x.lower() for x in _py_words(text)]
    scores = {
        lg: sum(1 for x in w if x in STOPWORDS[lg]) for lg in sorted(STOPWORDS)
    }
    best = max(scores.values()) if scores else 0
    if best == 0:
        return "und"
    return min(lg for lg, s in scores.items() if s == best)


def _py_ngrams(text, n):
    words = [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if w]
    grams = (
        {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
        if len(words) >= n
        else {" ".join(words)}
    )
    return {g for g in grams if g}


def _py_funnel():
    import hashlib

    eval_grams = set().union(*(_py_ngrams(t, NGRAM) for _, t in EVAL))
    canon = {}
    for i, t in TRAIN:
        fp = hashlib.md5(t.encode()).hexdigest()
        canon.setdefault(fp, i)
    out = {}
    for i, t in TRAIN:
        q = _py_quality(t)
        lang = _py_lang(t)
        fp = hashlib.md5(t.encode()).hexdigest()
        isdup = canon[fp] != i
        grams = _py_ngrams(t, NGRAM)
        contam = round(len(grams & eval_grams) / max(len(grams), 1), 6)
        if q < MIN_Q:
            reason = "low_quality"
        elif lang not in LANGS:
            reason = "language"
        elif isdup:
            reason = "duplicate"
        elif contam >= THR:
            reason = "contaminated"
        else:
            reason = "kept"
        out[i] = (q, lang, int(isdup), contam, reason, int(reason == "kept"))
    return out


def test_funnel_matches_bruteforce(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    evald = spark.createDataFrame(EVAL, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["quality"],
            r["pred_lang"],
            r["is_duplicate"],
            r["contamination"],
            r["reason"],
            r["keep"],
        )
        for r in pretraining_funnel(
            train,
            evald,
            min_quality=MIN_Q,
            langs=LANGS,
            ngram=NGRAM,
            contamination_threshold=THR,
        ).collect()
    }
    want = _py_funnel()
    assert set(got) == set(want)
    for i in want:
        gq, *grest = got[i]
        wq, *wrest = want[i]
        assert gq == pytest.approx(wq, abs=1e-9), f"doc {i} quality"
        assert grest == wrest, f"doc {i}: {got[i]} != {want[i]}"
    # the planted branches all fired, with the documented priority
    reasons = {i: want[i][4] for i in want}
    assert reasons[0] == "kept" and reasons[6] == "kept"
    assert reasons[1] == "low_quality"
    assert reasons[2] == "language"
    assert reasons[3] == "duplicate"
    assert reasons[4] == "contaminated"
    assert reasons[5] == "low_quality"  # quality outranks duplicate


def test_funnel_without_eval_set(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["contamination"], r["reason"])
        for r in pretraining_funnel(
            train, None, min_quality=MIN_Q, langs=LANGS
        ).collect()
    }
    assert all(c == 0.0 for c, _ in got.values())
    assert got[4][1] == "kept"  # no eval set -> nothing is contaminated
    assert got[3][1] == "duplicate"  # other stages still fire
