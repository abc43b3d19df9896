"""Decontamination + deterministic splits vs brute-force Python oracles."""

import hashlib
import re

import pytest

from graph_partitioning_spark.data import contamination, hash_split, word_ngrams
from graph_partitioning_spark.data.decontam import SPLIT_BUCKETS

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a totally unrelated document about spark shuffle plans"),
    (2, "the quick brown fox naps all day long"),
    (3, "short doc"),                       # fewer words than n
    (4, ""),                                # empty: no grams at all
    (5, "  spaced    out\ttext \n lines "),  # whitespace mess
    (6, "the lazy dog sat on the mat near the door"),
]
EVAL = [
    (100, "the quick brown fox jumps high"),
    (101, "dogs sat on the mat yesterday"),
    (102, "short doc"),                     # whole-example fallback gram
]


def _py_ngrams(text, n):
    words = [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if w]
    if len(words) >= n:
        grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    else:
        grams = {" ".join(words)}
    return {g for g in grams if g}


def _py_bucket(doc_id, seed):
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
    return int(h[:8], 16) % SPLIT_BUCKETS


@pytest.fixture(scope="module")
def train(spark):
    return spark.createDataFrame(TRAIN, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(EVAL, "doc_id long, text string")


@pytest.mark.parametrize("n", [2, 3, 8])
def test_word_ngrams_matches_python(spark, train, n):
    got = {
        (r["doc_id"], r["gram"])
        for r in word_ngrams(train, n=n).collect()
    }
    want = {(i, g) for i, t in TRAIN for g in _py_ngrams(t, n)}
    assert got == want


def test_contamination_matches_bruteforce(spark, train, eval_docs):
    n, threshold = 3, 0.1
    eval_grams = set().union(*(_py_ngrams(t, n) for _, t in EVAL))
    rows = {r["doc_id"]: r for r in contamination(train, eval_docs, n=n, threshold=threshold).collect()}
    assert set(rows) == {i for i, _ in TRAIN}
    for i, t in TRAIN:
        grams = _py_ngrams(t, n)
        hits = len(grams & eval_grams)
        r = rows[i]
        assert r["n_ngrams"] == len(grams)
        assert r["eval_hits"] == hits
        want_c = round(hits / max(len(grams), 1), 6)
        assert r["contamination"] == pytest.approx(want_c, abs=1e-9)
        assert r["contaminated"] == (want_c >= threshold)
    # the planted overlaps actually fire: doc 0 shares "the quick brown"
    # with eval 100, doc 3 is a verbatim whole-example copy of eval 102
    assert rows[0]["eval_hits"] >= 1
    assert rows[3]["eval_hits"] == 1 and rows[3]["contaminated"]
    assert rows[4]["n_ngrams"] == 0 and not rows[4]["contaminated"]


def test_hash_split_matches_python_md5(spark, train):
    for seed in (0, 7):
        got = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(train, seed=seed).collect()}
        for i, _ in TRAIN:
            b = _py_bucket(i, seed)
            split = "train" if b < 9000 else ("val" if b < 9500 else "test")
            assert got[i] == (b, split)


def test_hash_split_custom_fractions_and_validation(spark, train):
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(train, {"a": 0.5, "b": 0.5}, seed=3).collect()
    }
    for i, _ in TRAIN:
        assert got[i] == ("a" if _py_bucket(i, 3) < 5000 else "b")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(train, {"a": 0.5, "b": 0.6})
