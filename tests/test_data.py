"""Training-data operators: dedup, similarity, textstats, multimodal."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_partitioning_spark.data import (
    brute_force_topk,
    bucketed_topk,
    exact_duplicates,
    fingerprint,
    language_id,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_scores,
    simhash,
    token_counts,
)
from graph_partitioning_spark.data.dedup import simhash_near_pairs
from graph_partitioning_spark.data.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    synthesize_media,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumped over the lazy dog"),         # near dup
    (3, "completely different content about spark engines"),
    (4, "der hund und die katze sind mit der maus"),             # German
    (5, "le chat est dans la maison pour le moment"),            # French
    (6, "the quick brown fox jumps over the lazy dog today"),    # near dup
    (7, "zzz qqq www eee rrr"),                                  # junk
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").persist()


def _py_shingles(text, k=5):
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    if len(norm) >= k:
        return {norm[i : i + k] for i in range(len(norm) - k + 1)}
    return {norm}


def test_exact_duplicates(spark, docs):
    rows = exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]["keep_id"] == 0
    assert rows[0]["dup_count"] == 2
    assert rows[0]["members"] == [0, 1]


def test_ngram_jaccard_matches_bruteforce(spark, docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=5, threshold=0.3).collect()
    }
    # brute-force python
    want = {}
    for i, (ida, ta) in enumerate(DOCS):
        for idb, tb in DOCS[i + 1 :]:
            sa, sb = _py_shingles(ta), _py_shingles(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.3:
                want[(ida, idb)] = round(j, 6)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-6)


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # identical docs → identical signatures
    # python oracle for one signature slot
    from graph_partitioning_spark.data.dedup import MINHASH_PRIME, minhash_params

    a0, b0 = minhash_params(1)[0]
    want0 = min(
        (a0 * int(hashlib.md5(s.encode()).hexdigest()[:8], 16) + b0) % MINHASH_PRIME
        for s in _py_shingles(DOCS[0][1])
    )
    assert sigs[0][0] == want0

    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs or (0, 6) in pairs  # near dups surface
    assert (3, 7) not in pairs


def test_simhash_near_pairs(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1]
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    assert ham02 < ham03  # near dup closer than unrelated
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=8).collect()}
    assert pairs.get((0, 1)) == 0


def test_token_counts_and_quality(spark, docs):
    tc = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert tc[0]["n_words"] == len(DOCS[0][1].split())
    assert tc[0]["n_chars_measured"] == len(DOCS[0][1])
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    words = DOCS[0][1].split()
    stop = {"the", "and", "of", "to", "a", "in", "is", "that", "for", "with"}
    want_stop = sum(1 for w in words if w.lower() in stop) / len(words)
    assert q[0]["stopword_ratio"] == pytest.approx(want_stop, abs=1e-6)
    assert q[0]["quality"] > q[7]["quality"]  # english prose beats junk


def test_language_id(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert got[0] == "en"
    assert got[4] == "de"
    assert got[5] == "fr"
    assert got[7] == "und"


def test_fingerprint(spark, docs):
    rows = {r["doc_id"]: r for r in fingerprint(docs).collect()}
    assert rows[0]["fp_md5"] == hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert rows[0]["fp_md5"] == rows[1]["fp_md5"]
    assert rows[0]["fp_first_shingle"] == min(
        hashlib.md5(s.encode()).hexdigest() for s in _py_shingles(DOCS[0][1])
    )


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(17)
    base = rng.normal(size=(10, 8))
    rows = []
    for i in range(50):
        label = i % 10
        v = base[label] + rng.normal(scale=0.1, size=8)
        rows.append((i, [float(x) for x in v.astype(np.float32)], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return df.persist(), rows


def test_brute_force_topk_matches_numpy(spark, embeddings):
    df, rows = embeddings
    queries = df.filter(F.col("vec_id") < 3)
    got = brute_force_topk(df, queries, top_k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    vecs = {i: np.array(v, dtype=np.float64) for i, v, _ in rows}
    for qid in range(3):
        sims = []
        for nid, v in vecs.items():
            if nid == qid:
                continue
            q = vecs[qid]
            c = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            sims.append((round(c, 6), -nid, nid))
        sims.sort(reverse=True)
        want = [nid for _, _, nid in sims[:4]]
        got_ids = [nid for _, nid, _ in sorted(by_q[qid])]
        assert got_ids == want, f"query {qid}"


def test_bucketed_topk_stays_in_bucket(spark, embeddings):
    df, rows = embeddings
    queries = df.filter(F.col("vec_id") < 3)
    got = bucketed_topk(df, queries, top_k=3).collect()
    label_of = {i: lb for i, _, lb in rows}
    for r in got:
        assert label_of[r["neighbor_id"]] == label_of[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]


def test_multimodal_features(spark):
    media = synthesize_media(spark, 20)
    feats = extract_features(media, fake_decode=True).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(media, fake_decode=True).collect()}
    first = {r["media_id"]: r["feature"] for r in feats}
    assert first == again


def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)
    a = decode_image(b"abc", fake=True)
    b = decode_image(b"abc", fake=True)
    assert a.shape == (8, 8, 3) and (a == b).all()


def test_exact_duplicates_member_cap(spark):
    """The members list is capped by default so one boilerplate page
    duplicated millions of times never becomes a giant array row; dup_count
    still counts the whole group."""
    boiler = spark.createDataFrame(
        [(i, "same text") for i in range(10)] + [(50, "unique")],
        "doc_id long, text string",
    )
    rows = exact_duplicates(boiler, max_members=3).collect()
    assert len(rows) == 1
    assert rows[0]["dup_count"] == 10
    assert rows[0]["members"] == [0, 1, 2]
    full = exact_duplicates(boiler, max_members=None).collect()
    assert full[0]["members"] == list(range(10))
    # the default cap (100) leaves small groups untouched
    dflt = exact_duplicates(boiler).collect()
    assert dflt[0]["members"] == list(range(10))


def test_ngram_jaccard_postings_cap_recall_trade(spark):
    """The finite max_postings default only ever REMOVES pairs (similarity
    understated, never overstated) and true near-dups sharing non-boilerplate
    shingles survive."""
    docs = [
        (i, "boilerplate header " + ("alpha beta gamma" if i < 2 else f"unique tail {i} xyz{i}"))
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=5, threshold=0.2, max_postings=None).collect()
    }
    capped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=5, threshold=0.2, max_postings=4).collect()
    }
    assert set(capped) <= set(uncapped)
    assert (0, 1) in capped              # identical docs still pair up
    for pair, j in capped.items():
        assert j <= uncapped[pair] + 1e-9  # understated only


def test_cosine_near_dup_recall_and_exactness(spark):
    """Banded sign-LSH near-dup (similarity.cosine_near_dup_pairs):
    near-identical vectors (tiny perturbation) MUST pair up (they agree on
    every sign bit, so they collide in every band), reported cosines match a
    NumPy brute force to 1e-6, and no pair below threshold leaks through."""
    import numpy as np

    from graph_partitioning_spark.data import cosine_near_dup_pairs

    rng = np.random.RandomState(7)
    dims, n = 16, 40
    base = rng.randn(n, dims)
    # rows 0/1 and 2/3 are near-duplicates; everything else is random
    base[1] = base[0] + 1e-4 * rng.randn(dims)
    base[3] = base[2] + 1e-4 * rng.randn(dims)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_dup_pairs(df, threshold=0.95, bits=16, bands=4).collect()
    }
    assert (0, 1) in got and (2, 3) in got
    V = np.array([np.array(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(V, axis=1)
    for (a, b), c in got.items():
        exact = float(V[a] @ V[b] / (norms[a] * norms[b]))
        assert abs(c - round(exact, 6)) < 1e-6
        assert c >= 0.95


def test_cosine_near_dup_bucket_cap(spark):
    """max_bucket drops degenerate hot buckets (pair set only shrinks) and
    the surviving pairs keep their exact cosines."""
    import numpy as np

    from graph_partitioning_spark.data import cosine_near_dup_pairs

    rng = np.random.RandomState(3)
    dims = 8
    v = rng.randn(dims)
    # 30 near-copies of one vector -> one hot bucket in every band
    rows = [(i, [float(x) for x in v + 1e-5 * rng.randn(dims)]) for i in range(30)]
    rows += [(100 + i, [float(x) for x in rng.randn(dims)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.9, bits=8, bands=2, max_bucket=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(df, threshold=0.9, bits=8, bands=2, max_bucket=20).collect()
    }
    assert len(full) >= 30 * 29 // 2  # the clone cluster all pairs up
    assert capped <= full
    assert len(capped) < len(full)  # the hot bucket actually got dropped


def test_dedup_clusters_keep_list(spark, docs):
    """LSH pairs → CC → keep-list: docs 0/1 (exact dups, identical
    signatures) land in one cluster whose canonical copy is min id 0;
    transitive closure pulls in any near-dup that collides with either;
    every doc appears exactly once; singletons keep themselves."""
    from graph_partitioning_spark.data import dedup_clusters, lsh_candidate_pairs

    rows = {r["doc_id"]: r for r in dedup_clusters(docs).collect()}
    assert set(rows) == {d for d, _ in DOCS}  # total keep-list

    # python oracle: union-find over the actual LSH candidate pairs
    pairs = [(r["a"], r["b"]) for r in lsh_candidate_pairs(docs).collect()]
    parent = {d: d for d, _ in DOCS}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d, _ in DOCS}
    for d, _ in DOCS:
        assert rows[d]["keep_id"] == want[d]
        assert rows[d]["keep"] == int(want[d] == d)
    assert rows[1]["keep_id"] == 0 and rows[1]["keep"] == 0
    assert rows[0]["keep"] == 1


def test_ann_kmeans_recall_and_determinism(spark):
    """The learned k-means|| quantizer on genuinely clustered vectors:
    recall@5 of the IVF probe vs brute force ≥ 0.9 (pinned floor), and the
    fitted centroids are a pure function of the data (two fits identical —
    the k-means|| sampling is hash-determinized, no RNG state)."""
    from graph_partitioning_spark.data import (
        ann_kmeans_topk,
        brute_force_topk,
        kmeans_quantizer,
    )

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 16))
    rows, vid = [], 0
    for c in range(8):
        for _ in range(40):
            v = centers[c] + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 40 == 0)  # one per true cluster

    assert kmeans_quantizer(emb, k=8) == kmeans_quantizer(emb, k=8)

    exact = brute_force_topk(emb, queries, top_k=5)
    approx = ann_kmeans_topk(emb, queries, top_k=5, k_clusters=8)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, f"recall@5 {recall} below pinned floor"

    # nprobe: probing more buckets can only widen each query's candidate
    # set, so recall is monotone in nprobe and hits 1.0 at nprobe=k
    ap2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_kmeans_topk(emb, queries, top_k=5, k_clusters=8, nprobe=2).collect()
    }
    ap_all = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_kmeans_topk(emb, queries, top_k=5, k_clusters=8, nprobe=8).collect()
    }
    assert len(ex & ap2) >= len(ex & ap)
    assert ap_all == ex, "nprobe=k must reduce to exact brute force"


def _clustered_rows(n_clusters, per, dims, seed=3, scale=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dims))
    rows, vid = [], 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.normal(scale=scale, size=dims)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_ann_broadcast_kernel_bit_identical_to_literal(spark):
    """The size-gated broadcast Arrow kernel is not an approximation: on
    the same fixed-point integer inputs it must produce the SAME quantizer
    (bit-for-bit centroids — init sampling, candidate weighting, Lloyd
    truncated means) and the SAME search rows as the plan-literal path,
    including (d2, cid) tie-breaks and the nprobe>1 probe order. Forcing
    literal_cell_budget=0 routes every step through the kernel."""
    from graph_partitioning_spark.data import ann_kmeans_topk, kmeans_quantizer

    emb = spark.createDataFrame(
        _clustered_rows(8, 40, 16), "vec_id long, embedding array<float>"
    ).persist()
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    lit = kmeans_quantizer(emb, k=8)
    ker = kmeans_quantizer(emb, k=8, literal_cell_budget=0)
    assert lit == ker, "broadcast-kernel quantizer diverged from literal path"
    for nprobe in (1, 2, 4):
        a = sorted(
            tuple(r)
            for r in ann_kmeans_topk(
                emb, queries, top_k=5, k_clusters=8, nprobe=nprobe
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in ann_kmeans_topk(
                emb,
                queries,
                top_k=5,
                k_clusters=8,
                nprobe=nprobe,
                literal_cell_budget=0,
            ).collect()
        )
        assert a == b, f"search rows diverged at nprobe={nprobe}"
    emb.unpersist()


def test_ann_big_k_fit_wall_and_plan_size(spark):
    """k=256 × dims=128 (k·dims = 32768 — double the literal-cell budget,
    the regime where a plan-literal centroid matrix and per-dim Lloyd agg
    columns stop being viable): the fit must auto-route to the broadcast
    kernel, finish in bounded wall-clock, and the search plan must NOT
    embed the centroid matrix (analyzed-plan size stays flat)."""
    import time

    from graph_partitioning_spark.data import ann_kmeans_topk, kmeans_quantizer
    from graph_partitioning_spark.data.similarity import LITERAL_CELL_BUDGET

    k, dims = 256, 128
    assert k * dims > LITERAL_CELL_BUDGET
    emb = spark.createDataFrame(
        _clustered_rows(k, 24, dims, seed=7), "vec_id long, embedding array<float>"
    ).persist()
    emb.count()
    t0 = time.time()
    cents = kmeans_quantizer(emb, k=k, lloyd_iters=2, init_rounds=2)
    fit_wall = time.time() - t0
    assert len(cents) == k and len(cents[0][1]) == dims
    # generous for a shared VM; the literal path at this size spent minutes
    # in driver-side analysis alone before it was replaced
    assert fit_wall < 240, f"big-k fit took {fit_wall:.0f}s"

    queries = emb.filter(F.col("vec_id") % 512 == 0)
    out = ann_kmeans_topk(
        emb, queries, top_k=5, k_clusters=k, lloyd_iters=2, nprobe=2
    )
    plan_chars = len(out._jdf.queryExecution().analyzed().toString())
    # a literal k×dims int matrix alone would serialize to >130k chars
    assert plan_chars < 60_000, f"plan embeds the centroid matrix ({plan_chars} chars)"
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {
        r["vec_id"] for r in queries.select("vec_id").collect()
    }
    emb.unpersist()


def test_ann_recall10_nprobe4_100k(spark):
    """Recall@10 ≥ 0.95 at nprobe=4 on a 10^5-vector clustered corpus,
    ground truth by NumPy brute force (float32-exact, the same cast the
    engine applies). Runs entirely on the broadcast-kernel path
    (literal_cell_budget=0) — the configuration a 100 TB IVF would use."""
    import pandas as pd

    from graph_partitioning_spark.data import ann_kmeans_topk

    n_clusters, per, dims = 64, 1563, 32  # 100,032 vectors
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(n_clusters, dims))
    reps = np.repeat(np.arange(n_clusters), per)
    X = (centers[reps] + rng.normal(scale=0.25, size=(len(reps), dims))).astype(
        np.float32
    )
    n = len(X)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)})
    emb = spark.createDataFrame(pdf).persist()
    emb.count()

    q_ids = np.arange(0, n, n // 50)[:50]
    queries = emb.filter(F.col("vec_id").isin([int(i) for i in q_ids]))

    # NumPy ground truth in float64 from the float32 values (== _as_double)
    X64 = X.astype(np.float64)
    norms = np.linalg.norm(X64, axis=1)
    truth = {}
    for qi in q_ids:
        cos = (X64 @ X64[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf  # self excluded
        top = np.argsort(-cos, kind="stable")[:10]
        truth[int(qi)] = set(int(t) for t in top)

    got = ann_kmeans_topk(
        emb,
        queries,
        top_k=10,
        k_clusters=n_clusters,
        lloyd_iters=2,
        nprobe=4,
        literal_cell_budget=0,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & by_q.get(q, set())) for q in truth)
    recall = hits / (10 * len(truth))
    assert recall >= 0.95, f"recall@10 at nprobe=4 is {recall:.3f}"
    emb.unpersist()


def test_embed_text_hashed_projection(spark, docs):
    """Feature-hashed text embeddings: unit norm (or exact zero), exact
    duplicates embed identically, near-duplicate documents score far above
    unrelated ones, and the output is deterministic (pure function of the
    text — bit-parity with the DuckDB replay is the embed_text gate)."""
    from graph_partitioning_spark.data.embed import embed_text

    emb = {
        r["doc_id"]: np.array(r["embedding"])
        for r in embed_text(docs, dims=32).collect()
    }
    assert len(emb) == len(DOCS)
    for d, v in emb.items():
        n = np.linalg.norm(v)
        assert abs(n - 1.0) < 1e-9 or n == 0.0, f"doc {d} norm {n}"

    def cos(a, b):
        return float(emb[a] @ emb[b])

    assert (emb[0] == emb[1]).all(), "exact duplicates must embed identically"
    # near-dups of doc 0 (one word changed/appended) vs unrelated doc 3
    assert cos(0, 2) > cos(0, 3)
    assert cos(0, 6) > cos(0, 3)
    assert cos(0, 2) > 0.8
    again = {
        r["doc_id"]: np.array(r["embedding"])
        for r in embed_text(docs, dims=32).collect()
    }
    assert all((emb[d] == again[d]).all() for d in emb)


def test_lsh_bucket_cap_drops_degenerate_flood(spark):
    """A flood of identical/templated docs collapses to ONE band bucket —
    the O(bucket²) self-join must be capped by default-style max_bucket
    (the same safety as the shingle postings cap), dropping the flood
    while unrelated duplicate pairs still surface."""
    docs = [(i, "aaaa bbbb cccc dddd eeee ffff") for i in range(40)]
    docs += [
        (100, "unique text about spark engines running fast"),
        (101, "unique text about spark engines running fast"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = lsh_candidate_pairs(df, max_bucket=10)
    pairs = {(r["a"], r["b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), "flood bucket must be dropped"
    full = lsh_candidate_pairs(df, max_bucket=None)
    n_full = full.count()
    assert n_full >= 40 * 39 // 2, "uncapped path must keep the flood pairs"
