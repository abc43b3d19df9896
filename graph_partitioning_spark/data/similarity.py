"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k of query vectors against the
  corpus — broadcast the (small) query set, one pass over the corpus, a
  per-query top-k window. The dot product is a JVM higher-order
  ``zip_with``+``aggregate`` fold in float64 index order, so results are
  bitwise-reproducible at any parallelism (and match the DuckDB oracle's
  in-order fold exactly).
- ``bucketed_topk``: the scale path — an IVF-style coarse quantization.
  Corpus rows carry a bucket id (here the ``label`` column; in a real
  pipeline, a k-means coarse centroid id); each query probes only its own
  bucket's rows (assigned by the query's own bucket), turning the n×m
  cross join into a co-partitioned equi-join. Exact within the probed
  bucket; recall depends on quantizer quality, which is the standard IVF
  trade.
- ``cosine_near_dup_pairs``: embedding-cosine near-duplicate detection —
  the all-pairs analogue of MinHash-LSH for dense vectors. Random-
  hyperplane signatures (sign of <v, h_j> for ``bits`` deterministic
  hyperplanes) are banded; only pairs colliding in some band are scored
  exactly and thresholded. Never a cross join: the candidate set is a
  (band, key) equi-self-join, hot buckets capped like the shingle
  postings cap in ``dedup.ngram_jaccard_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Above this many literal cells (candidate/centroid count × dims) the
# quantizer switches from plan-literal centroid expressions to the
# broadcast Arrow kernel: a literal matrix rides inside the logical plan
# and is re-serialized/analyzed per query, which stops being viable around
# k·dims ~ 10^5 (a 100 TB IVF wants k~10^4-10^5 × 128-1024 dims). The two
# paths compute in the same fixed-point integer domain and are pinned
# bit-identical by tests/test_data.py.
LITERAL_CELL_BUDGET = 16_384


def _cosine(a, b):
    """Cosine similarity of two array<double> columns, folded in index order."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k, self excluded.

    ``queries``: (vec_id, embedding) — must be small enough to broadcast.
    Ties broken by neighbor id ascending for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style top-k: each query probes only corpus rows in its bucket.

    Same output schema as ``brute_force_topk``; at 10^12 rows this is the
    shape that survives — the join key (bucket) co-partitions both sides
    and per-bucket work is |bucket| × queries-in-bucket.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col(bucket_col).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col(bucket_col).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


KMEANS_SCALE = 1000


def _scaled_ints(vec_col):
    """array<long> fixed-point view of a float vector: floor(x·1000 + 0.5).

    The quantizer fits entirely in this integer domain so every distance,
    sum, and mean is order-independent and exactly replayable by a non-Spark
    SQL engine (the DuckDB gate) — float reductions would drift across
    engines and Lloyd iterations amplify a one-ulp drift into a different
    clustering. floor(x·1000+0.5) rather than round() because the two
    engines disagree on round-half semantics while floor is exact IEEE.
    """
    return F.transform(
        _as_double(vec_col), lambda x: F.floor(x * 1000.0 + 0.5).cast("long")
    )


def _hash_uniform(id_col, seed: int, r: int):
    """Deterministic pseudo-uniform in [0,1) from (id, seed, round) — the
    same md5-prefix arithmetic the MinHash oracle replays in DuckDB."""
    s = F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)), F.lit(str(r)))
    base = F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")
    return base / F.lit(4294967296.0)


def _dist_pairs(cents: list[tuple[int, list[int]]], xi):
    """array<struct<d2,cid>> of squared distances to every centroid — a
    pure JVM expression over ONE 2-D array literal.

    The centroid matrix is a single ``array<array<long>>`` literal and the
    per-centroid fold runs inside one ``transform`` lambda, so the
    expression tree is O(1) in both k and dims (a per-candidate struct
    list was O(k·dims) and driver analysis dominated the fit: 5.8s →
    0.55s per pass at 33 candidates × 64 dims, measured at sf0.1).
    Candidates are sorted by cid so struct comparison ties break to the
    smallest cid, matching the oracle's ``ORDER BY d2, cid``.
    """
    cents = sorted(cents, key=lambda t: int(t[0]))
    mat = F.lit([[int(v) for v in coords] for _, coords in cents]).cast(
        "array<array<long>>"
    )
    cids = F.lit([int(c) for c, _ in cents]).cast("array<long>")
    d2s = F.transform(
        mat,
        lambda c: F.aggregate(
            F.zip_with(xi, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return F.zip_with(d2s, cids, lambda d, c: F.struct(d.alias("d2"), c.alias("cid")))


def _nearest(cents: list[tuple[int, list[int]]], xi):
    """struct(d2, cid) of the nearest centroid — a pure JVM expression.

    The k centroids are one literal integer matrix, so bucket assignment
    over the corpus is ONE columnar pass: no join, no shuffle, no Python.
    Ties break to the smallest cid ((d2, cid) struct min), matching the
    oracle's ``ROW_NUMBER() OVER (ORDER BY d2, cid)``.
    """
    return F.array_min(_dist_pairs(cents, xi))


def _tdiv(s: int, n: int) -> int:
    """Truncate-toward-zero integer division (SQL ``//`` semantics; Python's
    ``//`` floors, which disagrees for negative sums)."""
    return s // n if s >= 0 else -((-s) // n)


def _cent_arrays(cents: list[tuple[int, list[int]]]):
    """(cids int64[k], C int64[k×dims]) sorted by cid — the broadcast-side
    twin of ``_dist_pairs``'s sorted literal matrix."""
    import numpy as np

    cents = sorted(cents, key=lambda t: int(t[0]))
    cids = np.array([int(c) for c, _ in cents], dtype=np.int64)
    C = np.array([[int(v) for v in vec] for _, vec in cents], dtype=np.int64)
    return cids, C


def _nearest_frame(
    pts: DataFrame,
    cents: list[tuple[int, list[int]]],
    literal_cell_budget: int = LITERAL_CELL_BUDGET,
    nprobe: int = 1,
) -> DataFrame:
    """(id, cid, d2) of each point's nearest centroid(s) — path-gated.

    ``pts`` must carry (id, xi: array<long>) in the fixed-point domain.
    Below the budget (len(cents)·dims literal cells) this is the pure-JVM
    ``_nearest`` expression — no shuffle, no Python, DuckDB-replayable.
    Above it, the centroids travel as ONE NumPy int64 matrix in a Spark
    broadcast variable and assignment is an Arrow ``mapInPandas`` kernel:
    one ``X @ Cᵀ`` matmul per batch (d² = |x|² − 2x·c + |c|², exact in
    int64 for fixed-point inputs), so the logical plan stays O(1) in
    k·dims and driver-side analysis cost is flat. Both paths compute the
    identical integer math with the identical (d2, cid) tie-break and are
    pinned bit-identical by tests.

    ``nprobe`` > 1 emits one row per (point, probed centroid) ranked by
    (d2 asc, cid asc) — the multi-probe fan-out; every point still gets
    exactly ``min(nprobe, k)`` rows.
    """
    dims = len(cents[0][1])
    nprobe = min(nprobe, len(cents))
    if len(cents) * dims <= literal_cell_budget:
        if nprobe <= 1:
            near = _nearest(cents, F.col("xi"))
            return pts.select(
                "id",
                near.getField("cid").alias("cid"),
                near.getField("d2").alias("d2"),
            )
        arr = F.slice(F.array_sort(_dist_pairs(cents, F.col("xi"))), 1, nprobe)
        return pts.select("id", F.explode(arr).alias("p")).select(
            "id", F.col("p.cid").alias("cid"), F.col("p.d2").alias("d2")
        )

    import numpy as np
    import pandas as pd

    cids, C = _cent_arrays(cents)
    bc = pts.sparkSession.sparkContext.broadcast((cids, C))
    np_ = nprobe

    def kernel(batches):
        bcids, bC = bc.value
        cn = (bC * bC).sum(axis=1)  # |c|² per centroid, int64-exact
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["xi"].to_numpy()).astype(np.int64, copy=False)
            d2 = (X * X).sum(axis=1)[:, None] - 2 * (X @ bC.T) + cn[None, :]
            if np_ <= 1:
                # rows of C are cid-ascending, argmin takes the FIRST min —
                # exactly the literal path's (d2, cid) struct-min tie-break
                j = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy(),
                        "cid": bcids[j],
                        "d2": d2[np.arange(len(j)), j],
                    }
                )
            else:
                # stable sort on d2: ties keep column (= cid) order, the
                # same (d2 asc, cid asc) total order as array_sort(struct)
                order = np.argsort(d2, axis=1, kind="stable")[:, :np_]
                ids = np.repeat(pdf["id"].to_numpy(), np_)
                rows = np.repeat(np.arange(len(pdf)), np_)
                cols = order.reshape(-1)
                yield pd.DataFrame(
                    {"id": ids, "cid": bcids[cols], "d2": d2[rows, cols]}
                )

    id_type = dict(pts.dtypes)["id"]
    return pts.select("id", "xi").mapInPandas(
        kernel, schema=f"id {id_type}, cid long, d2 long"
    )


def _lloyd_sums(
    pts: DataFrame,
    cents: list[tuple[int, list[int]]],
    literal_cell_budget: int = LITERAL_CELL_BUDGET,
) -> dict[int, list[int]]:
    """One Lloyd update: {cid: truncated-integer-mean centroid} — path-gated.

    Below the budget: the original per-dim ``F.sum`` aggregation (dims agg
    columns — DuckDB-replayable, fine through a few hundred dims). Above:
    the Arrow kernel assigns AND partially aggregates in one pass — each
    partition emits at most k rows of (cid, n, ssum array<long>), the
    MLlib-KMeans partial-sum shape, and the driver finishes the k-way
    reduction on what it must hold anyway (the k×dims centroid matrix).
    Shuffle volume is k·dims per partition, independent of row count.
    """
    dims = len(cents[0][1])
    if len(cents) * dims <= literal_cell_budget:
        near = _nearest(cents, F.col("xi"))
        agg = (
            pts.select(near.getField("cid").alias("cid"), "xi")
            .groupBy("cid")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("xi")[i]).alias(f"s{i}") for i in range(dims)],
            )
            .collect()
        )
        return {
            int(r["cid"]): [_tdiv(int(r[f"s{i}"]), int(r["n"])) for i in range(dims)]
            for r in agg
        }

    import numpy as np
    import pandas as pd

    cids, C = _cent_arrays(cents)
    bc = pts.sparkSession.sparkContext.broadcast((cids, C))
    k, d = C.shape

    def kernel(batches):
        bcids, bC = bc.value
        cn = (bC * bC).sum(axis=1)
        S = np.zeros((k, d), dtype=np.int64)
        n = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["xi"].to_numpy()).astype(np.int64, copy=False)
            d2 = (X * X).sum(axis=1)[:, None] - 2 * (X @ bC.T) + cn[None, :]
            j = d2.argmin(axis=1)
            np.add.at(S, j, X)
            n += np.bincount(j, minlength=k)
        nz = np.flatnonzero(n)
        if len(nz):
            yield pd.DataFrame(
                {"cid": bcids[nz], "n": n[nz], "ssum": list(S[nz])}
            )

    partials = pts.select("id", "xi").mapInPandas(
        kernel, schema="cid long, n long, ssum array<long>"
    ).collect()
    S = {}
    N = {}
    for r in partials:
        c = int(r["cid"])
        N[c] = N.get(c, 0) + int(r["n"])
        if c in S:
            S[c] = [a + int(b) for a, b in zip(S[c], r["ssum"])]
        else:
            S[c] = [int(b) for b in r["ssum"]]
    return {c: [_tdiv(s, N[c]) for s in S[c]] for c in S}


def kmeans_quantizer(
    embeddings: DataFrame,
    k: int = 8,
    lloyd_iters: int = 3,
    init_rounds: int = 2,
    oversample: int | None = None,
    seed: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    literal_cell_budget: int = LITERAL_CELL_BUDGET,
) -> list[tuple[int, list[int]]]:
    """Deterministic k-means|| coarse quantizer; returns [(cid, centroid)]
    with centroids in the fixed-point integer domain (``_scaled_ints``).

    k-means|| (Bahmani et al., VLDB'12) with hash-determinized sampling:
    start from the min-id vector, then for ``init_rounds`` rounds select
    each point with probability min(1, l·d²/Σd²) — the coin flip replaced
    by the md5 uniform ``_hash_uniform(id, seed, round)`` so the sample is
    a pure function of the data. Candidates are weighted by the number of
    points nearest to them and reduced to k by (weight desc, id asc); then
    ``lloyd_iters`` Lloyd refinements with truncated-integer-mean updates
    (empty clusters keep their previous centroid).

    Scale shape: every step is one corpus scan and the driver holds only
    the k×dims integer centroids plus the expected (1 + init_rounds·l)
    sampled candidates, both bounded by construction (the sampler's
    selection probabilities sum to l per round). Per-dim int64 sums
    overflow only past ~10^15 unit-norm rows. Exactly replayable in
    portable SQL: the ann_kmeans DuckDB oracle re-runs init + Lloyd
    end-to-end and must match bit-for-bit.

    Path gating (``literal_cell_budget``): while candidates·dims (and
    k·dims) stay under the budget, distances are codegen'd JVM
    expressions over one literal candidate matrix and the Lloyd update is
    a k-group aggregation with map-side combine — the DuckDB-replayable
    plan the gate query pins. Past the budget — a 100 TB IVF wants
    k~10^4-10^5 × 128-1024 dims, where a plan literal and per-dim agg
    columns stop being viable — :func:`_nearest_frame` /
    :func:`_lloyd_sums` switch to the broadcast Arrow kernel, computing
    the SAME integer math (pinned bit-identical by tests), so results are
    independent of which path ran.
    """
    l = oversample if oversample is not None else 2 * k
    pts = embeddings.select(
        F.col(id_col).alias("id"), _scaled_ints(F.col(vec_col)).alias("xi")
    ).persist()
    try:
        first = pts.orderBy("id").limit(1).collect()[0]
        cands = {int(first["id"]): [int(v) for v in first["xi"]]}
        for r in range(1, init_rounds + 1):
            scored = _nearest_frame(
                pts, sorted(cands.items()), literal_cell_budget
            )
            tot = scored.agg(
                F.sum(F.col("d2").cast("decimal(38,0)")).alias("t")
            ).first()["t"]
            tot = float(tot or 0)
            if tot <= 0:  # degenerate corpus (all points identical)
                break
            sel_ids = scored.filter(
                _hash_uniform(F.col("id"), seed, r)
                < (F.lit(float(l)) * F.col("d2").cast("double")) / F.lit(tot)
            ).select("id")
            sel = pts.join(F.broadcast(sel_ids), "id").select("id", "xi").collect()
            for row in sel:
                cands[int(row["id"])] = [int(v) for v in row["xi"]]
        wrows = (
            _nearest_frame(pts, sorted(cands.items()), literal_cell_budget)
            .groupBy("cid")
            .agg(F.count("*").alias("w"))
            .collect()
        )
        ranked = sorted(
            ((int(r["w"]), int(r["cid"])) for r in wrows), key=lambda t: (-t[0], t[1])
        )[:k]
        cents = [(i, cands[cid]) for i, (_, cid) in enumerate(ranked)]
        for _ in range(lloyd_iters):
            got = _lloyd_sums(pts, cents, literal_cell_budget)
            cents = [(cid, got.get(cid, old)) for cid, old in cents]
    finally:
        pts.unpersist()
    return cents


def ann_kmeans_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    k_clusters: int = 8,
    lloyd_iters: int = 3,
    init_rounds: int = 2,
    seed: int = 1,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    literal_cell_budget: int = LITERAL_CELL_BUDGET,
) -> DataFrame:
    """IVF top-k with a LEARNED coarse quantizer (vs ``bucketed_topk``'s
    pre-existing label column, which a real pipeline doesn't have).

    Fits ``kmeans_quantizer`` on the corpus, assigns both sides their
    nearest-centroid bucket, and probes exactly like ``bucketed_topk`` —
    exact within the probed buckets; recall is the quantizer-quality IVF
    trade (pinned by a recall@k pytest on clustered data).

    ``nprobe``: the standard IVF recall knob — each query probes its
    ``nprobe`` nearest centroid buckets (the query frame fans out nprobe×,
    the corpus side is untouched, so candidate work scales linearly with
    nprobe and per-neighbor duplicates can't arise: every corpus row lives
    in exactly one bucket).

    Bucket assignment is path-gated like the fit: under
    ``literal_cell_budget`` it is one codegen'd expression per side (no
    join, no Python — the gate-query plan); above, each side gets its
    bucket from the broadcast Arrow kernel and joins it back on the id —
    an id-hash co-partitioned equi-join, still zero cross-join, so the
    whole search keeps working at k~10^4-10^5 × 1024 dims.

    If ``embeddings`` is an EXPENSIVE derived frame (e.g. embed_text's
    hashed-token fold), persist it first — the MLlib persist-before-fit
    convention. The fit caches its own fixed-point projection, but the
    literal bucket expression references the vector column k times and
    HOF-derived columns get no CSE, so an uncached derivation re-runs
    per reference (measured 214s → <10s at sf0.1 once cached).
    """
    cents = kmeans_quantizer(
        embeddings,
        k=k_clusters,
        lloyd_iters=lloyd_iters,
        init_rounds=init_rounds,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        literal_cell_budget=literal_cell_budget,
    )
    dims = len(cents[0][1])
    if len(cents) * dims <= literal_cell_budget:
        corpus_bucket = _nearest(cents, _scaled_ints(F.col(vec_col))).getField("cid")
        emb = embeddings.withColumn("_kb", corpus_bucket)
        if nprobe <= 1:
            qs = queries.withColumn("_kb", corpus_bucket)
        else:
            # full (d2, cid) array sorted ascending, sliced to nprobe buckets
            arr = F.array_sort(_dist_pairs(cents, _scaled_ints(F.col(vec_col))))
            probes = F.transform(
                F.slice(arr, 1, min(nprobe, len(cents))), lambda s: s.getField("cid")
            )
            qs = queries.withColumn("_kb", F.explode(probes))
    else:

        def _assign(df: DataFrame, n_probe: int) -> DataFrame:
            pts = df.select(
                F.col(id_col).alias("id"), _scaled_ints(F.col(vec_col)).alias("xi")
            )
            buckets = (
                _nearest_frame(pts, cents, literal_cell_budget, nprobe=n_probe)
                .select(F.col("id").alias(id_col), F.col("cid").alias("_kb"))
            )
            return df.join(buckets, id_col)

        emb = _assign(embeddings, 1)
        qs = _assign(queries, nprobe)
    return bucketed_topk(
        emb,
        qs,
        top_k=top_k,
        id_col=id_col,
        vec_col=vec_col,
        bucket_col="_kb",
    )


def hyperplane_values(bits: int, dims: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH.

    A Weyl low-discrepancy sequence (golden-ratio stride) centered on 0 —
    no RNG state, so the planes are pure functions of (bits, dims, seed)
    and any engine (Spark, the DuckDB oracle, a NumPy test) regenerates
    bit-identical double literals. Quality is on par with Gaussian planes
    for sign-LSH: what matters is that the directions are spread, and a
    Weyl sequence is equidistributed by construction.
    """
    out = []
    for j in range(bits):
        row = []
        for d in range(dims):
            x = ((j * dims + d + 1) * 0.6180339887498949
                 + seed * 0.7548776662466927) % 1.0
            row.append(x - 0.5)
        out.append(row)
    return out


def hyperplane_signature(
    embeddings: DataFrame,
    bits: int = 16,
    dims: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """(id, sig) — ``bits``-bit random-hyperplane (sign) signature.

    sig bit j = 1 iff <v, h_j> > 0. Each dot product is a JVM
    ``zip_with``+``aggregate`` fold in index order against a literal
    plane array — one columnar pass over the corpus, no shuffle, no
    Python. P(bit match) = 1 − angle/π (Charikar's sign-LSH), so banding
    the signature gives tunable near-dup candidate recall.

    ``dims`` defaults to the length of the first vector (one tiny job).
    """
    if dims is None:
        dims = int(
            embeddings.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
        )
    planes = hyperplane_values(bits, dims, seed)
    v = _as_double(F.col(vec_col))
    sig = F.lit(0).cast("long")
    for j in range(bits):
        plane = F.lit([float(p) for p in planes[j]]).cast("array<double>")
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return embeddings.select(F.col(id_col).alias("id"), sig.alias("sig"))


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    bits: int = 16,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """(id_a, id_b, cosine) with id_a < id_b and cosine ≥ ``threshold``.

    Embedding-cosine near-duplicate detection, LSH-bucketed so it never
    cross-joins: sign signatures → ``bands`` band keys per row → self
    equi-join per (band, key) bucket → exact in-order cosine on the
    (deduplicated) candidates → threshold filter. Near-identical vectors
    agree on almost every sign bit, so they collide in every band —
    recall ≈ 1 where it matters, and the band width (bits/bands) tunes
    the candidate rate for the grey zone.

    ``max_bucket`` drops degenerate buckets (e.g. the all-zeros
    signature of a null-vector flood) before the join goes quadratic —
    same safe-by-default shape as ``dedup.ngram_jaccard_pairs``'s
    ``max_postings``; pass ``None`` to disable. Dropped buckets are
    logged to stderr on the driver.

    At 10^12 rows: signature is one scan, banding is ``bands`` rows/doc,
    the join shuffles on (band, key) with bounded bucket sizes, and only
    candidate pairs (a tiny fraction) pay the exact-cosine join back to
    the vectors.
    """
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    bpb = bits // bands
    mask = (1 << bpb) - 1
    sigs = hyperplane_signature(
        embeddings, bits=bits, id_col=id_col, vec_col=vec_col, seed=seed
    )
    keyed = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", t * bpb).bitwiseAND(F.lit(mask))
                    for t in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    if max_bucket is not None:
        sizes = keyed.groupBy("band", "key").agg(F.count("*").alias("n"))
        hot = sizes.filter(F.col("n") > max_bucket)
        n_hot = hot.count()
        if n_hot:
            import sys

            sys.stderr.write(
                f"[cosine_near_dup_pairs] dropping {n_hot} bucket(s) larger "
                f"than {max_bucket} rows (recall trade, see docstring)\n"
            )
            keyed = keyed.join(
                F.broadcast(hot.select("band", "key")), ["band", "key"], "left_anti"
            )
    a = keyed.select(F.col("id").alias("id_a"), "band", "key")
    b = keyed.select(F.col("id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    emb = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    return (
        cand.join(emb.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), "id_a")
        .join(emb.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
