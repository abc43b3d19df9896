"""Deduplication operators over a ``documents(doc_id, text)`` table.

Four families, all shuffle-conscious:

- **exact**: md5 grouping — one hash-aggregate, the canonical first pass.
- **n-gram Jaccard**: exact pairwise Jaccard over character-shingle sets,
  computed by *inverted-index self-join on shingle* (explode → join →
  count), never a cross join: candidate pairs are only documents sharing
  ≥1 shingle, so the shuffle is Σ postings², not n². At web scale the
  postings list of a stop-shingle is capped (``max_postings``) exactly like
  a search engine drops stopwords — a documented recall trade.
- **MinHash + LSH**: per-seed signature = min md5(seed‖shingle) (md5 is
  portable across Spark and DuckDB, so the driver oracle can recompute
  signatures bit-for-bit); bands of r rows are hashed to buckets; pairs
  sharing a band bucket are candidates. O(n·seeds) work, O(bucket²) pair
  expansion.
- **SimHash**: 32-bit signature from per-token md5 bits weighted by term
  frequency; near-dups = signatures within ``max_hamming``. The signature
  is computed with higher-order functions (transform/aggregate) fully
  JVM-side.

The reference's dedup analogue is its duplicate-edge overwrite on load
(nx.Graph re-add semantics, /root/reference/graph_partitioning/utils.py:93-99);
these operators are the training-data-pipeline generalization the north
star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_members: int | None = 100,
) -> DataFrame:
    """Groups with >1 identical text → (keep_id, dup_count, members).

    keep_id = smallest doc_id of the group (deterministic survivor).
    ``members`` holds at most ``max_members`` smallest ids of the group
    (default 100): one boilerplate page duplicated 10^8 times must not
    become a single giant array row — ``dup_count`` still counts the whole
    group. Pass ``max_members=None`` to collect every member (only safe
    when group sizes are known-bounded); pass 0 to skip members entirely.
    """
    base = documents.select(id_col, F.md5(F.col(text_col).cast("binary")).alias("h"))
    if max_members is None:
        members = F.sort_array(F.collect_list(id_col))
    else:
        # rank within the hash group BEFORE collecting, so no aggregation
        # buffer ever holds an unbounded group; the window's h-partitioned
        # sort is spillable and its exchange is reused by the groupBy
        w = Window.partitionBy("h").orderBy(id_col)
        base = base.withColumn("_rn", F.row_number().over(w))
        members = F.sort_array(
            F.collect_list(F.when(F.col("_rn") <= max_members, F.col(id_col)))
        )
    return (
        base.groupBy("h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
            members.alias("members"),
        )
        .filter(F.col("dup_count") > 1)
        .select("keep_id", "dup_count", "members")
    )


from ._util import fan_out as _fan_out  # shared: see _util.fan_out


def _shingle_rows(documents: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) — one row per distinct character k-shingle of the
    casefolded, space-collapsed text.

    The normalization is PROJECTED to a column before the per-shingle
    ``transform`` lambda touches it. Referencing the regexp expression
    inside the lambda body re-evaluates it once PER SHINGLE, not per
    document — higher-order-function lambdas are interpreted with no
    common-subexpression elimination (measured: 161s → 5.6s for 300k-doc
    minhash signatures, a 29× cliff). Same values either way; this is
    purely an evaluation-structure guard.
    """
    norm_expr = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    d = _fan_out(documents.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"), norm_expr.alias("_norm")
    )
    norm = F.col("_norm")
    n = F.length(norm)
    arr = F.when(
        n >= k,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n - (k - 1)), lambda i: norm.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array(norm))
    return d.select("doc_id", F.explode(arr).alias("shingle"))


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = 10_000,
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs → (a, b, jaccard) with a < b.

    Inverted-index plan: doc→shingle postings, self-join on shingle,
    count shared shingles per pair, Jaccard = |∩| / (|A|+|B|−|∩|).
    ``max_postings`` drops shingles shared by more than that many docs
    (frequency-capped inverted index — the standard web-scale guard against
    quadratic blowup on boilerplate shingles). The cap is ON by default
    (10k postings ⇒ ≤10^8 pair rows per dropped stop-shingle avoided);
    ``None`` opts out for exact small-corpus runs. When the cap fires, the
    number of dropped shingles is printed so truncation is never silent —
    dropped shingles shrink intersections only (a documented recall trade:
    jaccard is understated for pairs sharing a stop-shingle, never
    overstated, because ``sizes`` is computed before the cap).
    """
    sh = _shingle_rows(documents, id_col, text_col, k).withColumnRenamed("doc_id", "doc")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    if max_postings is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_postings)
            .select("shingle")
        )
        hot = hot.persist()
        n_hot = hot.count()
        if n_hot:
            print(
                f"[ngram_jaccard_pairs] dropping {n_hot} stop-shingle(s) with "
                f"more than {max_postings} postings (recall trade, see docstring)"
            )
        # hot stays persisted for the anti-join (≤ total_postings/max_postings
        # rows); AQE broadcasts it when small enough
        sh = sh.join(hot, "shingle", "left_anti") if n_hot else sh
    a = sh.select(F.col("doc").alias("a"), "shingle")
    b = sh.select(F.col("doc").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


MINHASH_PRIME = 2147483647  # 2^31 - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine-mix constants per seed. a < 2^30 keeps
    a·base < 2^62 (no int64 overflow for base < 2^32, ANSI-safe)."""
    return [
        ((1000003 * (h + 1) + 12345) % (1 << 30) | 1, (40503 * (h + 1) + 7) % MINHASH_PRIME)
        for h in range(num_hashes)
    ]


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = 16,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig: array<long>) — per-seed min of an affine mix of the
    shingle's base hash.

    base(shingle) = first 8 hex chars of md5 as int (portable: DuckDB
    computes the identical value), h_i = (a_i·base + b_i) mod (2^31−1).
    One md5 per shingle total; the 16 mixes are integer multiply-adds.

    Plan: explode shingles once, all seed-mins as flat agg columns — the
    map-side combine shrinks the shuffle to num_hashes longs per document
    regardless of shingle count.
    """
    sh = _shingle_rows(documents, id_col, text_col, k)
    base = F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    sh = sh.select("doc_id", base.alias("base"))
    mins = [
        F.min((F.lit(a) * F.col("base") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{h}")
        for h, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"m{h}") for h in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    signatures: DataFrame | None = None,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a, b, n_bands) with a < b.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; band
    key = md5 of the concatenated band slice; documents sharing a band key
    are candidates. n_bands = number of agreeing bands (ranking signal).

    ``signatures``: optional precomputed ``minhash_signatures`` output
    (doc_id, sig) — pass it when the pipeline already materialized
    signatures so the (dominant) shingle+hash pass is not paid twice.

    ``max_bucket``: drop band buckets larger than this before the
    self-join goes quadratic — the same safe-by-default cap as
    ``ngram_jaccard_pairs``/``cosine_near_dup_pairs``. The degenerate
    inputs are real: a flood of empty/templated documents all collapse to
    one signature, and a low-diversity shingle universe lets a globally
    common shingle win the min-hash for a large corpus fraction (measured
    while benching: decimal-number tokens produced a 51.7M-pair candidate
    set for ~2M true duplicates at 10M docs). Dropped buckets are logged
    to stderr; pass ``None`` to disable. Far below any true-near-dup
    recall impact at the default: a 100k-doc bucket is never one
    duplicate cluster.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = (
        signatures
        if signatures is not None
        else minhash_signatures(documents, num_hashes, k, text_col, id_col)
    )
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws("|", *[F.col("sig")[bi * r + j] for j in range(r)]).cast(
                                "binary"
                            )
                        ).alias("key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket is not None:
        sizes = band_rows.groupBy("band", "key").agg(F.count("*").alias("n"))
        hot = sizes.filter(F.col("n") > max_bucket)
        n_hot = hot.count()
        if n_hot:
            import sys

            sys.stderr.write(
                f"[lsh_candidate_pairs] dropping {n_hot} band bucket(s) larger "
                f"than {max_bucket} docs (recall trade, see docstring)\n"
            )
            band_rows = band_rows.join(
                F.broadcast(hot.select("band", "key")), ["band", "key"], "left_anti"
            )
    left = band_rows.select(F.col("doc_id").alias("a"), "band", "key")
    right = band_rows.select(F.col("doc_id").alias("b"), "band", "key")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(
    documents: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash: long) — token-frequency-weighted SimHash.

    Per word token: 32-bit hash from the first 8 hex chars of md5(token);
    each bit contributes +tf or −tf; signature bit = 1 where the sum > 0.
    All higher-order-function arithmetic, JVM-side.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda w: w != ""
    )
    tf = (
        _fan_out(documents.select(id_col, text_col))
        .select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    h32 = F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 8), 16, 10).cast("long")
    withbits = tf.select("doc_id", "tf", h32.alias("h"))
    contribs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = withbits.groupBy("doc_id").agg(*contribs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
        sig = term if sig is None else (sig + term)
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs with simhash Hamming distance ≤ max_hamming (a < b, distance).

    Banding on 4 byte-chunks of the signature (pigeonhole: distance ≤ 3 →
    at least one identical chunk) keeps this a bucket join, not a cross
    join.
    """
    sigs = simhash(documents, bits, text_col, id_col)
    chunks = 4
    cb = bits // chunks
    mask = (1 << cb) - 1
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * cb).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    left = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"), "chunk", "key")
    right = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"), "chunk", "key")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        left.join(right, ["chunk", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    signatures: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-dup clustering: LSH pairs → connected components →
    canonical keep-list. The pipeline step users actually run: every
    document gets a ``keep_id`` (the minimum doc id of its near-duplicate
    cluster; itself when it has no candidates) and a ``keep`` flag (1 iff
    it IS the canonical copy).

    Composition of already-scale-shaped pieces: the candidate graph is the
    banded ``lsh_candidate_pairs`` equi-join (never a cross join), the
    clustering is the large-star/small-star ``connected_components`` pass
    (O(log n) rounds, no driver state), and the keep-list is one left
    join back to the corpus. ``pairs``: optional precomputed candidate
    pairs (a, b) — pass them when the pipeline already materialized them.
    """
    from ..graph.components import connected_components

    if pairs is None:
        pairs = lsh_candidate_pairs(
            documents, num_hashes, bands, k, text_col, id_col, signatures
        )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp, _ = connected_components(edges)
    docs = documents.select(F.col(id_col).alias("doc_id"))
    keep_id = F.coalesce(F.col("component"), F.col("doc_id"))
    return (
        docs.join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            keep_id.alias("keep_id"),
            (keep_id == F.col("doc_id")).cast("int").alias("keep"),
        )
    )
