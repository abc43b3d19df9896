"""Dedup pipeline bench at corpus scale: minhash → LSH → CC → keep-list.

The gate pins `dedup_clusters` exact at 500 docs; this measures the same
pipeline at millions of documents on local[32] with planted duplicates,
reporting per-stage wall, rows, and rows/s — the profile a 100 TB corpus
run would exhibit (every stage is a scan + bounded-key shuffle; nothing
driver-side).

Synthetic corpus (deterministic, generated JVM-side, no Python row path):
80% canonical documents — 12-40 token bodies over a 30k-token synthetic
vocabulary ("w<id>"), seeded by doc id; the 63-word demo pool the pages
generator uses is far too small here (5-char shingles of a tiny shared
vocabulary collide across UNRELATED docs, and a first cut of this bench
clustered 89% of the corpus together) — 10% exact duplicates of a
hash-picked canonical doc, 10% near-duplicates (same body + one extra
token). The expected cluster structure is known, so the keep-list is
sanity-checked, not just timed.

Usage:
    python tools/bench_dedup.py [n_docs]      (default 10_000_000)
Appends a BENCH.md section unless SPARK_GRAFT_NO_WRITE.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from graph_partitioning_spark.session import get_spark  # noqa: E402
from graph_partitioning_spark.data.dedup import (  # noqa: E402
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
)


def synth_docs(spark, n: int):
    """(doc_id, text): ids < 0.8n canonical; [0.8n, 0.9n) exact dups;
    [0.9n, n) near dups (one appended token)."""
    n_canon = int(n * 0.8)
    df = spark.range(0, n, 1, max(16, min(512, n // 100_000 + 8)))
    did = F.col("id")
    canon = F.when(
        did < n_canon, did
    ).otherwise(F.pmod(F.xxhash64(F.lit("pick"), did), F.lit(n_canon)))
    n_body = (
        F.lit(12) + F.pmod(F.xxhash64(F.lit("blen"), canon), F.lit(29))
    ).cast("int")
    # tokens are md5-hex prefixes, not decimal numbers: 5-char shingles of
    # decimal tokens ("w2341 w87...") share digit substrings across
    # UNRELATED docs, a few globally-common shingles win the global
    # min-hash per seed, and the LSH buckets go quadratic (measured at
    # 10M docs: 51.7M candidate pairs for ~2M true dups and 3.2M
    # canonicals wrongly clustered). Hex tokens make the shingle space
    # rich enough that candidates ≈ true duplicates.
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_body - 1),
            lambda j: F.substring(
                F.md5(
                    F.pmod(F.xxhash64(F.lit("w"), canon, j), F.lit(30_000))
                    .cast("string")
                    .cast("binary")
                ),
                1,
                8,
            ),
        ),
    )
    near = (did >= int(n * 0.9)) & (did < n)
    text = F.when(
        near, F.concat(body, F.lit(" extra"), F.pmod(did, F.lit(7)).cast("string"))
    ).otherwise(body)
    return df.select(did.alias("doc_id"), text.alias("text"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="bench_dedup")
    rows = []

    def stage(label, fn):
        t0 = time.time()
        out, count = fn()
        wall = time.time() - t0
        rows.append(
            f"| {label} | {wall:,.1f}s | {count:,} | {count / wall:,.0f}/s |\n"
        )
        print(rows[-1], end="", flush=True)
        return out

    docs = stage(
        "corpus synth + materialize",
        lambda: (lambda d: (d, d.count()))(synth_docs(spark, n).persist()),
    )
    sigs = stage(
        "minhash signatures (16 hashes, 5-shingles)",
        lambda: (lambda s: (s, s.count()))(minhash_signatures(docs).persist()),
    )
    pairs = stage(
        "LSH candidate pairs (4 bands)",
        lambda: (lambda p: (p, p.count()))(
            lsh_candidate_pairs(docs, signatures=sigs).persist()
        ),
    )
    clusters = stage(
        "dedup_clusters (CC + keep-list)",
        lambda: (lambda c: (c, c.count()))(
            dedup_clusters(docs, signatures=sigs, pairs=pairs).persist()
        ),
    )

    # sanity: every exact duplicate must NOT be the kept copy; canonical
    # docs without candidates keep themselves
    agg = clusters.agg(
        F.sum("keep").alias("kept"),
        F.sum(
            F.when(
                (F.col("doc_id") >= int(n * 0.8))
                & (F.col("doc_id") < int(n * 0.9))
                & (F.col("keep") == 1),
                1,
            ).otherwise(0)
        ).alias("exact_dups_kept"),
    ).first()
    kept, bad = int(agg["kept"]), int(agg["exact_dups_kept"])
    dropped = n - kept
    print(f"kept {kept:,} / {n:,} (dropped {dropped:,}); exact dups wrongly kept: {bad:,}")

    text = (
        f"\n## Dedup pipeline at corpus scale ({n:,} docs, "
        f"local[{spark.sparkContext.defaultParallelism}])\n\n"
        "| stage | wall | rows out | rows/s |\n|---|---|---|---|\n"
        + "".join(rows)
        + f"\nKeep-list: kept {kept:,} / {n:,} (dropped {dropped:,} near/exact "
        f"duplicates); exact duplicates wrongly kept: {bad:,} (exact dups always "
        "cluster with their canonical, which has the smaller id). Every stage is "
        "scan + bounded-key shuffle; signatures are reused by pairs and clusters "
        "(the shingle+md5 pass — the dominant cost — is paid once).\n"
    )
    print(text)
    if not os.environ.get("SPARK_GRAFT_NO_WRITE"):
        with open("/root/repo/BENCH.md", "a") as f:
            f.write(text)


if __name__ == "__main__":
    main()
