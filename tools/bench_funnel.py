"""Composed-funnel bench at corpus scale: one pass scores, then dedup +
decontamination, per-document reasons.

`corpus_funnel` is gated exact at 478 docs; this measures
`data.pipeline.pretraining_funnel` end-to-end at millions of documents on
local[32] and reports the reason histogram against the planted structure.

Corpus: the decontam bench's synthetic generator (md5-hex token bodies,
1% verbatim + 1% partial eval copies) EXTENDED with a planted 10% exact-
duplicate slice (body seed copied from a hash-picked earlier doc). The
hex corpus has no natural language, so the language stage is configured
to pass everything through (`langs=('und',)` — the honest setting for a
token-synthetic corpus; the stage's cost is still paid and measured),
and the quality bar is set inside the synthetic length band so the
length component genuinely splits the corpus (~quarter rejected).

Usage:
    python tools/bench_funnel.py [n_train] [n_eval]   (default 10_000_000 10_000)
Appends a BENCH.md section unless SPARK_GRAFT_NO_WRITE.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from graph_partitioning_spark.session import get_spark  # noqa: E402
from graph_partitioning_spark.data import pretraining_funnel  # noqa: E402
from bench_decontam import N_GRAM, _body, _n_tokens, synth_eval  # noqa: E402

MIN_QUALITY = 0.40  # rejects bodies under ~25 tokens (synthetic band 20-40)
THRESHOLD = 0.1


def synth_train_dups(spark, n_train: int, n_eval: int):
    """ids < n_train; plant buckets by hash: 0 → verbatim eval copy,
    1 → half eval copy, 2-11 (10%) → exact duplicate of a hash-picked
    earlier clean doc, rest → own clean body."""
    parts = max(16, min(512, n_train // 100_000 + 8))
    df = spark.range(0, n_train, 1, parts)
    did = F.col("id")
    bucket = F.pmod(F.xxhash64(F.lit("plant"), did), F.lit(100))
    picked = F.lit(n_train) + F.pmod(F.xxhash64(F.lit("pick"), did), F.lit(n_eval))
    # duplicate source: re-derive the source's OWN body from its id. When
    # the hash-picked source is itself in a planted bucket (~12% of picks)
    # that body never actually appears as the source's final text, so the
    # "duplicate" is a unique clean doc — the effective exact-dup plant is
    # ~8.8%, further reduced to ~7.5% observed because a short source body
    # loses to the quality stage in the priority order. The histogram
    # check below uses these effective rates, not the nominal 10%.
    src = F.pmod(F.xxhash64(F.lit("dupof"), did), F.greatest(did, F.lit(1)))
    own = _body(did, _n_tokens(did))
    ev_body = _body(picked, _n_tokens(picked))
    half = F.concat_ws(" ", _body(picked, F.lit(N_GRAM + 4)), own)
    dup_body = _body(src, _n_tokens(src))
    text = (
        F.when(bucket == 0, ev_body)
        .when(bucket == 1, half)
        .when((bucket >= 2) & (bucket < 12) & (did > 0), dup_body)
        .otherwise(own)
    )
    return df.select(did.alias("doc_id"), text.alias("text"))


def main() -> None:
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_eval = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark(app_name="bench_funnel")
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

    eval_docs = stage(
        "eval-set synth + materialize",
        lambda: (lambda d: (d, d.count()))(
            synth_eval(spark, n_train, n_eval).persist()
        ),
    )
    train = stage(
        "train corpus synth + materialize (10% dups planted)",
        lambda: (lambda d: (d, d.count()))(
            synth_train_dups(spark, n_train, n_eval).persist()
        ),
    )
    funnel = stage(
        "pretraining_funnel (score+dedup+decontaminate, 8-grams)",
        lambda: (lambda s: (s, s.count()))(
            pretraining_funnel(
                train,
                eval_docs,
                min_quality=MIN_QUALITY,
                langs=("und",),
                ngram=N_GRAM,
                contamination_threshold=THRESHOLD,
            ).persist()
        ),
    )

    hist = {
        r["reason"]: r["n"]
        for r in funnel.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    kept = hist.get("kept", 0)
    print("reason histogram:", dict(sorted(hist.items())))

    hist_md = ", ".join(f"{k} {v:,}" for k, v in sorted(hist.items()))
    text = (
        f"\n## Composed funnel at corpus scale ({n_train:,} train docs vs "
        f"{n_eval:,} eval docs, local[{spark.sparkContext.defaultParallelism}])\n\n"
        "| stage | wall | rows out | rows/s |\n|---|---|---|---|\n"
        + "".join(rows)
        + f"\nReason histogram: {hist_md} — kept {kept:,} of {n_train:,}. "
        "Planted: a 10% dup slice (~8.8% effective — a dup whose "
        "hash-picked source is itself planted copies a body that never "
        "appears, see the generator comment) and ~2% eval copies (1% "
        "verbatim + 1% partial); the quality bar (0.40) sits inside the "
        "synthetic 20-40 token band so the length component rejects the "
        "short quarter; the hex corpus has no natural language so the "
        "language stage passes 'und' through (its hit-count scan is still "
        "paid). Reasons follow the documented priority: a short eval-copy "
        "or short-source duplicate scores low_quality first. One scoring "
        "pass over the corpus + one fingerprint aggregate + the broadcast "
        "decontamination stage — the text column never enters a shuffle.\n"
    )
    print(text)
    if not os.environ.get("SPARK_GRAFT_NO_WRITE"):
        with open("/root/repo/BENCH.md", "a") as f:
            f.write(text)


if __name__ == "__main__":
    main()
