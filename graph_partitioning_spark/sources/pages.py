"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema (per BASELINE.json input_hint):
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

The generator is fully JVM-side (``spark.range`` + built-in expressions; no
Python in the row path) so it scales linearly with cores and produces the
exact same bytes at any parallelism: every field is a pure function of the
page id through ``xxhash64``. Hyperlinks follow a preferential-attachment
style rule (targets biased quadratically toward low ids) so in-degree is
power-law — the hub-vertex skew the engine's salting paths are built for.

The ``text`` column is the golden byte-identical extraction target: it is
built from the same (title, body, anchors) pieces the HTML embeds, joined
with "\\n" — ``functions.extraction.extract_text_udf`` must reproduce it
byte-for-byte (invariant checked in tests/test_extraction.py).

Reference analogue: the METIS test corpus generator
(/root/reference/random_edge_network_updater.ipynb cells 0-1) and fixture
files (/root/reference/data/oneshot_fennel_simple.txt — 1000n/2939e).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2022 = 1640995200  # 2022-01-01T00:00:00Z — fixed warc_ts base

LANGS = ["en", "en", "en", "de", "fr", "es", "it", "nl"]  # weighted categorical

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "graph", "vertex", "edge", "crawl", "page",
    "link", "rank", "spark", "shard", "batch", "stream", "index", "token",
    "corpus", "anchor", "query", "table", "join", "merge", "sort", "scan",
    "hash", "tree", "node", "label", "group", "count", "score", "weight",
    "block", "frame", "tuple", "row", "col", "byte", "text", "lang",
]

_SITE_SKEW_EXP = 3  # host popularity ~ u^3 → power-law pages/host
_DST_SKEW_EXP = 2   # link target ~ id * u^2 → power-law in-degree


def _hash_unit(*cols: Column | str) -> Column:
    """Deterministic uniform in [0, 1) from xxhash64 of the inputs."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000)).cast("double")) / 1_000_000.0


def _site_of(page_id: Column, n_sites: int) -> Column:
    u = _hash_unit(F.lit("host"), page_id)
    return F.floor(F.lit(n_sites) * F.pow(u, F.lit(_SITE_SKEW_EXP))).cast("long")


def _url_of(page_id: Column, n_sites: int) -> Column:
    return F.concat(
        F.lit("https://site"),
        _site_of(page_id, n_sites).cast("string"),
        F.lit(".example/p"),
        page_id.cast("string"),
    )


def _link_targets(page_id: Column, max_out: int) -> Column:
    """array<long> of deterministic out-link targets for a page.

    Target ids are ``floor(id * u^2)`` — quadratically biased toward old
    (low-id) pages, yielding power-law in-degree (hubs). Self-links are
    dropped; duplicates are kept (they become edge weight on aggregation).
    """
    out_deg = (F.lit(1) + F.pmod(F.xxhash64(F.lit("deg"), page_id), F.lit(max_out))).cast("int")
    seq = F.sequence(F.lit(0), out_deg - 1)
    tgt = F.transform(
        seq,
        lambda j: F.floor(
            page_id.cast("double")
            * F.pow(_hash_unit(F.lit("dst"), page_id, j), F.lit(_DST_SKEW_EXP))
        ).cast("long"),
    )
    return F.filter(tgt, lambda t: t != page_id)


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_sites: int | None = None,
    max_out_links: int = 12,
    body_words_min: int = 12,
    body_words_max: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic pages DataFrame (lazy; nothing materialized)."""
    if n_sites is None:
        n_sites = max(4, n_pages // 50)
    if num_partitions is None:
        num_partitions = max(8, min(256, n_pages // 25_000 + 8))

    df = spark.range(0, n_pages, 1, num_partitions).withColumnRenamed("id", "page_id")
    pid = F.col("page_id")

    title = F.concat(
        F.lit("Page "), pid.cast("string"),
        F.lit(" of site "), _site_of(pid, n_sites).cast("string"),
    )
    n_body = (
        F.lit(body_words_min)
        + F.pmod(F.xxhash64(F.lit("blen"), pid), F.lit(body_words_max - body_words_min + 1))
    ).cast("int")
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_body - 1),
            lambda j: F.element_at(words_arr, (F.pmod(F.xxhash64(F.lit("w"), pid, j), F.lit(len(WORDS))) + 1).cast("int")),
        ),
    )
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]),
        (F.pmod(F.xxhash64(F.lit("lang"), pid), F.lit(len(LANGS))) + 1).cast("int"),
    )

    targets = _link_targets(pid, max_out_links)
    anchor_of = lambda t: F.concat(F.lit("Link to page "), t.cast("string"))  # noqa: E731
    li_items = F.array_join(
        F.transform(
            targets,
            lambda t: F.concat(
                F.lit('<li><a href="'), _url_of(t, n_sites), F.lit('">'),
                anchor_of(t), F.lit("</a></li>"),
            ),
        ),
        "",
    )

    html_str = F.concat(
        F.lit('<!DOCTYPE html><html lang="'), lang, F.lit('"><head><meta charset="utf-8"><title>'),
        title,
        F.lit("</title></head><body><h1>"), title, F.lit("</h1><p>"),
        body,
        F.lit("</p><nav><ul>"), li_items, F.lit("</ul></nav></body></html>"),
    )

    # Golden extraction: title, body, then anchor texts, "\n"-joined.
    text = F.concat_ws(
        "\n",
        F.concat_ws("\n", title, body),
        F.array_join(F.transform(targets, anchor_of), "\n"),
    )
    # concat_ws skips empty trailing piece only if null; pages with no links
    # produce "title\nbody" exactly because array_join of [] is "" and
    # concat_ws("\n", x, "") would append a trailing "\n" — guard it:
    text = F.when(F.size(targets) > 0, text).otherwise(F.concat_ws("\n", title, body))

    return df.select(
        _url_of(pid, n_sites).alias("url"),
        F.timestamp_seconds(F.lit(EPOCH_2022) + pid).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def pages_schema() -> str:
    return "url string, warc_ts timestamp, html binary, text string, lang string"


def synthetic_edges(
    spark: SparkSession,
    n_pages: int,
    max_out_links: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Directed weighted edge table of the synthetic link graph, generated
    entirely JVM-side (no html round-trip) — same targets as the ``pages``
    table's hyperlinks, for benchmarks that need the graph, not the pages.

    Returns (src long, dst long, weight double) with preferential-attachment
    in-degree skew (hubs at low ids).
    """
    if num_partitions is None:
        num_partitions = max(8, min(512, n_pages // 100_000 + 8))
    df = spark.range(0, n_pages, 1, num_partitions).withColumnRenamed("id", "page_id")
    pid = F.col("page_id")
    targets = _link_targets(pid, max_out_links)
    return (
        df.select(pid.alias("src"), F.explode(targets).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def planted_edges(
    spark: SparkSession,
    n_vertices: int,
    communities: int = 64,
    intra: int = 8,
    inter: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Directed edge table of a planted-partition graph, generated entirely
    JVM-side — ``communities`` contiguous vertex blocks, ``intra``
    hash-pseudorandom targets inside the block and ``inter`` anywhere, per
    vertex. The ground-truth community of vertex v is v // block_size.

    The quality benchmark for partitioners that exploit community
    structure (the multilevel F6 role): a good k-way cut aligns with the
    blocks, so cut ratio has real headroom, unlike the community-free
    preferential-attachment web graph where every partitioner converges
    to a similar cut. Deterministic (xxhash64 targets), one generator
    stage, no Python row path.
    """
    if num_partitions is None:
        num_partitions = max(8, min(512, n_vertices // 100_000 + 8))
    block = max(1, n_vertices // communities)
    df = spark.range(0, n_vertices, 1, num_partitions).withColumnRenamed(
        "id", "src"
    )
    v = F.col("src")
    base = (v - F.pmod(v, F.lit(block)))  # block start (last block absorbs tail)
    base = F.when(base >= (communities - 1) * block, F.lit((communities - 1) * block)).otherwise(base)
    blk_len = F.when(
        base == (communities - 1) * block,
        F.lit(n_vertices - (communities - 1) * block),
    ).otherwise(F.lit(block))
    targets = []
    for j in range(1, intra + 1):
        t = base + F.pmod(F.xxhash64(v, F.lit(j)), blk_len)
        targets.append(t)
    for j in range(1, inter + 1):
        targets.append(F.pmod(F.xxhash64(v, F.lit(1000 + j)), F.lit(n_vertices)))
    arr = F.array_distinct(F.array(*targets))
    return (
        df.select("src", F.explode(arr).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
    )
