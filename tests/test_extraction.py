"""Extraction invariants: byte-identical text per url, link parity,
determinism across parallelism (SURVEY.md §5, input_hint invariant)."""

import pyspark.sql.functions as F

from graph_partitioning_spark.functions.extraction import (
    extract_links_py,
    extract_text_py,
    extract_text_udf,
)
from graph_partitioning_spark.sources.pages import generate_pages


def test_text_extraction_byte_identical(spark):
    pages = generate_pages(spark, n_pages=400)
    bad = (
        pages.withColumn("extracted", extract_text_udf("html"))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extraction_deterministic_across_parallelism(spark):
    a = generate_pages(spark, n_pages=300, num_partitions=2).orderBy("url").collect()
    b = generate_pages(spark, n_pages=300, num_partitions=16).orderBy("url").collect()
    assert [r.url for r in a] == [r.url for r in b]
    assert [bytes(r.html) for r in a] == [bytes(r.html) for r in b]
    assert [r.text for r in a] == [r.text for r in b]


def test_pure_parser_roundtrip():
    html = (
        b'<!DOCTYPE html><html lang="en"><head><meta charset="utf-8">'
        b"<title>T1</title></head><body><h1>T1</h1><p>hello world</p>"
        b'<nav><ul><li><a href="https://x.example/a">A1</a></li>'
        b'<li><a href="https://x.example/b">A2</a></li></ul></nav></body></html>'
    )
    assert extract_text_py(html) == "T1\nhello world\nA1\nA2"
    assert extract_links_py(html) == ["https://x.example/a", "https://x.example/b"]


def test_parser_edge_cases():
    assert extract_text_py(None) == ""
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"<p>only <b>body</b></p>") == "only body"
    assert extract_links_py(b"<a name=x>no href</a>") == []
    # invalid utf-8 decodes deterministically via replacement char
    assert extract_text_py(b"<p>\xff\xfe</p>") == "��"
