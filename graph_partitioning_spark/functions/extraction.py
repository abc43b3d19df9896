"""Vectorized Arrow UDFs: HTML → text and HTML → hyperlink extraction.

Per BASELINE.json input_hint these are the mandated Python surface — Arrow
pandas UDFs over binary ``html`` columns, never row-at-a-time Python UDFs.
The text parser is pure, versioned, and encoding-stable: given the same
html bytes it returns the same text bytes on any machine/partitioning
(the north star's "byte-identical extracted text per url" invariant).

Parser contract (PARSER_VERSION bumps on any behavior change):
  1. decode html as UTF-8 (errors="replace" — deterministic replacement),
  2. take <title> text, every <p> block's inner text, and every <a> tag's
     anchor text, in document order within each class,
  3. strip any residual tags inside those blocks, collapse to the literal
     block strings, join all blocks with "\n".

Reference analogue: the METIS loader is the reference's only "extraction"
step (/root/reference/graph_partitioning/utils.py:20-104); the html→link
extraction here plays its role for the web-page input mandated by the
north star.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARSER_VERSION = 1

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_A_RE = re.compile(r"<a\s[^>]*>(.*?)</a>", re.DOTALL | re.IGNORECASE)
_HREF_RE = re.compile(r"""<a\s[^>]*?href=["']([^"']+)["']""", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def _decode(b: bytes | None) -> str:
    if b is None:
        return ""
    return bytes(b).decode("utf-8", errors="replace")


def extract_text_py(html: bytes | None) -> str:
    """Pure-Python deterministic text extraction (the single source of truth;
    the UDF and all tests route through this exact function)."""
    s = _decode(html)
    blocks: list[str] = []
    m = _TITLE_RE.search(s)
    if m:
        blocks.append(_TAG_RE.sub("", m.group(1)))
    for m in _P_RE.finditer(s):
        blocks.append(_TAG_RE.sub("", m.group(1)))
    for m in _A_RE.finditer(s):
        blocks.append(_TAG_RE.sub("", m.group(1)))
    return "\n".join(blocks)


def extract_links_py(html: bytes | None) -> list[str]:
    """All href targets of <a> tags, in document order, duplicates kept."""
    return _HREF_RE.findall(_decode(html))


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_links_py)
