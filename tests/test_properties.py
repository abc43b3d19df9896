"""Property-based tests (hypothesis) for the pure kernels.

These cover the north star's byte-identical-extraction invariant and the
deterministic text kernels without spinning Spark jobs per example — the
Spark UDFs are thin Arrow wrappers over exactly these functions (verified
separately in test_extraction.py).
"""

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from graph_partitioning_spark.functions.extraction import (
    extract_links_py,
    extract_text_py,
)

html_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)
urls = st.from_regex(r"https?://[a-z0-9.]{1,20}/[a-z0-9]{0,10}", fullmatch=True)


@given(html_text)
@settings(max_examples=200, deadline=None)
def test_extraction_deterministic_and_pure(s):
    b = s.encode("utf-8", errors="surrogatepass") if any(
        0xD800 <= ord(c) <= 0xDFFF for c in s
    ) else s.encode("utf-8")
    assert extract_text_py(b) == extract_text_py(b)
    assert extract_links_py(b) == extract_links_py(b)


@given(st.lists(st.tuples(urls, st.text(max_size=20)), max_size=8))
@settings(max_examples=100, deadline=None)
def test_links_extracted_in_document_order(pairs):
    html = "".join(
        f'<a href="{u}">{re.sub("[<>]", "", a)}</a>' for u, a in pairs
    ).encode()
    assert extract_links_py(html) == [u for u, _ in pairs]


@given(st.text(min_size=0, max_size=120), st.text(min_size=0, max_size=120))
@settings(max_examples=150, deadline=None)
def test_title_and_paragraph_extraction(title, body):
    t = re.sub(r"[<>&]", "", title)
    p = re.sub(r"[<>&]", "", body)
    html = f"<html><head><title>{t}</title></head><body><p>{p}</p></body></html>".encode()
    out = extract_text_py(html)
    assert out == f"{t}\n{p}"


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_extraction_total_on_arbitrary_bytes(b):
    # never raises, always a str, stable under repetition (errors="replace")
    a = extract_text_py(b)
    assert isinstance(a, str)
    assert a == extract_text_py(b)


def _py_minhash_slot(text, seed_params):
    a, b = seed_params
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    sh = {norm[i : i + 5] for i in range(max(len(norm) - 4, 0))} or {norm}
    return min(
        (a * int(hashlib.md5(s.encode()).hexdigest()[:8], 16) + b) % (2**31 - 1)
        for s in sh
    )


@given(st.text(alphabet="abcdefgh ", min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_minhash_identical_docs_collide(s):
    from graph_partitioning_spark.data.dedup import minhash_params

    p = minhash_params(1)[0]
    assert _py_minhash_slot(s, p) == _py_minhash_slot(s + "", p)
    # whitespace-normalized variants share shingle sets → same minhash
    assert _py_minhash_slot(s, p) == _py_minhash_slot(re.sub(r" +", " ", s), p)
