"""Tokenizer goldens + Arrow/Python/SQL parity (SURVEY.md §5)."""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_ray.analyzer import (
    analyze_query,
    doc_token_stats,
    tokenize_flat,
    tokens_py,
    tokens_sql,
)

GOLDENS = [
    ("getHTTPResponse2Code", ["get", "http", "response2", "code"]),
    ("foo_bar baz", ["foo", "bar", "baz"]),
    ("SimpleXMLParser", ["simple", "xml", "parser"]),
    ("camelCase snake_case MixedHTTP", ["camel", "case", "snake", "case", "mixed", "http"]),
    ("x9y abc123def", ["x9y", "abc123def"]),
    ("déjà_vu ναμε ok", ["d", "j", "vu", "ok"]),  # unicode acts as separator
    ("", []),
    ("!!! ... ???", []),
    ("a..b,,c", ["a", "b", "c"]),
    ("HTML", ["html"]),
    ("getA", ["get", "a"]),
    ("A1b2C3", ["a1b2", "c3"]),
]


@pytest.mark.parametrize("text,expect", GOLDENS)
def test_tokens_py_golden(text, expect):
    assert tokens_py(text) == expect


def test_arrow_matches_python():
    texts = [t for t, _ in GOLDENS] + [None]
    flat, parents = tokenize_flat(pa.array(texts, type=pa.string()))
    per_row = [[] for _ in texts]
    for tok, p in zip(flat.to_pylist(), parents):
        per_row[p].append(tok)
    for (text, expect), got in zip(GOLDENS, per_row):
        assert got == expect, text
    assert per_row[-1] == []  # null row


def test_sql_matches_python():
    con = duckdb.connect()
    for text, expect in GOLDENS:
        if text == "":
            continue
        got = con.execute(
            f"select {tokens_sql('t')} from (values (?)) v(t)", [text]
        ).fetchone()[0]
        assert got == expect, text


def test_lang_tagging():
    flat, _ = tokenize_flat(pa.array(["def foo"]), pa.array(["py"]))
    assert flat.to_pylist() == ["py:def", "py:foo"]


def test_doc_token_stats_sorted_and_counted():
    terms, tfs, dl = doc_token_stats(pa.array(["b a b c a b"]))
    assert terms.to_pylist() == [["a", "b", "c"]]
    assert tfs.to_pylist() == [[2, 3, 1]]
    assert dl.tolist() == [6]


def test_doc_token_stats_batch_independent():
    """Per-row output must not depend on neighbouring rows in the batch."""
    a = doc_token_stats(pa.array(["zeta alpha zeta"]))
    b = doc_token_stats(pa.array(["other words first", "zeta alpha zeta"]))
    assert a[0].to_pylist()[0] == b[0].to_pylist()[1]
    assert a[1].to_pylist()[0] == b[1].to_pylist()[1]


def test_analyze_query_expansion():
    assert analyze_query("def def x", "py") == {"py:def": 2, "py:x": 1}
    assert analyze_query("def", None, ["py", "js"]) == {"py:def": 1, "js:def": 1}
    assert analyze_query("def", None, None) == {"def": 1}
    assert analyze_query("", None, None) == {}


def test_byte_fast_path_parity_adversarial():
    """_tokenize_ascii_bytes must equal tokens_py on camel/digit/run edge
    cases, and tokenize_flat must route mixed ASCII/unicode rows correctly."""
    import numpy as np

    from splade_ray.analyzer import (
        _tokenize_ascii_bytes,
        tokenize_flat,
        tokens_py,
    )

    cases = [
        "", "a", "A", "aB", "Ab", "AB", "ABc", "aBc", "aXBc", "getHTTPResponse2Code",
        "max2Count", "B2", "2b", "snake_case_id", "__x__", "a  b\tc\nd",
        "ALLCAPS", "xX", "Xx", "xXx", "XxX", "a1B2c3D4", "...", "a.b.C.d",
        "HTTPserver", "parseURLFast", "A1a", "1A1", "aA", "Aa1Bb2",
        "trailing ", " leading", "mIxEdCaSe", "x" * 3000 + "Y" + "z" * 10,
    ]
    tbl = pa.array(cases, type=pa.string())
    flat, parents = _tokenize_ascii_bytes(tbl)
    got = [[] for _ in cases]
    for tok, p in zip(flat.to_pylist(), parents):
        got[p].append(tok)
    for i, c in enumerate(cases):
        assert got[i] == tokens_py(c), (c, got[i], tokens_py(c))

    # mixed batch: unicode rows (incl. Kelvin sign, which lowercases to
    # ASCII 'k') must take the regex path and agree with tokens_py
    mixed = cases + ["héllo wörld", "aKb", "日本語 code", "naïveCase"]
    flat2, par2 = tokenize_flat(pa.array(mixed, type=pa.string()))
    got2 = [[] for _ in mixed]
    for tok, p in zip(flat2.to_pylist(), par2):
        got2[p].append(tok)
    for i, c in enumerate(mixed):
        assert got2[i] == tokens_py(c), (c, got2[i], tokens_py(c))
    # parents ascending (shingle construction relies on it)
    assert (np.diff(par2) >= 0).all()


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60),
    max_size=30))
@settings(max_examples=300, deadline=None)
def test_byte_fast_path_parity_hypothesis(rows):
    from splade_ray.analyzer import tokenize_flat, tokens_py

    flat, parents = tokenize_flat(pa.array(rows, type=pa.string()))
    got = [[] for _ in rows]
    for tok, p in zip(flat.to_pylist(), parents):
        got[p].append(tok)
    for i, c in enumerate(rows):
        assert got[i] == tokens_py(c), (c, got[i], tokens_py(c))
