"""Recursive separator-aware chunker: invariants + SQL-oracle parity on
long multi-chunk documents (the driver's sf0.01 docs are mostly single-chunk,
so this covers the recursive walk the contract data doesn't reach)."""

import duckdb
import numpy as np
import pyarrow as pa

from splade_ray.pipelines import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    _recursive_chunks,
)
from splade_ray.sql import chunk_docs_recursive_sql


def _synthetic_docs(n=40, seed=5):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "kappa"]
    docs = []
    for i in range(n):
        parts = []
        for _ in range(int(rng.integers(1, 12))):
            para = " ".join(
                words[int(w)] for w in rng.integers(0, len(words),
                                                    int(rng.integers(5, 120)))
            )
            parts.append(para)
        sep = "\n\n" if rng.random() < 0.6 else "\n"
        text = sep.join(parts)
        if rng.random() < 0.1:
            text = text.replace(" ", "")  # no-separator stretch -> hard cuts
        docs.append(text)
    docs.append("")  # empty doc -> one empty chunk
    docs.append("x" * (CHUNK_SIZE * 3))  # pure hard-cut doc
    docs.append("word " * 1000)  # space-separated only
    return docs


def test_recursive_chunks_invariants():
    for text in _synthetic_docs():
        chunks = _recursive_chunks(text)
        assert len(chunks) >= 1
        assert all(len(c) <= CHUNK_SIZE for c in chunks)
        # reconstruction: consecutive chunks overlap by exactly CHUNK_OVERLAP
        # chars except the (possibly shorter) final remainder
        pos = 0
        for j, c in enumerate(chunks):
            assert text[pos : pos + len(c)] == c
            if j < len(chunks) - 1:
                pos += len(c) - CHUNK_OVERLAP
        assert pos + len(chunks[-1]) == len(text)


def _py_fixed(text):
    import math

    step = CHUNK_SIZE - CHUNK_OVERLAP
    n = max(1, math.ceil((len(text) - CHUNK_OVERLAP) / step))
    return [text[j * step : j * step + CHUNK_SIZE] for j in range(n)]


def _adversarial_docs():
    docs = _synthetic_docs()
    docs += [
        "a",
        " " * 2500,
        "\n" * 2500,
        "\n\n".join(["p"] * 800),
        "x" * CHUNK_SIZE,  # exactly one window
        "x" * (CHUNK_SIZE + 1),  # one char over
        "y" * (CHUNK_SIZE - CHUNK_OVERLAP),  # exactly one step
        ("z" * 99 + " ") * 30,  # separators right at the overlap boundary
        ("z" * 100 + "\n") * 30,
        "héllo wörld " * 300,  # non-ASCII -> Python fallback path
        "x" * 500 + "é" + "y" * 2000,  # non-ASCII mid-doc
        "日本語テキスト " * 400,
        "mix " * 100 + "ünï " * 100 + "mix " * 500,
    ]
    return docs


def test_vectorized_fixed_chunker_parity():
    from splade_ray.chunk import chunk_fixed_batch

    docs = _adversarial_docs()
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs, type=pa.string())})
    got = chunk_fixed_batch(t).to_pylist()
    got = sorted((r["doc_id"], r["chunk_id"], r["chunk"]) for r in got)
    want = sorted(
        (i, j, c)
        for i, text in enumerate(docs)
        for j, c in enumerate(_py_fixed(text))
    )
    assert got == want


def test_vectorized_recursive_chunker_parity():
    from splade_ray.chunk import chunk_recursive_batch

    docs = _adversarial_docs()
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs, type=pa.string())})
    got = chunk_recursive_batch(t).to_pylist()
    got = sorted((r["doc_id"], r["chunk_id"], r["chunk"]) for r in got)
    want = sorted(
        (i, j, c)
        for i, text in enumerate(docs)
        for j, c in enumerate(_recursive_chunks(text))
    )
    assert got == want


def test_vectorized_chunkers_hypothesis():
    """Random fuzz: mixed ASCII/unicode snippets with separator runs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from splade_ray.chunk import chunk_fixed_batch, chunk_recursive_batch

    piece = st.sampled_from(
        ["word", "  ", "\n", "\n\n", "\n\n\n", "x" * 950, "é", "語",
         "a b", ""]
    )
    doc = st.lists(piece, min_size=0, max_size=40).map("".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def run(docs):
        t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                      "text": pa.array(docs, type=pa.string())})
        gf = sorted((r["doc_id"], r["chunk_id"], r["chunk"])
                    for r in chunk_fixed_batch(t).to_pylist())
        wf = sorted((i, j, c) for i, x in enumerate(docs)
                    for j, c in enumerate(_py_fixed(x)))
        assert gf == wf
        gr = sorted((r["doc_id"], r["chunk_id"], r["chunk"])
                    for r in chunk_recursive_batch(t).to_pylist())
        wr = sorted((i, j, c) for i, x in enumerate(docs)
                    for j, c in enumerate(_recursive_chunks(x)))
        assert gr == wr

    run()


def test_recursive_chunks_match_sql_oracle():
    docs = _synthetic_docs()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    got = con.execute(
        chunk_docs_recursive_sql() + " ORDER BY doc_id, chunk_id"
    ).fetchall()
    want = [
        (i, j, c)
        for i, text in enumerate(docs)
        for j, c in enumerate(_recursive_chunks(text))
    ]
    assert got == want


def test_chunkers_handle_large_string_columns():
    """large_utf8 columns carry int64 offsets — reading them as int32 would
    silently corrupt every chunk; both chunkers must match the utf8 output."""
    import pyarrow as pa

    from splade_ray.chunk import chunk_fixed_batch, chunk_recursive_batch

    texts = ["alpha beta " * 300, "x" * 2500 + "\n\n" + "y" * 800, "short"]
    ids = pa.array([1, 2, 3], type=pa.int64())
    small = pa.table({"doc_id": ids, "text": pa.array(texts, type=pa.string())})
    big = pa.table({"doc_id": ids,
                    "text": pa.array(texts, type=pa.large_string())})
    for fn in (chunk_fixed_batch, chunk_recursive_batch):
        a = fn(small).to_pylist()
        b = fn(big).to_pylist()
        assert a == b, fn.__name__
