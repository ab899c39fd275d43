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
