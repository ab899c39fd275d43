"""Weights-free learned-sparse-encoder (SURVEY §2 M4 stand-in) tests.

Covers the seeded hash projection itself, the vectorized batch encoder vs a
naive per-row Python re-implementation, actor-state memoization, retrieval
over the encoding, and the end-to-end path the reference runs with SPLADE
(retrievers.py:19-53 + ingest.py): encoder output -> inverted-index build ->
BM25 top-k, parity-checked against the pure-Python OracleIndex.
"""

import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.build import build_index
from splade_ray.oracle import OracleIndex
from splade_ray.ops.sparse import (
    N_PROJ,
    SPARSE_DIM,
    W_MOD,
    SparseEncoder,
    _bitlen,
    _term_projection,
    encode_texts_dense,
    sparse_encode,
    sparse_topk,
)
from splade_ray.query import QueryEngine


def test_term_projection_seeded_and_ranged():
    d1, w1 = _term_projection("merge")
    d2, w2 = _term_projection("merge")
    assert (d1, w1) == (d2, w2)
    assert len(d1) == N_PROJ
    assert all(0 <= d < SPARSE_DIM for d in d1)
    assert all(1 <= w <= W_MOD for w in w1)
    # different slots give (almost surely) different dims for a known term
    assert _term_projection("merge") != _term_projection("window")


def test_bitlen_matches_int_bit_length():
    vals = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 1 << 40, (1 << 41) - 1],
                    dtype=np.int64)
    want = np.array([v.bit_length() for v in vals.tolist()], dtype=np.int64)
    np.testing.assert_array_equal(_bitlen(vals), want)


def _naive_encode(text: str) -> dict[int, int]:
    """Per-row reference implementation (independent of numpy paths)."""
    from splade_ray.analyzer import tokens_py

    tf: dict[str, int] = {}
    for t in tokens_py(text):
        tf[t] = tf.get(t, 0) + 1
    vec: dict[int, int] = {}
    for term, n in tf.items():
        dims, ws = _term_projection(term)
        for d, w in zip(dims, ws):
            vec[d] = vec.get(d, 0) + n.bit_length() * w
    return vec


def test_encoder_matches_naive_python():
    texts = [
        "merge spark window merge merge",
        "def stream_join(x, y): return x + y",
        "",          # zero tokens -> no rows
        "!!! ...",   # zero tokens -> no rows
        "the " * 2000,  # deep tf saturation
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    enc = SparseEncoder()
    out = enc(t)
    got: dict[int, dict[int, int]] = {}
    for r in out.to_pylist():
        got.setdefault(r["doc_id"], {})[r["dim"]] = r["weight"]
    for i, text in enumerate(texts):
        assert got.get(i, {}) == _naive_encode(text), i


def test_encoder_memo_persists_across_batches():
    enc = SparseEncoder()
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(["alpha beta gamma"])})
    enc(t)
    n1 = len(enc._memo)
    assert n1 == 3
    out2 = enc(t)  # second batch: memo hit, identical output
    assert len(enc._memo) == n1
    assert out2.num_rows > 0


def test_batch_boundary_invariance(ray_session):
    """Encoding is per-row: block size must not change the triples."""
    texts = [f"token{i} merge window stream" * (1 + i % 3) for i in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                    "text": pa.array(texts)})
    a = sparse_encode(rd.from_arrow(tbl).repartition(1), concurrency=1)
    b = sparse_encode(rd.from_arrow(tbl).repartition(7), concurrency=2)
    pa_a = a.to_pandas().sort_values(["doc_id", "dim"], ignore_index=True)
    pa_b = b.to_pandas().sort_values(["doc_id", "dim"], ignore_index=True)
    assert pa_a.equals(pa_b)


def test_sparse_topk_dot_product(ray_session):
    """Retrieval over the encoding equals a dense numpy dot-product replay."""
    texts = [f"merge window w{i} x{i % 5} stream" for i in range(30)]
    tbl = pa.table({"doc_id": pa.array(range(30), type=pa.int64()),
                    "text": pa.array(texts)})
    queries = [(0, "merge window"), (1, "x3"), (2, "")]
    res = sparse_topk(rd.from_arrow(tbl), queries, k=5).to_pandas()
    D = encode_texts_dense(texts)            # (30, dim)
    Q = encode_texts_dense([q for _, q in queries])
    S = D @ Q.T
    for qi, (qid, _) in enumerate(queries):
        s = S[:, qi]
        nz = np.nonzero(s > 0)[0]
        order = nz[np.lexsort((nz, -s[nz]))[:5]]
        sub = res[res.query_id == qid].sort_values("rank")
        assert sub.doc_id.tolist() == order.tolist(), qid
        assert sub.score.tolist() == s[order].tolist(), qid
    assert (res[res.query_id == 2]).empty  # zero-token query matches nothing


def _dim_token(d: int) -> str:
    """Latent dim -> analyzer-stable surface token (pure lowercase alpha)."""
    return f"z{chr(97 + d // 26)}{chr(97 + d % 26)}"


def _latent_text(vec: dict[int, int]) -> str:
    return " ".join(
        " ".join([_dim_token(d)] * w) for d, w in sorted(vec.items())
    )


def test_encoder_feeds_index_build_end_to_end(ray_session, tmp_path):
    """The reference's SPLADE serving shape: encode -> store sparse vectors in
    an inverted index -> query.  Encoder triples become latent postings
    (dim token, tf=weight), flow through the UNMODIFIED build_index /
    QueryEngine path, and the result is parity-checked against OracleIndex
    over the same latent corpus — proving the encoder plugs into the build
    path end-to-end."""
    texts = [
        f"merge window stream w{i % 7} filter join x{i % 3}" for i in range(60)
    ]
    enc = SparseEncoder()
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    triples = enc(t).to_pylist()
    vecs: dict[int, dict[int, int]] = {}
    for r in triples:
        vecs.setdefault(r["doc_id"], {})[r["dim"]] = r["weight"]
    rows = [
        {"repo": "enc", "path": str(i), "commit": "c0", "lang": "py",
         "content": _latent_text(vecs[i])}
        for i in sorted(vecs)
    ]
    corpus = pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]})

    idx = str(tmp_path / "latent_idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(rd.from_arrow(corpus).repartition(3), idx,
                lang_tagged=False, n_shards=4)
    oracle = OracleIndex(rows, lang_tagged=False)
    engine = QueryEngine(idx, k=10, scorer="taat")

    for qtext in ["merge window", "x1 filter", "stream stream join"]:
        qvec = _naive_encode(qtext)
        latent_q = " ".join(_dim_token(d) for d in sorted(qvec))
        want = oracle.search(latent_q, None, k=10)
        ids, units = engine.search_one(latent_q, None)
        got = [(int(d), u / 1e9) for d, u in zip(ids, units)]
        assert [g[0] for g in got] == [w[0] for w in want], qtext
        np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want])
