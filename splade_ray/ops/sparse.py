"""Weights-free learned-sparse-encoder stand-in (SURVEY §2 M4, the SPLADE shape).

The reference's namesake stage is ``SpladeEmbeddingFunction`` (reference
retrievers.py:19-53, ingest.py:27-28): a BERT-MLM model loaded ONCE per
process that maps each text to a sparse vector over a ~30k-dim vocabulary via
batched CPU inference.  Model downloads don't exist in this sandbox, so this
module provides a SEEDED HASH-PROJECTION encoder with the same operational
shape, end-to-end testable against a DuckDB oracle:

* ``SparseEncoder`` is an actor-pool ``map_batches`` class whose projection
  state lives in ``__init__`` (once per actor, exactly where model weights
  would) — a term -> (dims, weights) memo that persists and grows across
  batches, so repeated vocabulary costs one sha256 per actor lifetime, not
  one per batch (ST2 model-in-__init__ pattern).
* Each term activates ``N_PROJ`` latent dimensions of a ``SPARSE_DIM``-dim
  space, chosen by sha256 (SQL-replayable, seeded by the projection slot):

      hex = sha256("{j}:{term}")          for j in 0..N_PROJ-1
      dim = int(hex[:8],  16) % SPARSE_DIM
      w   = 1 + int(hex[8:12], 16) % 7    # integer weight 1..7

* The tf nonlinearity is ``bit_length(tf)`` = 1 + floor(log2 tf) — the
  integer analogue of SPLADE's log(1+tf) saturation, rendered in SQL as
  ``length(bin(tf))`` so both sides stay integer-exact.

      V[doc, dim] = sum over (term, j) landing on dim of bit_length(tf) * w

Zero-token docs encode to the empty vector (no output rows), mirroring the
GROUP BY on the SQL side.  Retrieval over the encoding (``sparse_topk``) is
an integer dot product: queries are encoded with the SAME function (qtf
saturated identically), broadcast as a dense (n_q, SPARSE_DIM) matrix via
``ray.put``, and each batch emits per-query partial top-k candidates — no
shuffle; the driver merge sees k+1 rows per (query, batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

SPARSE_DIM = 256   # latent vocabulary size of the stand-in "model"
N_PROJ = 2         # projections (activated dims) per surface term
W_MOD = 7          # integer weights in 1..W_MOD
TOPK = 10


def _term_projection(term: str, n_proj: int = N_PROJ,
                     dim: int = SPARSE_DIM) -> tuple[list[int], list[int]]:
    """(dims, weights) a single term activates — the seeded 'model' row."""
    dims, ws = [], []
    for j in range(n_proj):
        hx = hashlib.sha256(f"{j}:{term}".encode()).hexdigest()
        dims.append(int(hx[:8], 16) % dim)
        ws.append(1 + int(hx[8:12], 16) % W_MOD)
    return dims, ws


def _bitlen(tf: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for positive int counts: frexp exponent.
    Exact for tf < 2**53 (frexp on exactly-representable doubles)."""
    return np.frexp(tf.astype(np.float64))[1].astype(np.int64)


class SparseEncoder:
    """Actor-pool batch encoder: text column -> (id, dim, weight) triples.

    Projection memo in ``__init__`` / grown across ``__call__`` — the
    model-resident-per-actor pattern (reference retrievers.py:19-22 loads
    BERT once per process; SURVEY §2 ST2).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 dim: int = SPARSE_DIM, n_proj: int = N_PROJ):
        self.id_col, self.text_col = id_col, text_col
        self.dim, self.n_proj = dim, n_proj
        # term -> (dims int64[n_proj], weights int64[n_proj]); actor-lifetime
        self._memo: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def _project_vocab(self, vocab: list[str]) -> tuple[np.ndarray, np.ndarray]:
        n = len(vocab)
        dims = np.empty((n, self.n_proj), dtype=np.int64)
        ws = np.empty((n, self.n_proj), dtype=np.int64)
        memo = self._memo
        for i, term in enumerate(vocab):
            hit = memo.get(term)
            if hit is None:
                d, w = _term_projection(term, self.n_proj, self.dim)
                hit = (np.asarray(d, dtype=np.int64),
                       np.asarray(w, dtype=np.int64))
                memo[term] = hit
            dims[i], ws[i] = hit
        return dims, ws

    def encode_dense(self, t: pa.Table) -> tuple[pa.Array, np.ndarray]:
        """(ids int64 Array, dense (n_rows, dim) int64 matrix) for a batch."""
        from ..analyzer import tokenize_flat

        texts = t[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = pc.cast(t[self.id_col], pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n_rows = len(texts)
        acc = np.zeros((n_rows, self.dim), dtype=np.int64)
        flat, parents = tokenize_flat(texts)
        if len(flat) == 0:
            return ids, acc
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_vocab = len(enc.dictionary)
        # (row, term) -> tf via one np.unique over a fused key
        key = parents * n_vocab + codes
        ukey, tf = np.unique(key, return_counts=True)
        rows = ukey // n_vocab
        ucodes = ukey % n_vocab
        sat = _bitlen(tf)
        dims, ws = self._project_vocab(enc.dictionary.to_pylist())
        for j in range(self.n_proj):
            np.add.at(acc, (rows, dims[ucodes, j]), sat * ws[ucodes, j])
        return ids, acc

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, acc = self.encode_dense(t)
        r, d = np.nonzero(acc)
        return pa.table(
            {
                self.id_col: ids.take(pa.array(r)),
                "dim": pa.array(d.astype(np.int64)),
                "weight": pa.array(acc[r, d]),
            }
        )


def sparse_encode(ds, id_col: str = "doc_id", text_col: str = "text",
                  concurrency: int = 2):
    # pool of 2 leaves CPUs for the upstream read even on a 4-CPU test
    # cluster (a fixed pool == cluster size deadlocks the streaming
    # executor's read stage); size up via the kwarg on real clusters.
    """documents -> (doc_id, dim, weight) sparse triples (actor pool)."""
    return ds.map_batches(
        SparseEncoder,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )


def encode_texts_dense(texts: list[str]) -> np.ndarray:
    """Driver-side tiny-batch encode (queries): dense (n, SPARSE_DIM) int64."""
    enc = SparseEncoder(id_col="doc_id", text_col="text")
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )
    _, acc = enc.encode_dense(t)
    return acc


class _SparseDotTopK:
    """Per-batch partial top-k of the integer dot product against a
    broadcast query matrix (ray.put once, zero-copy per actor)."""

    def __init__(self, queries_ref, k: int,
                 id_col: str = "doc_id", text_col: str = "text"):
        q = ray.get(queries_ref)
        self.qids: np.ndarray = q["ids"]
        self.qmat: np.ndarray = q["mat"]          # (n_q, dim) int64
        self.k = k
        self.enc = SparseEncoder(id_col=id_col, text_col=text_col)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_arr, acc = self.enc.encode_dense(t)
        ids = ids_arr.to_numpy(zero_copy_only=False)
        # integer matmul; magnitudes bounded far below 2**53
        scores = acc @ self.qmat.T                # (n_rows, n_q)
        out_q, out_d, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            s = scores[:, qi]
            nz = np.nonzero(s > 0)[0]
            if len(nz) == 0:
                continue
            order = nz[np.lexsort((ids[nz], -s[nz]))[: self.k]]
            out_q.extend([int(qid)] * len(order))
            out_d.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "score": pa.array(out_s, type=pa.int64()),
            }
        )


def sparse_topk(ds, queries: list[tuple[int, str]], k: int = TOPK,
                id_col: str = "doc_id", text_col: str = "text",
                concurrency: int = 2) -> pa.Table:
    """Retrieval over the hash-projection encoding: integer dot-product
    top-k per query.  Broadcast queries, per-batch partial top-k, driver
    merge of k rows per (query, batch) — the brute_force_topk shape
    (ops/similarity.py), no shuffle.  Ties by doc_id; zero scores excluded
    (a query sharing no active dimension with a doc does not match it)."""
    qids = np.asarray([q for q, _ in queries], dtype=np.int64)
    qmat = encode_texts_dense([s for _, s in queries])
    ref = ray.put({"ids": qids, "mat": qmat})
    partial = ds.map_batches(
        _SparseDotTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )
    def _merge_group(g: pa.Table) -> pa.Table:
        # one tiny task per query: re-cut the k-per-batch partials under the
        # same (score desc, doc_id asc) order — distributed, never a full
        # driver concat of every partial block (VERDICT r3 #4)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s))[:k]
        return pa.table(
            {
                "query_id": g["query_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1,
                                           dtype=np.int64)),
                "doc_id": pa.array(d[order], type=pa.int64()),
                "score": pa.array(s[order], type=pa.int64()),
            }
        )

    merged = partial.groupby("query_id").map_groups(
        _merge_group, batch_format="pyarrow")
    schema = pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("doc_id", pa.int64()), ("score", pa.int64())]
    )
    return pa.Table.from_pylist(merged.take_all(), schema=schema)
