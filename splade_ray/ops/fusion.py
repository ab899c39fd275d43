"""Rank fusion + relational scoring operators.

``rrf_fuse`` re-expresses the reference's hybrid-search RRF ranker
(``RRFRanker(k=60)`` over dense+sparse hit lists, reference
retrievers.py:135-141) as a relational pipeline: union the input result
tables with 1/(k+rank) contributions, sum per (query_id, doc_id), re-rank.
Pure aggregates — no per-group Python.

``weighted_fuse`` is the reference's OTHER hybrid ranker (pymilvus
``WeightedRanker``, reference retrievers.py:9 / main.py:17; the ES
"linear" retriever shape): per-query min-max normalization of each leg's
scores followed by a weighted sum.  Contributions are quantized to
integer units per leg BEFORE summation so the fused score is exact
integer arithmetic — summation order cannot perturb ranks, and the
result is bit-identical to the DuckDB oracle twin.

``idf_coord_topk`` is a second lexical ranking (BM25 with k1=0: each
matching term contributes qtf*idf regardless of tf/length — coordination
match) computed RELATIONALLY: qterms x postings join + groupby sum.  It
demonstrates query scoring as a dataflow (no index needed) and serves as
the second leg for the hybrid-fusion contract entry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RRF_K = 60


def _rrf_contrib_batch(t: pa.Table, *, k: int) -> pa.Table:
    ranks = t["rank"].to_numpy(zero_copy_only=False).astype(np.float64)
    contrib = 1.0 / (k + ranks)
    return pa.table(
        {
            "query_id": t["query_id"],
            "doc_id": t["doc_id"],
            "contrib": pa.array(contrib, type=pa.float64()),
        }
    )


def rrf_fuse(results_list, *, k: int = RRF_K, top_k: int = 10,
             scale: int = 1_000_000_000):
    """Fuse N (query_id, rank, doc_id, ...) result Datasets via RRF.

    score(q, d) = sum over lists of 1/(k + rank).  Scores are quantized to
    integer units (same determinism contract as BM25) and ties break by
    doc_id ascending.  Returns (query_id, rank, doc_id, rrf_score).
    """
    from ray.data.aggregate import Sum

    contribs = None
    for res in results_list:
        c = res.map_batches(_rrf_contrib_batch, batch_format="pyarrow",
                            fn_kwargs={"k": k})
        contribs = c if contribs is None else contribs.union(c)

    def _units(t: pa.Table) -> pa.Table:
        u = np.round(
            t["contrib"].to_numpy(zero_copy_only=False) * scale
        ).astype(np.int64)
        return pa.table(
            {"query_id": t["query_id"], "doc_id": t["doc_id"],
             "units": pa.array(u)}
        )

    summed = (
        contribs.map_batches(_units, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .aggregate(Sum("units", alias_name="units"))
    )

    def _rank(group: pa.Table) -> pa.Table:
        units = group["units"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -units))[:top_k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(ids[order]),
                "rrf_score": pa.array(units[order] / scale, type=pa.float64()),
            }
        )

    # few queries -> few groups: map_groups per query_id is fine here (the
    # group count equals the query count, not a data-dependent explosion)
    return summed.groupby("query_id").map_groups(_rank, batch_format="pyarrow")


def _leg_units_batch(t: pa.Table, *, leg: int, scale: int) -> pa.Table:
    """Tag one leg's (query_id, doc_id, score) rows with its leg index and
    recover the exact integer score units (score was emitted as units/scale,
    so round(score*scale) is exact)."""
    s = t["score"].to_numpy(zero_copy_only=False)
    u = np.round(s * scale).astype(np.int64)
    return pa.table(
        {
            "query_id": t["query_id"],
            "doc_id": t["doc_id"],
            "leg": pa.array(np.full(len(t), leg, dtype=np.int64)),
            "units": pa.array(u),
        }
    )


def weighted_fuse(results_list, weights, *, top_k: int = 10,
                  scale: int = 1_000_000_000):
    """Fuse N (query_id, rank, doc_id, score) result Datasets via per-query
    min-max normalization + weighted sum — the reference's WeightedRanker
    (pymilvus, retrievers.py:9 / main.py:17; ES linear retriever).

    Per (query, leg): norm = (units - min) / (max - min) over that leg's
    hits for the query (1.0 when the leg has a single distinct score —
    its only hit is its best hit).  Each leg contributes
    floor(w * norm * scale + 0.5) integer units; the fused score is the
    integer sum, so summation order cannot perturb FP and ranks are
    bit-identical to ``sql.weighted_hybrid_sql``.  Ties break doc_id asc.

    Scale: inputs are already bounded top-k results (k·|queries| rows);
    each map_groups group is ≤ legs·k rows regardless of corpus size, and
    the group count equals the query count.
    """
    if len(results_list) != len(weights):
        raise ValueError("one weight per result list required")
    w_arr = [float(w) for w in weights]

    tagged = None
    for i, res in enumerate(results_list):
        c = res.map_batches(_leg_units_batch, batch_format="pyarrow",
                            fn_kwargs={"leg": i, "scale": scale})
        tagged = c if tagged is None else tagged.union(c)

    def _fuse(group: pa.Table) -> pa.Table:
        leg = group["leg"].to_numpy(zero_copy_only=False)
        u = group["units"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        cu = np.zeros(len(u), dtype=np.int64)
        for i, w in enumerate(w_arr):
            m = leg == i
            if not m.any():
                continue
            umin = int(u[m].min())
            umax = int(u[m].max())
            if umax == umin:
                norm = np.ones(int(m.sum()), dtype=np.float64)
            else:
                # same op tree as the SQL twin: exact int subtraction,
                # one double division
                norm = (u[m] - umin).astype(np.float64) / np.float64(
                    umax - umin)
            cu[m] = np.floor((w * norm) * np.float64(scale) + 0.5).astype(
                np.int64)
        uids, inv = np.unique(ids, return_inverse=True)
        # bincount weights are float64 — exact for sums < 2^53 (≤ legs·scale)
        fused = np.bincount(inv, weights=cu).astype(np.int64)
        order = np.lexsort((uids, -fused))[:top_k]
        n = len(order)
        return pa.table(
            {
                "query_id": pa.array(
                    np.full(n, group["query_id"][0].as_py(), dtype=np.int64)),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "doc_id": pa.array(uids[order]),
                "weighted_score": pa.array(fused[order] / scale,
                                           type=pa.float64()),
            }
        )

    return tagged.groupby("query_id").map_groups(_fuse,
                                                 batch_format="pyarrow")


def rrf_units_sql(rank_col: str = "rank", k: int = RRF_K,
                  scale: int = 1_000_000_000) -> str:
    """SQL expression for the quantized RRF contribution of one result row."""
    return (
        f"CAST(round((1e0 / ({k} + {rank_col})) * {float(scale)!r}e0) AS BIGINT)"
    )
