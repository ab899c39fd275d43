"""Rank fusion + relational scoring operators.

``rrf_fuse`` re-expresses the reference's hybrid-search RRF ranker
(``RRFRanker(k=60)`` over dense+sparse hit lists, reference
retrievers.py:135-141) as a relational pipeline: union the input result
tables with 1/(k+rank) contributions, sum per (query_id, doc_id), re-rank.
Pure aggregates — no per-group Python.

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


def rrf_units_sql(rank_col: str = "rank", k: int = RRF_K,
                  scale: int = 1_000_000_000) -> str:
    """SQL expression for the quantized RRF contribution of one result row."""
    return (
        f"CAST(round((1e0 / ({k} + {rank_col})) * {float(scale)!r}e0) AS BIGINT)"
    )
