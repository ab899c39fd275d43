"""Retrieval-quality evaluation harness.

Reference analogue: eval.py:238-247 scores a retriever over a query set
with ragas metrics (LLM-judged, out of scope per SURVEY.md §2 ST5); the
self-contained equivalent here measures scorer AGREEMENT against the BM25
ground truth in per-query integers:

  * n_overlap  — |scorer top-k ∩ ground-truth top-k|  (recall@k = /k)
  * top1_rank  — rank of the ground truth's #1 doc in the scorer's list,
                 0 if absent                           (MRR term = 1/rank)

Integers (not averaged floats) keep the SQL oracle hash-exact regardless
of summation order; aggregate recall/MRR derive trivially downstream.
Queries with an empty ground truth (no matching terms) are excluded —
there is nothing to agree with.

All inputs are top-k result tables (k * |queries| rows, bounded), so the
computation is driver-side numpy on purpose — at any corpus scale the
inputs stay tiny because they are already top-k cuts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EVAL_SCHEMA = pa.schema(
    [
        ("scorer", pa.string()),
        ("query_id", pa.int64()),
        ("n_overlap", pa.int64()),
        ("top1_rank", pa.int64()),
    ]
)


_RESULT_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("rank", pa.int64()), ("doc_id", pa.int64())]
)


def _as_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    rows = res.take_all()
    if not rows:
        # an empty Dataset has no schema to infer: pin the result columns so
        # downstream t["query_id"] lookups see empty columns, not a KeyError
        return _RESULT_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=None)


def scorer_agreement(ground_truth, scorers: "dict[str, object]") -> pa.Table:
    """Per-(scorer, query) agreement table; inputs are result tables /
    Datasets with (query_id, rank, doc_id) columns, ground truth included."""
    gt = _as_table(ground_truth)
    gt_docs: dict[int, set] = {}
    gt_top1: dict[int, int] = {}
    for qid, rank, doc in zip(gt["query_id"].to_pylist(),
                              gt["rank"].to_pylist(),
                              gt["doc_id"].to_pylist()):
        gt_docs.setdefault(qid, set()).add(doc)
        if rank == 1:
            gt_top1[qid] = doc
    out = {"scorer": [], "query_id": [], "n_overlap": [], "top1_rank": []}
    for name in sorted(scorers):
        t = _as_table(scorers[name])
        per_q: dict[int, dict[int, int]] = {}  # qid -> {doc: rank}
        for qid, rank, doc in zip(t["query_id"].to_pylist(),
                                  t["rank"].to_pylist(),
                                  t["doc_id"].to_pylist()):
            per_q.setdefault(qid, {})[doc] = rank
        for qid in sorted(gt_docs):
            ranks = per_q.get(qid, {})
            out["scorer"].append(name)
            out["query_id"].append(qid)
            out["n_overlap"].append(len(gt_docs[qid] & ranks.keys()))
            out["top1_rank"].append(ranks.get(gt_top1[qid], 0))
    return pa.table(
        {
            "scorer": pa.array(out["scorer"], type=pa.string()),
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "n_overlap": pa.array(out["n_overlap"], type=pa.int64()),
            "top1_rank": pa.array(out["top1_rank"], type=pa.int64()),
        }
    )


def summarize(agreement: pa.Table, k: int) -> pa.Table:
    """Aggregate recall@k and MRR per scorer (reporting helper — floats, so
    NOT part of the hash-exact driver contract)."""
    names = agreement["scorer"].to_pylist()
    ov = np.asarray(agreement["n_overlap"].to_pylist(), dtype=np.float64)
    t1 = np.asarray(agreement["top1_rank"].to_pylist(), dtype=np.float64)
    rows = {"scorer": [], "recall_at_k": [], "mrr": [], "n_queries": []}
    for name in sorted(set(names)):
        m = np.asarray([n == name for n in names])
        rows["scorer"].append(name)
        rows["recall_at_k"].append(float((ov[m] / k).mean()))
        with np.errstate(divide="ignore"):
            rr = np.where(t1[m] > 0, 1.0 / np.maximum(t1[m], 1), 0.0)
        rows["mrr"].append(float(rr.mean()))
        rows["n_queries"].append(int(m.sum()))
    return pa.table(rows)
