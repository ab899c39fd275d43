"""eval.scorer_agreement / summarize unit tests (pure-table, no Ray)."""

import pyarrow as pa

from splade_ray.eval import scorer_agreement, summarize


def _tbl(rows):
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def test_agreement_counts_and_top1():
    gt = _tbl([(0, 1, 100), (0, 2, 101), (0, 3, 102),
               (1, 1, 200), (1, 2, 201)])
    perfect = gt
    partial = _tbl([(0, 1, 101), (0, 2, 999), (0, 3, 100),   # 2/3, top1 at rank 3
                    (1, 1, 888), (1, 2, 777)])               # 0/2, top1 absent
    out = scorer_agreement(gt, {"a": perfect, "b": partial})
    rows = {(r["scorer"], r["query_id"]): (r["n_overlap"], r["top1_rank"])
            for r in out.to_pylist()}
    assert rows[("a", 0)] == (3, 1)
    assert rows[("a", 1)] == (2, 1)
    assert rows[("b", 0)] == (2, 3)
    assert rows[("b", 1)] == (0, 0)
    # queries absent from gt never appear
    assert {q for _, q in rows} == {0, 1}


def test_agreement_skips_empty_gt_queries():
    gt = _tbl([(5, 1, 42)])
    s = _tbl([(5, 1, 42), (6, 1, 99)])  # scorer found docs for q6, gt didn't
    out = scorer_agreement(gt, {"s": s})
    assert out.num_rows == 1
    assert out.to_pylist()[0] == {
        "scorer": "s", "query_id": 5, "n_overlap": 1, "top1_rank": 1}


def test_summarize_recall_and_mrr():
    agreement = pa.table(
        {
            "scorer": pa.array(["x", "x"], type=pa.string()),
            "query_id": pa.array([0, 1], type=pa.int64()),
            "n_overlap": pa.array([10, 5], type=pa.int64()),
            "top1_rank": pa.array([1, 0], type=pa.int64()),
        }
    )
    s = summarize(agreement, k=10).to_pylist()[0]
    assert s["scorer"] == "x"
    assert abs(s["recall_at_k"] - 0.75) < 1e-12   # (1.0 + 0.5) / 2
    assert abs(s["mrr"] - 0.5) < 1e-12            # (1 + 0) / 2
    assert s["n_queries"] == 2
