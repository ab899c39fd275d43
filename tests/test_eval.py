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


def test_phrase_topk_docs_contain_phrase(ray_session):
    """Every (query, doc) hit must contain the exact phrase; the absent
    phrase returns no rows."""
    import os

    import duckdb

    from splade_ray.pipelines import PHRASE_QUERIES, phrase_topk

    sf = "/root/testdata/sf0.001"
    res = phrase_topk(sf).to_pandas()
    assert len(res) > 0
    phrases = dict(PHRASE_QUERIES)
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, source, text FROM read_parquet(?)",
        [os.path.join(sf, "documents.parquet")]).fetchall()
    texts = {int(r[0]): r[2] for r in rows}
    # doc_id63 -> raw id via the corpus adapter (repo=source, path=raw id)
    from splade_ray.corpus import DOCS_COMMIT
    from splade_ray.ids import doc_id63

    id63 = {doc_id63(r[1], str(int(r[0])), DOCS_COMMIT): int(r[0])
            for r in rows}
    assert 10 not in set(res.query_id)  # absent phrase -> no rows
    # NOTE: iterrows() would coerce the row to float64 and corrupt 63-bit ids
    for qid, doc in zip(res["query_id"].astype(int), res["doc_id"].astype(int)):
        assert phrases[int(qid)] in texts[id63[int(doc)]]


def test_phrase_token_mode_is_case_and_separator_insensitive(ray_session):
    """Token-mode phrase matching analyzes the query: "sparkWindow" (qid 6)
    must return exactly the rows of "spark window" (qid 0); substring mode
    must return nothing for it (no literal camelCase in the corpus)."""
    from splade_ray.pipelines import phrase_topk

    sf = "/root/testdata/sf0.001"
    tok = phrase_topk(sf, match="tokens").to_pandas()
    sub = phrase_topk(sf, match="substring").to_pandas()
    assert 6 not in set(sub.query_id)
    a = tok[tok.query_id == 0].sort_values("rank").reset_index(drop=True)
    b = tok[tok.query_id == 6].sort_values("rank").reset_index(drop=True)
    assert len(b) > 0
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.score.tolist() == b.score.tolist()


def test_phrase_near_topk_window_invariant(ray_session):
    """Every proximity hit must actually contain term b within slop
    positions after term a (checked against the analyzed token stream)."""
    import os

    import duckdb

    from splade_ray.analyzer import tokens_py
    from splade_ray.corpus import DOCS_COMMIT
    from splade_ray.ids import doc_id63
    from splade_ray.pipelines import NEAR_QUERIES, phrase_near_topk

    sf = "/root/testdata/sf0.001"
    res = phrase_near_topk(sf).to_pandas()
    assert len(res) > 0
    assert 10 not in set(res.query_id)
    near = {qid: (a, b, s) for qid, a, b, s in NEAR_QUERIES}
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, source, text FROM read_parquet(?)",
        [os.path.join(sf, "documents.parquet")]).fetchall()
    toks = {doc_id63(r[1], str(int(r[0])), DOCS_COMMIT): tokens_py(r[2])
            for r in rows}
    for qid, doc in zip(res["query_id"].astype(int), res["doc_id"].astype(int)):
        a, b, slop = near[int(qid)]
        ts = toks[int(doc)]
        assert any(
            ts[i] == a and b in ts[i + 1: i + 1 + slop]
            for i in range(len(ts))
        ), (qid, doc)


def test_unordered_near_is_superset_of_ordered(ray_session):
    """Every doc qualifying under ordered NEAR also qualifies unordered, so
    each ordered hit appears in the unordered CANDIDATE set (rank may
    differ only because more docs qualify)."""
    from splade_ray.pipelines import phrase_near_topk

    sf = "/root/testdata/sf0.001"
    o = phrase_near_topk(sf, top_k=1000).to_pandas()
    u = phrase_near_topk(sf, top_k=1000, ordered=False).to_pandas()
    for qid in set(o.query_id):
        o_docs = set(o[o.query_id == qid].doc_id)
        u_docs = set(u[u.query_id == qid].doc_id)
        assert o_docs <= u_docs, qid
        # scores agree on the shared docs (same BM25 terms)
        om = o[o.query_id == qid].set_index("doc_id").score
        um = u[u.query_id == qid].set_index("doc_id").score
        for d in o_docs:
            assert om[d] == um[d]
