"""Training-set assembly operators: stratified sampling and token-budget
sequence packing.

Reference scope note: MadisonEvans94/splade ingests a corpus wholesale
(ingest.py:21-35, every chunk embedded and inserted); it has no sampling or
batching policy at all.  These are the operators a 100-TB pretraining-data
pipeline needs between "cleaned corpus" and "training shards":

  * ``stratified_sample`` — n docs PER GROUP (here: lang), chosen by a
    deterministic content-hash order so the subset is stable across runs
    and dedup-consistent.  Shape: per-batch partial top-n per group (each
    batch emits at most n rows per group it touches), then ONE tiny
    ``groupby(lang).map_groups`` merge — a distributed top-n-per-group
    with no global sort and no batch ever shipping more than n·|langs|
    rows.  At 10^12 docs the shuffle moves O(n_blocks · n · |groups|)
    rows, not the corpus.

  * ``pack_sequences`` — assign every doc a ``pack_id`` so that packs are
    contiguous runs in doc_id order holding ~``budget`` analyzer tokens:
    pack_id = floor(exclusive_prefix_sum(n_tokens) / budget) — the
    deterministic GPT-style sequence-packing key (a doc straddling a
    boundary starts the next pack; packs are reproducible from the table
    alone).  Distributed prefix sum in two passes: (1) per-bucket token
    sums (bucket = doc_id // bucket_range) through a small groupby — the
    driver prefix-sums ONE ROW PER BUCKET; (2) ``groupby(bucket)
    .map_groups`` sorts each bucket's rows by doc_id and adds the
    broadcast bucket offset to a local cumsum.  Nothing doc-scale touches
    the driver; at 10^12 docs raise ``bucket_range`` so the per-bucket
    summary stays small (documented knob, correctness-independent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import pyarrow.compute as pc

from .textstats import MASK63, _flat_tokens, _h63

STRAT_N = 40
PACK_BUDGET = 2048
BUCKET_RANGE = 4096

PACK_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("n_tokens", pa.int64()),
                         ("pack_id", pa.int64())])


# ------------------------------------------------------ stratified sample --

def stratified_partial_batch(t: pa.Table, *, n: int = STRAT_N,
                             text_col: str = "text",
                             group_col: str = "lang",
                             id_col: str = "doc_id",
                             hash_mode: str = "sha") -> pa.Table:
    """Per-batch partial: the n smallest (h(text), doc_id) rows per group
    present in this batch — a correct partial because the global top-n per
    group is contained in the union of per-batch top-ns.

    ``hash_mode="sha"``: per-row sha-derived h63 (DuckDB-reproducible; the
    oracle contract runs this).  ``"mixer"``: ONE vectorized 64-bit hash
    over the whole column (polars xxhash-family, zero-copy from Arrow,
    masked to 63 bits so ordering semantics match) — the production path,
    same sample-size/determinism guarantees, non-SQL hash values
    (bench.py measures the speedup; tests assert count/shape parity)."""
    texts_col = t[text_col]
    if isinstance(texts_col, pa.ChunkedArray):
        texts_col = texts_col.combine_chunks()
    texts_col = pc.fill_null(texts_col, "")
    if hash_mode == "mixer":
        try:
            import polars as pl

            h = (pl.from_arrow(texts_col).hash(seed=1315423911)
                 .to_numpy() & np.uint64(MASK63)).astype(np.int64)
        except ImportError:  # pragma: no cover — polars is in the container
            h = np.fromiter((_h63(x) for x in texts_col.to_pylist()),
                            dtype=np.int64, count=len(texts_col))
    else:
        h = np.fromiter((_h63(x) for x in texts_col.to_pylist()),
                        dtype=np.int64, count=len(texts_col))
    ids = t[id_col].to_numpy(zero_copy_only=False)
    # null group -> "" (one shared bucket; np.unique cannot sort
    # None-vs-str object arrays, and a null lang is still one stratum)
    groups = np.asarray([x if x is not None else ""
                         for x in t[group_col].to_pylist()], dtype=object)
    keep_idx = []
    order = np.lexsort((ids, h))
    g_sorted = groups[order]
    for g in np.unique(groups):
        rows = order[g_sorted == g][:n]
        keep_idx.append(rows)
    sel = np.sort(np.concatenate(keep_idx)) if keep_idx else \
        np.empty(0, dtype=np.int64)
    return pa.table({
        "lang": pa.array(groups[sel].tolist(), type=pa.string()),
        "doc_id": pa.array(ids[sel], type=pa.int64()),
        "h": pa.array(h[sel], type=pa.int64()),
    })


def stratified_sample(ds, n: int = STRAT_N, hash_mode: str = "sha"):
    """n docs per lang by deterministic (content-hash, doc_id) order.
    Returns (doc_id, lang) — sql: contract.stratified_sample_sql (null
    lang folds to the '' stratum on BOTH sides via COALESCE)."""
    partials = ds.map_batches(
        stratified_partial_batch, batch_format="pyarrow",
        fn_kwargs={"n": n, "hash_mode": hash_mode})

    def _merge(g: pa.Table, n: int = n) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:n]
        return pa.table({
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "lang": g["lang"].take(pa.array(order)),
        })

    return partials.groupby("lang").map_groups(_merge, batch_format="pyarrow")


# -------------------------------------------------------- sequence packing --

def _token_counts_batch(t: pa.Table, *, text_col: str = "text",
                        id_col: str = "doc_id",
                        bucket_range: int = BUCKET_RANGE) -> pa.Table:
    flat, parents, n_rows = _flat_tokens(t, text_col)
    n_tokens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "n_tokens": pa.array(n_tokens, type=pa.int64()),
        "bucket": pa.array(ids // bucket_range, type=pa.int64()),
    })


def pack_sequences(ds, budget: int = PACK_BUDGET,
                   bucket_range: int = BUCKET_RANGE):
    """(doc_id, n_tokens, pack_id) with pack_id = floor(exclusive prefix
    sum of n_tokens in doc_id order / budget) — sql:
    contract.pack_sequences_sql."""
    import ray

    from ray.data.aggregate import Sum

    counted = ds.map_batches(
        _token_counts_batch, batch_format="pyarrow",
        fn_kwargs={"bucket_range": bucket_range}).materialize()
    # ^ materialize: both passes consume `counted`, and without pinning it
    # Ray Data re-executes the lineage — re-tokenizing the whole corpus
    # (the dominant cost) a second time.  The pinned columns are 24
    # bytes/doc in the object store (spillable), a fair trade at any scale.
    # pass 1: one summary row per bucket; the driver prefix-sums buckets
    # (bounded: n_docs / bucket_range rows — raise bucket_range at scale)
    sums = (counted.groupby("bucket")
            .aggregate(Sum("n_tokens", alias_name="bucket_tokens"))
            .take_all())
    sums.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in sums:
        offsets[r["bucket"]] = acc
        acc += r["bucket_tokens"]
    off_ref = ray.put(offsets)

    # pass 2: each bucket is one group — local exclusive cumsum in doc_id
    # order plus the broadcast bucket offset
    def _assign(g: pa.Table, budget: int = budget) -> pa.Table:
        if g.num_rows == 0:
            # keep the declared schema on empty groups: a schema-less empty
            # table makes Ray Data log a RefBundle schema mismatch and can
            # break downstream union/write_parquet at scale
            return PACK_SCHEMA.empty_table()
        offs = ray.get(off_ref)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        toks = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        excl = np.zeros(len(ids), dtype=np.int64)
        excl[order[1:]] = np.cumsum(toks[order])[:-1]
        excl += offs[int(g["bucket"][0].as_py())]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(toks, type=pa.int64()),
            "pack_id": pa.array(excl // budget, type=pa.int64()),
        })

    return counted.groupby("bucket").map_groups(
        _assign, batch_format="pyarrow")


# ------------------------------------------------------------- sql oracles --

def stratified_sample_sql(n: int = STRAT_N) -> str:
    from .contract import H63

    h = H63.format(expr="coalesce(text, '')")
    # COALESCE(lang, '') mirrors the engine partial's null->'' stratum fold
    # (the oracle would otherwise keep NULL as its own partition and emit
    # NULL rows — a row/value mismatch on any corpus with null langs)
    return f"""
WITH hd AS (SELECT doc_id, coalesce(lang, '') AS lang, {h} AS h
            FROM documents),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY h ASC, doc_id ASC) AS rn
  FROM hd
)
SELECT doc_id, lang FROM r WHERE rn <= {n}"""


def pack_sequences_sql(budget: int = PACK_BUDGET) -> str:
    from ..analyzer import tokens_sql

    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS excl
  FROM d
)
SELECT doc_id, n_tokens, CAST(excl // {budget} AS BIGINT) AS pack_id
FROM c"""
