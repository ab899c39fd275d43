"""Query engine: stateful actor-pool BM25 top-k over the segment index.

Replaces the reference's query side — Milvus sparse inner-product search
behind ``collection.search`` / ``hybrid_search`` (retrievers.py:120-141) plus
the per-process BM25 refit (main.py:46-64, eval.py:92-109) — with a
``QueryEngine`` callable class used as a Ray Data actor pool:

    results = queries_ds.map_batches(QueryEngine, fn_constructor_kwargs=
        {"index_dir": ...}, batch_format="pyarrow", concurrency=N, batch_size=B)

State (dictionary, mmapped postings, corpus stats) loads ONCE per actor in
``__init__`` (the ST1/ST3 state of SURVEY.md §2.3); per-batch work is pure
scoring.  Corpus stats come from the build manifest — never refit at query
time (the reference's per-process refit is a documented wart, SURVEY §2.1 S7).

Three scorers, parity-tested against each other and the oracle:

  * ``taat``  — vectorized term-at-a-time (numpy gather + segment-sort +
                unique/add.at).  Fastest in-Python path; bench default.
  * ``daat``  — naive document-at-a-time heap merge (reference semantics
                check; test-only).
  * ``bmw``   — block-max WAND: document-at-a-time pivoting over per-block
                max-score bounds (codecs.PostingMeta.block_max_tfsat), the
                scale path for huge posting lists.

Scores are integer-quantized (build.SCORE_SCALE units) before summation so
rank and score are exactly reproducible across scorers, partitionings and
the DuckDB oracle; ties break by doc_id ascending (deterministic, matching
the rank-identity requirement of the north rule).
"""

from __future__ import annotations

import heapq
import json
import math
import os

import numpy as np
import pyarrow as pa

from .analyzer import analyze_query
from .build import SCORE_SCALE
from .codecs import decode_postings_many, tf_saturation
from .segments import SegmentReader

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)


def idf(n_docs: int, df: int) -> float:
    """BM25 idf, Robertson/Lucene form (always > 0)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class QueryEngine:
    """Callable-class stage: one instance per pool actor, init once per actor."""

    def __init__(self, index_dir: str, k: int = 10, scorer: str = "taat",
                 cache_postings_budget: int = 32_000_000):
        """``cache_postings_budget``: max cached decoded postings per actor
        (~16 bytes each).  Admission-without-eviction: once full, new terms
        are simply not cached — plain LRU degenerates on the cyclic access
        pattern of a repeated query workload (evicts exactly what the next
        round needs).  This is the reference's ``collection.load()`` index
        residency (ST3) scoped to an actor's memory budget; 0 disables."""
        with open(os.path.join(index_dir, "MANIFEST.json")) as f:
            self.manifest = json.load(f)
        self._cache: dict[str, tuple] = {}
        self._cache_budget = cache_postings_budget
        self._cache_size = 0
        self._ucache: dict[str, tuple] = {}  # per-term qtf=1 unit vectors
        self._ucache_size = 0
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]
        self.langs = self.manifest["langs"]
        self.lang_tagged = self.manifest["lang_tagged"]
        self.k = k
        self.scorer = scorer
        # ordinal -> real doc id translation (build.py docmap); memmapped so
        # actor startup stays O(1) in corpus size.  A manifest without
        # doc_ordinals is a pre-v3 index: postings would misdecode (dl gone
        # from the posting stream) — refuse it loudly rather than crash later.
        if not self.manifest.get("doc_ordinals"):
            raise ValueError(
                f"index at {index_dir} predates the ordinal-postings format "
                f"(manifest lacks doc_ordinals); rebuild required"
            )
        self.docmap = np.memmap(
            os.path.join(index_dir, "docmap.bin"), dtype=np.int64, mode="r"
        )
        # forward doc-length array (ordinal-indexed; postings omit dl)
        self.doclens = np.memmap(
            os.path.join(index_dir, "doclens.bin"), dtype=np.int32, mode="r"
        )
        seg_root = os.path.join(index_dir, "segments")
        self.segments = [
            SegmentReader(os.path.join(seg_root, s["segment_id"]))
            for s in self.manifest["segments"]
        ]
        # merged dictionary: term -> [(segment_idx, row_idx)], df summed.
        # At 10^12-doc scale this in-RAM dict becomes a sorted mmapped term
        # file per segment + binary search; the per-actor pattern is the same.
        self.refs: dict[str, list[tuple[int, int]]] = {}
        self.df: dict[str, int] = {}
        for si, seg in enumerate(self.segments):
            dfs = seg.dict["df"].to_pylist()
            salts = seg.dict["salt"].to_pylist()
            for term, rows in seg.lookup.items():
                self.refs.setdefault(term, []).extend(
                    (salts[ri], si, ri) for ri in rows
                )
                self.df[term] = self.df.get(term, 0) + sum(dfs[ri] for ri in rows)
        for term in self.refs:
            # salt order: within one build generation, a hot term's salted
            # sub-lists cover disjoint ascending ordinal ranges, so salt-order
            # concatenation is already doc-sorted (merged indexes may overlap
            # and fall back to a sort in _gather)
            self.refs[term].sort()
        # dense TAAT path available when postings are ordinals and one
        # bincount over N is affordable
        self._dense_ok = self.docmap is not None and self.n_docs <= 50_000_000

    # ------------------------------------------------------------- gather --
    def _gather(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full postings for a term merged across segments/salts, doc-sorted.

        All the term's pieces are decoded in one batched varbyte pass
        (codecs.decode_postings_many) — the per-piece call overhead dominates
        otherwise once hot-term salting and lang expansion multiply pieces."""
        cached = self._cache.get(term)
        if cached is not None:
            return cached
        regions = []
        for _salt, si, ri in self.refs[term]:
            seg = self.segments[si]
            meta = seg.meta_at(ri)
            off = int(seg._offsets[ri])
            regions.append((seg.blob[off : off + meta.nbytes], meta))
        ids, tfs = decode_postings_many(regions)
        if len(regions) > 1 and not bool((ids[1:] >= ids[:-1]).all()):
            order = np.argsort(ids, kind="stable")
            ids, tfs = ids[order], tfs[order]
        dls = np.asarray(self.doclens)[ids]  # O(1) forward-array gather
        if (self._cache_budget > 0
                and self._cache_size + len(ids) <= self._cache_budget):
            self._cache[term] = (ids, tfs, dls)
            self._cache_size += len(ids)
        return ids, tfs, dls

    def _query_terms(self, query: str, lang: str | None) -> dict[str, int]:
        return analyze_query(
            query,
            lang if (self.lang_tagged and lang) else None,
            self.langs if self.lang_tagged else None,
        )

    def _contrib_units(self, qtf: int, w_idf: float, tfs, dls) -> np.ndarray:
        sat = tf_saturation(np.asarray(tfs), np.asarray(dls), self.avgdl)
        return np.round(qtf * w_idf * sat * SCORE_SCALE).astype(np.int64)

    def _term_units(self, term: str, qtf: int) -> tuple[np.ndarray, np.ndarray]:
        """(ids, quantized contribution units) for one query term.

        qtf == 1 units are cached per term (the common case — duplicate
        query tokens are rare); qtf > 1 recomputes the full expression so
        the quantization spec round((qtf*idf)*sat*1e9) holds exactly."""
        w = idf(self.n_docs, self.df[term])
        if qtf == 1:
            hit = self._ucache.get(term)
            if hit is not None:
                return hit
        ids, tfs, dls = self._gather(term)
        units = self._contrib_units(qtf, w, tfs, dls)
        if qtf == 1 and self._cache_budget > 0 and (
            self._ucache_size + len(ids) <= self._cache_budget
        ):
            self._ucache[term] = (ids, units)
            self._ucache_size += len(ids)
        return ids, units

    # ------------------------------------------------------------- scorers --
    def _score_taat(self, qterms: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
        all_ids, all_units = [], []
        for term, qtf in qterms.items():
            if term not in self.refs:
                continue
            ids, units = self._term_units(term, qtf)
            all_ids.append(ids)
            all_units.append(units)
        if not all_ids:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ids = np.concatenate(all_ids)
        units = np.concatenate(all_units)
        # integer sums via weighted bincount: float64 accumulation is exact
        # for our magnitudes (per-doc unit sums < 2^53 by construction) and
        # ~6x faster than np.add.at
        if self._dense_ok and len(ids) * 8 >= self.n_docs:
            # dense path: when a large fraction of docs match, one bincount
            # over N + one partition beats sorting the K matched postings
            acc = np.bincount(ids, weights=units.astype(np.float64),
                              minlength=self.n_docs)
            k = min(self.k, self.n_docs)
            cut = np.partition(acc, self.n_docs - k)[self.n_docs - k]
            if cut <= 0:
                cand = np.nonzero(acc > 0)[0]
            else:
                cand = np.nonzero(acc >= cut)[0]  # >= keeps boundary ties
            return cand, acc[cand].astype(np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.bincount(inv, weights=units.astype(np.float64),
                             minlength=len(uniq))
        return uniq, scores.astype(np.int64)

    def _score_daat(self, qterms: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
        """Naive DAAT heap merge over decoded lists (parity reference)."""
        cursors = []
        for term, qtf in qterms.items():
            if term not in self.refs:
                continue
            ids, tfs, dls = self._gather(term)
            units = self._contrib_units(qtf, idf(self.n_docs, self.df[term]), tfs, dls)
            cursors.append((ids, units))
        if not cursors:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        heap = [(int(ids[0]), ci, 0) for ci, (ids, _) in enumerate(cursors)]
        heapq.heapify(heap)
        out_ids, out_scores = [], []
        while heap:
            doc = heap[0][0]
            acc = 0
            while heap and heap[0][0] == doc:
                _, ci, pos = heapq.heappop(heap)
                ids, units = cursors[ci]
                acc += int(units[pos])
                if pos + 1 < len(ids):
                    heapq.heappush(heap, (int(ids[pos + 1]), ci, pos + 1))
            out_ids.append(doc)
            out_scores.append(acc)
        return np.asarray(out_ids, dtype=np.int64), np.asarray(out_scores, dtype=np.int64)

    def _score_bmw(self, qterms: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
        """Block-max WAND over decoded lists with per-block upper bounds.

        Returns only the top-k surviving candidates (ids, units).  Bounds are
        conservative: float upper bounds are inflated by 2 units before the
        <= theta prune, so quantization can never prune a true top-k doc.
        Docs are visited in increasing doc_id, so an equal-score candidate
        can never displace an in-heap doc (ties break doc_id-ascending) and
        pruning at ``bound <= theta`` is exact.
        """
        lists = []
        for term, qtf in qterms.items():
            if term not in self.refs:
                continue
            w = idf(self.n_docs, self.df[term])
            for _salt, si, ri in self.refs[term]:
                seg = self.segments[si]
                ids, tfs = seg.postings_at(ri)
                dls = np.asarray(self.doclens)[ids]
                units = self._contrib_units(qtf, w, tfs, dls)
                meta = seg.meta_at(ri)
                # per-piece block bounds in units (+2 safety margin)
                bmax = (
                    qtf * w * meta.block_max_tfsat.astype(np.float64) * SCORE_SCALE
                    + 2.0
                )
                block_last = meta.block_last_docid
                lists.append(
                    {
                        "ids": ids, "units": units, "pos": 0,
                        "ub": float(bmax.max()),
                        "block_bounds": bmax, "block_last": block_last,
                    }
                )
        if not lists:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

        k = self.k
        heap: list[tuple[int, int]] = []  # (units, -doc_id), worst first
        theta = -1

        def cur(c):
            return c["ids"][c["pos"]] if c["pos"] < len(c["ids"]) else None

        live = [c for c in lists if len(c["ids"])]
        while live:
            live.sort(key=lambda c: cur(c))
            # pivot: first prefix whose summed list-max bounds beat theta
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c["ub"]
                if acc > theta:
                    pivot = i
                    break
            if pivot < 0:
                break
            pivot_doc = cur(live[pivot])
            # extend the prefix over every cursor already AT the pivot doc —
            # their contributions belong to pivot_doc's bound, and skipping
            # past pivot_doc must account for them
            while pivot + 1 < len(live) and cur(live[pivot + 1]) == pivot_doc:
                pivot += 1
            # block-max refinement at the pivot doc
            block_acc = 0.0
            for c in live[: pivot + 1]:
                bi = int(np.searchsorted(c["block_last"], pivot_doc))
                if bi < len(c["block_bounds"]):
                    block_acc += float(c["block_bounds"][bi])
            if block_acc <= theta:
                # skip: advance the lowest cursor past the earliest block end,
                # capped at cur(pivot+1)-1 — beyond that, lists outside the
                # pivot prefix start contributing and the bound no longer holds
                nxt = None
                for c in live[: pivot + 1]:
                    bi = int(np.searchsorted(c["block_last"], pivot_doc))
                    if bi < len(c["block_last"]):
                        end = int(c["block_last"][bi])
                        nxt = end if nxt is None else min(nxt, end)
                if nxt is None:
                    nxt = pivot_doc
                if pivot + 1 < len(live):
                    nxt = min(nxt, int(cur(live[pivot + 1])) - 1)
                target = max(nxt, pivot_doc) + 1
                c0 = live[0]
                c0["pos"] += int(np.searchsorted(c0["ids"][c0["pos"]:], target))
                live = [c for c in live if c["pos"] < len(c["ids"])]
                continue
            if cur(live[0]) == pivot_doc:
                score = 0
                for c in live:
                    if cur(c) == pivot_doc:
                        score += int(c["units"][c["pos"]])
                        c["pos"] += 1
                    else:
                        break
                if score > 0 and (len(heap) < k or score > theta):
                    entry = (score, -int(pivot_doc))
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    else:
                        heapq.heappushpop(heap, entry)
                    if len(heap) == k:
                        theta = heap[0][0]
                live = [c for c in live if c["pos"] < len(c["ids"])]
            else:
                for c in live[:pivot]:
                    c["pos"] += int(
                        np.searchsorted(c["ids"][c["pos"]:], pivot_doc)
                    )
                live = [c for c in live if c["pos"] < len(c["ids"])]

        if not heap:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ids = np.array([-d for _, d in heap], dtype=np.int64)
        units = np.array([u for u, _ in heap], dtype=np.int64)
        return ids, units

    # --------------------------------------------------------------- topk --
    def _topk(self, ids: np.ndarray, units: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = units > 0
        ids, units = ids[pos], units[pos]
        if len(ids) == 0:
            return ids, units
        if len(ids) > self.k * 4:
            # cheap pre-cut at the k-th largest score; >= keeps boundary ties
            # so the final lexsort can break them by doc_id
            cut = np.partition(units, len(units) - self.k)[len(units) - self.k]
            keep = units >= cut
            ids, units = ids[keep], units[keep]
        order = np.lexsort((ids, -units))[: self.k]
        return ids[order], units[order]

    def search_one(self, query: str, lang: str | None = None):
        qterms = self._query_terms(query, lang)
        if self.scorer == "taat":
            ids, units = self._score_taat(qterms)
        elif self.scorer == "daat":
            ids, units = self._score_daat(qterms)
        elif self.scorer == "bmw":
            ids, units = self._score_bmw(qterms)
        else:
            raise ValueError(f"unknown scorer {self.scorer!r}")
        ids, units = self._topk(ids, units)
        if self.docmap is not None and len(ids):
            ids = np.asarray(self.docmap[ids])  # ordinal -> real doc id
        return ids, units

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        queries = batch["query"].to_pylist()
        langs = (
            batch["lang"].to_pylist()
            if "lang" in batch.schema.names
            else [None] * len(qids)
        )
        out_qid, out_rank, out_doc, out_score = [], [], [], []
        for qid, q, lg in zip(qids, queries, langs):
            ids, units = self.search_one(q or "", lg or None)
            for r, (d, u) in enumerate(zip(ids, units), start=1):
                out_qid.append(qid)
                out_rank.append(r)
                out_doc.append(int(d))
                out_score.append(u / SCORE_SCALE)
        return pa.table(
            {
                "query_id": pa.array(out_qid, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int32()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "score": pa.array(out_score, type=pa.float64()),
            }
        )


def run_queries(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    scorer: str = "taat",
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 64,
):
    """Queries Dataset -> results Dataset via the QueryEngine actor pool."""
    # a small query table often arrives as one block, which would starve the
    # pool (1 block -> 1 task); split so every actor gets work
    n_actors = concurrency if isinstance(concurrency, int) else concurrency[1]
    queries_ds = queries_ds.repartition(max(n_actors * 2, 4))
    return queries_ds.map_batches(
        QueryEngine,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "scorer": scorer},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
