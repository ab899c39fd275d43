"""Index-assisted candidate generation for phrase / proximity search.

Round 3 answered phrase/NEAR queries by re-scanning and re-tokenizing the
WHOLE corpus once per query set (the old pipelines._query_stats +
full-corpus _bm25_over_verified pass) — defensible as a one-shot batch job,
a scale-killer as a *search* operator.  This module provides the serving
shape instead (reference analogue: Milvus answers every query through its
index, never a collection scan — /root/reference/retrievers.py:120-128):

  * stats (n_docs, avgdl) come from the built index's MANIFEST.json —
    persisted at build time, never recomputed from the corpus;
  * per-term df comes from the segment dictionaries (one binary search per
    term per segment — the same lazy lookup the query engine uses);
  * candidate doc ORDINALS come from the posting lists, computed by a
    fan-out over contiguous ordinal ranges (one task per range; each task
    decodes ONLY the posting blocks overlapping its range via
    QueryEngine._gather_range — the run_queries_sharded partitioning), so
    no task ever holds more than ~1/n_ranges of any posting list.

Candidate semantics (must mirror sql._bm25_ranked_cte's verify_join): a doc
can appear in a phrase result iff it VERIFIES and carries >= 1 analyzed
query term (a verified doc with zero exact query tokens contributes zero
posting rows and is absent either way).  Hence:

  * ``any_terms`` (substring phrases): a substring match can cross token
    boundaries ("merge sort" matches inside "xmerge sort", whose tokens are
    [xmerge, sort]), so a verified doc may hold only SOME analyzed terms —
    candidates are the UNION of the terms' posting lists.
  * ``groups`` (token phrases / NEAR windows): consecutive-position or
    window verification implies EVERY term of the query is present —
    candidates are the per-query INTERSECTION of posting lists, unioned
    across queries (much smaller).  Intersections are exact per range
    because every posting of an in-range doc lands in-range.

Tombstoned ordinals are masked out of the candidate set (a dead doc must
not be fetched, verified, or ranked).

Scale notes: |candidates| <= sum df(term) ('any') / min-per-query df
('all'); the driver holds only the candidate id array — the semi-join key
the fetch must broadcast anyway.  At 10^12 docs with stop-word phrase terms
the range tasks would spill their per-range candidate arrays to side files
and the fetch would become a distributed semi-join against them; the range
fan-out below already produces exactly those per-range pieces.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .docmap import sorted_member
from .segments import SegmentReader


def index_stats(index_dir: str, terms: list[str]) -> tuple[int, float, dict]:
    """(n_docs, avgdl, {term: df}) with df > 0 only — n_docs/avgdl straight
    from MANIFEST.json, df summed over the segment dictionaries (salted
    sub-lists of a hot term each carry their own df; the sum is the
    corpus-wide document frequency, identical to the SQL DF_CTE)."""
    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        man = json.load(f)
    seg_root = os.path.join(index_dir, "segments")
    readers = [SegmentReader(os.path.join(seg_root, s["segment_id"]))
               for s in man["segments"]]
    dfs: dict[str, int] = {}
    for t in terms:
        df = 0
        for seg in readers:
            col = seg.dict["df"]
            for ri in seg.term_rows(t):
                df += col[ri].as_py()
        if df:
            dfs[t] = df
    return int(man["n_docs"]), float(man["avgdl"]), dfs


def _range_candidates_batch(t: pa.Table, *, index_dir: str,
                            any_terms: list[str] | None,
                            groups: list[list[str]] | None) -> pa.Table:
    """One task per ordinal range: gather (range-restricted) postings for
    the query terms, take union / per-group intersection, mask tombstones,
    return the range's candidate ordinals."""
    from .query import QueryEngine

    out: list[np.ndarray] = []
    for row in t.to_pylist():
        lo, hi = int(row["lo"]), int(row["hi"])
        eng = QueryEngine(index_dir, ord_range=(lo, hi))
        parts: list[np.ndarray] = []
        if any_terms is not None:
            for tm in any_terms:
                ids = eng._gather_range(tm)[0]
                if len(ids):
                    parts.append(ids)
        else:
            for toks in groups or []:
                lists = [eng._gather_range(tm)[0] for tm in sorted(set(toks))]
                if not lists or any(len(x) == 0 for x in lists):
                    continue  # a missing term empties the intersection
                lists.sort(key=len)  # smallest first bounds the work
                inter = lists[0]
                for arr in lists[1:]:
                    if not len(inter):
                        break
                    inter = inter[sorted_member(arr, inter)[0]]
                if len(inter):
                    parts.append(inter)
        if not parts:
            continue
        ords = np.unique(np.concatenate(parts))
        if len(eng.tomb):
            dead, _ = sorted_member(eng.tomb, ords)
            ords = ords[~dead]
        if len(ords):
            out.append(ords)
    merged = (np.unique(np.concatenate(out)) if out
              else np.empty(0, dtype=np.int64))
    return pa.table({"ord": pa.array(merged, type=pa.int64())})


def candidate_ordinals(index_dir: str, *, any_terms: list[str] | None = None,
                       groups: list[list[str]] | None = None,
                       n_ranges: int | None = None) -> np.ndarray:
    """Sorted candidate doc ordinals from the inverted index.

    Exactly one of ``any_terms`` (union semantics) / ``groups``
    (per-group intersection, unioned) must be given.  The fan-out uses
    ``n_ranges`` contiguous ordinal ranges (default: enough that each task
    covers <= ~250k docs, capped at 16 — one task per range)."""
    if (any_terms is None) == (groups is None):
        raise ValueError("pass exactly one of any_terms / groups")
    import ray.data as rd

    with open(os.path.join(index_dir, "MANIFEST.json")) as f:
        n_docs = json.load(f)["n_docs"]
    if n_ranges is None:
        n_ranges = max(1, min(16, (n_docs + 249_999) // 250_000))
    n_ranges = max(1, min(n_ranges, n_docs))
    bounds = [(i * n_docs) // n_ranges for i in range(n_ranges + 1)]
    items = [{"lo": bounds[i], "hi": bounds[i + 1]}
             for i in range(n_ranges) if bounds[i] < bounds[i + 1]]
    rows = (
        rd.from_items(items)
        .map_batches(_range_candidates_batch, batch_format="pyarrow",
                     batch_size=1,
                     fn_kwargs={"index_dir": index_dir,
                                "any_terms": any_terms, "groups": groups})
        .take_all()
    )
    if not rows:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.asarray([r["ord"] for r in rows], dtype=np.int64))
