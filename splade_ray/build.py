"""Index build: corpus Dataset -> segments + manifests (Ray-Data-first).

Replaces the reference build path — serial per-file loops feeding a Milvus
``SPARSE_INVERTED_INDEX`` (ingest.py:86-97 chunking, ingest.py:111-129 sparse
embedding, ingest.py:132-172 insert + create_index) — with a streaming
Ray Data pipeline:

  1. STAGE    corpus -> map_batches(prepare) -> staging parquet
              (doc_id, identity cols, content_sha256, doc_len, terms, tfs):
              tokenize ONCE, checkpoint the analyzed corpus; empty /
              whitespace-only rows dropped with a counter (M10).
  2. STATS    n_docs / avgdl / langs from the staging table (Ray aggregates,
              partial-per-block; reference analogue: BM25 ``fit`` ST1).
  3. HOT      deterministic doc sample (doc_id % sample_mod == 0) ->
              partial-df per batch -> groupby(term).sum -> hot-term set
              (df above threshold).  Broadcast to the shuffle stage.
  4. ORDINALS sorted-doc-id rank map (docmap.bin) + forward doc-length
              array (doclens.bin): postings store dense ordinals.
  5. SHUFFLE  staging -> explode (term, salt, ordinal, tf, shard) with
              salted shards for hot terms (salt = contiguous ordinal
              ranges) -> groupby(shard).map_groups(one segment per shard).
  6. FINAL    MANIFEST.json with stats + per-segment lineage.

Resumability (north_rule): staging and every segment are validated
checkpoints; a rerun skips valid ones (shards are filtered out of the
shuffle input *before* the exchange, so finished work costs nothing).

Scoring determinism: BM25 contributions are quantized to integer units of
1e-9 (``SCORE_SCALE``) before summation, so ranks/scores are bit-identical
across scorers, summation orders, and the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from . import DROP_WS, MASK63
from .analyzer import doc_token_stats
from .ids import doc_id63_column, hash63_bytes, sha256_hex_column
from .segments import SegmentBuilder, validate_segment

SCORE_SCALE = 1_000_000_000  # integer score units per 1.0 of BM25 score

STAGING_SCHEMA_COLS = [
    "doc_id", "repo", "path", "commit", "lang", "content_sha256", "doc_len",
    "terms", "tfs",
]


def prepare_batch(t: pa.Table, *, lang_tagged: bool,
                  with_sha: bool = True, positions: bool = False) -> pa.Table:
    """Corpus batch -> staging batch. Drops empty/whitespace-only content.

    ``with_sha=False`` skips the per-row content sha256 (the input_hint
    invariant column): postings/stats consumers that never read it save the
    single most expensive per-row hash in the stage.  The BUILD path always
    keeps it (the invariant is asserted through the whole pipeline).

    ``positions=True`` adds a per-doc ``positions`` list<int32> column
    (within-doc token positions grouped by term in the terms list's order;
    per-(doc, term) slice lengths = tfs) — the staging source of the
    positional posting sidecar."""
    content = t["content"]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    trimmed = pc.utf8_trim(pc.fill_null(content, ""), characters=DROP_WS)
    keep = pc.not_equal(trimmed, "")
    t = t.filter(keep)
    content = t["content"]
    langs = t["lang"] if lang_tagged else None
    pos_col = None
    if positions:
        from .analyzer import doc_token_positions_from_flat, tokenize_flat

        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        flat, parents = tokenize_flat(pc.fill_null(content, ""), langs)
        terms, tfs, doc_len, pos_col = doc_token_positions_from_flat(
            flat, parents, t.num_rows)
    else:
        terms, tfs, doc_len = doc_token_stats(content, langs)
    cols = {
        "doc_id": doc_id63_column(t["repo"], t["path"], t["commit"]),
        "repo": t["repo"],
        "path": t["path"],
        "commit": t["commit"],
        "lang": t["lang"],
        "doc_len": pa.array(doc_len, type=pa.int32()),
        "terms": terms,
        "tfs": tfs,
    }
    if pos_col is not None:
        cols["positions"] = pos_col
    if with_sha:
        cols["content_sha256"] = sha256_hex_column(content)
        order = STAGING_SCHEMA_COLS + (["positions"] if positions else [])
        return pa.table({c: cols[c] for c in order})
    return pa.table(cols)


def _sample_df_batch(t: pa.Table, *, sample_mod: int) -> pa.Table:
    """Partial document-frequencies over a deterministic doc sample."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(ids % sample_mod == 0))
    if t.num_rows == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "pdf": pa.array([], type=pa.int64())})
    terms = t["terms"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    flat = terms.flatten()
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(codes, minlength=len(enc.dictionary))
    return pa.table({"term": enc.dictionary,
                     "pdf": pa.array(counts.astype(np.int64))})


def explode_postings_batch(
    t: pa.Table, *, n_shards: int, hot_terms: dict[str, bool],
    salt_bits: int, skip_shards: frozenset[int],
    docmap_ref=None, n_docs: int = 0,
) -> pa.Table:
    """Staging batch -> (term, salt, doc_id, tf, dl, shard) posting rows.

    ``doc_id`` in the OUTPUT is the dense doc ORDINAL (rank of the real
    63-bit id in the sorted id set, via the broadcast ``docmap_ref``):
    ordinal gaps average N/df — 1-2 varbyte bytes — where raw hash-id gaps
    average 2^63/df (~7 bytes).  Ordinals are order-isomorphic to doc ids,
    so doc_id-ascending tie-breaks survive; the query engine translates
    back through docmap.bin on output.

    Cold terms: salt 0, shard = h(term) % P.  Hot terms: salt = the
    ordinal's position scaled to 2^salt_bits contiguous, doc-sorted ranges,
    shard = h(term # salt) % P — spreads the heavy list over the cluster.
    Shards already completed (resume) are filtered out here, before the
    shuffle moves any bytes.
    """
    import ray as _ray

    terms = t["terms"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    parents = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
    flat_terms = terms.flatten()
    tfs = t["tfs"]
    if isinstance(tfs, pa.ChunkedArray):
        tfs = tfs.combine_chunks()
    flat_tfs = tfs.flatten().to_numpy(zero_copy_only=False)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[parents]
    if docmap_ref is not None:
        docmap = _ray.get(docmap_ref)  # broadcast once; zero-copy from shm
        doc_ids = np.searchsorted(docmap, doc_ids)

    enc = pc.dictionary_encode(flat_terms)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    vocab = enc.dictionary.to_pylist()
    base_shard = np.array([hash63_bytes(v.encode()) % n_shards for v in vocab],
                          dtype=np.int32)
    is_hot = np.array([v in hot_terms for v in vocab], dtype=bool)

    shard = base_shard[codes]
    salt = np.zeros(len(codes), dtype=np.int32)
    if is_hot.any() and salt_bits > 0:
        hot_rows = is_hot[codes]
        if docmap_ref is not None and n_docs > 0:
            salt[hot_rows] = (
                (doc_ids[hot_rows] * (1 << salt_bits)) // n_docs
            ).astype(np.int32)
        else:
            salt[hot_rows] = (doc_ids[hot_rows] >> (63 - salt_bits)).astype(np.int32)
        # (hot term, salt) -> shard lookup built once over the tiny hot
        # vocabulary (hot x 2^salt_bits hashes), then one vectorized gather —
        # no per-term full-batch scans
        hot_codes = np.nonzero(is_hot)[0]
        n_salt = 1 << salt_bits
        lut = np.empty((len(hot_codes), n_salt), dtype=np.int32)
        for i, c in enumerate(hot_codes):
            for s in range(n_salt):
                lut[i, s] = hash63_bytes(f"{vocab[c]}#{s}".encode()) % n_shards
        hot_index = np.full(len(vocab), -1, dtype=np.int64)
        hot_index[hot_codes] = np.arange(len(hot_codes))
        shard[hot_rows] = lut[hot_index[codes[hot_rows]], salt[hot_rows]]

    cols = {
        "term": flat_terms,
        "salt": pa.array(salt),
        "doc_id": pa.array(doc_ids),
        "tf": pa.array(flat_tfs.astype(np.int32)),
        "shard": pa.array(shard),
    }
    if "positions" in t.schema.names:
        # per-(doc, term) position slice: the staging positions column is
        # already grouped by term in the terms list's order, so the exploded
        # row i's positions are the flat values with per-row counts = tf
        pos = t["positions"]
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        pos_offsets = np.zeros(len(flat_tfs) + 1, dtype=np.int64)
        np.cumsum(flat_tfs.astype(np.int64), out=pos_offsets[1:])
        flat_vals = pos.flatten()
        if pos_offsets[-1] != len(flat_vals):
            raise ValueError("positions column inconsistent with tfs")
        cols["pos"] = pa.LargeListArray.from_arrays(
            pa.array(pos_offsets), flat_vals)
    out = pa.table(cols)
    if skip_shards:
        out = out.filter(
            pa.array(~np.isin(shard, np.fromiter(skip_shards, dtype=np.int32)))
        )
    return out


def build_segment_group(group: pa.Table, *, index_dir: str, avgdl: float,
                        doclens_ref=None) -> pa.Table:
    """One shuffle partition -> one segment on disk; returns its manifest row.

    Postings are sorted (term, salt, doc_id) and encoded per (term, salt) run.
    Duplicate (term, salt, doc_id) entries (duplicate input rows) collapse if
    their tf agrees; a conflicting duplicate raises (doc_id collision check).
    """
    if group.num_rows == 0:
        return pa.table({"shard": pa.array([], type=pa.int32())})
    shard = int(group["shard"][0].as_py())
    terms = group["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    enc = pc.dictionary_encode(terms)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int32)
    vocab = enc.dictionary.to_pylist()
    import ray as _ray

    doclens = _ray.get(doclens_ref) if doclens_ref is not None else None
    salts = group["salt"].to_numpy(zero_copy_only=False)
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tfs = group["tf"].to_numpy(zero_copy_only=False)
    with_pos = "pos" in group.schema.names
    flat_pos = tfs_orig = None
    if with_pos:
        pos_col = group["pos"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        flat_pos = pos_col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tfs_orig = tfs  # pre-reorder layout: position slices index by it
    # group runs by (term, salt), doc_id-sorted WITHIN runs — an integer
    # lexsort over LEXICOGRAPHIC code ranks (one tiny Arrow sort of the
    # vocab maps first-appearance codes to lex ranks; a whole-table string
    # sort would cost ~10x).  Lexicographic dictionary order is a FORMAT
    # INVARIANT (v4): readers binary-search the term column directly, which
    # is what keeps their startup O(1) in vocabulary size.
    lex = pc.array_sort_indices(enc.dictionary).to_numpy(zero_copy_only=False)
    rank = np.empty(len(vocab), dtype=np.int32)
    rank[lex] = np.arange(len(vocab), dtype=np.int32)
    order = np.lexsort((doc_ids, salts, rank[codes]))
    codes, salts, doc_ids = codes[order], salts[order], doc_ids[order]
    tfs = tfs[order]

    n = len(codes)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.logical_or(codes[1:] != codes[:-1], salts[1:] != salts[:-1], out=change[1:])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], n)

    builder = SegmentBuilder(f"seg-{shard:05d}", shard,
                             with_positions=with_pos)
    builder.set_lineage(n_input_postings=n)
    for lo, hi in zip(starts, ends):
        ids = doc_ids[lo:hi]
        tf = tfs[lo:hi]
        keep = np.ones(hi - lo, dtype=bool)
        if hi - lo > 1:
            dup = ids[1:] == ids[:-1]
            if dup.any():
                if (tf[1:][dup] != tf[:-1][dup]).any():
                    raise ValueError(
                        f"doc_id collision (conflicting tf) for term "
                        f"{vocab[codes[lo]]!r}; widen doc ids"
                    )
                keep[1:] = ~dup
        kept = ids[keep]
        positions = None
        if with_pos:
            # gather the run's per-posting position slices in sorted-kept
            # order (variable-length slice gather, all vectorized)
            from .codecs import take_slices

            positions = take_slices(flat_pos, tfs_orig, order[lo:hi][keep])
        builder.add(vocab[codes[lo]], int(salts[lo]), kept, tf[keep],
                    doclens[kept], avgdl, positions=positions)
    manifest = builder.write(os.path.join(index_dir, "segments", f"seg-{shard:05d}"))
    return pa.table(
        {
            "shard": pa.array([shard], type=pa.int32()),
            "n_terms": pa.array([manifest["n_terms"]], type=pa.int64()),
            "n_postings": pa.array([manifest["n_postings"]], type=pa.int64()),
            "sum_tf": pa.array([manifest["sum_tf"]], type=pa.int64()),
        }
    )


def _corpus_fingerprint(corpus) -> str | None:
    """Cheap corpus identity for checkpoint binding: sha256 over the sorted
    input-file list PLUS each file's (size, mtime_ns) — still metadata-only
    (no data pass), but rewriting a file's contents in place (same names)
    now invalidates stale staging instead of silently resuming from it.
    ``None`` when the Dataset has no file provenance (e.g. from_arrow, or a
    map_batches lineage that hides it) — then resume validation falls back
    to trusting STAGING.json and the fast full-resume path is disabled;
    such callers should pass ``corpus_fp=fingerprint_files(...)`` to
    build_index instead."""
    try:
        files = corpus.input_files()
    except Exception:
        return None
    if not files:
        return None
    return fingerprint_files(files)


def fingerprint_files(files: list[str]) -> str:
    """The (name, size, mtime_ns) fingerprint over an explicit file list —
    for callers whose corpus Dataset has no recoverable file provenance."""
    parts = []
    for f in sorted(files):
        try:
            st = os.stat(f)
            parts.append(f"{f}\0{st.st_size}\0{st.st_mtime_ns}")
        except OSError:
            parts.append(f)  # remote/unstat-able path: name-only identity
    digest = hashlib.sha256("\n".join(parts).encode()).hexdigest()
    return digest[:16]


def _staging_valid(index_dir: str, corpus_fp: str | None = None,
                   positions: bool | None = None) -> bool:
    p = os.path.join(index_dir, "STAGING.json")
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            meta = json.load(f)
        if not (os.path.isdir(os.path.join(index_dir, "staging")) and meta.get("ok")):
            return False
        if positions is not None and bool(meta.get("positions")) != positions:
            return False  # positional staging carries an extra column
        # checkpoints are bound to the corpus they were staged from: a
        # changed input-file list invalidates staging (and everything
        # derived from it) instead of silently serving stale docs
        recorded = meta.get("corpus_fp")
        if corpus_fp is not None and recorded is not None and recorded != corpus_fp:
            return False
        return True
    except (json.JSONDecodeError, OSError):
        return False


def _finished_manifest(index_dir: str, corpus_fp: str, *, lang_tagged: bool,
                       n_shards: int, salt_bits: int,
                       positions: bool = False) -> dict | None:
    """The index's manifest iff it is a COMPLETE build of exactly this
    (corpus, settings) — staging, forward arrays and every listed segment
    validate — else None.  Tombstones are untouched either way (same
    semantics as the slow resume path)."""
    from .docmap import doc_arrays_valid

    mpath = os.path.join(index_dir, "MANIFEST.json")
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as f:
            man = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    if not (man.get("corpus_fp") == corpus_fp
            and man.get("lang_tagged") == lang_tagged
            and man.get("n_shards") == n_shards
            and man.get("salt_bits") == salt_bits
            and bool(man.get("positions")) == positions
            and man.get("doc_ordinals")
            and _staging_valid(index_dir, corpus_fp, positions)
            and doc_arrays_valid(index_dir, man.get("n_docs", -1))):
        return None
    seg_root = os.path.join(index_dir, "segments")
    for s in man.get("segments", []):
        # quick (size-only) validation: the fast path runs on EVERY warm
        # serving call — re-hashing the whole index per call would be
        # O(index bytes); the slow-resume paths keep the full sha check
        if validate_segment(os.path.join(seg_root, s["segment_id"]),
                            quick=True) is None:
            return None
    return man


def build_index(
    corpus: "ray.data.Dataset",
    index_dir: str,
    *,
    lang_tagged: bool = False,
    n_shards: int = 32,
    salt_bits: int = 3,
    sample_mod: int = 20,
    hot_df_frac: float = 0.005,
    hot_df_min: int = 512,
    overwrite: bool = False,
    shuffle_concurrency: int | None = None,
    ordinal_driver_threshold: int = 5_000_000,
    ordinal_driver_bytes_budget: int = 256 * 2**20,
    corpus_fp: str | None = None,
    positions: bool = False,
    checkpoint: str = "parquet",
) -> dict:
    """Build (or resume) the inverted index; returns the final manifest.

    ``n_shards`` sizes the term-hash shuffle partitions (≈ 2-4x cluster CPUs;
    each shard must fit one worker's heap). ``salt_bits`` gives 2^bits salt
    buckets for hot terms. The corpus Dataset is consumed streaming; nothing
    is materialized except small aggregates.

    ``positions=True`` builds the positional sidecar (within-doc token
    positions per posting, codecs.encode_positions): phrase / NEAR queries
    then answer ENTIRELY from the index (phrase.positional_topk) — no
    candidate content fetch.  Costs ~1 extra byte per token in staging,
    the shuffle, and the segments; off by default.

    ``checkpoint`` picks the staging strategy:

      * ``"parquet"`` (default): tokenize once into a staging parquet —
        the resume checkpoint the north rule requires (a killed build
        skips valid staging + segments on rerun) AND the index's docs
        table (read_docs / highlight / bm25_topk_docs read it with column
        pruning).  Costs one corpus-scale write + read.
      * ``"none"``: single-shot fused build — the tokenized batches are
        pinned in the OBJECT STORE (``materialize()``, ~190 B/doc,
        spillable) and every downstream pass (stats, ordinals, hot
        detection, shuffle) reads them zero-copy; nothing corpus-scale
        touches disk except the segments.  No resume (a killed build
        restarts) and no docs table (read_docs raises — serve those from
        the source corpus).  The right mode for throwaway / benchmark
        builds and for pipelines whose source is already a resumable
        checkpoint one stage upstream.
    """
    import time as _time

    if checkpoint not in ("parquet", "none"):
        raise ValueError(f"unknown checkpoint mode {checkpoint!r}")
    fused = checkpoint == "none"
    timings: dict[str, float] = {}
    _t = _time.perf_counter
    os.makedirs(index_dir, exist_ok=True)

    if overwrite or fused:
        # a fused build is single-shot by definition: leftover artifacts
        # (possibly from a different corpus) must not be resumed into
        for sub in ("staging", "segments", "docs", "docmap", "tombstones.d"):
            p = os.path.join(index_dir, sub)
            if os.path.exists(p):
                shutil.rmtree(p)
        # tombstones belong to the PREVIOUS corpus: doc ids are content-
        # independent (repo,path,commit), so a surviving tombstones.bin
        # would silently hide live docs of the rebuilt index
        for f in ("STAGING.json", "MANIFEST.json", "tombstones.bin",
                  "docs_excluded.bin", "docmap.bin", "doclens.bin"):
            p = os.path.join(index_dir, f)
            if os.path.exists(p):
                os.remove(p)

    staging_dir = os.path.join(index_dir, "staging")
    t0 = _t()
    if corpus_fp is None and not fused:
        corpus_fp = _corpus_fingerprint(corpus)

    # FAST full-resume: a finished index (manifest bound to this corpus
    # fingerprint + settings, staging/docmap/segments all valid) returns
    # immediately.  Without this, every re-entrant build pays ~3 Dataset
    # pipelines of re-validation (stats, hot-detect, shuffle-skip) — fixed
    # seconds that dominate warm serving paths like the phrase candidates.
    if not overwrite and not fused and corpus_fp is not None:
        man = _finished_manifest(index_dir, corpus_fp, lang_tagged=lang_tagged,
                                 n_shards=n_shards, salt_bits=salt_bits,
                                 positions=positions)
        if man is not None:
            return man
    if fused:
        import ray as _ray_mod

        n_input = corpus.count()
        staged_ds = corpus.map_batches(
            prepare_batch, batch_format="pyarrow",
            fn_kwargs={"lang_tagged": lang_tagged, "positions": positions},
        ).materialize()
        # coalesce fine-grained prepare output (one block per corpus read
        # task): every downstream exchange pays O(blocks x partitions)
        # intermediate objects, so 240 tiny blocks through a 64-shard
        # groupby cost more than the repartition pass that merges them
        tgt = max(16, int(_ray_mod.cluster_resources().get("CPU", 16)) * 2)
        if staged_ds.num_blocks() > 2 * tgt:
            staged_ds = staged_ds.repartition(tgt).materialize()
        n_docs = staged_ds.count()  # block metadata, no pass
        if n_docs == 0:
            raise ValueError("no indexable documents (all rows empty?)")
        n_dropped = n_input - n_docs

        def _staging_read(columns: list[str]):
            return staged_ds.select_columns(columns)
    elif not _staging_valid(index_dir, corpus_fp, positions):
        # stale/absent staging: every derived artifact (segments, docmap,
        # manifest) came from that staging — drop them too, or a fingerprint
        # mismatch would rebuild staging yet keep serving stale segments
        for sub in ("staging", "segments", "docmap", "tombstones.d"):
            p = os.path.join(index_dir, sub)
            if os.path.exists(p):
                shutil.rmtree(p)
        for fn in ("docmap.bin", "doclens.bin", "MANIFEST.json",
                   "tombstones.bin", "docs_excluded.bin"):
            p = os.path.join(index_dir, fn)
            if os.path.exists(p):
                os.remove(p)
        n_input = corpus.count()
        staged_ds = corpus.map_batches(
            prepare_batch, batch_format="pyarrow",
            fn_kwargs={"lang_tagged": lang_tagged, "positions": positions},
        )
        staged_ds.write_parquet(staging_dir)
        if not os.path.isdir(staging_dir):  # zero indexable rows -> no files
            raise ValueError("no indexable documents (all rows empty?)")
        with open(os.path.join(index_dir, "STAGING.json"), "w") as f:
            json.dump({"ok": True, "n_input_rows": n_input,
                       "lang_tagged": lang_tagged, "corpus_fp": corpus_fp,
                       "positions": positions}, f)
    if not fused:
        with open(os.path.join(index_dir, "STAGING.json")) as f:
            staging_meta = json.load(f)
        if staging_meta.get("lang_tagged") != lang_tagged:
            raise ValueError(
                "index_dir was staged with a different lang_tagged setting")
    timings["staging_sec"] = round(_t() - t0, 3)
    t0 = _t()

    # n_docs from parquet FOOTER metadata — zero data read, no pipeline.
    # Every other stat (total_len, langs) comes from the single combined
    # pass below, fused with the ordinal pass when one is needed: each
    # separate Dataset pass costs ~0.5-1s of fixed startup that Amdahl turns
    # straight into lost scaling efficiency.
    if not fused:
        import pyarrow.parquet as _pq

        staging_files = sorted(
            os.path.join(staging_dir, f)
            for f in os.listdir(staging_dir)
            if f.endswith(".parquet")
        )
        n_docs = sum(_pq.read_metadata(f).num_rows for f in staging_files)
        if n_docs == 0:
            raise ValueError("no indexable documents (all rows empty?)")
        n_dropped = staging_meta["n_input_rows"] - n_docs

        def _staging_read(columns: list[str]):
            return ray.data.read_parquet(staging_dir, columns=columns)
    timings["stats_sec"] = round(_t() - t0, 3)
    t0 = _t()

    # doc-ordinal map: sorted unique doc ids -> postings store dense ranks.
    # Adaptive (same pattern as ops.dedup.connected_components): up to
    # ``ordinal_driver_threshold`` docs a driver-side argsort is strictly
    # faster than paying a distributed-sort pipeline (bounded: 12 bytes/doc,
    # 5M docs = 60 MB) and writes the FLAT docmap.bin/doclens.bin layout.
    # Above it the sort is DISTRIBUTED (ray.data range-partition sort over
    # the pruned 2-column read) and the sort's OUTPUT TASKS write per-range
    # shard files themselves (docmap.write_sharded): the driver only
    # prefix-sums one summary row per shard into ranges.json — nothing
    # doc-scale flows through a driver write cursor, so the path holds at
    # 10^12 docs.  Either path doubles as the duplicate-identity check:
    # equal ids end up adjacent.
    from .docmap import (LANG_MISSING, LANGVALS_NAME, doc_arrays_valid,
                         encode_lang_codes, open_doc_arrays, write_sharded)

    docmap_path = os.path.join(index_dir, "docmap.bin")
    doclens_path = os.path.join(index_dir, "doclens.bin")
    langvals_path = os.path.join(index_dir, LANGVALS_NAME)
    docmap_valid = doc_arrays_valid(index_dir, n_docs)
    tmp_map, tmp_dl = docmap_path + ".tmp", doclens_path + ".tmp"
    dup_msg = (
        "duplicate (repo, path, commit) identity rows (or a 63-bit "
        "doc_id collision); deduplicate the corpus first (ops.dedup) "
        "or widen ids"
    )
    total_len = 0
    langset: set[str] = set()

    def _absorb_stats(batch: pa.Table) -> None:
        nonlocal total_len
        dls = batch["doc_len"].to_numpy(zero_copy_only=False)
        total_len += int(dls.astype(np.int64).sum())
        lang_col = batch["lang"]
        if isinstance(lang_col, pa.ChunkedArray):
            lang_col = lang_col.combine_chunks()
        langset.update(x for x in pc.unique(lang_col).to_pylist() if x)

    if docmap_valid:
        # resume: ordinals exist, only the (sum, langs) stats pass remains —
        # distributed per-block partials, one tiny take_all
        def _stats_partial(t: pa.Table) -> pa.Table:
            lang_col = t["lang"]
            if isinstance(lang_col, pa.ChunkedArray):
                lang_col = lang_col.combine_chunks()
            uniq = pc.unique(lang_col).to_pylist()
            return pa.table(
                {
                    "total_len": pa.array(
                        [int(pc.sum(t["doc_len"]).as_py() or 0)],
                        type=pa.int64()),
                    "langs": pa.array([",".join(sorted(x for x in uniq if x))]),
                }
            )

        for r in (
            _staging_read(["doc_len", "lang"])
            .map_batches(_stats_partial, batch_format="pyarrow")
            .take_all()
        ):
            total_len += r["total_len"]
            langset.update(lg for lg in r["langs"].split(",") if lg)
    elif (n_docs <= ordinal_driver_threshold
          and 12 * n_docs <= ordinal_driver_bytes_budget):
        # ONE fused pass: stats + ordinal material (estimated 12 bytes/doc;
        # the running nbytes check below catches wide-dtype drift or a
        # mis-set threshold and falls back to the distributed sort rather
        # than blowing the driver heap)
        id_chunks, dl_chunks, lv_chunks, acc_bytes = [], [], [], 0
        fits = True
        for batch in _staging_read(
            ["doc_id", "doc_len", "lang"]
        ).iter_batches(batch_size=262144, batch_format="pyarrow"):
            _absorb_stats(batch)
            ic = batch["doc_id"].to_numpy(zero_copy_only=False)
            dc = batch["doc_len"].to_numpy(zero_copy_only=False)
            # lang doc-values: per-chunk codes against the chunk's own
            # vocabulary (1 byte/doc resident), remapped to the global
            # sorted vocabulary once the pass completes
            lang_col = batch["lang"]
            if isinstance(lang_col, pa.ChunkedArray):
                lang_col = lang_col.combine_chunks()
            cv = np.asarray(
                sorted(x for x in pc.unique(lang_col).to_pylist() if x),
                dtype=object)
            lc = encode_lang_codes(lang_col, cv)
            acc_bytes += ic.nbytes + dc.nbytes + lc.nbytes
            if acc_bytes > 2 * ordinal_driver_bytes_budget:
                fits = False
                break
            id_chunks.append(ic)
            dl_chunks.append(dc)
            lv_chunks.append((lc, cv))
        if fits:
            all_ids = np.concatenate(id_chunks)
            order = np.argsort(all_ids, kind="stable")
            sorted_ids = all_ids[order]
            if len(sorted_ids) > 1 and (sorted_ids[1:] == sorted_ids[:-1]).any():
                raise ValueError(dup_msg)
            sorted_ids.tofile(tmp_map)
            np.concatenate(dl_chunks)[order].astype(np.int32).tofile(tmp_dl)
            glob = np.asarray(sorted(langset), dtype=object)
            if len(glob) >= 255:
                raise ValueError(
                    f"corpus has {len(glob)} distinct langs; lang "
                    "doc-values support at most 254 (uint8 codes)")
            remapped = []
            for lc, cv in lv_chunks:
                lut = np.full(256, LANG_MISSING, dtype=np.uint8)
                if len(cv):
                    lut[: len(cv)] = np.searchsorted(glob, cv).astype(np.uint8)
                remapped.append(lut[lc])
            tmp_lv = langvals_path + ".tmp"
            np.concatenate(remapped)[order].tofile(tmp_lv)
            os.replace(tmp_map, docmap_path)
            os.replace(tmp_dl, doclens_path)
            os.replace(tmp_lv, langvals_path)
        else:
            # stats were partially absorbed: reset; the distributed path
            # recomputes them from its own pass (write_sharded summary rows)
            id_chunks = dl_chunks = lv_chunks = None
            total_len = 0
            langset.clear()
            sorted_ds = _staging_read(
                ["doc_id", "doc_len", "lang"]).sort("doc_id")
            stats = write_sharded(sorted_ds, index_dir, n_docs)
            total_len += stats["total_len"]
            langset |= stats["langs"]
    else:
        # distributed range-partition sort; the sort's output tasks write
        # the per-range shard layout themselves and return one summary row
        # each — stats are absorbed from the same rows (no extra pipeline)
        sorted_ds = _staging_read(
            ["doc_id", "doc_len", "lang"]).sort("doc_id")
        stats = write_sharded(sorted_ds, index_dir, n_docs)
        total_len += stats["total_len"]
        langset |= stats["langs"]
    avgdl = total_len / n_docs
    langs = sorted(langset)
    # memmap-backed handles: the driver never loads the arrays into its heap;
    # ray.put streams them into the object store as the one broadcast copy
    doc_arrays = open_doc_arrays(index_dir)
    import ray as _ray

    docmap_ref = _ray.put(doc_arrays.docmap_array())
    doclens_ref = _ray.put(doc_arrays.doclens_array())
    timings["docmap_sec"] = round(_t() - t0, 3)
    t0 = _t()

    # hot-term detection over a deterministic file-level sample of staging:
    # reading every file and discarding (1 - 1/sample_mod) of rows costs a
    # full decompress of the terms column — sampling whole files reads ~1/k
    # of the bytes.  Only load balance (salting) depends on this estimate,
    # never correctness.
    hot_threshold = max(hot_df_min, int(hot_df_frac * n_docs))
    if fused:
        # object-store staging has no file boundaries: fall back to the
        # deterministic row sample (doc_id % sample_mod) inside the batch —
        # the blocks are already decoded, so there is no decompress tax to
        # dodge
        sampled_df = (
            _staging_read(["doc_id", "terms"])
            .map_batches(_sample_df_batch, batch_format="pyarrow",
                         fn_kwargs={"sample_mod": sample_mod})
            .groupby("term")
            .aggregate(Sum("pdf", alias_name="pdf"))
        )
        est_min = max(1, hot_threshold // max(1, sample_mod))
    else:
        sample_files = staging_files[:: max(1, sample_mod)] \
            or staging_files[:1]
        sampled_df = (
            ray.data.read_parquet(sample_files, columns=["doc_id", "terms"])
            .map_batches(_sample_df_batch, batch_format="pyarrow",
                         fn_kwargs={"sample_mod": 1})
            .groupby("term")
            .aggregate(Sum("pdf", alias_name="pdf"))
        )
        sample_frac = len(sample_files) / max(1, len(staging_files))
        est_min = max(1, int(hot_threshold * sample_frac))
    hot_rows = sampled_df.filter(
        lambda r, m=est_min: r["pdf"] >= m
    ).take_all()
    hot_terms = {r["term"]: True for r in hot_rows}
    timings["hot_detect_sec"] = round(_t() - t0, 3)
    t0 = _t()

    seg_root = os.path.join(index_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    done: dict[int, dict] = {}
    for name in os.listdir(seg_root):
        m = validate_segment(os.path.join(seg_root, name))
        if m is not None:
            done[m["shard"]] = m
    todo = [s for s in range(n_shards) if s not in done]

    # push-based shuffle: measured ~2x faster than the default sort exchange
    # for the low-cardinality shard key at this scale
    _ctx = ray.data.DataContext.get_current()
    _prev_push = getattr(_ctx, "use_push_based_shuffle", False)
    _ctx.use_push_based_shuffle = True
    if todo:
        shuffle_cols = ["doc_id", "terms", "tfs"]
        if positions:
            shuffle_cols.append("positions")
        postings = _staging_read(shuffle_cols).map_batches(
            explode_postings_batch, batch_format="pyarrow",
            fn_kwargs={
                "n_shards": n_shards, "hot_terms": hot_terms,
                "salt_bits": salt_bits, "skip_shards": frozenset(done),
                "docmap_ref": docmap_ref, "n_docs": n_docs,
            },
        )
        grouped = postings.groupby("shard")
        seg_stats = grouped.map_groups(
            partial(build_segment_group, index_dir=index_dir, avgdl=avgdl,
                    doclens_ref=doclens_ref),
            batch_format="pyarrow",
        )
        seg_stats.count()  # drive execution; manifests land on disk
        for name in os.listdir(seg_root):
            m = validate_segment(os.path.join(seg_root, name))
            if m is not None:
                done[m["shard"]] = m

    _ctx.use_push_based_shuffle = _prev_push
    timings["shuffle_build_sec"] = round(_t() - t0, 3)
    # NOTE: no separate docs-table write — the staging parquet IS the docs
    # table (read it with column pruning via ``read_docs``); avoids one full
    # read+write pass per build.
    manifest = {
        "format_version": 1,
        "timings": timings,
        "n_docs": int(n_docs),
        "n_dropped_rows": int(n_dropped),
        "total_doc_len": int(total_len),
        "avgdl": float(avgdl),
        "langs": langs,
        "lang_tagged": lang_tagged,
        "corpus_fp": corpus_fp,
        "checkpoint": checkpoint,
        "n_shards": n_shards,
        "salt_bits": salt_bits,
        "doc_ordinals": True,  # postings store dense ranks; see docmap.bin
        "positions": bool(positions),
        "hot_terms": sorted(hot_terms),
        "hot_df_threshold": hot_threshold,
        "n_postings": int(sum(m["n_postings"] for m in done.values())),
        "segments": [
            {"shard": s, "segment_id": m["segment_id"],
             "n_terms": m["n_terms"], "n_postings": m["n_postings"]}
            for s, m in sorted(done.items())
        ],
    }
    with open(os.path.join(index_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_docs(index_dir: str, columns: list[str] | None = None,
              live_only: bool = False):
    """The index's docs table as a Dataset (identity, sha256, doc_len).

    Backed by the staging parquet with column pruning — the list columns
    (terms/tfs) are never read unless asked for.  A merged index (no staging
    of its own) lists its inputs' staging dirs under ``docs_sources``.

    ``live_only=True`` filters out tombstoned docs (delete.delete_docs) with
    a vectorized sorted-membership test per batch — the docs-side mirror of
    the query-side mask; a compacted index has no tombstones and streams
    through unchanged."""
    if columns is None:
        columns = ["doc_id", "repo", "path", "commit", "lang",
                   "content_sha256", "doc_len"]
    from .delete import read_excluded, read_tombstones

    drop = read_excluded(index_dir)
    if live_only:
        drop = np.union1d(drop, read_tombstones(index_dir))
    # the drop filter reads t["doc_id"]: when the caller pruned it away,
    # read it internally and project it back out after the filter
    strip_doc_id = len(drop) > 0 and "doc_id" not in columns
    if strip_doc_id:
        columns = ["doc_id"] + list(columns)
    staging = os.path.join(index_dir, "staging")
    if not os.path.isdir(staging):
        with open(os.path.join(index_dir, "MANIFEST.json")) as f:
            man = json.load(f)
        sources = man.get("docs_sources", [])
        if not sources:
            # built (or derived via merge/compact) from checkpoint='none'
            # inputs: object-store staging, nothing corpus-scale on disk
            raise ValueError(
                "index was built with checkpoint='none' (object-store "
                "staging, nothing corpus-scale on disk): it has no docs "
                "table — serve identity/content columns from the source "
                "corpus, or rebuild with checkpoint='parquet'")
        files = [
            os.path.join(d, f)
            for d in sources
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        ds = ray.data.read_parquet(files, columns=columns)
    else:
        ds = ray.data.read_parquet(staging, columns=columns)
    # compaction-excluded docs are gone from the index (no ordinal, no
    # postings) but still present in the backing staging parquet: filter
    # them UNCONDITIONALLY; live_only additionally hides tombstoned docs
    if len(drop):
        def _drop_dead(t: pa.Table, drop=drop,
                       strip=strip_doc_id) -> pa.Table:
            from .docmap import sorted_member

            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            dead, _ = sorted_member(drop, ids)
            if dead.any():
                t = t.filter(pa.array(~dead))
            return t.drop_columns(["doc_id"]) if strip else t

        ds = ds.map_batches(_drop_dead, batch_format="pyarrow")
    return ds
