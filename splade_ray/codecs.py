"""Posting-list codecs: delta-gap + varbyte, with block-max metadata.

Replaces the opaque Milvus ``SPARSE_INVERTED_INDEX`` posting storage
(reference ingest.py:159-166) with an explicit, compressed, skippable format:

  * varbyte (LEB128: little-endian 7-bit groups, MSB = continuation), encoded
    and decoded fully vectorized in numpy (no per-int Python loop);
  * postings sorted by doc_id, doc ids stored as a single global delta chain
    (gap of a block's first posting is taken from the previous block's last
    doc id, so a whole-list decode is one varbyte pass + one cumsum, while a
    skipped-to block can still be decoded alone from ``block_last_docid``);
  * per posting we store (gap, tf) only — format v3 moved doc lengths out of
    the postings into the forward ``doclens.bin`` array (ordinal-indexed, one
    int32 per doc; see segments.py) so the hottest lists carry ~2 bytes per
    posting.  Doc lengths are still SUPPLIED to ``encode_postings`` at build
    time to compute the block-max bounds, but are not stored in the blob;
  * per block of ``BLOCK`` postings: last doc id and an upper bound of the
    BM25 tf-saturation factor (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl)), rounded
    UP in float32 — the block-max WAND bound.

Block layout in the blob, per block: varbyte(gaps) ++ varbyte(tfs).  No
intra-block offsets are needed: a varbyte decode of n ints reports consumed
bytes, so the two streams are read back-to-back.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import B, K1

BLOCK = 128  # postings per block


# ---------------------------------------------------------------- varbyte ---

def vb_encode(values: np.ndarray) -> np.ndarray:
    """Varbyte-encode a uint64 ndarray -> uint8 ndarray (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):  # 64 bits -> at most 10 groups of 7
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=offs[1:])
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(int(nb.max())):
        m = nb > j
        byte = (v[m] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[m] - 1 > j).astype(np.uint8) << 7
        out[offs[m] + j] = byte.astype(np.uint8) | cont
    return out


def vb_decode_all(buf: np.ndarray) -> np.ndarray:
    """Decode EVERY varbyte int in ``buf`` in one vectorized pass.

    Varbyte is self-delimiting, so a whole multi-stream region can be decoded
    at once and re-split by known counts — this is the query-path fast path
    (one numpy pass per posting list instead of 3 calls per 128-block)."""
    b = np.ascontiguousarray(buf)  # materialize mmap slice once
    ends = np.nonzero((b & 0x80) == 0)[0]
    n = len(ends)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lengths.max())):
        m = lengths > j
        vals[m] |= (b[starts[m] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def vb_decode(buf: np.ndarray, n: int, start: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``n`` varbyte ints from ``buf[start:]`` (vectorized).

    Returns (values uint64[n], bytes consumed)."""
    if n == 0:
        return np.empty(0, dtype=np.uint64), 0
    view = buf[start:]
    term = np.nonzero((view & 0x80) == 0)[0]
    ends = term[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lengths.max())):
        m = lengths > j
        vals[m] |= (view[starts[m] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals, int(ends[n - 1] + 1)


# ----------------------------------------------------------- posting list ---

@dataclass
class PostingMeta:
    """Per-term metadata kept in the segment dictionary."""

    df: int
    cf: int  # collection frequency: sum of tf
    nbytes: int
    block_count: np.ndarray  # int32 per block
    block_nbytes: np.ndarray  # int32 per block
    block_last_docid: np.ndarray  # int64 per block
    block_max_tfsat: np.ndarray  # float32 per block (safe upper bound)


def tf_saturation(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 per-posting factor (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl)), f64."""
    tf = tf.astype(np.float64)
    denom = tf + K1 * (1.0 - B + B * dl.astype(np.float64) / max(avgdl, 1e-9))
    return (K1 + 1.0) * tf / denom


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, avgdl: float
) -> tuple[np.ndarray, PostingMeta]:
    """Encode one term's postings (doc_id-sorted, unique) into a blob + meta.

    ``dls`` (per-posting doc lengths) feed the block-max score bounds but
    are NOT stored — with dense doc ordinals, doc lengths live once in the
    index's forward array (doclens.bin) and are gathered at query time.
    Block layout: varbyte(gaps) ++ varbyte(tfs)."""
    df = len(doc_ids)
    assert df > 0
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    gaps = np.empty(df, dtype=np.uint64)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    if df > 1 and (doc_ids[1:] <= doc_ids[:-1]).any():
        raise ValueError("postings must be strictly doc_id-sorted")
    n_blocks = (df + BLOCK - 1) // BLOCK
    chunks: list[np.ndarray] = []
    block_count = np.empty(n_blocks, dtype=np.int32)
    block_nbytes = np.empty(n_blocks, dtype=np.int32)
    block_last = np.empty(n_blocks, dtype=np.int64)
    block_max = np.empty(n_blocks, dtype=np.float32)
    sat = tf_saturation(np.asarray(tfs), np.asarray(dls), avgdl)
    for i in range(n_blocks):
        lo, hi = i * BLOCK, min((i + 1) * BLOCK, df)
        enc = np.concatenate(
            [
                vb_encode(gaps[lo:hi]),
                vb_encode(np.asarray(tfs[lo:hi], dtype=np.uint64)),
            ]
        )
        chunks.append(enc)
        block_count[i] = hi - lo
        block_nbytes[i] = len(enc)
        block_last[i] = int(doc_ids[hi - 1])
        # float32 round-up so the f32 bound is >= the f64 truth
        m = np.float32(sat[lo:hi].max())
        if float(m) < float(sat[lo:hi].max()):
            m = np.nextafter(m, np.float32(np.inf))
        block_max[i] = m
    blob = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
    meta = PostingMeta(
        df=df,
        cf=int(np.asarray(tfs, dtype=np.uint64).sum()),
        nbytes=len(blob),
        block_count=block_count,
        block_nbytes=block_nbytes,
        block_last_docid=block_last,
        block_max_tfsat=block_max,
    )
    return blob, meta


def decode_postings(blob: np.ndarray, meta: PostingMeta) -> tuple[np.ndarray, np.ndarray]:
    """Full-list decode -> (doc_ids int64, tfs int32).

    Fast path: a region whose byte count equals 2x its posting count has
    every gap and tf in one byte (the overwhelmingly common case with dense
    ordinals) — the bytes ARE the values, decoded by two slices.  Otherwise
    one vectorized varbyte pass + per-block re-split."""
    df = meta.df
    nbytes = int(meta.block_nbytes.sum())
    region = blob[:nbytes]
    if nbytes == 2 * df and not bool((meta.block_nbytes != 2 * meta.block_count).any()):
        b = np.ascontiguousarray(region)
        gaps = np.empty(df, dtype=np.uint64)
        tfs = np.empty(df, dtype=np.uint64)
        pos = ipos = 0
        for n in meta.block_count:
            n = int(n)
            gaps[pos : pos + n] = b[ipos : ipos + n]
            tfs[pos : pos + n] = b[ipos + n : ipos + 2 * n]
            pos += n
            ipos += 2 * n
        doc_ids = np.cumsum(gaps, dtype=np.uint64).astype(np.int64)
        return doc_ids, tfs.astype(np.int32)
    ints = vb_decode_all(region)
    if len(ints) != 2 * df:
        raise ValueError(f"corrupt posting region: {len(ints)} ints, df={df}")
    gaps = np.empty(df, dtype=np.uint64)
    tfs = np.empty(df, dtype=np.uint64)
    pos = ipos = 0
    for n in meta.block_count:
        n = int(n)
        gaps[pos : pos + n] = ints[ipos : ipos + n]
        tfs[pos : pos + n] = ints[ipos + n : ipos + 2 * n]
        pos += n
        ipos += 2 * n
    doc_ids = np.cumsum(gaps, dtype=np.uint64).astype(np.int64)
    return doc_ids, tfs.astype(np.int32)


def decode_postings_many(
    parts: list[tuple[np.ndarray, "PostingMeta"]],
) -> tuple[np.ndarray, np.ndarray]:
    """Decode several posting regions (e.g. one term's salted sub-lists across
    segments), returning the concatenation in part order.  All-1-byte parts
    take the reshape fast path; the rest share a single varbyte pass."""
    if len(parts) == 1:
        return decode_postings(parts[0][0], parts[0][1])
    total_df = sum(m.df for _, m in parts)
    gaps = np.empty(total_df, dtype=np.uint64)
    tfs = np.empty(total_df, dtype=np.uint64)
    piece_start = []
    slow: list[tuple[int, np.ndarray, "PostingMeta"]] = []
    pos = 0
    for b, m in parts:
        piece_start.append(pos)
        nbytes = int(m.block_nbytes.sum())
        if nbytes == 2 * m.df and not bool(
            (m.block_nbytes != 2 * m.block_count).any()
        ):
            by = np.ascontiguousarray(b[:nbytes])
            p = pos
            ip = 0
            for n in m.block_count:
                n = int(n)
                gaps[p : p + n] = by[ip : ip + n]
                tfs[p : p + n] = by[ip + n : ip + 2 * n]
                p += n
                ip += 2 * n
        else:
            slow.append((pos, b[:nbytes], m))
        pos += m.df
    if slow:
        ints = vb_decode_all(np.concatenate([np.ascontiguousarray(b) for _, b, _ in slow]))
        ipos = 0
        for p, _, m in slow:
            for n in m.block_count:
                n = int(n)
                gaps[p : p + n] = ints[ipos : ipos + n]
                tfs[p : p + n] = ints[ipos + n : ipos + 2 * n]
                p += n
                ipos += 2 * n
    # per-piece delta chains: global cumsum, then subtract the running total
    # accumulated before each piece start
    csum = np.cumsum(gaps, dtype=np.uint64)
    starts = np.asarray(piece_start, dtype=np.int64)
    base = np.zeros(len(parts), dtype=np.uint64)
    base[1:] = csum[starts[1:] - 1]
    counts = np.diff(np.append(starts, total_df))
    doc_ids = (csum - np.repeat(base, counts)).astype(np.int64)
    return doc_ids, tfs.astype(np.int32)


# ----------------------------------------------------------- positions ---
#
# Positional sidecar (opt-in, build_index(positions=True)): per posting, the
# WITHIN-DOC token positions of the term (0-based index into the analyzed
# token stream — the exact numbering pipelines._token_phrase_flags and the
# NEAR window kernel use), delta-encoded ([pos0, pos1-pos0, ...], varbyte)
# and stored in per-BLOCK regions aligned 1:1 with the posting blocks, so a
# range-restricted decode (block-max skipping, sharded engines) can decode
# positions for exactly the posting blocks it decodes.  Counts per posting
# are NOT stored — they are the tfs the posting decode already yields.
# Reference analogue: Milvus has no positional store at all (phrase queries
# are impossible there); Lucene's .prx file plays this role.

def encode_positions(
    tfs: np.ndarray, flat_pos: np.ndarray, block_count: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Encode one term's per-posting position lists -> (blob, block_pos_nbytes).

    ``flat_pos``: positions of all postings concatenated in posting order,
    strictly ascending within each posting; ``tfs`` gives the per-posting
    counts; ``block_count`` is the posting-block layout (PostingMeta) the
    regions must align with."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total != len(flat_pos):
        raise ValueError(f"positions/tf mismatch: {len(flat_pos)} vs {total}")
    pos = np.ascontiguousarray(flat_pos, dtype=np.uint64)
    # per-posting delta chains in one vectorized pass: subtract the previous
    # position everywhere, then overwrite each posting's first slot with its
    # absolute position
    deltas = np.empty(total, dtype=np.uint64)
    if total:
        deltas[0] = pos[0]
        np.subtract(pos[1:], pos[:-1], out=deltas[1:])
        starts = np.zeros(len(tfs), dtype=np.int64)
        np.cumsum(tfs[:-1], out=starts[1:])
        deltas[starts] = pos[starts]
    # ONE global varbyte pass; per-block region sizes come from the per-value
    # byte counts (same formula vb_encode uses), segment-summed per block —
    # no per-block encode calls (a hot term has df/128 blocks)
    blob = vb_encode(deltas)
    nb = np.ones(total, dtype=np.int64)
    for k in range(1, 10):
        nb += (deltas >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    # block i's region covers the positions of its postings: cumulative
    # position count at each block end -> cumulative byte count -> diff
    bc = np.asarray(block_count, dtype=np.int64)
    post_ends = np.cumsum(bc)  # posting index one past each block
    tf_csum = np.concatenate([[0], np.cumsum(tfs)])
    nb_csum = np.concatenate([[0], np.cumsum(nb)])
    block_pos_nbytes = np.diff(
        np.concatenate([[0], nb_csum[tf_csum[post_ends]]])
    ).astype(np.int32)
    if int(block_pos_nbytes.sum()) != len(blob):
        # not an assert: this invariant guards the on-disk sidecar layout
        # and must hold under python -O too
        raise ValueError(
            f"position region sizes ({int(block_pos_nbytes.sum())}) disagree "
            f"with encoded blob ({len(blob)} bytes)"
        )
    return blob, block_pos_nbytes


def decode_positions_range(
    blob: np.ndarray, block_pos_nbytes: np.ndarray, tfs: np.ndarray,
    b_lo: int, b_hi: int,
) -> np.ndarray:
    """Decode position lists for posting blocks [b_lo, b_hi) -> flat int64
    positions (per-posting counts = ``tfs``, the tfs decoded from the SAME
    block range).  Each block's region is self-contained (first delta of a
    posting is absolute), so any contiguous range decodes alone."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = int(block_pos_nbytes[:b_lo].sum())
    nbytes = int(block_pos_nbytes[b_lo:b_hi].sum())
    region = np.ascontiguousarray(blob[off : off + nbytes])
    if nbytes == total:  # every delta one byte — the bytes ARE the deltas
        deltas = region.astype(np.uint64)
    else:
        deltas = vb_decode_all(region)
        if len(deltas) != total:
            raise ValueError(
                f"corrupt position region: {len(deltas)} ints, expected {total}"
            )
    # undo per-posting delta chains: global cumsum minus the running total
    # accumulated before each posting start (decode_postings_many's trick)
    csum = np.cumsum(deltas, dtype=np.uint64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    base = np.zeros(len(tfs), dtype=np.uint64)
    base[1:] = csum[starts[1:] - 1]
    return (csum - np.repeat(base, tfs)).astype(np.int64)


def take_slices(flat: np.ndarray, counts: np.ndarray,
                sel: np.ndarray) -> np.ndarray:
    """Gather variable-length slices: ``flat`` holds len(counts) concatenated
    slices (slice i has ``counts[i]`` elements); return the concatenation of
    the slices indexed by ``sel``, in ``sel`` order — fully vectorized (the
    reorder/filter primitive for per-posting position lists)."""
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=starts[1:])
    lens = counts[sel]
    total = int(lens.sum())
    if total == 0:
        return flat[:0]
    out_starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=out_starts[1:])
    idx = (np.repeat(starts[sel], lens)
           + np.arange(total, dtype=np.int64)
           - np.repeat(out_starts, lens))
    return flat[idx]


def decode_block(
    blob: np.ndarray, meta: PostingMeta, i: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode block ``i`` alone (for WAND skipping) -> (doc_ids, tfs)."""
    off = int(meta.block_nbytes[:i].sum())
    n = int(meta.block_count[i])
    g, c1 = vb_decode(blob, n, off)
    t, _ = vb_decode(blob, n, off + c1)
    base = np.uint64(meta.block_last_docid[i - 1]) if i > 0 else np.uint64(0)
    doc_ids = (base + np.cumsum(g, dtype=np.uint64)).astype(np.int64)
    return doc_ids, t.astype(np.int32)


def decode_block_range(
    blob: np.ndarray, meta: PostingMeta, b_lo: int, b_hi: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode the contiguous blocks [b_lo, b_hi) in one pass -> (ids, tfs).

    The global delta chain makes any contiguous range self-contained given
    the previous block's last doc id (``block_last_docid[b_lo-1]``) — this is
    the decode-on-demand primitive behind the block-max scorer: only blocks
    whose upper bound survives pruning ever get decoded."""
    if b_hi <= b_lo:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
    off = int(meta.block_nbytes[:b_lo].sum())
    nbytes = int(meta.block_nbytes[b_lo:b_hi].sum())
    counts = meta.block_count[b_lo:b_hi]
    total = int(counts.sum())
    region = blob[off : off + nbytes]
    gaps = np.empty(total, dtype=np.uint64)
    tfs = np.empty(total, dtype=np.uint64)
    if nbytes == 2 * total and not bool(
        (meta.block_nbytes[b_lo:b_hi] != 2 * counts).any()
    ):
        by = np.ascontiguousarray(region)
        p = ip = 0
        for n in counts:
            n = int(n)
            gaps[p : p + n] = by[ip : ip + n]
            tfs[p : p + n] = by[ip + n : ip + 2 * n]
            p += n
            ip += 2 * n
    else:
        ints = vb_decode_all(np.ascontiguousarray(region))
        if len(ints) != 2 * total:
            raise ValueError(
                f"corrupt block range: {len(ints)} ints, expected {2 * total}"
            )
        p = ip = 0
        for n in counts:
            n = int(n)
            gaps[p : p + n] = ints[ip : ip + n]
            tfs[p : p + n] = ints[ip + n : ip + 2 * n]
            p += n
            ip += 2 * n
    base = np.uint64(meta.block_last_docid[b_lo - 1]) if b_lo > 0 else np.uint64(0)
    doc_ids = (base + np.cumsum(gaps, dtype=np.uint64)).astype(np.int64)
    return doc_ids, tfs.astype(np.int32)
