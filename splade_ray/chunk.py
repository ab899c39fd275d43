"""Vectorized document chunkers (SURVEY M1 — the reference's
RecursiveCharacterTextSplitter role, ingest.py:86-97, chunk_size=1000 /
overlap=100).

Chunking is a full-corpus pass at 100 TB, so the hot path must not loop
Python per row.  Both chunkers follow the analyzer's two-path pattern
(analyzer.py): all-ASCII rows (byte == char) run entirely on the raw UTF-8
buffer — window arithmetic in numpy, chunk contents materialized by ONE
fancy-index gather into a fresh Arrow values buffer — while rows containing
any byte >= 0x80 fall back to the per-row Python walk (char slicing differs
from byte slicing there).  Outputs are bit-identical across paths
(parity-tested, and both SQL-oracled via sql.chunk_docs*_sql).

  * fixed-window: closed-form — chunk j of a doc is [j*step, j*step+size);
    fully vectorized for every row shape.
  * recursive (separator-aware): the greedy walk has a sequential dependence
    WITHIN a doc (next start depends on the last cut) but none across docs,
    so all docs advance in LOCKSTEP: one iteration emits chunk #i of every
    still-active doc, finding each doc's best separator with three
    searchsorted stabs into precomputed global separator-position arrays.
    Iteration count = max chunks per doc (~len/900), work per iteration is
    O(active docs) numpy — no per-char or per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHUNK_SIZE = 1000  # reference ingest.py:90-91 (chunk_size=1000, overlap=100)
CHUNK_OVERLAP = 100
CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP

# Separator priority ladder of the recursive chunker (reference uses
# RecursiveCharacterTextSplitter, default ladder ["\n\n", "\n", " ", ""]).
CHUNK_SEPARATORS = ("\n\n", "\n", " ")


def recursive_chunks_py(text: str, size: int = CHUNK_SIZE,
                        ov: int = CHUNK_OVERLAP) -> list[str]:
    """Greedy separator-aware chunking, deterministic and SQL-replicable.

    Window = next ``size`` chars; cut at the END of the LAST separator
    occurrence in the window (first separator in the priority ladder whose
    cut keeps progress, i.e. cut > ``ov``); hard cut at ``size`` if no
    separator qualifies.  Next chunk starts ``ov`` chars before the cut.
    The SQL oracle (sql.chunk_docs_recursive_sql) replays this walk as a
    recursive CTE; the vectorized lockstep walk below replays it in numpy.
    This function is the reference implementation (non-ASCII fallback +
    parity baseline)."""
    out = []
    s, n = 0, len(text)
    while True:
        if n - s <= size:
            out.append(text[s:])
            return out
        w = text[s : s + size]
        cut = size
        for sep in CHUNK_SEPARATORS:
            q = w.rfind(sep)
            if q >= 0 and q + len(sep) > ov:
                cut = q + len(sep)
                break
        out.append(w[:cut])
        s = s + cut - ov


# ------------------------------------------------------------- buffer utils --

def _compact_utf8(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    if texts.offset != 0:  # sliced arrays share parent buffers; compact first
        texts = pa.concat_arrays([texts])
    return texts


def _raw(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(row byte offsets int64[n+1], data bytes uint8) of a utf8 /
    large_utf8 array — the offsets buffer is int32 or int64 depending on
    the type; reading the wrong width silently corrupts every row."""
    off_dtype = (np.int64 if pa.types.is_large_string(texts.type)
                 else np.int32)
    bufs = texts.buffers()
    row_off = np.frombuffer(bufs[1], dtype=off_dtype,
                            count=len(texts) + 1).astype(np.int64)
    nbytes = int(row_off[-1])
    data = (np.frombuffer(bufs[2], dtype=np.uint8, count=nbytes)
            if nbytes else np.empty(0, dtype=np.uint8))
    return row_off, data


def _gather_slices(row_off: np.ndarray, data: np.ndarray, rows: np.ndarray,
                   starts: np.ndarray, lens: np.ndarray) -> pa.Array:
    """Materialize ``len(rows)`` substrings — row ``rows[i]``, byte range
    [starts[i], starts[i]+lens[i]) relative to the row — as a fresh Arrow
    values buffer (overlapping windows cannot share bytes: Arrow string
    values must be contiguous per offsets).

    The copy is ONE fancy index of the chunk start positions into a
    zero-copy sliding-window VIEW of the data (stride trick), i.e. an
    (n_chunks, max_len) matrix gather, trimmed to exact lengths by a
    boolean mask.  Index arrays stay O(n_chunks), never O(output bytes) —
    a per-output-byte index costs 8x the output in temporaries."""
    n = len(rows)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total >= 2**31:
        raise ValueError("chunk batch exceeds 2 GiB of output text; "
                         "lower the batch/block size")
    if n == 0 or total == 0:
        return pa.Array.from_buffers(
            pa.utf8(), n,
            [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(b"")],
        )
    w = int(lens.max())
    if bool((lens == w).all()):
        # equal-length chunks: ONE fancy index of the start positions into a
        # zero-copy sliding-window view == one (n, w) matrix memcpy
        data_p = np.concatenate([data, np.zeros(w, dtype=np.uint8)])
        windows = np.lib.stride_tricks.sliding_window_view(data_p, w)
        values = windows[row_off[rows] + starts].reshape(-1)
    else:
        # ragged lengths: one C-level memcpy per CHUNK (O(chunks) Python,
        # ~1 us each — measured faster and far more stable than numpy's
        # boolean-mask extraction over the padded matrix)
        values = np.empty(total, dtype=np.uint8)
        src = row_off[rows] + starts
        for i in range(n):
            o, l, s = out_off[i], lens[i], src[i]
            values[o : o + l] = data[s : s + l]
    # py_buffer wraps the ndarrays zero-copy (Arrow holds the reference);
    # the int32-offset overflow guard already ran up top, BEFORE the output
    # buffer was allocated/filled (an oversized batch fails fast and cheap)
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(out_off.astype(np.int32)),
         pa.py_buffer(np.ascontiguousarray(values))],
    )


def _assemble_chunks(texts: pa.Array, row_off: np.ndarray, data: np.ndarray,
                     rows: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray) -> pa.Array:
    """Chunk contents for (row, byte start, byte len) triples.

    Fast path: a chunk that covers its WHOLE row (docs shorter than the
    window — the overwhelmingly common case in document corpora) is the row
    string itself, emitted with one Arrow ``take`` instead of a byte copy.
    Only genuinely windowed chunks go through the gather."""
    row_len = row_off[rows + 1] - row_off[rows]
    whole = (starts == 0) & (lens == row_len)
    if bool(whole.all()):
        return texts.take(pa.array(rows))
    if whole.mean() < 0.25:
        # few whole rows: the split-merge's concat+take re-copies ALL output,
        # which costs more than just byte-copying the handful of whole rows
        return _gather_slices(row_off, data, rows, starts, lens)
    w_idx = np.flatnonzero(whole)
    g_idx = np.flatnonzero(~whole)
    arr_w = texts.take(pa.array(rows[w_idx]))
    arr_g = _gather_slices(row_off, data, rows[g_idx], starts[g_idx],
                           lens[g_idx])
    perm = np.empty(len(rows), dtype=np.int64)
    perm[w_idx] = np.arange(len(w_idx))
    perm[g_idx] = len(w_idx) + np.arange(len(g_idx))
    return pa.concat_arrays([arr_w, arr_g]).take(pa.array(perm))


def _ascii_row_mask(row_off: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Boolean per row: True iff the row contains no byte >= 0x80."""
    n_rows = len(row_off) - 1
    mask = np.ones(n_rows, dtype=bool)
    bad = np.flatnonzero(data >= 128)
    if len(bad):
        mask[np.unique(np.searchsorted(row_off, bad, side="right") - 1)] = False
    return mask


# ------------------------------------------------------------ fixed windows --

def _n_fixed_chunks(lens: np.ndarray, size: int, step: int, ov: int) -> np.ndarray:
    # ceil((len - ov) / step), at least 1 (empty docs emit one empty chunk)
    return np.maximum(1, -((ov - lens) // step)).astype(np.int64)


def chunk_fixed_batch(t: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id", size: int = CHUNK_SIZE,
                      overlap: int = CHUNK_OVERLAP) -> pa.Table:
    """Fixed-window chunker: (doc_id, chunk_id, chunk) rows, chunk j =
    text[j*step : j*step + size].  Vectorized end to end for ASCII rows;
    per-row Python slicing only for rows with non-ASCII bytes."""
    step = size - overlap
    texts = _compact_utf8(t[text_col])
    ids = pc.cast(t[id_col], pa.int64())
    n_rows = len(texts)
    if n_rows == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "chunk_id": pa.array([], type=pa.int64()),
                         "chunk": pa.array([], type=pa.string())})
    row_off, data = _raw(texts)
    ascii_rows = _ascii_row_mask(row_off, data)
    if bool(ascii_rows.all()):
        lens = np.diff(row_off)  # byte == char: skip the utf8_length scan
    else:
        lens = pc.utf8_length(texts).to_numpy(
            zero_copy_only=False).astype(np.int64)
    n_chunks = _n_fixed_chunks(lens, size, step, overlap)
    doc_rep = np.repeat(np.arange(n_rows, dtype=np.int64), n_chunks)
    csum = np.cumsum(n_chunks)
    chunk_id = np.arange(int(csum[-1]), dtype=np.int64) - np.repeat(
        csum - n_chunks, n_chunks)
    starts = chunk_id * step
    clens = np.minimum(size, lens[doc_rep] - starts)

    if bool(ascii_rows.all()):
        content = _assemble_chunks(texts, row_off, data, doc_rep, starts,
                                   clens)
    else:
        good = ascii_rows[doc_rep]
        content_a = _assemble_chunks(texts, row_off, data, doc_rep[good],
                                     starts[good], clens[good])
        bad_idx = np.flatnonzero(~good)
        content_b = pa.array(
            [texts[int(doc_rep[i])].as_py()[int(starts[i]):
                                            int(starts[i] + clens[i])]
             for i in bad_idx],
            type=pa.string(),
        )
        perm = np.empty(len(doc_rep), dtype=np.int64)
        perm[np.flatnonzero(good)] = np.arange(int(good.sum()))
        perm[bad_idx] = int(good.sum()) + np.arange(len(bad_idx))
        content = pa.concat_arrays([content_a, content_b]).take(pa.array(perm))
    return pa.table(
        {
            "doc_id": ids.take(pa.array(doc_rep)),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "chunk": content,
        }
    )


# -------------------------------------------------- recursive, lockstep walk --

def chunk_recursive_batch(t: pa.Table, *, text_col: str = "text",
                          id_col: str = "doc_id", size: int = CHUNK_SIZE,
                          ov: int = CHUNK_OVERLAP) -> pa.Table:
    """Separator-aware recursive chunker (exact ``recursive_chunks_py``
    semantics), ASCII rows advanced in lockstep:

      * separator occurrences are found ONCE per batch as three sorted
        global-byte-position arrays (``\\n\\n`` / ``\\n`` / space);
      * each iteration emits chunk #i of every still-active doc: finished
        docs (remaining <= size) take their tail; the rest pick the last
        qualifying separator in their window with one searchsorted per
        ladder rung, falling through the priority ladder vectorized.
    """
    texts = _compact_utf8(t[text_col])
    ids = pc.cast(t[id_col], pa.int64())
    n_rows = len(texts)
    if n_rows == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "chunk_id": pa.array([], type=pa.int64()),
                         "chunk": pa.array([], type=pa.string())})
    row_off, data = _raw(texts)
    ascii_rows = _ascii_row_mask(row_off, data)

    parts: list[pa.Table] = []
    a_rows = np.flatnonzero(ascii_rows)
    if len(a_rows):
        def _sep_positions():
            """Global separator positions (sorted), computed LAZILY — a batch
            of all-single-chunk docs (the common corpus shape) never pays the
            three full-buffer scans.  A "\\n\\n" straddling a row boundary is
            NOT an occurrence: pos+1 must lie inside the same row."""
            nl = data == 10
            p1 = np.flatnonzero(nl)
            if len(p1):
                row_of = np.searchsorted(row_off, p1, side="right") - 1
                nxt_in_row = p1 + 1 < row_off[row_of + 1]
                has_nl_next = np.zeros(len(p1), dtype=bool)
                ok = p1 + 1 < len(data)
                has_nl_next[ok] = nl[p1[ok] + 1]
                p2 = p1[nxt_in_row & has_nl_next]
            else:
                p2 = p1
            p0 = np.flatnonzero(data == 32)
            return ((p2, 2), (p1, 1), (p0, 1))

        seps = None
        act = a_rows.copy()  # active doc rows
        s = row_off[act].copy()  # current global byte position per doc
        ends = row_off[1:]  # per-row end (indexed by row id)
        out_rows: list[np.ndarray] = []
        out_starts: list[np.ndarray] = []
        out_lens: list[np.ndarray] = []
        while len(act):
            rem = ends[act] - s
            fin = rem <= size
            if bool(fin.any()):
                out_rows.append(act[fin])
                out_starts.append(s[fin])
                out_lens.append(rem[fin])
                act, s = act[~fin], s[~fin]
                if not len(act):
                    break
            if seps is None:
                seps = _sep_positions()
            cut = np.full(len(act), size, dtype=np.int64)
            undecided = np.ones(len(act), dtype=bool)
            for pos, sl in seps:
                if not bool(undecided.any()) or not len(pos):
                    continue
                su = s[undecided]
                # last occurrence fully inside the window [s, s+size):
                # q <= s + size - sl; qualifies iff cut = q - s + sl > ov
                idx = np.searchsorted(pos, su + (size - sl), side="right") - 1
                ok = idx >= 0
                q = np.where(ok, pos[np.maximum(idx, 0)], -1)
                ok &= (q - su + sl > ov) & (q >= su)  # q >= su guards ov < sl
                tgt = np.flatnonzero(undecided)[ok]
                cut[tgt] = q[ok] - s[tgt] + sl
                undecided[tgt] = False
            out_rows.append(act)
            out_starts.append(s.copy())
            out_lens.append(cut)
            s = s + cut - ov
        rows = np.concatenate(out_rows)
        gstarts = np.concatenate(out_starts)
        glens = np.concatenate(out_lens)
        # chunk order within a doc == iteration order == ascending start;
        # stable sort by row groups chunks per doc in emission order
        order = np.lexsort((gstarts, rows))
        rows, gstarts, glens = rows[order], gstarts[order], glens[order]
        grp_first = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
        chunk_id = np.arange(len(rows), dtype=np.int64) - np.repeat(
            grp_first, np.diff(np.r_[grp_first, len(rows)]))
        content = _assemble_chunks(texts, row_off, data, rows,
                                   gstarts - row_off[rows], glens)
        parts.append(pa.table(
            {"doc_id": ids.take(pa.array(rows)),
             "chunk_id": pa.array(chunk_id, type=pa.int64()),
             "chunk": content}
        ))

    b_rows = np.flatnonzero(~ascii_rows)
    if len(b_rows):
        out_id, out_cid, out_chunk = [], [], []
        id_np = ids.to_numpy(zero_copy_only=False)
        for r in b_rows:
            for j, ch in enumerate(
                recursive_chunks_py(texts[int(r)].as_py() or "", size, ov)
            ):
                out_id.append(int(id_np[r]))
                out_cid.append(j)
                out_chunk.append(ch)
        parts.append(pa.table(
            {"doc_id": pa.array(out_id, type=pa.int64()),
             "chunk_id": pa.array(out_cid, type=pa.int64()),
             "chunk": pa.array(out_chunk, type=pa.string())}
        ))
    if not parts:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "chunk_id": pa.array([], type=pa.int64()),
                         "chunk": pa.array([], type=pa.string())})
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]
