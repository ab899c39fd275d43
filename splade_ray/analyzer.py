"""Code-aware analyzer: text -> terms, as vectorized Arrow kernels.

Plays the role of the reference's sparse-embedding analyzer (the milvus-model
English analyzer behind ``BM25SparseEmbedding``; reference call sites
ingest.py:120-125, main.py:64, eval.py:105) but code-aware per the north star:

  1. split camelCase boundaries:  ``getHTTPResponse2Code`` -> ``get HTTPResponse2 Code``
                                  -> ``get HTTP Response2 Code``
  2. lowercase
  3. split on runs of non-[a-z0-9] (snake_case, punctuation, unicode all split)
  4. optional language tagging:   ``def`` in a ``py`` file -> ``py:def``

The SAME rules are emitted as a DuckDB SQL fragment (``tokens_sql``) from the
same constants, so the engine and the SQL oracle cannot drift apart.  The
doc side and the query side share one implementation — the invariant the
reference gets by sharing a single embedding object (retrievers.py:35-53).

Everything here is stateless and batch-vectorized (pyarrow.compute kernels +
numpy); it is used inside ``map_batches(batch_format="pyarrow")`` stages.
Terms are ASCII [a-z0-9]+; non-ASCII codepoints act as separators (documented
corpus contract — consistent between the Arrow and SQL paths).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Shared constants — single source of truth for Python, Arrow and SQL paths.
CAMEL_1 = r"([a-z0-9])([A-Z])"  # lower/digit -> Upper boundary
CAMEL_2 = r"([A-Z]+)([A-Z][a-z])"  # acronym -> Word boundary (HTTPResponse)
SPLIT = r"[^a-z0-9]+"  # applied after lowercasing
LANG_SEP = ":"  # lang-tag separator: "py:def"

_CAMEL_1_RE = re.compile(CAMEL_1)
_CAMEL_2_RE = re.compile(CAMEL_2)
_SPLIT_RE = re.compile(SPLIT)


def tokens_sql(col: str) -> str:
    """DuckDB SQL expression producing the token list for a text column.

    Mirrors ``_split_tokens`` exactly (same regexes, same order).  Backslash
    group refs (\\1 \\2) are literal backslashes in SQL string literals.
    """
    camel = (
        f"regexp_replace(regexp_replace({col}, '{CAMEL_1}', '\\1 \\2', 'g'),"
        f" '{CAMEL_2}', '\\1 \\2', 'g')"
    )
    return (
        f"list_filter(string_split_regex(lower({camel}), '{SPLIT}'), x -> x <> '')"
    )


def tokens_py(text: str) -> list[str]:
    """Pure-Python reference tokenizer (oracle side; parity-tested vs Arrow)."""
    if text is None:
        return []
    t = _CAMEL_1_RE.sub(r"\1 \2", text)
    t = _CAMEL_2_RE.sub(r"\1 \2", t)
    return [tok for tok in _SPLIT_RE.split(t.lower()) if tok]


def _split_tokens(texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Vectorized rules 1-3: string column -> list<string> of tokens per row."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    t = pc.replace_substring_regex(texts, CAMEL_1, replacement=r"\1 \2")
    t = pc.replace_substring_regex(t, CAMEL_2, replacement=r"\1 \2")
    t = pc.utf8_lower(t)
    return pc.split_pattern_regex(t, SPLIT)


def _tokenize_ascii_bytes(texts: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Single-pass BYTE-level tokenizer for all-ASCII rows.

    The regex pipeline above copies the whole corpus ~4 times (two camel
    replaces, a lowercase, a split); on this memory-bandwidth-bound stage
    that traffic IS the cost.  This path computes token boundaries directly
    on the UTF-8 buffer (camel rules as per-position predicates, proven
    equivalent to the two sequential regex passes for ASCII: camel-1 splits
    at lower/digit->Upper, camel-2 before the last upper of an upper-run
    followed by a lower) and emits the flat token array ZERO-materialization:
    values = the lowercased alnum bytes, offsets from a cumsum.  Returns
    (flat tokens StringArray, parent row indices).  ONLY correct for ASCII
    input — callers must route rows containing bytes >= 0x80 to the regex
    path (unicode lowercasing can map non-ASCII to ASCII, e.g. Kelvin K).
    """
    n_rows = len(texts)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.offset != 0:
        texts = pa.concat_arrays([texts])
    buffers = texts.buffers()
    row_off = np.frombuffer(buffers[1], dtype=np.int32, count=n_rows + 1).astype(np.int64)
    nbytes = int(row_off[-1])
    if nbytes == 0:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8, count=nbytes)
    low = (data >= 97) & (data <= 122)
    upp = (data >= 65) & (data <= 90)
    dig = (data >= 48) & (data <= 57)
    alnum = low | upp | dig
    # shifted views with row-boundary sentinels: positions at a row START act
    # as if preceded by a separator; at a row END as if followed by one
    prev_low_dig = np.empty(nbytes, dtype=bool)
    prev_low_dig[0] = False
    prev_low_dig[1:] = low[:-1] | dig[:-1]
    prev_upp = np.empty(nbytes, dtype=bool)
    prev_upp[0] = False
    prev_upp[1:] = upp[:-1]
    prev_alnum = np.empty(nbytes, dtype=bool)
    prev_alnum[0] = False
    prev_alnum[1:] = alnum[:-1]
    next_low = np.empty(nbytes, dtype=bool)
    next_low[-1] = False
    next_low[:-1] = low[1:]
    starts_of_rows = row_off[:-1][row_off[:-1] < nbytes]
    prev_low_dig[starts_of_rows] = False
    prev_upp[starts_of_rows] = False
    prev_alnum[starts_of_rows] = False
    ends_of_rows = row_off[1:] - 1
    ends_of_rows = ends_of_rows[(ends_of_rows >= 0) & (ends_of_rows < nbytes)]
    # next_low at the last byte of each row must ignore the next row
    next_low[ends_of_rows] = False
    camel_a = prev_low_dig & upp
    camel_b = prev_upp & upp & next_low
    tok_start = alnum & (~prev_alnum | camel_a | camel_b)
    start_idx = np.flatnonzero(tok_start)
    if len(start_idx) == 0:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    # token ends pair 1:1 with starts (row-start alnum bytes are starts, so
    # a row boundary implies an end on the previous byte automatically)
    tok_end = np.empty(nbytes, dtype=bool)
    tok_end[:-1] = alnum[:-1] & (~alnum[1:] | tok_start[1:])
    tok_end[-1] = alnum[-1]
    end_idx = np.flatnonzero(tok_end)
    lengths = end_idx - start_idx + 1
    sel = np.flatnonzero(alnum)
    values = data[sel] + (upp[sel].astype(np.uint8) * 32)  # lowercase
    tok_off = np.zeros(len(start_idx) + 1, dtype=np.int32)
    np.cumsum(lengths, out=tok_off[1:])
    flat = pa.Array.from_buffers(
        pa.utf8(), len(start_idx),
        [None, pa.py_buffer(tok_off.tobytes()),
         pa.py_buffer(np.ascontiguousarray(values).tobytes())],
    )
    parents = (np.searchsorted(row_off, start_idx, side="right") - 1).astype(np.int64)
    return flat, parents


def _regex_flat(texts: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Regex-pipeline tokenization -> (flat tokens, parent row indices)."""
    lists = _split_tokens(texts)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = lists.flatten()
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents[keep.to_numpy(zero_copy_only=False)]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, parents


def _tokens_flat_inner(texts: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Route each row to the byte fast path (pure ASCII) or the regex path
    (any byte >= 0x80 — unicode lowercasing can differ, e.g. Kelvin K -> k),
    then restore ascending-parent order (downstream shingle construction
    relies on row-contiguous, row-ordered flat tokens)."""
    if texts.type != pa.utf8() or len(texts) == 0:
        return _regex_flat(texts)
    if texts.offset != 0:
        # sliced arrays share parent buffers; compact before raw-buffer reads
        texts = pa.concat_arrays([texts])
    buffers = texts.buffers()
    n_rows = len(texts)
    row_off = np.frombuffer(buffers[1], dtype=np.int32,
                            count=n_rows + 1).astype(np.int64)
    nbytes = int(row_off[-1])
    if nbytes == 0:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8, count=nbytes)
    bad_bytes = np.flatnonzero(data >= 128)
    if len(bad_bytes) == 0:
        return _tokenize_ascii_bytes(texts)
    bad_rows = np.unique(np.searchsorted(row_off, bad_bytes, side="right") - 1)
    good_mask = np.ones(n_rows, dtype=bool)
    good_mask[bad_rows] = False
    f1, p1 = _tokenize_ascii_bytes(texts.filter(pa.array(good_mask)))
    f2, p2 = _regex_flat(texts.take(pa.array(bad_rows)))
    good_idx = np.flatnonzero(good_mask)
    parents = np.concatenate([
        good_idx[p1] if len(p1) else p1,
        bad_rows[p2] if len(p2) else p2,
    ])
    flat = pa.concat_arrays([f1, f2])
    order = np.argsort(parents, kind="stable")
    return flat.take(pa.array(order)), parents[order]


def tokenize_flat(
    texts: pa.ChunkedArray | pa.Array,
    langs: pa.ChunkedArray | pa.Array | None = None,
) -> tuple[pa.Array, np.ndarray]:
    """Tokenize a string column -> (flat token array, parent row indices).

    ``langs`` (optional, aligned with ``texts``) switches on lang-tagging:
    every token becomes ``{lang}:{token}``.  Empty tokens (from leading /
    trailing separators) are dropped.  Returns (tokens: pa.StringArray,
    parents: np.int64 row index per token).  All-ASCII rows take the
    single-pass byte tokenizer (_tokenize_ascii_bytes); rows with any
    non-ASCII byte take the regex pipeline — identical output, parity-tested.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    flat, parents = _tokens_flat_inner(texts)
    if langs is not None:
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        langs = pc.fill_null(langs, "")
        lang_per_tok = langs.take(pa.array(parents))
        flat = pc.binary_join_element_wise(lang_per_tok, flat, LANG_SEP)
    return flat, parents


def doc_token_stats(
    texts: pa.ChunkedArray | pa.Array,
    langs: pa.ChunkedArray | pa.Array | None = None,
) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """Per-row unique-term stats: (terms list<string> lex-sorted, tfs list<int32>,
    doc_len int32 ndarray).  ``doc_len`` counts ALL token occurrences.

    Deterministic w.r.t. batch boundaries: per-row term lists are sorted
    lexicographically, independent of neighbouring rows in the batch.
    """
    n_rows = len(texts)
    flat, parents = tokenize_flat(texts, langs)
    return doc_token_stats_from_flat(flat, parents, n_rows)


def doc_token_stats_from_flat(
    flat: pa.Array, parents: np.ndarray, n_rows: int
) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """doc_token_stats over an ALREADY-tokenized flat stream — callers that
    also need the positional token stream (e.g. token-level phrase match)
    tokenize once and derive both from it."""
    doc_len = np.bincount(parents, minlength=n_rows).astype(np.int32)
    if len(flat) == 0:
        empty_terms = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_rows + 1, dtype=np.int32)), pa.array([], type=pa.string())
        )
        empty_tfs = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_rows + 1, dtype=np.int32)), pa.array([], type=pa.int32())
        )
        return empty_terms, empty_tfs, doc_len

    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary  # unique strings, first-appearance order
    # rank codes by lexicographic vocab order so per-doc lists sort by term
    order = pc.array_sort_indices(vocab).to_numpy(zero_copy_only=False)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[order] = np.arange(len(vocab))
    keys = parents * len(vocab) + rank[codes]
    uniq, counts = np.unique(keys, return_counts=True)  # sorted by (parent, term)
    pair_parent = uniq // len(vocab)
    pair_rank = uniq % len(vocab)
    pair_term_codes = order[pair_rank]  # back to vocab indices

    offsets = np.searchsorted(pair_parent, np.arange(n_rows + 1)).astype(np.int32)
    terms_flat = vocab.take(pa.array(pair_term_codes))
    terms = pa.ListArray.from_arrays(pa.array(offsets), terms_flat)
    tfs = pa.ListArray.from_arrays(pa.array(offsets), pa.array(counts.astype(np.int32)))
    return terms, tfs, doc_len


def doc_token_positions_from_flat(
    flat: pa.Array, parents: np.ndarray, n_rows: int
) -> tuple[pa.ListArray, pa.ListArray, np.ndarray, pa.ListArray]:
    """doc_token_stats_from_flat PLUS per-doc token positions.

    Returns (terms, tfs, doc_len, positions): ``positions`` is a
    list<int32> per doc of length doc_len holding the WITHIN-DOC 0-based
    token positions, grouped by term in the terms list's (lexicographic)
    order with ascending positions inside each term's group — i.e. the
    per-(doc, term) position list is the slice of ``positions`` whose
    length is that term's tf.  This is the numbering the token-phrase /
    NEAR verify kernels use (pipelines._token_phrase_flags).

    One pass: the dictionary encode, vocab lex-sort, and the single stable
    (parent, term)-key sort below yield BOTH the stats (run-change points
    replace doc_token_stats_from_flat's np.unique) and the position
    permutation — nothing is computed twice (this runs per staging batch
    over the whole corpus when positions=True)."""
    doc_len = np.bincount(parents, minlength=n_rows).astype(np.int32)
    if len(flat) == 0:
        zero32 = pa.array(np.zeros(n_rows + 1, dtype=np.int32))
        return (
            pa.ListArray.from_arrays(zero32, pa.array([], type=pa.string())),
            pa.ListArray.from_arrays(zero32, pa.array([], type=pa.int32())),
            doc_len,
            pa.ListArray.from_arrays(zero32, pa.array([], type=pa.int32())),
        )
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    lex = pc.array_sort_indices(vocab).to_numpy(zero_copy_only=False)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[lex] = np.arange(len(vocab))
    # ONE stable sort by (parent, lex term): runs give the per-(doc, term)
    # stats, the permutation groups positions by term with ascending
    # positions inside each group
    keys = parents * len(vocab) + rank[codes]
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    change = np.empty(len(sk), dtype=bool)
    change[0] = True
    np.not_equal(sk[1:], sk[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    uniq = sk[starts]
    counts = np.diff(np.append(starts, len(sk)))
    pair_parent = uniq // len(vocab)
    pair_rank = uniq % len(vocab)
    offsets = np.searchsorted(pair_parent, np.arange(n_rows + 1)) \
        .astype(np.int32)
    terms = pa.ListArray.from_arrays(
        pa.array(offsets), vocab.take(pa.array(lex[pair_rank])))
    tfs = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(counts.astype(np.int32)))
    row_start = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(doc_len[:-1], out=row_start[1:])
    pos_in_row = np.arange(len(parents), dtype=np.int64) - row_start[parents]
    pos_offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(doc_len, out=pos_offsets[1:])
    positions = pa.ListArray.from_arrays(
        pa.array(pos_offsets), pa.array(pos_in_row[order].astype(np.int32)))
    return terms, tfs, doc_len, positions


def analyze_query(query: str, lang: str | None = None, all_langs: list[str] | None = None) -> dict[str, int]:
    """Query-side analysis -> {term: qtf}.

    With lang-tagging active: a query with an explicit ``lang`` tags every
    token with it; an untagged query (lang None/empty) expands each token to
    one term per corpus language (``all_langs``), each with the token's qtf —
    i.e. the token matches in any language, scored with per-language idf.
    """
    toks = tokens_py(query)
    qtf: dict[str, int] = {}
    for tok in toks:
        if lang:
            keys = [f"{lang}{LANG_SEP}{tok}"]
        elif all_langs:
            keys = [f"{lg}{LANG_SEP}{tok}" for lg in all_langs]
        else:
            keys = [tok]
        for k in keys:
            qtf[k] = qtf.get(k, 0) + 1
    return qtf
