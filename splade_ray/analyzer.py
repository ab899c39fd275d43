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


def tokenize_flat(
    texts: pa.ChunkedArray | pa.Array,
    langs: pa.ChunkedArray | pa.Array | None = None,
) -> tuple[pa.Array, np.ndarray]:
    """Tokenize a string column -> (flat token array, parent row indices).

    ``langs`` (optional, aligned with ``texts``) switches on lang-tagging:
    every token becomes ``{lang}:{token}``.  Empty tokens (from leading /
    trailing separators) are dropped.  Returns (tokens: pa.StringArray,
    parents: np.int64 row index per token).
    """
    lists = _split_tokens(texts)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = lists.flatten()
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents[keep.to_numpy(zero_copy_only=False)]
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
