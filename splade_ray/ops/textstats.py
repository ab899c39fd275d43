"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting (winnowing).

All ``map_batches`` stages over a text column, with constants shared between
the Python and DuckDB-SQL sides (ops.contract).  Floats in outputs are
rounded to 9 dp on BOTH sides before comparison.

Vectorization: token_stats / quality_score / langid run entirely on Arrow
kernels + numpy segment reductions (tokenization via the SAME analyzer
kernels the index build uses — parity-tested against ``tokens_py``), so the
oracle contract is unchanged while the hot path has no per-row Python.
Fingerprinting supports two hash modes:

  * ``sha``   (default) — sha256-derived 63-bit k-gram hashes, reproducible
    in DuckDB; the oracle contract runs this mode.
  * ``mixer`` — vectorized splitmix64 over byte k-grams (one numpy pass per
    doc, no per-gram Python); the 100-TB path.  Same winnowing structure,
    different (non-SQL) hash values — bench.py reports the speedup.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analyzer import tokenize_flat, tokens_py  # noqa: F401 (tokens_py: tests)

MASK63 = (1 << 63) - 1

# language marker stopwords — shared with the SQL oracle (ops.contract)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en": ("the", "and", "of", "to", "is", "a", "in"),
    "es": ("el", "la", "los", "que", "y", "es", "una"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta"),
}
EN_STOPWORDS = LANG_MARKERS["en"]

FINGERPRINT_K = 8  # char k-gram width
FINGERPRINT_W = 4  # winnowing window (positions)


def _h63(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big") & MASK63


def _flat_tokens(t: pa.Table, text_col: str):
    """(flat token StringArray, parent row indices, n_rows) via the analyzer's
    Arrow kernels — identical token stream to tokens_py (parity-tested)."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, parents = tokenize_flat(texts)
    return flat, parents, len(texts)


def token_stats_batch(t: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_unique, max_tf, n_ws_tokens, n_chars).
    Arrow kernels + bincount segment reductions; no per-row Python."""
    flat, parents, n_rows = _flat_tokens(t, text_col)
    n_tokens = np.bincount(parents, minlength=n_rows).astype(np.int64)
    # unique terms + max tf per row: one lexsort over (parent, dict code)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    keys = parents * (len(enc.dictionary) + 1) + codes
    uniq, counts = np.unique(keys, return_counts=True)
    pair_parent = (uniq // (len(enc.dictionary) + 1)).astype(np.int64)
    n_unique = np.bincount(pair_parent, minlength=n_rows).astype(np.int64)
    max_tf = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(max_tf, pair_parent, counts)
    # whitespace tokens: RE2 \s+ split (same engine family as the SQL oracle)
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    ws_lists = pc.split_pattern_regex(texts, r"\s+")
    ws_flat = ws_lists.flatten()
    ws_parents = pc.list_parent_indices(ws_lists).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(ws_flat, "").to_numpy(zero_copy_only=False)
    n_ws = np.bincount(ws_parents[nonempty], minlength=n_rows).astype(np.int64)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t[id_col]
    return pa.table(
        {
            "doc_id": pc.cast(ids, pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "n_unique": pa.array(n_unique),
            "max_tf": pa.array(max_tf),
            "n_ws_tokens": pa.array(n_ws),
            "n_chars": pa.array(n_chars),
        }
    )


def quality_score_batch(t: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """(doc_id, stopword_ratio, mean_token_len, digit_ratio, quality).

    quality = stopword_ratio * 0.4 + clamp(mean_token_len / 10, 0, 1) * 0.3
              + (1 - digit_ratio) * 0.3   — an explainable heuristic in the
    C4/Gopher-rule family; the exact formula is mirrored in SQL.
    Vectorized: is_in / utf8_length / regex-match over the flat token array,
    segment sums by row via bincount.
    """
    flat, parents, n_rows = _flat_tokens(t, text_col)
    n = np.bincount(parents, minlength=n_rows).astype(np.float64)
    stop_mask = pc.is_in(
        flat, value_set=pa.array(sorted(EN_STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    sw_n = np.bincount(parents[stop_mask], minlength=n_rows)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    len_sum = np.bincount(parents, weights=tok_len, minlength=n_rows)
    dig_mask = pc.match_substring_regex(flat, "[0-9]").to_numpy(
        zero_copy_only=False
    )
    dg_n = np.bincount(parents[dig_mask], minlength=n_rows)
    safe_n = np.where(n > 0, n, 1.0)
    sw = np.where(n > 0, sw_n / safe_n, 0.0)
    mtl = np.where(n > 0, len_sum / safe_n, 0.0)
    dg = np.where(n > 0, dg_n / safe_n, 0.0)
    q = sw * 0.4 + np.minimum(mtl / 10.0, 1.0) * 0.3 + (1.0 - dg) * 0.3
    return pa.table(
        {
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "stopword_ratio": pa.array(np.round(sw, 9), type=pa.float64()),
            "mean_token_len": pa.array(np.round(mtl, 9), type=pa.float64()),
            "digit_ratio": pa.array(np.round(dg, 9), type=pa.float64()),
            "quality": pa.array(np.round(q, 9), type=pa.float64()),
        }
    )


def langid_batch(t: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(doc_id, pred_lang, marker_hits): argmax of per-language marker-token
    hits, ties broken by language code ascending (deterministic).  One is_in
    + bincount per language; argmax over the (rows, langs) hit matrix."""
    langs = sorted(LANG_MARKERS)
    flat, parents, n_rows = _flat_tokens(t, text_col)
    hits = np.zeros((n_rows, len(langs)), dtype=np.int64)
    for j, lg in enumerate(langs):
        mask = pc.is_in(
            flat, value_set=pa.array(sorted(LANG_MARKERS[lg]))
        ).to_numpy(zero_copy_only=False)
        hits[:, j] = np.bincount(parents[mask], minlength=n_rows)
    best = hits.argmax(axis=1)  # first max -> lang code ascending
    return pa.table(
        {
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "pred_lang": pa.array([langs[b] for b in best]),
            "marker_hits": pa.array(hits[np.arange(n_rows), best],
                                    type=pa.int64()),
        }
    )


HLL_REGISTER_BITS = 8  # m = 256 registers
HLL_M = 1 << HLL_REGISTER_BITS
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # standard bias constant for m>=128


def _hll_partial_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch HLL partial: (register, rho) rows, one per non-zero register.

    The sketch is MERGEABLE (register-wise max), so the shuffle moves at most
    256 rows per batch regardless of batch size — the canonical
    sketch-on-Ray shape.  Hash = sha-derived 63 bits (register = top 8 bits,
    rho = 56 - bit_length(low 55 bits)), all INTEGER math so the SQL oracle
    reproduces it bit-for-bit (no float log2 boundary hazards)."""
    flat, parents, n_rows = _flat_tokens(t, text_col)
    if len(flat) == 0:
        return pa.table(
            {"register": pa.array([], type=pa.int64()),
             "rho": pa.array([], type=pa.int64())}
        )
    vocab = pc.dictionary_encode(flat).dictionary.to_pylist()
    regs = np.zeros(HLL_M, dtype=np.int64)
    low_mask = (1 << (63 - HLL_REGISTER_BITS)) - 1
    for term in vocab:  # sha per unique term in the batch (like simhash)
        h = _h63(term)
        idx = h >> (63 - HLL_REGISTER_BITS)
        rest = h & low_mask
        rho = 56 - rest.bit_length() if rest else 56
        if rho > regs[idx]:
            regs[idx] = rho
    nz = np.flatnonzero(regs)
    return pa.table(
        {"register": pa.array(nz.astype(np.int64)),
         "rho": pa.array(regs[nz])}
    )


def hll_distinct_terms(ds, text_col: str = "text") -> pa.Table:
    """HyperLogLog estimate of the corpus's distinct-term count.

    One map_batches of bounded partials + a <=256-group Max aggregate; the
    driver folds 256 rows into the estimate.  Small-range correction
    (linear counting) applied exactly as in the SQL oracle."""
    from ray.data.aggregate import Max

    rows = (
        ds.map_batches(_hll_partial_batch, batch_format="pyarrow",
                       fn_kwargs={"text_col": text_col})
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
        .take_all()  # bounded: <= 256 rows
    )
    m_arr = np.zeros(HLL_M, dtype=np.int64)
    for r in rows:
        m_arr[r["register"]] = r["rho"]
    zeros = int((m_arr == 0).sum())
    denom = float(np.sum(np.power(2.0, -m_arr[m_arr > 0]))) + float(zeros)
    est = HLL_ALPHA * HLL_M * HLL_M / denom
    if est <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * np.log(HLL_M / zeros)
    return pa.table(
        {
            "hll_estimate": pa.array([round(float(est), 6)], type=pa.float64()),
            "nonzero_registers": pa.array([HLL_M - zeros], type=pa.int64()),
        }
    )


SAMPLE_MOD = 20  # content-hash sampling keeps h63(text) % SAMPLE_MOD == 0 (~5%)


def sample_by_content_batch(t: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id",
                            mod: int = SAMPLE_MOD) -> pa.Table:
    """Deterministic corpus sampling keyed on CONTENT hash: identical texts
    are sampled together (dedup-consistent — a near-dup analysis of the
    sample sees whole duplicate groups, never fragments).  sha-derived so
    the SQL oracle reproduces the exact subset; a non-oracle deployment
    swaps in the vectorized mixer like the other sha consumers."""
    texts = t[text_col].to_pylist()
    keep = np.fromiter(
        ((_h63(x or "") % mod) == 0 for x in texts), dtype=bool,
        count=len(texts),
    )
    return t.filter(pa.array(keep)).select([id_col, text_col])


def doclen_quantiles(ds, text_col: str = "text"):
    """Exact analyzer-token-count quantiles over the corpus WITHOUT a sort:
    token counts are small bounded ints, so a per-batch bincount partial +
    one tiny groupby yields the exact histogram; the driver reduces a
    few-hundred-row table to (n_docs, p50, p90, p99, max).  The 100-TB-safe
    exact-quantile shape for bounded-int columns (no all-to-all sort).

    Quantile definition (mirrored in SQL): sorted values v[0..n-1],
    q -> v[floor(q * (n-1))]."""
    from ray.data.aggregate import Sum

    def _hist_batch(t: pa.Table) -> pa.Table:
        flat, parents, n_rows = _flat_tokens(t, text_col)
        n_tokens = np.bincount(parents, minlength=n_rows).astype(np.int64)
        vals, counts = np.unique(n_tokens, return_counts=True)
        return pa.table(
            {"n_tokens": pa.array(vals),
             "n_docs": pa.array(counts.astype(np.int64))}
        )

    hist_rows = (
        ds.map_batches(_hist_batch, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()  # bounded: one row per distinct token count
    )
    vals = np.array([r["n_tokens"] for r in hist_rows], dtype=np.int64)
    counts = np.array([r["n_docs"] for r in hist_rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, counts = vals[order], counts[order]
    n = int(counts.sum())
    cum = np.cumsum(counts)

    def pick(q: float) -> int:
        idx = int(np.floor(q * (n - 1)))
        return int(vals[np.searchsorted(cum, idx + 1)])

    return pa.table(
        {
            "n_docs": pa.array([n], type=pa.int64()),
            "p50": pa.array([pick(0.5)], type=pa.int64()),
            "p90": pa.array([pick(0.9)], type=pa.int64()),
            "p99": pa.array([pick(0.99)], type=pa.int64()),
            "max_len": pa.array([int(vals[-1])], type=pa.int64()),
        }
    )


# GPT-2-family pre-tokenizer shape, restricted to lookahead-free RE2 syntax
# so Arrow (engine) and DuckDB (oracle) count the exact same matches:
# contractions | optional-space letters | optional-space digits |
# optional-space punctuation run | whitespace run.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def bpe_token_count_batch(t: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_bpe_tokens): count of BPE-ish pre-tokenizer matches — the
    LLM-training 'how many tokens is this corpus' estimator, one vectorized
    count_substring_regex call per batch."""
    texts = t[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n = pc.count_substring_regex(texts, BPE_PATTERN)
    return pa.table(
        {
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "n_bpe_tokens": pc.cast(n, pa.int64()),
        }
    )


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = (np.asarray(x, dtype=np.uint64)
         + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def fingerprint_batch(t: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", hash_mode: str = "sha") -> pa.Table:
    """Winnowing fingerprints: 63-bit hash of each k-gram, min over a sliding
    window of W positions, distinct minima per doc -> (doc_id, fingerprint).

    The rolling structure (window min over position-ordered k-gram hashes)
    is the Schleimer/Wilkerson/Aiken winnowing scheme.  ``hash_mode="sha"``
    hashes char k-grams with sha256 (SQL-reproducible; oracle mode);
    ``"mixer"`` hashes BYTE k-grams with one vectorized polynomial+splitmix64
    pass per doc — no per-gram Python call, ~an order of magnitude faster,
    not SQL-checkable (bench.py measures both).
    """
    if hash_mode == "mixer":
        return _fingerprint_mixer_batch(t, text_col, id_col)
    out_id, out_fp = [], []
    for text, did in zip(t[text_col].to_pylist(), t[id_col].to_pylist()):
        text = text or ""
        n = len(text) - FINGERPRINT_K + 1
        if n <= 0:
            continue
        hs = np.fromiter(
            (_h63(text[i : i + FINGERPRINT_K]) for i in range(n)),
            dtype=np.int64, count=n,
        )
        w = min(FINGERPRINT_W, len(hs))
        mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
        for fp in np.unique(mins):
            out_id.append(did)
            out_fp.append(int(fp))
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "fingerprint": pa.array(out_fp, type=pa.int64()),
        }
    )


def _run_expand(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """[s0, s0+1, ..., s0+c0-1, s1, ...] — vectorized run expansion."""
    total = int(counts.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    rep = np.repeat(starts, counts)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return rep + off


def _fingerprint_mixer_batch(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Whole-batch vectorized winnowing: ONE polynomial+splitmix64 pass over
    the concatenated byte buffer, window mins as W shifted elementwise mins,
    per-doc selection by run expansion, distinct via one lexsort.  No
    per-document Python beyond the initial encode."""
    k, w = FINGERPRINT_K, FINGERPRINT_W
    texts = t[text_col].to_pylist()
    ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    blobs = [(x or "").encode() for x in texts]
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    big = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    if len(big) < k:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "fingerprint": pa.array([], type=pa.int64())}
        )
    starts = np.cumsum(lens) - lens  # byte offset of each doc
    n_grams = np.maximum(lens - k + 1, 0)  # valid grams per doc
    powers = (np.uint64(256) ** np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        # polynomial gram hash as k shifted multiply-adds on the flat buffer
        # (no (N, k) gram matrix materialized)
        n_pos = len(big) - k + 1
        b64 = big.astype(np.uint64)
        acc = np.zeros(n_pos, dtype=np.uint64)
        for j in range(k):
            acc += b64[j : j + n_pos] * powers[j]
        hs = (mix64(acc) & np.uint64(MASK63)).astype(np.int64)
        # wm[j] = min(hs[j : j+w]) — full-W windows, global
        if len(hs) >= w:
            wm = hs[: len(hs) - w + 1].copy()
            for sh in range(1, w):
                np.minimum(wm, hs[sh : len(hs) - w + 1 + sh], out=wm)
        else:
            wm = np.array([], dtype=np.int64)
    # docs with n >= w: winnow outputs = wm at window starts S_d .. S_d+n-w
    full = n_grams >= w
    sel = _run_expand(starts[full], (n_grams[full] - w + 1))
    out_parent = np.repeat(np.flatnonzero(full), n_grams[full] - w + 1)
    out_val = wm[sel] if len(sel) else np.array([], dtype=np.int64)
    # docs with 0 < n < w: single fingerprint = min over their grams
    small = (n_grams > 0) & ~full
    if small.any():
        gsel = _run_expand(starts[small], n_grams[small])
        seg = np.repeat(np.arange(int(small.sum())), n_grams[small])
        smins = np.full(int(small.sum()), np.iinfo(np.int64).max)
        np.minimum.at(smins, seg, hs[gsel])
        out_parent = np.concatenate([out_parent, np.flatnonzero(small)])
        out_val = np.concatenate([out_val, smins])
    if len(out_parent) == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "fingerprint": pa.array([], type=pa.int64())}
        )
    # distinct (doc, fingerprint): lexsort + first-occurrence mask
    order = np.lexsort((out_val, out_parent))
    p, v = out_parent[order], out_val[order]
    keep = np.empty(len(p), dtype=bool)
    keep[0] = True
    keep[1:] = (p[1:] != p[:-1]) | (v[1:] != v[:-1])
    return pa.table(
        {
            "doc_id": pa.array(ids[p[keep]]),
            "fingerprint": pa.array(v[keep]),
        }
    )


def repetition_stats_batch(t: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, dup_bigram_frac, top_token_frac) — the
    Gopher/MassiveText repetition filters: the fraction of token bigrams
    that are repeats of an earlier bigram in the same doc
    (1 - distinct/total, 0 when < 2 tokens) and the share of the single
    most frequent token.  Vectorized: one flat tokenize, bigrams via a
    shifted element-wise join, per-row distinct counts via np.unique over
    packed (row, code) keys."""
    flat, parents, n_rows = _flat_tokens(t, text_col)
    n = np.bincount(parents, minlength=n_rows).astype(np.int64)
    dup_frac = np.zeros(n_rows, dtype=np.float64)
    top_frac = np.zeros(n_rows, dtype=np.float64)
    if len(flat):
        # top token fraction: distinct (row, token-code) counts
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(enc.dictionary) + 1
        keys = parents * v + codes
        uk, cnt = np.unique(keys, return_counts=True)
        rows_k = (uk // v).astype(np.int64)
        top = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(top, rows_k, cnt)
        top_frac = np.where(n > 0, top / np.where(n > 0, n, 1), 0.0)
        # bigrams: join adjacent tokens within a row
        if len(flat) >= 2:
            m = len(flat) - 1
            joined = pc.binary_join_element_wise(
                flat.slice(0, m), flat.slice(1, m), " ")
            valid = parents[:m] == parents[1:]
            bg = joined.filter(pa.array(valid))
            bp = parents[:m][valid]
            if len(bp):
                enc2 = pc.dictionary_encode(
                    bg.combine_chunks() if isinstance(bg, pa.ChunkedArray)
                    else bg)
                c2 = enc2.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                v2 = len(enc2.dictionary) + 1
                total_bg = np.bincount(bp, minlength=n_rows).astype(np.int64)
                distinct_bg = np.bincount(
                    (np.unique(bp * v2 + c2) // v2).astype(np.int64),
                    minlength=n_rows).astype(np.int64)
                safe = np.where(total_bg > 0, total_bg, 1)
                dup_frac = np.where(
                    total_bg > 0, 1.0 - distinct_bg / safe, 0.0)
    return pa.table({
        "doc_id": pc.cast(t[id_col], pa.int64()),
        "n_tokens": pa.array(n, type=pa.int64()),
        "dup_bigram_frac": pa.array(np.round(dup_frac, 9),
                                    type=pa.float64()),
        "top_token_frac": pa.array(np.round(top_frac, 9),
                                   type=pa.float64()),
    })


GOPHER_MIN_TOKENS = 30
GOPHER_MAX_TOKENS = 10_000
GOPHER_MAX_DUP_BIGRAM = 0.05
GOPHER_MAX_TOP_TOKEN = 0.125


def gopher_filter_batch(t: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Gopher/MassiveText-style composite quality FILTER decision: the
    repetition stats plus an auditable (keep, reason) pair — reason is
    the FIRST failing rule in fixed precedence (too_short, too_long,
    repetitive_bigrams, dominant_token), 'ok' otherwise.  Emitting the
    decision instead of dropping rows keeps the operator pure/auditable;
    apply with a downstream filter on ``keep``.  Flags are computed on
    the same rounded values the stats columns expose, so the decision is
    reproducible from the output alone."""
    r = repetition_stats_batch(t, text_col, id_col)
    n = r["n_tokens"].to_numpy(zero_copy_only=False)
    dup = r["dup_bigram_frac"].to_numpy(zero_copy_only=False)
    top = r["top_token_frac"].to_numpy(zero_copy_only=False)
    reason = np.full(len(n), "ok", dtype=object)
    # assign in REVERSE precedence: later writes win, so too_short ends
    # up strongest — matching the SQL CASE's first-match order
    reason[top > GOPHER_MAX_TOP_TOKEN] = "dominant_token"
    reason[dup > GOPHER_MAX_DUP_BIGRAM] = "repetitive_bigrams"
    reason[n > GOPHER_MAX_TOKENS] = "too_long"
    reason[n < GOPHER_MIN_TOKENS] = "too_short"
    r = r.append_column("keep", pa.array(reason == "ok"))
    return r.append_column("reason", pa.array(reason.tolist(),
                                              type=pa.string()))


# ------------------------------------------- unigram-LM quality scoring --

def _term_count_partial(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial collection-frequency counts (term, c) — the
    combiner side of the LM-estimation groupby, so the shuffle moves one
    row per DISTINCT term per batch, not one per token."""
    flat, parents, n_rows = _flat_tokens(t, text_col)
    if len(flat) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.int64())})
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
    return pa.table({"term": pa.array(enc.dictionary.to_pylist(),
                                      type=pa.string()),
                     "c": pa.array(cnt)})


class _UnigramNLL:
    """Actor-pool scorer: the unigram log-prob table is fetched from the
    object store ONCE per actor (`ray.put` broadcast) and built into a
    dict in ``__init__``; each batch does a unique-terms-only lookup and a
    bincount-weighted per-doc sum.  The CCNet perplexity-filter shape
    (Wenzek et al. 2020) with a unigram stand-in for KenLM — no model
    downloads in this environment.  OOV terms (possible when the LM was
    estimated on a sample) score ln(N), i.e. probability 1/N."""

    def __init__(self, lm_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        terms, nll, total = ray.get(lm_ref)
        self.lut = dict(zip(terms, nll.tolist()))
        self.oov = float(np.log(total)) if total > 0 else 0.0
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, parents, n_rows = _flat_tokens(t, self.text_col)
        n = np.bincount(parents, minlength=n_rows).astype(np.int64)
        s = np.zeros(n_rows, dtype=np.float64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            codes = enc.indices.to_numpy(zero_copy_only=False)
            vocab = enc.dictionary.to_pylist()
            vals = np.fromiter((self.lut.get(v, self.oov) for v in vocab),
                               dtype=np.float64, count=len(vocab))
            s = np.bincount(parents, weights=vals[codes], minlength=n_rows)
        mean_nll = np.where(n > 0, s / np.where(n > 0, n, 1), 0.0)
        return pa.table({
            "doc_id": pc.cast(t[self.id_col], pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
            "mean_nll": pa.array(np.round(mean_nll, 6), type=pa.float64()),
        })


def unigram_nll(ds, lm_ds=None, text_col: str = "text",
                id_col: str = "doc_id", concurrency: int = 4):
    """Per-doc mean negative log-probability under a corpus unigram LM —
    the perplexity quality filter of CCNet-style pipelines.

    Pass 1 estimates the LM: per-batch partial counts → a small
    ``groupby(term)`` (rows = vocab size, SUBLINEAR in corpus bytes — at
    100 TB pass a bounded sample as ``lm_ds`` instead of the full corpus,
    exactly as CCNet trains its LM on a Wikipedia sample).  The table is
    broadcast once via ``ray.put`` and pass 2 scores every doc through an
    actor pool.  Returns (doc_id, n_tokens, mean_nll)."""
    import ray
    from ray.data.aggregate import Sum

    src = ds if lm_ds is None else lm_ds
    cf_rows = (
        src.map_batches(_term_count_partial, batch_format="pyarrow",
                        fn_kwargs={"text_col": text_col})
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded: one row per distinct term
    )
    terms = [r["term"] for r in cf_rows]
    counts = np.array([r["c"] for r in cf_rows], dtype=np.float64)
    total = float(counts.sum())
    nll = -np.log(counts / total) if total > 0 else counts
    lm_ref = ray.put((terms, nll, total))
    return ds.map_batches(
        _UnigramNLL,
        fn_constructor_kwargs={"lm_ref": lm_ref, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )


def make_op(batch_fn, text_col: str = "text", id_col: str = "doc_id"):
    def op(ds):
        return ds.map_batches(
            batch_fn, batch_format="pyarrow",
            fn_kwargs={"text_col": text_col, "id_col": id_col},
        )

    return op


# interpolated bigram LM weights — explicit literals on BOTH sides of the
# oracle boundary (1 - 0.7 in float is 0.30000000000000004, not 0.3; the
# weights need not sum to exactly 1, they need to MATCH)
BIGRAM_LAM_B = 0.7
BIGRAM_LAM_U = 0.3


def _gram_count_partial(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial counts over unigrams AND ordered within-doc
    bigrams in ONE pass (bigrams render as 'w1 w2' — unambiguous, tokens
    never contain spaces).  The combiner side of the LM-estimation
    groupby: the shuffle moves one row per DISTINCT gram per batch."""
    flat, parents, n_rows = _flat_tokens(t, text_col)
    if len(flat) == 0:
        return pa.table({"gram": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.int64())})
    toks = flat.to_pylist()
    same = parents[1:] == parents[:-1]
    idx = np.nonzero(same)[0]
    grams = pa.array(toks + [f"{toks[i]} {toks[i + 1]}" for i in idx],
                     type=pa.string())
    enc = pc.dictionary_encode(grams)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
    return pa.table({"gram": pa.array(enc.dictionary.to_pylist(),
                                      type=pa.string()),
                     "c": pa.array(cnt)})


class _BigramNLL:
    """Actor-pool scorer for the interpolated bigram LM: count tables
    fetched from the object store ONCE per actor, dicts built in
    ``__init__`` (ST2/ST3).  Per position i >= 2,
    p = LAM_B·c(w_{i-1} w_i)/c(w_{i-1}) + LAM_U·c(w_i)/N and the doc
    scores mean(-ln p) over its bigram positions — the KenLM-shaped
    fluency filter one order up from unigram_nll.  When the LM was
    estimated on a sample, an unseen bigram contributes only its unigram
    leg and an unseen unigram backs off to 1/N (never zero probability);
    on a full-corpus LM (the oracle contract) neither path fires."""

    def __init__(self, lm_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        grams, counts, total = ray.get(lm_ref)
        self.uni: dict[str, float] = {}
        self.big: dict[str, float] = {}
        for g, c in zip(grams, counts):
            (self.big if " " in g else self.uni)[g] = float(c)
        self.total = float(total)

        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, parents, n_rows = _flat_tokens(t, self.text_col)
        nb = np.zeros(n_rows, dtype=np.int64)
        s = np.zeros(n_rows, dtype=np.float64)
        if len(flat) > 1:
            toks = flat.to_pylist()
            same = parents[1:] == parents[:-1]
            idx = np.nonzero(same)[0]
            if len(idx):
                w1 = [toks[i] for i in idx]
                w2 = [toks[i + 1] for i in idx]
                cb = np.fromiter(
                    (self.big.get(f"{a} {b}", 0.0)
                     for a, b in zip(w1, w2)),
                    dtype=np.float64, count=len(idx))
                cu1 = np.fromiter((self.uni.get(a, 0.0) for a in w1),
                                  dtype=np.float64, count=len(idx))
                cu2 = np.fromiter((self.uni.get(b, 1.0) for b in w2),
                                  dtype=np.float64, count=len(idx))
                big_leg = np.where(cu1 > 0.0,
                                   BIGRAM_LAM_B * cb
                                   / np.where(cu1 > 0.0, cu1, 1.0),
                                   0.0)
                p = big_leg + BIGRAM_LAM_U * cu2 / self.total
                nll = -np.log(p)
                par = parents[idx]
                nb = np.bincount(par, minlength=n_rows).astype(np.int64)
                s = np.bincount(par, weights=nll, minlength=n_rows)
        mean_nll = np.where(nb > 0, s / np.where(nb > 0, nb, 1), 0.0)
        return pa.table({
            "doc_id": pc.cast(t[self.id_col], pa.int64()),
            "n_bigrams": pa.array(nb, type=pa.int64()),
            "mean_nll": pa.array(np.round(mean_nll, 6), type=pa.float64()),
        })


def bigram_nll(ds, lm_ds=None, text_col: str = "text",
               id_col: str = "doc_id", concurrency: int = 2):
    """Per-doc mean negative log-probability under an interpolated BIGRAM
    LM (p = LAM_B·p_bigram + LAM_U·p_unigram) — the next-order fluency
    filter above unigram_nll, the closest in-container stand-in for the
    CCNet KenLM 5-gram perplexity gate.

    Pass 1 estimates both count tables in ONE corpus pass
    (_gram_count_partial → a gram-keyed groupby; rows = unigram + bigram
    vocabulary, SUBLINEAR in corpus bytes but larger than unigram_nll's —
    at 100 TB pass a bounded sample as ``lm_ds``, the CCNet convention).
    Broadcast once via ray.put; pass 2 scores every doc through an actor
    pool.  Returns (doc_id, n_bigrams, mean_nll)."""
    import ray
    from ray.data.aggregate import Sum

    src = ds if lm_ds is None else lm_ds
    rows = (
        src.map_batches(_gram_count_partial, batch_format="pyarrow",
                        fn_kwargs={"text_col": text_col})
        .groupby("gram")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded: one row per distinct gram
    )
    grams = [r["gram"] for r in rows]
    counts = [int(r["c"]) for r in rows]
    total = float(sum(c for g, c in zip(grams, counts) if " " not in g))
    if total <= 0:
        # an all-empty LM source would make every probability divide by
        # zero and emit -inf scores — refuse loudly instead
        raise ValueError("bigram_nll: the LM source contains no tokens")
    lm_ref = ray.put((grams, counts, total))
    # concurrency default leaves CPU headroom for the upstream
    # read/tokenize tasks (the tfidf_keywords small-session rule)
    return ds.map_batches(
        _BigramNLL,
        fn_constructor_kwargs={"lm_ref": lm_ref, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )
