"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting (winnowing).

All pure vectorized-enough ``map_batches`` stages over a text column, with
constants shared between the Python and DuckDB-SQL sides (ops.contract).
Floats in outputs are rounded to 9 dp on BOTH sides before comparison.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analyzer import tokens_py

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


def token_stats_batch(t: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_unique, max_tf, n_ws_tokens, n_chars)."""
    out = {k: [] for k in
           ("doc_id", "n_tokens", "n_unique", "max_tf", "n_ws_tokens", "n_chars")}
    for text, did in zip(t[text_col].to_pylist(), t[id_col].to_pylist()):
        text = text or ""
        toks = tokens_py(text)
        tf: dict[str, int] = {}
        for tok in toks:
            tf[tok] = tf.get(tok, 0) + 1
        out["doc_id"].append(did)
        out["n_tokens"].append(len(toks))
        out["n_unique"].append(len(tf))
        out["max_tf"].append(max(tf.values()) if tf else 0)
        out["n_ws_tokens"].append(len(text.split()))
        out["n_chars"].append(len(text))
    return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})


def quality_score_batch(t: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """(doc_id, stopword_ratio, mean_token_len, digit_ratio, quality).

    quality = stopword_ratio * 0.4 + clamp(mean_token_len / 10, 0, 1) * 0.3
              + (1 - digit_ratio) * 0.3   — an explainable heuristic in the
    C4/Gopher-rule family; the exact formula is mirrored in SQL.
    """
    rows = {k: [] for k in
            ("doc_id", "stopword_ratio", "mean_token_len", "digit_ratio", "quality")}
    stop = set(EN_STOPWORDS)
    for text, did in zip(t[text_col].to_pylist(), t[id_col].to_pylist()):
        toks = tokens_py(text or "")
        n = len(toks)
        sw = sum(1 for x in toks if x in stop) / n if n else 0.0
        mtl = sum(len(x) for x in toks) / n if n else 0.0
        dg = sum(1 for x in toks if any(c.isdigit() for c in x)) / n if n else 0.0
        q = sw * 0.4 + min(mtl / 10.0, 1.0) * 0.3 + (1.0 - dg) * 0.3
        rows["doc_id"].append(did)
        rows["stopword_ratio"].append(round(sw, 9))
        rows["mean_token_len"].append(round(mtl, 9))
        rows["digit_ratio"].append(round(dg, 9))
        rows["quality"].append(round(q, 9))
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "stopword_ratio": pa.array(rows["stopword_ratio"], type=pa.float64()),
            "mean_token_len": pa.array(rows["mean_token_len"], type=pa.float64()),
            "digit_ratio": pa.array(rows["digit_ratio"], type=pa.float64()),
            "quality": pa.array(rows["quality"], type=pa.float64()),
        }
    )


def langid_batch(t: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(doc_id, pred_lang, marker_hits): argmax of per-language marker-token
    hits, ties broken by language code ascending (deterministic)."""
    langs = sorted(LANG_MARKERS)
    sets = {lg: set(LANG_MARKERS[lg]) for lg in langs}
    out_id, out_lang, out_hits = [], [], []
    for text, did in zip(t[text_col].to_pylist(), t[id_col].to_pylist()):
        toks = tokens_py(text or "")
        best_lang, best_hits = langs[0], -1
        for lg in langs:
            hits = sum(1 for x in toks if x in sets[lg])
            if hits > best_hits:
                best_lang, best_hits = lg, hits
        out_id.append(did)
        out_lang.append(best_lang)
        out_hits.append(best_hits)
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "pred_lang": pa.array(out_lang),
            "marker_hits": pa.array(out_hits, type=pa.int64()),
        }
    )


def fingerprint_batch(t: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Winnowing fingerprints: sha-63 of each char k-gram, min over a sliding
    window of W positions, distinct minima per doc -> (doc_id, fingerprint).

    The rolling structure (window min over position-ordered k-gram hashes)
    is the Schleimer/Wilkerson/Aiken winnowing scheme; sha-based hashes keep
    it SQL-reproducible.
    """
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
        w = min(FINGERPRINT_W, n)
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


def make_op(batch_fn, text_col: str = "text", id_col: str = "doc_id"):
    def op(ds):
        return ds.map_batches(
            batch_fn, batch_format="pyarrow",
            fn_kwargs={"text_col": text_col, "id_col": id_col},
        )

    return op
