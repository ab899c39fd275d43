"""Driver-contract entries for the training-data operators (ops.*).

Ray callables + DuckDB oracle SQL, generated from the SAME constants the
operators use (shingle width, number of permutations, marker stopwords,
fingerprint k/w, thresholds).  All run on the driver's raw ``documents`` /
``embeddings`` tables (their own doc_id / vec_id — no corpus mapping needed
here).  Hash functions are sha256-derived 63-bit ints on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

from ..analyzer import tokens_sql
from . import dedup, events, similarity, textstats

H63 = (
    "(('0x' || substr(sha256({expr}), 1, 16))::UBIGINT"
    " & 9223372036854775807)::BIGINT"
)

NEARDUP_COS = 0.45  # picked so the driver's embeddings yield non-empty pairs
JACCARD_T = 0.8
ANN_K = 10
ANN_QUERY_VECS = 5  # vec_id < 5 are the query vectors
EMB_DIM = 64  # driver embeddings are 64-dim at every sf (TESTDATA.md tables)


def _docs_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vectors(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    keep = ids < ANN_QUERY_VECS
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[keep]).astype(np.float64)
    return ids[keep], mat


# ------------------------------------------------------------- ray side ----

def q_dedup_exact(sf_dir: str):
    return dedup.exact_dedup(_docs_ds(sf_dir))


def q_dedup_apply(sf_dir: str):
    return dedup.exact_dedup_apply(_docs_ds(sf_dir))


def dedup_apply_sql() -> str:
    return """
SELECT d.doc_id, d.text
FROM documents d
JOIN (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM documents GROUP BY sha256(text)) k USING (doc_id)"""


def q_minhash_lsh_pairs(sf_dir: str):
    return dedup.minhash_lsh_pairs(_docs_ds(sf_dir))


def q_simhash(sf_dir: str):
    return dedup.simhash63(_docs_ds(sf_dir))


def q_ngram_jaccard_pairs(sf_dir: str):
    return dedup.ngram_jaccard_pairs(_docs_ds(sf_dir), threshold=JACCARD_T)


def q_token_stats(sf_dir: str):
    return textstats.make_op(textstats.token_stats_batch)(_docs_ds(sf_dir))


def q_quality_score(sf_dir: str):
    return textstats.make_op(textstats.quality_score_batch)(_docs_ds(sf_dir))


def q_repetition_stats(sf_dir: str):
    """Gopher/MassiveText repetition filters: per doc, the duplicate
    token-bigram fraction and the single most frequent token's share."""
    return textstats.make_op(
        textstats.repetition_stats_batch)(_docs_ds(sf_dir))


def q_gopher_filter(sf_dir: str):
    """Gopher-style composite quality filter decision: repetition stats
    plus auditable (keep, reason) under fixed rule precedence."""
    return textstats.make_op(
        textstats.gopher_filter_batch)(_docs_ds(sf_dir))


def q_unigram_nll(sf_dir: str):
    """CCNet-style unigram-LM perplexity quality score (mean negative
    log-prob per doc; LM estimated from the corpus itself here)."""
    return textstats.unigram_nll(_docs_ds(sf_dir), concurrency=2)


def q_langid(sf_dir: str):
    return textstats.make_op(textstats.langid_batch)(_docs_ds(sf_dir))


def q_fingerprints(sf_dir: str):
    return textstats.make_op(textstats.fingerprint_batch)(_docs_ds(sf_dir))


def q_bpe_token_count(sf_dir: str):
    return textstats.make_op(textstats.bpe_token_count_batch)(_docs_ds(sf_dir))


def q_sample_by_content(sf_dir: str):
    return _docs_ds(sf_dir).map_batches(
        textstats.sample_by_content_batch, batch_format="pyarrow"
    )


def sample_by_content_sql() -> str:
    h = H63.format(expr="coalesce(text, '')")
    return f"""
SELECT doc_id, text FROM documents
WHERE {h} % {textstats.SAMPLE_MOD} = 0"""


def q_doclen_quantiles(sf_dir: str):
    return textstats.doclen_quantiles(_docs_ds(sf_dir))


def q_hll_distinct_terms(sf_dir: str):
    return textstats.hll_distinct_terms(_docs_ds(sf_dir))


def hll_distinct_terms_sql() -> str:
    """Bit-exact HLL replay: same sha-derived hash split (top 8 bits ->
    register, rho = 56 - bit_length(low 55 bits) via printf('%b')), register
    max, harmonic estimate + linear-counting correction."""
    m = textstats.HLL_M
    bits = textstats.HLL_REGISTER_BITS
    h = H63.format(expr="term")
    alpha = repr(textstats.HLL_ALPHA)
    return f"""
WITH {_DTOK},
terms AS (SELECT DISTINCT term FROM dtok),
hashes AS (SELECT {h} AS h FROM terms),
parts AS (
  SELECT h >> {63 - bits} AS register,
         h & ((CAST(1 AS BIGINT) << {63 - bits}) - 1) AS rest
  FROM hashes
),
rhos AS (
  SELECT register,
         CASE WHEN rest = 0 THEN 56
              ELSE 56 - length(printf('%b', rest)) END AS rho
  FROM parts
),
regs AS (SELECT register, max(rho) AS mrho FROM rhos GROUP BY register),
agg AS (
  SELECT sum(power(2e0, -mrho)) + ({m} - count(*)) * 1e0 AS denom,
         {m} - count(*) AS zeros,
         CAST(count(*) AS BIGINT) AS nonzero
  FROM regs
)
SELECT round(CASE WHEN ({alpha}e0 * {m} * {m} / denom) <= 2.5e0 * {m}
                   AND zeros > 0
              THEN {m} * ln({m} * 1e0 / zeros)
              ELSE {alpha}e0 * {m} * {m} / denom END, 6) AS hll_estimate,
       nonzero AS nonzero_registers
FROM agg"""


def doclen_quantiles_sql() -> str:
    def pick(q: str) -> str:
        return (f"(SELECT n_tokens FROM ord WHERE rn = "
                f"CAST(floor({q} * (m.n - 1)) AS BIGINT))")

    return f"""
WITH {_DTOK}, {_DPOST},
agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens FROM dpost GROUP BY doc_id
),
lens AS (
  SELECT coalesce(a.n_tokens, 0) AS n_tokens
  FROM documents d LEFT JOIN agg a USING (doc_id)
),
ord AS (
  SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) - 1 AS rn FROM lens
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lens)
SELECT m.n AS n_docs,
       {pick('0.5e0')} AS p50,
       {pick('0.9e0')} AS p90,
       {pick('0.99e0')} AS p99,
       (SELECT CAST(max(n_tokens) AS BIGINT) FROM lens) AS max_len
FROM meta m"""


def bpe_token_count_sql() -> str:
    pat = textstats.BPE_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{pat}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents"""


# pool size 2: a pool whose concurrency x num_cpus covers the whole session
# (e.g. 4 actors in the 4-cpu test fixture) starves the read stage -> hang
ANN_POOL = 2


def q_ann_cosine(sf_dir: str):
    ids, mat = _query_vectors(sf_dir)
    return similarity.brute_force_topk(_emb_ds(sf_dir), ids, mat, k=ANN_K,
                                       concurrency=ANN_POOL)


ANN_RANGE_TAU = 0.25  # >=3e-5 from every actual cosine at sf0.001-0.1


def q_ann_range(sf_dir: str):
    """Milvus-style range search (radius=) / ES knn similarity threshold:
    every (query, vector) pair with cosine >= ANN_RANGE_TAU — no top-k
    heap, no merge; per-batch threshold emit."""
    ids, mat = _query_vectors(sf_dir)
    return similarity.range_search(_emb_ds(sf_dir), ids, mat,
                                   tau=ANN_RANGE_TAU, concurrency=ANN_POOL)


ANN_GROUPS = 4


def q_ann_grouped(sf_dir: str):
    """Grouping vector search (Milvus group_by_field / ES knn collapse):
    per query, the top ANN_GROUPS label groups by best cosine, one
    representative vector each — per-batch per-label partials, tiny
    per-query merge."""
    ids, mat = _query_vectors(sf_dir)
    return similarity.grouped_topk(_emb_ds(sf_dir), ids, mat,
                                   n_groups=ANN_GROUPS,
                                   concurrency=ANN_POOL)


def q_decontaminate(sf_dir: str):
    """Train/test decontamination: TRAIN docs (doc_id % DECON_MOD != 0)
    sharing a token 3-gram shingle with the TEST subset (== 0), flagged
    with the distinct-shared-shingle count."""
    return dedup.decontaminate(_docs_ds(sf_dir))


def decontaminate_sql() -> str:
    h = H63.format(expr="shingle")
    return f"""
WITH {_SHINGLES},
sh AS (SELECT doc_id, {h} AS h FROM shd),
test AS (SELECT DISTINCT h FROM sh WHERE doc_id % {dedup.DECON_MOD} = 0)
SELECT s.doc_id, CAST(count(DISTINCT s.h) AS BIGINT) AS n_shared
FROM sh s JOIN test t ON t.h = s.h
WHERE s.doc_id % {dedup.DECON_MOD} <> 0
GROUP BY s.doc_id"""


ANN_FILTER_LABEL = 3  # candidate predicate for the filtered-knn entry


def q_ann_filtered(sf_dir: str):
    """Filtered vector search (Milvus expr= / ES knn filter): exact cosine
    top-k among candidates with label == ANN_FILTER_LABEL — the predicate
    applies BEFORE the matmul inside each batch (pre-filtering), so the
    answer is the true top-k of the qualifying subset."""
    ids, mat = _query_vectors(sf_dir)
    return similarity.brute_force_topk(
        _emb_ds(sf_dir), ids, mat, k=ANN_K, concurrency=ANN_POOL,
        label_filter=ANN_FILTER_LABEL)


IVF_CLUSTERS = 16
IVF_NPROBE = 4


def q_ann_ivf(sf_dir: str):
    """IVF with data-independent seeded centroids: the SQL oracle replays
    bucket assignment, probe selection and within-bucket ranking exactly."""
    ids, mat = _query_vectors(sf_dir)
    return similarity.ivf_topk(
        _emb_ds(sf_dir), ids, mat, k=ANN_K, nprobe=IVF_NPROBE,
        centroids=similarity.ivf_fixed_centroids(EMB_DIM, IVF_CLUSTERS),
        concurrency=ANN_POOL,
    )


def q_embedding_neardup(sf_dir: str):
    """LSH-bucketed near-dup (the scale path) — hyperplanes seeded identically
    to the SQL literals, so the approximate result is bit-reproducible."""
    return similarity.lsh_neardup_pairs(_emb_ds(sf_dir), threshold=NEARDUP_COS)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "dedup_exact": q_dedup_exact,
        "decontaminate": q_decontaminate,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "repetition_stats": q_repetition_stats,
        "gopher_filter": q_gopher_filter,
        "unigram_nll": q_unigram_nll,
        "langid": q_langid,
        "fingerprints": q_fingerprints,
        "ann_cosine_topk": q_ann_cosine,
        "ann_range_search": q_ann_range,
        "ann_grouped_topk": q_ann_grouped,
        "ann_filtered_topk": q_ann_filtered,
        "ann_ivf_topk": q_ann_ivf,  # approximate: rows-only driver check
        "embedding_neardup_pairs": q_embedding_neardup,
    }


# ------------------------------------------------------------- sql side ----

_TOKENS = tokens_sql("text")

_DTOK = f"""
dtok AS (
  SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
)"""

_DPOST = """
dpost AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM dtok GROUP BY doc_id, term
)"""

# token shingles (width SHINGLE_K, short docs collapse to one joined shingle)
_SHINGLES = f"""
tl AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
shd AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(toks) < {dedup.SHINGLE_K}
              THEN array_to_string(toks, ' ')
              ELSE toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         END AS shingle
  FROM (
    SELECT doc_id, toks,
           unnest(range(1, greatest(len(toks) - {dedup.SHINGLE_K - 1}, 1) + 1)) AS i
    FROM tl WHERE len(toks) > 0
  )
)"""


def dedup_exact_sql() -> str:
    return """
SELECT sha256(text) AS content_sha256,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY sha256(text)"""


def simhash_sql() -> str:
    h = H63.format(expr="term")
    return f"""
WITH {_DTOK}, {_DPOST},
th AS (SELECT doc_id, tf, {h} AS h FROM dpost),
bits AS (
  SELECT doc_id, b.b,
         CASE WHEN sum(CASE WHEN (h >> b.b) & 1 = 1 THEN tf ELSE -tf END) > 0
              THEN (CAST(1 AS BIGINT) << b.b) ELSE 0 END AS bitval
  FROM th CROSS JOIN (SELECT unnest(range(0, 63)) AS b) b
  GROUP BY doc_id, b.b
),
sims AS (SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash FROM bits GROUP BY doc_id)
SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sims s USING (doc_id)"""


def minhash_lsh_pairs_sql() -> str:
    r = dedup.N_PERM // dedup.N_BANDS
    assert r == 2, "SQL band key assumes 2 rows per band"
    h_perm = H63.format(expr="CAST(j.j AS VARCHAR) || ':' || shingle")
    h_band = H63.format(expr="CAST(band AS VARCHAR) || '|' || sigstr")
    return f"""
WITH {_SHINGLES},
mh AS (
  SELECT doc_id, j.j AS perm, min({h_perm}) AS mh
  FROM shd CROSS JOIN (SELECT unnest(range(0, {dedup.N_PERM})) AS j) j
  GROUP BY doc_id, j.j
),
bk AS (
  SELECT doc_id, perm // {r} AS band,
         string_agg(CAST(mh AS VARCHAR), '|' ORDER BY perm) AS sigstr
  FROM mh GROUP BY doc_id, perm // {r}
),
bands AS (SELECT doc_id, band, {h_band} AS band_key FROM bk)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""


def ngram_jaccard_pairs_sql() -> str:
    return f"""
WITH {_SHINGLES},
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
  FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i / (ca.n + cb.n - i), 9) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE i / (ca.n + cb.n - i) >= {JACCARD_T!r}e0"""


def token_stats_sql() -> str:
    return f"""
WITH {_DTOK}, {_DPOST},
agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_unique,
         CAST(max(tf) AS BIGINT) AS max_tf
  FROM dpost GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.n_unique, 0) AS n_unique,
       coalesce(a.max_tf, 0) AS max_tf,
       CAST(len(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> ''))
            AS BIGINT) AS n_ws_tokens,
       CAST(len(d.text) AS BIGINT) AS n_chars
FROM documents d LEFT JOIN agg a USING (doc_id)"""


def repetition_stats_sql() -> str:
    return f"""
WITH tl AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM tl),
tok AS (SELECT doc_id, unnest(toks) AS term FROM tl),
topt AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top
  FROM (SELECT doc_id, term, count(*) AS c FROM tok
        GROUP BY doc_id, term)
  GROUP BY doc_id
),
bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM tl WHERE len(toks) >= 2)
),
bgs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS total,
         CAST(count(DISTINCT bigram) AS BIGINT) AS dstnct
  FROM bg GROUP BY doc_id
)
SELECT b.doc_id, b.n AS n_tokens,
       round(CASE WHEN coalesce(g.total, 0) > 0
                  THEN 1e0 - CAST(g.dstnct AS DOUBLE) / g.total
                  ELSE 0e0 END, 9) AS dup_bigram_frac,
       round(CASE WHEN b.n > 0
                  THEN CAST(coalesce(tp.top, 0) AS DOUBLE) / b.n
                  ELSE 0e0 END, 9) AS top_token_frac
FROM base b LEFT JOIN bgs g USING (doc_id) LEFT JOIN topt tp USING (doc_id)"""


def gopher_filter_sql() -> str:
    return f"""
WITH rep AS ({repetition_stats_sql()})
SELECT doc_id, n_tokens, dup_bigram_frac, top_token_frac,
       (reason = 'ok') AS keep, reason
FROM (
  SELECT *,
    CASE WHEN n_tokens < {textstats.GOPHER_MIN_TOKENS} THEN 'too_short'
         WHEN n_tokens > {textstats.GOPHER_MAX_TOKENS} THEN 'too_long'
         WHEN dup_bigram_frac > {textstats.GOPHER_MAX_DUP_BIGRAM}
              THEN 'repetitive_bigrams'
         WHEN top_token_frac > {textstats.GOPHER_MAX_TOP_TOKEN}
              THEN 'dominant_token'
         ELSE 'ok' END AS reason
  FROM rep
)"""


def unigram_nll_sql() -> str:
    return f"""
WITH tl AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM tl),
cf AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY term),
tot AS (SELECT sum(c) AS n FROM cf),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tl),
sc AS (
  SELECT t.doc_id, avg(-ln(cf.c / tot.n)) AS m
  FROM tok t JOIN cf USING (term) CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT b.doc_id, b.n_tokens,
       round(coalesce(s.m, 0e0), 6) AS mean_nll
FROM base b LEFT JOIN sc s USING (doc_id)"""


def quality_score_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
    return f"""
WITH {_DTOK},
per AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (term IN ({stop})) AS BIGINT) AS sw,
         CAST(sum(len(term)) AS BIGINT) AS tot_len,
         CAST(count(*) FILTER (regexp_matches(term, '[0-9]')) AS BIGINT) AS dg
  FROM dtok GROUP BY doc_id
),
vals AS (
  SELECT doc_id, sw / n AS swr, tot_len / n AS mtl, dg / n AS dgr FROM per
)
SELECT d.doc_id,
       round(coalesce(v.swr, 0e0), 9) AS stopword_ratio,
       round(coalesce(v.mtl, 0e0), 9) AS mean_token_len,
       round(coalesce(v.dgr, 0e0), 9) AS digit_ratio,
       round(coalesce(v.swr * 0.4e0 + least(v.mtl / 1e1, 1e0) * 0.3e0
                      + (1e0 - v.dgr) * 0.3e0, 0.3e0), 9) AS quality
FROM documents d LEFT JOIN vals v USING (doc_id)"""


def langid_sql() -> str:
    langs = sorted(textstats.LANG_MARKERS)
    marker_rows = ",".join(
        f"('{lg}', '{w}')" for lg in langs for w in textstats.LANG_MARKERS[lg]
    )
    lang_list = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
WITH {_DTOK},
markers(lang, term) AS (SELECT * FROM (VALUES {marker_rows})),
hits AS (
  SELECT t.doc_id, m.lang, CAST(count(*) AS BIGINT) AS hits
  FROM dtok t JOIN markers m ON t.term = m.term
  GROUP BY t.doc_id, m.lang
),
cand AS (
  SELECT dl.doc_id, dl.lang, coalesce(h.hits, 0) AS hits
  FROM (SELECT d.doc_id, l.lang FROM documents d
        CROSS JOIN (SELECT unnest([{lang_list}]) AS lang) l) dl
  LEFT JOIN hits h ON h.doc_id = dl.doc_id AND h.lang = dl.lang
)
SELECT doc_id, lang AS pred_lang, hits AS marker_hits
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY hits DESC, lang ASC) AS rn
      FROM cand)
WHERE rn = 1"""


def fingerprints_sql() -> str:
    k, w = textstats.FINGERPRINT_K, textstats.FINGERPRINT_W
    h = H63.format(expr=f"substr(text, i, {k})")
    return f"""
WITH base AS (
  SELECT doc_id, text, len(text) - {k} + 1 AS npos FROM documents
),
pos AS (
  SELECT doc_id, npos, text, unnest(range(1, npos + 1)) AS i
  FROM base WHERE npos >= 1
),
kh AS (SELECT doc_id, npos, i, {h} AS h FROM pos),
wm AS (
  SELECT doc_id, npos, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS m
  FROM kh
)
SELECT DISTINCT doc_id, m AS fingerprint
FROM wm WHERE i >= least({w}, npos)"""


def _cos_sql(a: str, b: str) -> str:
    dot = (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )
    na = (
        f"sqrt(list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), 'sum'))"
    )
    nb = (
        f"sqrt(list_aggregate(list_transform(range(1, len({b}) + 1), "
        f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum'))"
    )
    return f"({dot} / ({na} * {nb}))"


def ann_cosine_sql() -> str:
    cos = _cos_sql("q.embedding", "e.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_vec_id, e.vec_id, {cos} AS cos
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {ANN_QUERY_VECS}
),
ranked AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id,
       round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {ANN_K}"""


def ann_range_sql() -> str:
    cos = _cos_sql("q.embedding", "e.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_vec_id, e.vec_id, {cos} AS cos
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {ANN_QUERY_VECS}
)
SELECT query_vec_id, vec_id, round(cos, 6) AS cosine
FROM scored WHERE cos >= {ANN_RANGE_TAU}"""


def ann_grouped_sql() -> str:
    cos = _cos_sql("q.embedding", "e.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_vec_id, e.label, e.vec_id, {cos} AS cos
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {ANN_QUERY_VECS}
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id, label
                               ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored
),
grp AS (
  SELECT query_vec_id, label, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY cos DESC, label ASC) AS grank
  FROM best WHERE rn = 1
)
SELECT query_vec_id, CAST(grank AS BIGINT) AS grank,
       CAST(label AS BIGINT) AS label, vec_id, round(cos, 6) AS cosine
FROM grp WHERE grank <= {ANN_GROUPS}"""


def ann_filtered_sql() -> str:
    cos = _cos_sql("q.embedding", "e.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_vec_id, e.vec_id, {cos} AS cos
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {ANN_QUERY_VECS} AND e.label = {ANN_FILTER_LABEL}
),
ranked AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id,
       round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {ANN_K}"""


def ann_ivf_sql() -> str:
    """Exact replay of q_ann_ivf: same seeded unit centroids as literals,
    bucket = argmax dot (ties: lowest cid), probes = top nprobe centroids per
    query (same tie-break), rank within probed buckets."""
    cents = similarity.ivf_fixed_centroids(EMB_DIM, IVF_CLUSTERS)
    rows = ",\n    ".join(
        "(" + str(cid) + ", [" + ", ".join(repr(float(x)) for x in coefs)
        + "]::DOUBLE[])"
        for cid, coefs in enumerate(cents)
    )
    dot = (
        f"list_aggregate(list_transform(range(1, {EMB_DIM} + 1), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * c.coefs[i]), 'sum')"
    )
    cos = _cos_sql("q.embedding", "e.embedding")
    return f"""
WITH cents(cid, coefs) AS (
  SELECT * FROM (VALUES {rows})
),
edot AS (
  SELECT e.vec_id, c.cid, {dot} AS dot
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
    FROM edot) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
    FROM edot WHERE vec_id < {ANN_QUERY_VECS}) WHERE rn <= {IVF_NPROBE}
),
scored AS (
  SELECT q.vec_id AS query_vec_id, e.vec_id, {cos} AS cos
  FROM embeddings q
  JOIN probes p ON p.query_vec_id = q.vec_id
  JOIN assign a ON a.bucket = p.cid
  JOIN embeddings e ON e.vec_id = a.vec_id AND e.vec_id <> q.vec_id
  WHERE q.vec_id < {ANN_QUERY_VECS}
),
ranked AS (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id,
       round(cos, 6) AS cosine
FROM ranked WHERE rnk <= {ANN_K}"""


def embedding_neardup_sql() -> str:
    """Replicates lsh_neardup_pairs exactly: the SAME seeded hyperplanes
    (similarity.lsh_planes, rounded to 6 dp) embedded as DOUBLE[] literals;
    sign-bit buckets per table; pairs sharing any (tbl, bucket); exact cosine
    filter on the candidates."""
    planes = similarity.lsh_planes(EMB_DIM)
    n_planes = similarity.LSH_N_PLANES
    rows = []
    for idx, coefs in enumerate(planes):
        tbl, pid = idx // n_planes, idx % n_planes
        lit = "[" + ", ".join(repr(float(c)) for c in coefs) + "]::DOUBLE[]"
        rows.append(f"({tbl}, {pid}, {lit})")
    values = ",\n    ".join(rows)
    dot = (
        f"list_aggregate(list_transform(range(1, {EMB_DIM} + 1), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * p.coefs[i]), 'sum')"
    )
    cos = _cos_sql("a.embedding", "b.embedding")
    return f"""
WITH planes(tbl, pid, coefs) AS (
  SELECT * FROM (VALUES {values})
),
dots AS (
  SELECT e.vec_id, p.tbl, p.pid, {dot} AS dot
  FROM embeddings e CROSS JOIN planes p
),
buckets AS (
  SELECT vec_id, tbl,
         CAST(sum(CASE WHEN dot >= 0 THEN (1 << pid) ELSE 0 END) AS INTEGER) AS bucket
  FROM dots GROUP BY vec_id, tbl
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM buckets x JOIN buckets y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b, round({cos}, 6) AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE {cos} >= {NEARDUP_COS!r}e0"""


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": dedup_exact_sql(),
        "decontaminate": decontaminate_sql(),
        "minhash_lsh_pairs": minhash_lsh_pairs_sql(),
        "simhash": simhash_sql(),
        "ngram_jaccard_pairs": ngram_jaccard_pairs_sql(),
        "token_stats": token_stats_sql(),
        "quality_score": quality_score_sql(),
        "repetition_stats": repetition_stats_sql(),
        "gopher_filter": gopher_filter_sql(),
        "unigram_nll": unigram_nll_sql(),
        "langid": langid_sql(),
        "fingerprints": fingerprints_sql(),
        "ann_cosine_topk": ann_cosine_sql(),
        "ann_range_search": ann_range_sql(),
        "ann_grouped_topk": ann_grouped_sql(),
        "ann_filtered_topk": ann_filtered_sql(),
        "ann_ivf_topk": ann_ivf_sql(),
        "embedding_neardup_pairs": embedding_neardup_sql(),
    }


# ------------------------------------------------------- events operators --

def _events_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def q_events_hourly(sf_dir: str):
    return events.hourly_window(_events_ds(sf_dir))


def q_events_sessions(sf_dir: str):
    return events.sessionize(_events_ds(sf_dir))


def q_events_rolling(sf_dir: str):
    return events.rolling_sum(_events_ds(sf_dir))


def q_events_asof(sf_dir: str):
    return events.asof_join(_events_ds(sf_dir))


def events_hourly_sql() -> str:
    return f"""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY epoch_us(date_trunc('hour', ts)), event_type"""


def events_sessions_sql() -> str:
    gap = events.SESSION_GAP_US
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events
),
o AS (
  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS p
  FROM e
),
f AS (
  SELECT *, CASE WHEN p IS NULL OR us - p > {gap} THEN 1 ELSE 0 END AS nf
  FROM o
),
s AS (
  SELECT *, sum(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM f
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       min(us) AS session_start_us, max(us) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid"""


def events_rolling_sql() -> str:
    w = events.ROLLING_ROWS
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events
)
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW),
             6) AS rolling_sum
FROM e"""


def events_asof_sql() -> str:
    """DuckDB-native ASOF JOIN against the max-event_id-per-(user, ts)
    deduplicated error stream — mirrors ops.events.asof_join exactly."""
    return """
WITH errs AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'error'
  ) WHERE rn = 1
),
e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
SELECT e.event_id, e.user_id,
       a.event_id AS match_event_id, a.value AS match_value
FROM e ASOF JOIN errs a
  ON e.user_id = a.user_id AND e.us >= a.us"""


def q_neardup_clusters(sf_dir: str):
    """MinHash-LSH candidate pairs -> connected components: every doc gets a
    cluster_id (= min doc id in its near-dup cluster; own id if isolated)."""
    pairs = dedup.minhash_lsh_pairs(_docs_ds(sf_dir))
    return dedup.connected_components(
        pairs, all_ids_ds=_docs_ds(sf_dir).select_columns(["doc_id"])
    )


def neardup_clusters_sql() -> str:
    """Recursive-CTE oracle: reachability closure over the LSH pair graph,
    cluster label = min reachable doc id."""
    pairs_sql = minhash_lsh_pairs_sql()
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id
)
SELECT doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc_id"""


queries_orig = queries


def queries() -> dict[str, Callable[[str], Any]]:  # noqa: F811
    q = queries_orig()
    q["neardup_clusters"] = q_neardup_clusters
    q["bpe_token_count"] = q_bpe_token_count
    q["sample_by_content"] = q_sample_by_content
    q["doclen_quantiles"] = q_doclen_quantiles
    q["hll_distinct_terms"] = q_hll_distinct_terms
    q["dedup_apply"] = q_dedup_apply
    q["events_hourly_window"] = q_events_hourly
    q["events_sessions"] = q_events_sessions
    q["events_rolling_sum"] = q_events_rolling
    q["events_asof_join"] = q_events_asof
    return q


oracle_sql_orig = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    s = oracle_sql_orig()
    s["neardup_clusters"] = neardup_clusters_sql()
    s["bpe_token_count"] = bpe_token_count_sql()
    s["sample_by_content"] = sample_by_content_sql()
    s["doclen_quantiles"] = doclen_quantiles_sql()
    s["hll_distinct_terms"] = hll_distinct_terms_sql()
    s["dedup_apply"] = dedup_apply_sql()
    s["events_hourly_window"] = events_hourly_sql()
    s["events_sessions"] = events_sessions_sql()
    s["events_rolling_sum"] = events_rolling_sql()
    s["events_asof_join"] = events_asof_sql()
    return s


# ------------------------------------------- learned-sparse encoder (M4) --

def q_sparse_encode(sf_dir: str):
    from . import sparse

    return sparse.sparse_encode(_docs_ds(sf_dir))


def q_sparse_topk(sf_dir: str):
    from ..pipelines import DOC_QUERIES
    from . import sparse

    return sparse.sparse_topk(_docs_ds(sf_dir), DOC_QUERIES, k=sparse.TOPK)


def _sparse_proj_sql(tf_src: str) -> str:
    """Projection CTE body over a (id, term, tf)-shaped relation: one row per
    (id, term, projection slot j), emitting (dim, w, saturated tf) — the SQL
    replay of sparse._term_projection / _bitlen."""
    from . import sparse

    h = f"sha256(CAST(j.j AS VARCHAR) || ':' || term)"
    return f"""
  SELECT {tf_src}.*, j.j,
         CAST(('0x' || substr({h}, 1, 8))::UBIGINT % {sparse.SPARSE_DIM} AS BIGINT) AS dim,
         CAST(1 + ('0x' || substr({h}, 9, 4))::UBIGINT % {sparse.W_MOD} AS BIGINT) AS w,
         CAST(length(bin(tf)) AS BIGINT) AS sat
  FROM {tf_src} CROSS JOIN (SELECT unnest(range(0, {sparse.N_PROJ})) AS j) j"""


def sparse_encode_sql() -> str:
    return f"""
WITH {_DTOK}, {_DPOST},
proj AS ({_sparse_proj_sql('dpost')})
SELECT doc_id, dim, CAST(sum(sat * w) AS BIGINT) AS weight
FROM proj GROUP BY doc_id, dim"""


def sparse_topk_sql() -> str:
    from ..pipelines import DOC_QUERIES
    from ..sql import _queries_values
    from . import sparse

    return f"""
WITH {_DTOK}, {_DPOST},
{_queries_values(DOC_QUERIES)},
qtok AS (
  SELECT query_id, unnest({tokens_sql('query')}) AS term FROM query_lit
),
qpost AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM qtok GROUP BY query_id, term
),
dproj AS ({_sparse_proj_sql('dpost')}),
denc AS (
  SELECT doc_id, dim, CAST(sum(sat * w) AS BIGINT) AS weight
  FROM dproj GROUP BY doc_id, dim
),
qproj AS ({_sparse_proj_sql('qpost')}),
qenc AS (
  SELECT query_id, dim, CAST(sum(sat * w) AS BIGINT) AS weight
  FROM qproj GROUP BY query_id, dim
),
scores AS (
  SELECT q.query_id, d.doc_id,
         CAST(sum(q.weight * d.weight) AS BIGINT) AS score
  FROM qenc q JOIN denc d USING (dim)
  GROUP BY q.query_id, d.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM ranked WHERE rank <= {sparse.TOPK}"""


queries_v2 = queries


def queries() -> dict[str, Callable[[str], Any]]:  # noqa: F811
    q = queries_v2()
    q["sparse_encode"] = q_sparse_encode
    q["sparse_topk"] = q_sparse_topk
    return q


oracle_sql_v2 = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    s = oracle_sql_v2()
    s["sparse_encode"] = sparse_encode_sql()
    s["sparse_topk"] = sparse_topk_sql()
    return s


# --- training-set assembly: stratified sampling + sequence packing ---------

def q_stratified_sample(sf_dir: str):
    from . import assemble

    return assemble.stratified_sample(_docs_ds(sf_dir))


def q_pack_sequences(sf_dir: str):
    from . import assemble

    return assemble.pack_sequences(_docs_ds(sf_dir))


queries_v3 = queries


def queries() -> dict[str, Callable[[str], Any]]:  # noqa: F811
    q = queries_v3()
    q["stratified_sample"] = q_stratified_sample
    q["pack_sequences"] = q_pack_sequences
    return q


oracle_sql_v3 = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    from . import assemble

    s = oracle_sql_v3()
    s["stratified_sample"] = assemble.stratified_sample_sql()
    s["pack_sequences"] = assemble.pack_sequences_sql()
    return s


# --- C4/RefinedWeb-style cross-corpus line dedup ---------------------------

LINE_DEDUP_MIN_CHARS = 10


def q_line_dedup(sf_dir: str):
    return dedup.line_dedup(_docs_ds(sf_dir),
                            min_chars=LINE_DEDUP_MIN_CHARS)


def line_dedup_sql(min_chars: int = LINE_DEDUP_MIN_CHARS) -> str:
    """Oracle for dedup.line_dedup: rebuild each document keeping every
    long-enough line only at its minimal (doc_id, line_no) corpus-wide
    occurrence; lines under min_chars always survive.  The '%019d:%09d'
    printf packing is the SAME fixed-width rendering the engine's
    _owner_key produces, so string min == lexicographic (doc_id, line_no)
    min on both sides."""
    return f"""
WITH parts AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
),
lines AS (
  SELECT doc_id, CAST(j AS BIGINT) AS line_no,
         ls[CAST(j AS INTEGER)] AS line
  FROM parts, unnest(range(1, len(ls) + 1)) AS t(j)
),
owners AS (
  SELECT line, min(printf('%019d:%09d', doc_id, line_no)) AS okey
  FROM lines WHERE len(line) >= {min_chars} GROUP BY line
),
kept AS (
  SELECT l.doc_id, l.line_no, l.line FROM lines l
  LEFT JOIN owners o ON o.line = l.line
  WHERE o.line IS NULL
     OR printf('%019d:%09d', l.doc_id, l.line_no) = o.okey
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text_clean
FROM kept GROUP BY doc_id"""


queries_v4 = queries


def queries() -> dict[str, Callable[[str], Any]]:  # noqa: F811
    q = queries_v4()
    q["line_dedup"] = q_line_dedup
    return q


oracle_sql_v4 = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    s = oracle_sql_v4()
    s["line_dedup"] = line_dedup_sql()
    return s


def q_bigram_nll(sf_dir: str):
    """Interpolated bigram-LM fluency score (one order above
    unigram_nll; LM estimated from the corpus itself here — at 100 TB
    pass a bounded sample as lm_ds, the CCNet convention)."""
    return textstats.bigram_nll(_docs_ds(sf_dir), concurrency=2)


def bigram_nll_sql() -> str:
    lb, lu = textstats.BIGRAM_LAM_B, textstats.BIGRAM_LAM_U
    return f"""
WITH tl AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM tl),
uc AS (SELECT term, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY term),
tot AS (SELECT sum(c) AS n FROM uc),
big AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
    FROM tl WHERE len(toks) >= 2
  )
),
bc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c
       FROM big GROUP BY w1, w2),
base AS (
  SELECT doc_id,
         CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams
  FROM tl
),
sc AS (
  SELECT b.doc_id,
         avg(-ln({lb!r}e0 * bc.c / u1.c + {lu!r}e0 * u2.c / tot.n)) AS m
  FROM big b
  JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
  JOIN uc u1 ON u1.term = b.w1
  JOIN uc u2 ON u2.term = b.w2
  CROSS JOIN tot
  GROUP BY b.doc_id
)
SELECT b.doc_id, b.n_bigrams,
       round(coalesce(s.m, 0e0), 6) AS mean_nll
FROM base b LEFT JOIN sc s USING (doc_id)"""


queries_v5 = queries


def queries() -> dict[str, Callable[[str], Any]]:  # noqa: F811
    q = queries_v5()
    q["bigram_nll"] = q_bigram_nll
    return q


oracle_sql_v5 = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    s = oracle_sql_v5()
    s["bigram_nll"] = bigram_nll_sql()
    return s
