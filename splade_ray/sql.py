"""DuckDB oracle SQL generators for the driver contract.

Every pipeline exposed in ``__ray_entry__.queries()`` that is SQL-expressible
gets its oracle here, GENERATED from the same constants the engine uses
(analyzer regexes via ``analyzer.tokens_sql``, doc-id derivation via
``ids.doc_id63_sql``, BM25 k1/b and the integer score quantization via
``build.SCORE_SCALE``) so the two sides cannot drift.

Numeric-literal rule: every fractional constant is emitted in scientific
notation (``1.2e0``) — DuckDB parses plain ``1.2`` as DECIMAL, which would
silently switch the arithmetic away from float64 and break exact score
parity.  The BM25 contribution expression pins the same operation order the
engine and the pure-Python oracle use:

    units = round( (qtf * idf) * (((k1+1)*tf) / denom) * 1e9 )::BIGINT
    denom = tf + k1 * ((1 - b) + (b * dl) / avgdl)

(Engine-side: query.QueryEngine._contrib_units / codecs.tf_saturation.)
The only residual divergence is round-half-even (numpy/Python) vs
round-half-away (DuckDB), which requires a contribution to land exactly on a
0.5e-9 boundary — measure-zero in practice.
"""

from __future__ import annotations

from . import B, K1
from .analyzer import tokens_sql
from .build import SCORE_SCALE
from .corpus import DOCS_COMMIT
from .ids import doc_id63_sql


def _f(x: float) -> str:
    """Emit a float constant that DuckDB types as DOUBLE (never DECIMAL)."""
    return f"{x!r}e0" if "e" not in repr(x) else repr(x)


# The documents -> corpus adapter, mirrored from corpus.documents_as_corpus_batch
CORPUS_FROM_DOCUMENTS = f"""
corpus AS (
  SELECT source AS repo,
         CAST(doc_id AS VARCHAR) AS path,
         '{DOCS_COMMIT}' AS commit_sha,
         lang,
         text AS content
  FROM documents
)"""

# docs: identity + sha256 + tokens; empty/whitespace rows dropped (build.prepare_batch)
DOCS_CTE = f"""
docs AS (
  SELECT {doc_id63_sql('repo', 'path', 'commit_sha')} AS doc_id,
         repo, path, commit_sha, lang,
         sha256(content) AS content_sha256,
         CAST(len(tokens) AS BIGINT) AS doc_len,
         tokens
  FROM (
    SELECT *, {tokens_sql('content')} AS tokens
    FROM corpus
    WHERE content IS NOT NULL AND trim(content, ' ' || chr(9) || chr(10) || chr(13)) <> ''
  )
)"""

POSTINGS_CTE = """
tok AS (SELECT doc_id, unnest(tokens) AS term FROM docs),
postings AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY term, doc_id
)"""

STATS_CTE = """
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl,
         CAST(sum(doc_len) AS BIGINT) AS total_tokens
  FROM docs
)"""

DF_CTE = """
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
  FROM postings GROUP BY term
)"""


def _with(*ctes: str) -> str:
    return "WITH " + ",".join(ctes)


def corpus_docs_sql() -> str:
    return (
        _with(CORPUS_FROM_DOCUMENTS, DOCS_CTE)
        + """
SELECT doc_id, repo, path, lang, content_sha256, doc_len FROM docs"""
    )


def postings_sql() -> str:
    return (
        _with(CORPUS_FROM_DOCUMENTS, DOCS_CTE, POSTINGS_CTE)
        + """
SELECT term, doc_id, tf FROM postings"""
    )


def term_df_sql() -> str:
    return (
        _with(CORPUS_FROM_DOCUMENTS, DOCS_CTE, POSTINGS_CTE, DF_CTE)
        + """
SELECT term, df, cf FROM df"""
    )


def corpus_stats_sql() -> str:
    return (
        _with(CORPUS_FROM_DOCUMENTS, DOCS_CTE, POSTINGS_CTE, STATS_CTE)
        + """
SELECT s.n_docs, s.avgdl, s.total_tokens,
       (SELECT CAST(count(DISTINCT term) AS BIGINT) FROM postings) AS n_terms
FROM stats s"""
    )


def top_terms_sql(n: int = 20) -> str:
    return (
        _with(CORPUS_FROM_DOCUMENTS, DOCS_CTE, POSTINGS_CTE, DF_CTE)
        + f"""
SELECT term, df, cf FROM df
ORDER BY df DESC, term ASC LIMIT {n}"""
    )


def _queries_values(queries: list[tuple[int, str]]) -> str:
    rows = ",".join(
        f"({qid}, '" + q.replace("'", "''") + "')" for qid, q in queries
    )
    return f"query_lit(query_id, query) AS (SELECT * FROM (VALUES {rows}))"


def bm25_topk_sql(queries: list[tuple[int, str]], k: int = 10) -> str:
    """Full BM25 top-k oracle over the documents-derived corpus (untagged)."""
    qcte = _queries_values(queries)
    contrib = (
        f"CAST(round((q.qtf * ln(1e0 + (s.n_docs - f.df + {_f(0.5)}) / (f.df + {_f(0.5)})))"
        f" * ((({_f(K1)} + 1e0) * p.tf)"
        f" / (p.tf + {_f(K1)} * ((1e0 - {_f(B)}) + ({_f(B)} * d.doc_len) / s.avgdl)))"
        f" * {_f(float(SCORE_SCALE))}) AS BIGINT)"
    )
    return (
        _with(
            CORPUS_FROM_DOCUMENTS, DOCS_CTE, POSTINGS_CTE, DF_CTE, STATS_CTE,
            qcte,
            f"""
qtok AS (
  SELECT query_id, unnest({tokens_sql('query')}) AS term FROM query_lit
),
qterms AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS qtf
  FROM qtok GROUP BY query_id, term
),
contribs AS (
  SELECT q.query_id, p.doc_id, {contrib} AS units
  FROM qterms q
  JOIN postings p ON p.term = q.term
  JOIN df f ON f.term = q.term
  JOIN docs d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, CAST(sum(units) AS BIGINT) AS units
  FROM contribs GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, units,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY units DESC, doc_id ASC) AS rnk
  FROM scores WHERE units > 0
)""",
        )
        + f"""
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       units / {_f(float(SCORE_SCALE))} AS score
FROM ranked WHERE rnk <= {k}"""
    )
