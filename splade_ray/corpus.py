"""Corpus sources: deterministic synthetic code corpus + adapters.

Replaces the reference's corpus inputs — the 5 fixed ``SOURCE_DOCUMENTS``
files read by ``load_documents`` (ingest.py:67-83) and the OpenAI-generated
corpus (generate_documents.py:31-69) — with a seeded, pure-function-of-
``(seed, n)`` generator of the BASELINE.json ``input_hint`` table shape:

    (repo:string, path:string, commit:string, lang:string, content:string)

Properties engineered into the corpus (FIXTURES.md §1): Zipfian term skew so
hot-term salting is actually exercised, camelCase + snake_case identifiers,
per-lang keywords, duplicate contents under different (repo, path), empty and
whitespace-only rows, unicode rows, and rare very wide rows (>=64 KB).

Also: the reference query set generator (FIXTURES.md §2) and an adapter
mapping the driver's ``documents`` table to the corpus shape.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "js", "go", "java", "rs", "md"]
LANG_P = [0.40, 0.20, 0.10, 0.10, 0.10, 0.10]

KEYWORDS = {
    "py": ["def", "import", "class", "return", "self", "if", "else", "for", "in", "lambda", "yield", "none"],
    "js": ["function", "const", "let", "var", "return", "import", "export", "class", "this", "async", "await"],
    "go": ["func", "package", "import", "type", "struct", "interface", "range", "defer", "chan", "go"],
    "java": ["public", "private", "static", "void", "class", "import", "extends", "interface", "final", "new"],
    "rs": ["fn", "let", "mut", "impl", "struct", "enum", "match", "pub", "use", "trait"],
    "md": ["the", "a", "of", "and", "to", "in", "is", "usage", "example", "install"],
}

_PARTS = [
    "get", "set", "parse", "load", "index", "token", "query", "merge", "batch",
    "stream", "shard", "hash", "data", "node", "user", "file", "read", "write",
    "count", "max", "min", "buffer", "cache", "config", "handler", "util",
    "block", "score", "rank", "term", "doc", "segment", "posting", "codec",
]
_SEPS = [" ", " ", " ", "\n", "(", ") ", ": ", ", ", " = ", ".", ";\n", "["]


def _identifiers(rng: np.random.Generator, n: int = 1500) -> list[str]:
    out = []
    for _ in range(n):
        k = int(rng.integers(2, 4))
        parts = [_PARTS[int(i)] for i in rng.integers(0, len(_PARTS), k)]
        if rng.random() < 0.5:  # snake_case
            out.append("_".join(parts))
        else:  # camelCase
            out.append(parts[0] + "".join(p.capitalize() for p in parts[1:]))
    return out


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


def generate_corpus(n_files: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic source-code corpus; pure function of (seed, n)."""
    rng = np.random.default_rng(seed)
    idents = _identifiers(rng)
    langs = np.array(LANGS)[rng.choice(len(LANGS), n_files, p=LANG_P)]
    # token counts per file: log-normal around ~120 tokens
    n_toks = np.clip(rng.lognormal(4.6, 0.7, n_files).astype(np.int64), 5, 4000)

    contents = np.empty(n_files, dtype=object)
    for lang in LANGS:
        rows = np.nonzero(langs == lang)[0]
        if len(rows) == 0:
            continue
        vocab = np.array(KEYWORDS[lang] + idents, dtype=object)
        probs = _zipf_probs(len(vocab))
        total = int(n_toks[rows].sum())
        toks = vocab[rng.choice(len(vocab), total, p=probs)]
        seps = np.array(_SEPS, dtype=object)[rng.integers(0, len(_SEPS), total)]
        pieces = np.char.add(toks.astype(str), seps.astype(str))
        offs = np.concatenate([[0], np.cumsum(n_toks[rows])])
        for j, r in enumerate(rows):
            contents[r] = "".join(pieces[offs[j] : offs[j + 1]])

    for i in range(n_files):  # special rows (deterministic positions)
        if i % 211 == 0:
            contents[i] = ""  # empty -> dropped with counter
        elif i % 211 == 105:
            contents[i] = " \n\t "  # whitespace-only -> dropped
        elif i % 151 == 3:
            contents[i] = "déjà_vu ναμε " + contents[i]  # unicode separators
        elif i % 97 == 96 and i >= 96:
            contents[i] = contents[i - 96]  # duplicate content, different path
        elif i % 5000 == 4999:
            contents[i] = contents[i] * 100  # wide row >= 64 KB

    repos = [f"org{i % 7}/repo{i % 23}" for i in range(n_files)]
    paths = [f"src/m{i // 97}/f{i}.{langs[i]}" for i in range(n_files)]
    commits = [
        hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:40] for i in range(n_files)
    ]
    return pa.table(
        {
            "repo": pa.array(repos),
            "path": pa.array(paths),
            "commit": pa.array(commits),
            "lang": pa.array(langs.astype(str)),
            "content": pa.array(contents.tolist(), type=pa.string()),
        }
    )


def corpus_parquet(n_files: int, seed: int = 42, root: str = "/tmp/splade_ray_corpus",
                   n_shards: int | None = None) -> str:
    """Materialize (cached) the synthetic corpus as sharded Parquet; returns dir.

    Cache key = (n_files, seed, n_shards); generation is deterministic so
    reuse is safe.  Default shard count scales with corpus size — parallelism
    of every downstream stage is bounded by input block count, so an
    under-sharded corpus silently caps the whole pipeline (measured: 8 shards
    limited a 32-CPU build to ~8-way parallelism).
    """
    if n_shards is None:
        n_shards = max(8, min(256, n_files // 2500))
    out = os.path.join(root, f"n{n_files}_s{seed}_p{n_shards}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    table = generate_corpus(n_files, seed)
    per = max(1, (n_files + n_shards - 1) // n_shards)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n_files)
        if lo >= hi:
            break
        pq.write_table(table.slice(lo, hi - lo), os.path.join(tmp, f"part-{s:04d}.parquet"))
    os.makedirs(root, exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def generate_queries(seed: int = 42) -> pa.Table:
    """Reference query set (FIXTURES.md §2): (query_id, query, lang).

    ``lang`` empty -> untagged (expanded across corpus langs when the index is
    lang-tagged).  Mix: hot single terms, rare terms, conjunctions, camelCase
    identifiers, lang-tagged lookups, absent terms, zero-token queries.
    """
    rng = np.random.default_rng(seed)
    idents = _identifiers(rng)  # same stream prefix as generate_corpus
    qs: list[tuple[str, str]] = []
    qs += [("def", ""), ("import", ""), ("return", ""), ("data", ""), ("the", "")]
    qs += [(idents[7], ""), (idents[123], ""), (idents[999], ""), (idents[1400], "")]
    qs += [
        ("parse token stream", ""),
        ("merge shard index", ""),
        ("read write buffer cache", ""),
        ("query score rank", ""),
        ("hash data node user", ""),
    ]
    qs += [("parseTokenStream", ""), ("bufferCacheHandler", ""), ("getMaxCount", "")]
    qs += [("def import", "py"), ("func package", "go"), ("function const", "js"),
           ("fn impl", "rs"), ("public static", "java")]
    qs += [("zzzzqqqxyzzy", ""), ("qqfoo bar_nonexistent_zz", "")]
    qs += [("!!! ... ???", ""), ("", "")]
    qs += [(f"{idents[i]} {idents[i + 1]}", "") for i in range(50, 60, 2)]
    return pa.table(
        {
            "query_id": pa.array(np.arange(len(qs), dtype=np.int64)),
            "query": pa.array([q for q, _ in qs]),
            "lang": pa.array([l for _, l in qs]),
        }
    )


DOCS_COMMIT = "t0"  # constant pseudo-commit for the documents-table adapter


def documents_as_corpus_batch(t: pa.Table) -> pa.Table:
    """Map a batch of the driver's ``documents`` table to the corpus shape.

    documents(doc_id:int64, text, lang, source, n_chars) ->
    corpus(repo=source, path=cast(doc_id), commit='t0', lang, content=text).
    SQL oracle mirror: see `splade_ray.sql.CORPUS_FROM_DOCUMENTS`.
    """
    import pyarrow.compute as pc

    return pa.table(
        {
            "repo": t["source"],
            "path": pc.cast(t["doc_id"], pa.string()),
            "commit": pa.array([DOCS_COMMIT] * len(t), type=pa.string()),
            "lang": t["lang"],
            "content": t["text"],
        }
    )
