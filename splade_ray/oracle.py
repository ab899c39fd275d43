"""Pure-Python BM25 oracle — the ground truth for parity tests.

Plays the role the Milvus server plays for the reference (SURVEY.md §5):
an independent ~100-line implementation of tokenize -> dicts -> exact Okapi
BM25 (k1=1.2, b=0.75) with the same deterministic contract as the engine
(integer-quantized scores, ties by doc_id ascending).  Deliberately naive:
plain dicts, no numpy in the scoring path, no shared code with the engine
beyond the tokenizer-rule constants (tokens_py re-implements the rules with
``re``; analyzer parity is itself golden-tested).
"""

from __future__ import annotations

import math

from . import DROP_WS
from .analyzer import analyze_query, tokens_py
from .build import SCORE_SCALE
from .ids import doc_id63


class OracleIndex:
    def __init__(self, rows: list[dict], lang_tagged: bool = False,
                 k1: float = 1.2, b: float = 0.75):
        """rows: dicts with repo/path/commit/lang/content (corpus shape)."""
        self.k1, self.b = k1, b
        self.lang_tagged = lang_tagged
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.docs: dict[int, dict] = {}
        self.dropped = 0
        langs = set()
        for row in rows:
            content = row.get("content") or ""
            if content.strip(DROP_WS) == "":
                self.dropped += 1
                continue
            did = doc_id63(row["repo"], row["path"], row["commit"])
            toks = tokens_py(content)
            if lang_tagged:
                toks = [f"{row['lang']}:{t}" for t in toks]
            if did in self.docs:
                continue  # duplicate identity row
            self.docs[did] = row
            self.doc_len[did] = len(toks)
            langs.add(row["lang"])
            for t in toks:
                self.postings.setdefault(t, {})
                self.postings[t][did] = self.postings[t].get(did, 0) + 1
        self.langs = sorted(langs)
        self.n_docs = len(self.docs)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _acc_units(self, qterms: dict[str, int]) -> dict[int, int]:
        """Quantized per-doc unit sums over a {term: qtf} bag (no cut)."""
        acc: dict[int, int] = {}
        for term, qtf in qterms.items():
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term)
            for did, tf in plist.items():
                dl = self.doc_len[did]
                # operation order pinned engine-wide (build.SCORE_SCALE spec):
                # units = round((qtf*idf) * (((k1+1)*tf)/denom) * 1e9)
                denom = tf + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
                sat = (self.k1 + 1) * tf / denom
                acc[did] = acc.get(did, 0) + round(qtf * w * sat * SCORE_SCALE)
        return acc

    def _rank_qterms(self, qterms: dict[str, int], k: int,
                     allowed: set[int] | None = None,
                     banned: set[int] | None = None):
        """Accumulate quantized units over a {term: qtf} bag, filter, rank."""
        acc = self._acc_units(qterms)
        ranked = sorted(
            ((u, did) for did, u in acc.items()
             if u > 0
             and (allowed is None or did in allowed)
             and (banned is None or did not in banned)),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        return [(did, u / SCORE_SCALE) for u, did in ranked]

    def search(self, query: str, lang: str | None = None, k: int = 10):
        """Top-k [(doc_id, score_float)], integer-quantized, doc_id tie-break."""
        qterms = analyze_query(
            query,
            lang if (self.lang_tagged and lang) else None,
            self.langs if self.lang_tagged else None,
        )
        return self._rank_qterms(qterms, k)

    # --------------------------------------------- doc-values query class --
    def _hits(self, query: str, lang: str | None = None,
              banned: set[int] | None = None) -> list[tuple[int, int]]:
        """All matching live (doc_id, units) with units > 0, unranked."""
        qterms = analyze_query(
            query, lang if (self.lang_tagged and lang) else None,
            self.langs if self.lang_tagged else None)
        return [(did, u) for did, u in self._acc_units(qterms).items()
                if u > 0 and (banned is None or did not in banned)]

    def search_collapse(self, query: str, lang: str | None = None,
                        k: int = 10, banned: set[int] | None = None):
        """Top-k best-doc-per-lang representatives: [(doc_id, score, lang)]."""
        hits = sorted(self._hits(query, lang, banned),
                      key=lambda x: (-x[1], x[0]))
        seen, out = set(), []
        for did, u in hits:
            lg = self.docs[did]["lang"]
            if lg in seen:
                continue
            seen.add(lg)
            out.append((did, u / SCORE_SCALE, lg))
            if len(out) >= k:
                break
        return out

    def lang_agg(self, query: str, lang: str | None = None,
                 banned: set[int] | None = None) -> dict[str, tuple[int, float]]:
        """{lang: (n_hits, best_score)} over the FULL hit set."""
        agg: dict[str, tuple[int, int]] = {}
        for did, u in self._hits(query, lang, banned):
            lg = self.docs[did]["lang"]
            n, best = agg.get(lg, (0, 0))
            agg[lg] = (n + 1, max(best, u))
        return {lg: (n, b / SCORE_SCALE) for lg, (n, b) in agg.items()}

    def count_hits(self, query: str, lang: str | None = None,
                   banned: set[int] | None = None) -> int:
        return len(self._hits(query, lang, banned))

    # ------------------------------------------------- prefix / boolean ---
    def _variants(self, tok: str, lang: str | None) -> list[str]:
        if self.lang_tagged:
            langs = [lang] if lang else self.langs
            return [f"{lg}:{tok}" for lg in langs]
        return [tok]

    def search_prefix(self, prefix: str, lang: str | None = None,
                      k: int = 10):
        """QueryEngine.search_prefix ground truth: linear dictionary scan."""
        toks = tokens_py(prefix)
        if not toks:
            return []
        qterms = {
            t: 1
            for key in self._variants(toks[0], lang)
            for t in self.postings
            if t.startswith(key)
        }
        return self._rank_qterms(qterms, k)

    def search_wildcard(self, pattern: str, lang: str | None = None,
                        k: int = 10):
        """QueryEngine.search_wildcard ground truth: linear dictionary scan
        with a compiled regex (``*`` -> ``.*``, ``?`` -> ``.``)."""
        import re

        pat = pattern.strip().lower()
        if not pat:
            return []
        rx = re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in pat)
        )
        if self.lang_tagged:
            langs = [lang] if lang else self.langs
            qterms = {
                t: 1 for t in self.postings
                if t.split(":", 1)[0] in langs
                and rx.fullmatch(t.split(":", 1)[1])
            }
        else:
            qterms = {t: 1 for t in self.postings if rx.fullmatch(t)}
        return self._rank_qterms(qterms, k)

    def search_fuzzy(self, query: str, lang: str | None = None,
                     k: int = 10, max_edits: int = 1):
        """QueryEngine.search_fuzzy / search_fuzzy2 ground truth: linear
        vocabulary scan with an exact Levenshtein(<=max_edits) check."""
        toks = tokens_py(query)
        if not toks:
            return []
        q = toks[0]
        n = max_edits

        def _lev(a: str, b: str) -> int:
            if abs(len(a) - len(b)) > n:
                return n + 1
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        if self.lang_tagged:
            langs = [lang] if lang else self.langs
            qterms = {
                t: 1 for t in self.postings
                if t.split(":", 1)[0] in langs
                and _lev(t.split(":", 1)[1], q) <= n
            }
        else:
            qterms = {t: 1 for t in self.postings if _lev(t, q) <= n}
        return self._rank_qterms(qterms, k)

    def search_filtered(self, query: str, dl_lo: int, dl_hi: int,
                        lang: str | None = None, k: int = 10):
        """QueryEngine.search_filtered ground truth: full BM25 qterms,
        allowed set = docs with token count in [dl_lo, dl_hi)."""
        qterms = analyze_query(
            query,
            lang if (self.lang_tagged and lang) else None,
            self.langs if self.lang_tagged else None,
        )
        allowed = {d for d, length in self.doc_len.items()
                   if dl_lo <= length < dl_hi}
        return self._rank_qterms(qterms, k, allowed=allowed)

    def search_bool(self, must=(), should=(), must_not=(),
                    lang: str | None = None, k: int = 10,
                    min_should_match: int = 0):
        """QueryEngine.search_bool ground truth: python-set filters."""
        def _toks(items):
            out = []
            for s in items:
                out.extend(tokens_py(s))
            return list(dict.fromkeys(out))

        def _doc_set(tok):
            out: set[int] = set()
            for v in self._variants(tok, lang):
                out.update(self.postings.get(v, {}))
            return out

        m_toks, s_toks, n_toks = _toks(must), _toks(should), _toks(must_not)
        if not m_toks and not s_toks:
            return []
        allowed: set[int] | None = None
        for tok in m_toks:
            ids = _doc_set(tok)
            allowed = ids if allowed is None else (allowed & ids)
        if min_should_match > 0:
            if len(s_toks) < min_should_match:
                return []
            counts: dict[int, int] = {}
            for tok in s_toks:
                for d in _doc_set(tok):
                    counts[d] = counts.get(d, 0) + 1
            ok = {d for d, c in counts.items() if c >= min_should_match}
            allowed = ok if allowed is None else (allowed & ok)
        banned = set()
        for tok in n_toks:
            banned |= _doc_set(tok)
        qterms = {v: 1 for tok in dict.fromkeys(m_toks + s_toks)
                  for v in self._variants(tok, lang)}
        return self._rank_qterms(qterms, k, allowed=allowed, banned=banned)
