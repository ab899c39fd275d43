"""Levenshtein automaton for fuzzy dictionary intersection (maxEdits <= 2).

Lucene answers FuzzyQuery(maxEdits=2) by intersecting a Levenshtein
automaton with the term dictionary FST (Schulz & Mihov 2002, "Fast string
correction with Levenshtein automata").  Our dictionary is a SORTED ARRAY,
so the classic array form of the same idea applies: repeatedly ask the
automaton for the lexicographically smallest ACCEPTED string >= the current
dictionary term, then binary-search the dictionary forward to that string.
Every iteration either emits a match or leap-frogs a (possibly huge) run of
non-matching terms, so total cost is O(matches + automaton segments) —
INDEPENDENT of vocabulary size, unlike a scan-and-levenshtein pass.  That is
the property that matters at a 10^8-term dictionary; the edit-1 exhaustive
neighborhood (query.QueryEngine.expand_fuzzy) stays the better constant for
maxEdits=1, where the neighborhood is only ~(2L+1)*36 probes.

The NFA is the textbook construction over states (i, e) = (chars of the
word consumed, edits spent):

  consume c:  (i, e)   -> (i+1, e)     if word[i] == c      (match)
                        -> (i,   e+1)  if e < n             (insertion)
                        -> (i+1, e+1)  if e < n, i < len    (substitution)
  epsilon:    (i, e)   -> (i+1, e+1)   if e < n, i < len    (deletion)

State sets are epsilon-closed frozensets; transitions are memoized per
automaton instance (a lazily-determinized DFA).  Every non-empty state set
is co-accessible — from any (i, e) the remaining word chars word[i:] lead
to acceptance — which is what makes the greedy smallest-completion walk in
``next_valid`` correct.

The alphabet is the analyzer term contract [0-9a-z] in ASCII order (the
dictionary's sort order), so "smallest accepted string" agrees with the
dictionary's lexicographic order.
"""

from __future__ import annotations

# ASCII-sorted: digits (0x30-0x39) before lowercase letters (0x61-0x7a) —
# MUST match the dictionary's byte sort order for next_valid-driven seeks
ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


class LevenshteinAutomaton:
    """Accepts exactly the strings within edit distance ``max_edits`` of
    ``word`` (restricted to the term alphabet)."""

    def __init__(self, word: str, max_edits: int):
        if max_edits < 0:
            raise ValueError("max_edits must be >= 0")
        self.word = word
        self.n = max_edits
        self._step_memo: dict[tuple, frozenset] = {}
        self._start = self._closure({(0, 0)})

    # ------------------------------------------------------------- states --
    def _closure(self, states: set) -> frozenset:
        """Epsilon-close over deletion edges (i,e) -> (i+1,e+1)."""
        w, n = self.word, self.n
        stack = list(states)
        seen = set(states)
        while stack:
            i, e = stack.pop()
            if i < len(w) and e < n and (i + 1, e + 1) not in seen:
                seen.add((i + 1, e + 1))
                stack.append((i + 1, e + 1))
        return frozenset(seen)

    def start(self) -> frozenset:
        return self._start

    def step(self, state: frozenset, c: str) -> frozenset:
        key = (state, c)
        hit = self._step_memo.get(key)
        if hit is not None:
            return hit
        w, n = self.word, self.n
        new: set = set()
        for i, e in state:
            if i < len(w) and w[i] == c:
                new.add((i + 1, e))
            if e < n:
                new.add((i, e + 1))  # insertion of c
                if i < len(w):
                    new.add((i + 1, e + 1))  # substitution
        out = self._closure(new) if new else frozenset()
        self._step_memo[key] = out
        return out

    def is_match(self, state: frozenset) -> bool:
        # closure already promoted every (i, e) with len(w)-i <= n-e
        return any(i == len(self.word) for i, _ in state)

    def accepts(self, s: str) -> bool:
        state = self._start
        for c in s:
            state = self.step(state, c)
            if not state:
                return False
        return self.is_match(state)

    # --------------------------------------------------------------- seek --
    def _smallest_completion(self, state: frozenset) -> str | None:
        """Lex-smallest suffix accepted from ``state`` ('' if it already
        matches — the empty extension sorts before any non-empty one)."""
        out: list[str] = []
        while not self.is_match(state):
            for c in ALPHABET:
                ns = self.step(state, c)
                if ns:
                    out.append(c)
                    state = ns
                    break
            else:  # not co-accessible — unreachable by construction
                return None
        return "".join(out)

    def next_valid(self, s: str) -> str | None:
        """Lexicographically smallest accepted string >= ``s`` (None if the
        automaton accepts nothing at or after ``s``).

        Strings >= s order as: s itself, then extensions of s (shortest
        prefixes first), then strings first differing at position p with a
        char > s[p] — larger p sorts earlier.  The walk mirrors that order:
        accept s as-is, else backtrack from the deepest live prefix trying
        ascending replacement chars, gluing on the smallest completion."""
        state = self._start
        states = [state]
        for ch in s:
            state = self.step(state, ch)
            if not state:
                break
            states.append(state)
        consumed = len(states) - 1
        if consumed == len(s) and self.is_match(state):
            return s
        for pos in range(consumed, -1, -1):
            st = states[pos]
            # at pos == len(s) (full consume, no match) extend with ANY
            # char; below that the replacement must exceed s[pos]
            floor = s[pos] if pos < len(s) else None
            for c in ALPHABET:
                if floor is not None and c <= floor:
                    continue
                ns = self.step(st, c)
                if ns:
                    tail = self._smallest_completion(ns)
                    if tail is not None:
                        return s[:pos] + c + tail
        return None
