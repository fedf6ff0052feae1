"""Aho-Corasick automaton over token-id sequences (SURVEY.md §2.3 P1).

Reference behavior: ``db/FSASpotter.scala`` + ``FSADictionary`` [U] match
every surface form in one pass over the token stream — an FSA over token
ids, functionally Aho-Corasick over the lexicon (BASELINE.json
north_star). We build goto/fail/output tables driver-side from the
``surface_forms`` lexicon table and broadcast the compiled object; each
Python worker deserializes it once (lazy singleton in the UDF module).

Patterns are tuples of token ids (a surface form's lowercase token
sequence). Matching is O(tokens) independent of lexicon size.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable, Sequence


class AhoCorasick:
    """Token-level Aho-Corasick with dict-based goto (sparse alphabet —
    token ids are ints up to |vocab|, transitions per state are few)."""

    __slots__ = ("goto", "fail", "out")

    def __init__(self) -> None:
        self.goto: list[dict[int, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[tuple[int, int]]] = [[]]  # (pattern_len, pattern_id)

    def add(self, pattern: Sequence[int], pattern_id: int) -> None:
        if not pattern or any(t < 0 for t in pattern):
            return  # unknown-token patterns can never match
        state = 0
        for tok in pattern:
            nxt = self.goto[state].get(tok)
            if nxt is None:
                nxt = len(self.goto)
                self.goto[state][tok] = nxt
                self.goto.append({})
                self.fail.append(0)
                self.out.append([])
            state = nxt
        self.out[state].append((len(pattern), pattern_id))

    def build(self) -> "AhoCorasick":
        q: deque[int] = deque()
        for nxt in self.goto[0].values():
            self.fail[nxt] = 0
            q.append(nxt)
        while q:
            state = q.popleft()
            for tok, nxt in self.goto[state].items():
                q.append(nxt)
                f = self.fail[state]
                while f and tok not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(tok, 0)
                if self.fail[nxt] == nxt:
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]
        return self

    def find_all(self, tokens: Sequence[int]) -> list[tuple[int, int, int]]:
        """All matches as (start_tok, end_tok_exclusive, pattern_id)."""
        res: list[tuple[int, int, int]] = []
        state = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, tok in enumerate(tokens):
            if tok < 0:  # unknown token: hard reset (cannot be inside a pattern)
                state = 0
                continue
            while state and tok not in goto[state]:
                state = fail[state]
            state = goto[state].get(tok, 0)
            if out[state]:
                for plen, pid in out[state]:
                    res.append((i - plen + 1, i + 1, pid))
        return res


def build_automaton(patterns: Iterable[tuple[Sequence[int], int]]) -> AhoCorasick:
    ac = AhoCorasick()
    for pat, pid in patterns:
        ac.add(pat, pid)
    return ac.build()


def resolve_overlaps(
    matches: list[tuple[int, int, int]],
) -> list[tuple[int, int, int]]:
    """Greedy longest-match overlap resolution (SURVEY §2.3 P4).

    Deterministic: sort by (start asc, length desc, pattern_id asc); keep a
    match iff it starts at/after the end of the last kept one. This mirrors
    the reference's maximal-span spot selection in ``DBSpotter.extract`` [U].
    """
    kept: list[tuple[int, int, int]] = []
    last_end = -1
    for m in sorted(matches, key=lambda m: (m[0], m[0] - m[1], m[2])):
        if m[0] >= last_end:
            kept.append(m)
            last_end = m[1]
    return kept


def naive_find_all(
    tokens: Sequence[int], patterns: list[tuple[Sequence[int], int]]
) -> list[tuple[int, int, int]]:
    """O(n·m) oracle used by property tests against find_all."""
    res = []
    for pat, pid in patterns:
        pat = tuple(pat)
        if not pat or any(t < 0 for t in pat):
            continue
        L = len(pat)
        for i in range(len(tokens) - L + 1):
            if tuple(tokens[i : i + L]) == pat:
                res.append((i, i + L, pid))
    return res
