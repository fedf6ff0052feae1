"""Offset-preserving tokenizer (SURVEY.md §2.2 T1/T5).

Reference behavior: ``db/model/LanguageIndependentTokenizer.scala`` [U]
uses locale BreakIterators to emit tokens with character offsets; the
surface-form store lowercases for lookup
(``db/memory/MemorySurfaceFormStore.scala`` [U]). We use a deterministic
regex tokenizer (no ICU dependency), which is sufficient because both the
model build and the request path share it — self-consistency is what the
planted-fixture P/R gate measures.

Offsets refer to the *extracted text* (the ``text`` column), which is the
coordinate system for triple subjects ``url#char=begin,end``.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# Word characters incl. digits; apostrophes/hyphens kept inside tokens so
# "O'Brien" and "Baden-Baden" stay single tokens (they may be surface forms).
_TOKEN_RE = re.compile(r"[0-9A-Za-zÀ-ɏ]+(?:['\-][0-9A-Za-zÀ-ɏ]+)*")


def tokenize(text: str) -> list[tuple[int, int, str]]:
    """Return [(begin, end, token_lower)] with [begin, end) char spans.

    Fast path: lowercase the WHOLE text once (C-speed) and slice tokens
    out of it — ~2× cheaper than a per-match ``.group(0).lower()``.
    Python's ``str.lower`` maps each code point independently, so when
    the lowercased text has the SAME length as the original, slicing by
    the original match spans is positionwise identical to per-token
    lowercasing; one-to-many casefolds (U+0130 İ → 2 codepoints) change
    the length, and that rare case falls back to the per-token form."""
    low = text.lower()
    if len(low) == len(text):
        out = []
        ap = out.append
        for m in _TOKEN_RE.finditer(text):
            b, e = m.span()
            ap((b, e, low[b:e]))
        return out
    return [(m.start(), m.end(), m.group(0).lower())
            for m in _TOKEN_RE.finditer(text)]


def tokenize_ids(
    text: str, token_index: dict[str, int]
) -> tuple[list[int], list[int], list[int]]:
    """Tokenize and map to dense token-type ids (SURVEY §2.2 T4).

    Unknown tokens get id -1 (kept for offset bookkeeping; they can never
    match a surface form but still break adjacency in the automaton).
    Returns (begins, ends, ids) parallel lists.
    """
    begins: list[int] = []
    ends: list[int] = []
    ids: list[int] = []
    for b, e, tok in tokenize(text):
        begins.append(b)
        ends.append(e)
        ids.append(token_index.get(tok, -1))
    return begins, ends, ids


def token_counts(tokens: Iterable[str], stopwords: frozenset[str]) -> dict[str, int]:
    """Bag-of-words counts with stopword removal (T3) — the per-paragraph
    context query of the two-step disambiguator (SURVEY §2.5 D1)."""
    out: dict[str, int] = {}
    for t in tokens:
        if t not in stopwords:
            out[t] = out.get(t, 0) + 1
    return out
