"""T1/T5 tokenizer offsets + P1 Aho-Corasick property tests
(SURVEY §5.2 item 3)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dbpedia_spotlight_spark.functions.automaton import (
    build_automaton, naive_find_all, resolve_overlaps,
)
from dbpedia_spotlight_spark.functions.tokenizer import tokenize


def test_tokenize_offsets():
    text = "Hello, World! O'Brien went to Baden-Baden."
    toks = tokenize(text)
    for b, e, t in toks:
        assert text[b:e].lower() == t
    assert [t for _, _, t in toks] == ["hello", "world", "o'brien", "went", "to", "baden-baden"]


def test_tokenize_lowercases_and_keeps_offsets():
    text = "Berlin Wall"
    toks = tokenize(text)
    assert toks == [(0, 6, "berlin"), (7, 11, "wall")]


def test_automaton_basic():
    # patterns over token ids
    ac = build_automaton([((1, 2), 0), ((2,), 1), ((1, 2, 3), 2)])
    found = set(ac.find_all([1, 2, 3, 2]))
    assert found == {(0, 2, 0), (1, 2, 1), (0, 3, 2), (3, 4, 1)}


def test_automaton_unknown_token_breaks_match():
    ac = build_automaton([((1, 2), 0)])
    assert ac.find_all([1, -1, 2]) == []
    assert ac.find_all([1, 2]) == [(0, 2, 0)]


def test_resolve_overlaps_longest_wins():
    # (0,3) contains (0,2) and (1,2): keep longest from same start, then next
    kept = resolve_overlaps([(0, 2, 0), (0, 3, 2), (1, 2, 1), (3, 4, 1)])
    assert kept == [(0, 3, 2), (3, 4, 1)]


def test_resolve_overlaps_deterministic_tiebreak():
    kept = resolve_overlaps([(0, 2, 5), (0, 2, 3)])
    assert kept == [(0, 2, 3)]


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=6), max_size=40),
    pats=st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=4),
        min_size=1, max_size=8,
    ),
)
def test_automaton_equals_naive(tokens, pats):
    patterns = [(tuple(p), i) for i, p in enumerate(pats)]
    ac = build_automaton(patterns)
    assert sorted(ac.find_all(tokens)) == sorted(naive_find_all(tokens, patterns))


def test_tokenize_fast_path_matches_per_token_lower():
    """The whole-text-lower fast path must be positionwise identical to
    per-token lowercasing, and the length guard must catch one-to-many
    casefolds (U+0130 expands under str.lower)."""
    from hypothesis import given, settings, strategies as st
    from dbpedia_spotlight_spark.functions.tokenizer import (
        _TOKEN_RE, tokenize,
    )

    def reference(text):
        return [(m.start(), m.end(), m.group(0).lower())
                for m in _TOKEN_RE.finditer(text)]

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32,
                                          max_codepoint=0x2FF),
                   max_size=80))
    def inner(text):
        assert tokenize(text) == reference(text)

    inner()
    # explicit regressions: expanding casefold before/inside/after tokens
    for text in ("İstanbul is big", "xİx abc", "abc İ", "ŉandi"):
        assert tokenize(text) == reference(text), text
