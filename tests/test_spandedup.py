"""Exact duplicate-span dedup (operators/spandedup.py) — a from-scratch
pure-python reference implements the same ExactSubstr-style rule
(k-word grams, kept-first masking) and every operator output is checked
against it on a hand-built corpus with planted duplication shapes:
cross-doc syndicated runs, within-doc repetition, overlapping spans,
docs shorter than k, and empty text. (The DuckDB pairing lives in
queries.py: registry `dup_span_stats` + rotated `dup_spans`.)"""

from __future__ import annotations

import pytest

from dbpedia_spotlight_spark.operators import spandedup as S

K = 4

CORPUS = [
    # 0/1 share an 8-word syndicated run (5 duplicated 4-grams each)
    (0, "Breaking news the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog said reporters"),
    # 2: unique text, no duplication
    (2, "completely original prose with no repeated span anywhere here"),
    # 3: within-doc repetition ONLY (invisible at scope='docs')
    (3, "again and again and again and again and again and again"),
    # 4: shorter than k — emits no grams at all
    (4, "too short"),
    # 5: empty text
    (5, ""),
    # 6: shares a run with 0 AND 1 (three-doc gram)
    (6, "all saw the quick brown fox jumps clear"),
]


def _py_words(text: str) -> list[str]:
    t = text.strip().lower()
    import re
    return re.split(r"\s+", t) if t else []


def _py_grams(text: str, k: int) -> list[str]:
    w = _py_words(text)
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


def _py_dup(corpus, k, min_dup=2, scope="docs"):
    """Reference: gram -> list[(doc, pos)], filtered to duplicated."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, text in corpus:
        for pos, g in enumerate(_py_grams(text, k)):
            occ.setdefault(g, []).append((doc_id, pos))
    if scope == "docs":
        return {g: v for g, v in occ.items()
                if len({d for d, _ in v}) >= min_dup}
    return {g: v for g, v in occ.items() if len(v) >= min_dup}


def _py_stats(corpus, k, scope="docs"):
    dup = _py_dup(corpus, k, scope=scope)
    out = {}
    for doc_id, text in corpus:
        covered: set[int] = set()
        n_grams = 0
        for g, v in dup.items():
            for d, p in v:
                if d == doc_id:
                    n_grams += 1
                    covered.update(range(p, p + k))
        out[doc_id] = (len(_py_words(text)), n_grams, len(covered))
    return out


def _py_mask(corpus, k, scope="docs"):
    dup = _py_dup(corpus, k, scope=scope)
    out = {}
    for doc_id, text in corpus:
        keep_cov: set[int] = set()
        lose_cov: set[int] = set()
        for g, v in dup.items():
            keeper = min(v)
            for d, p in v:
                if d != doc_id:
                    continue
                tgt = keep_cov if (d, p) == keeper else lose_cov
                tgt.update(range(p, p + k))
        drop = lose_cov - keep_cov
        words = [w for i, w in enumerate(text.strip().split())
                 if i not in drop]
        out[doc_id] = (" ".join(words), len(drop))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_gram_occurrences_match_reference(docs):
    got = {(r.doc_id, r.pos, r.gram)
           for r in S.gram_occurrences(docs, K, carry_gram=True).collect()}
    want = {(d, p, g) for d, t in CORPUS
            for p, g in enumerate(_py_grams(t, K))}
    assert got == want
    # short and empty docs emit nothing
    assert not [r for r in got if r[0] in (4, 5)]


@pytest.mark.parametrize("scope", ["docs", "occurrences"])
def test_duplicate_spans_match_reference(docs, scope):
    got = {(r.doc_id, r.pos, r.gram, r.n_dup)
           for r in S.duplicate_spans(docs, K, scope=scope,
                                      carry_gram=True).collect()}
    want = set()
    for g, v in _py_dup(CORPUS, K, scope=scope).items():
        n = len({d for d, _ in v}) if scope == "docs" else len(v)
        want |= {(d, p, g, n) for d, p in v}
    assert got == want
    if scope == "docs":
        # within-doc-only repetition (doc 3) is invisible at scope='docs'
        assert not [r for r in got if r[0] == 3]
    else:
        assert [r for r in got if r[0] == 3]


def test_stats_match_reference_and_cover_all_docs(docs):
    rows = S.duplicate_span_stats(docs, K).collect()
    assert {r.doc_id for r in rows} == {d for d, _ in CORPUS}
    want = _py_stats(CORPUS, K)
    for r in rows:
        assert (r.n_words, r.n_dup_grams, r.dup_positions) == want[r.doc_id]
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].n_dup_grams == 0          # unique doc → zeros
    assert by_id[5].n_words == 0              # empty text pinned to 0
    assert by_id[0].dup_positions > 0


@pytest.mark.parametrize("scope", ["docs", "occurrences"])
def test_mask_matches_reference(docs, scope):
    rows = S.mask_duplicate_spans(docs, K, scope=scope).collect()
    want = _py_mask(CORPUS, K, scope=scope)
    assert len(rows) == len(CORPUS)
    for r in rows:
        assert (r.clean_text, r.n_words_dropped) == want[r.doc_id], r.doc_id


def test_mask_kept_first_and_keeper_protected(docs):
    by_id = {r.doc_id: r for r in
             S.mask_duplicate_spans(docs, K).collect()}
    # keeper = min (doc_id, pos): doc 0 keeps every shared span intact
    assert by_id[0].clean_text == CORPUS[0][1]
    assert by_id[0].n_words_dropped == 0
    # doc 1 loses exactly the positions covered only by shared grams
    assert by_id[1].n_words_dropped > 0
    assert "said reporters" in by_id[1].clean_text
    # untouched docs come back verbatim (single-space normalization
    # is a no-op on these fixtures)
    assert by_id[2].clean_text == CORPUS[2][1]
    assert by_id[5].clean_text == ""


def test_case_fold_matching_rebuild_preserves_case(spark):
    docs = spark.createDataFrame(
        [(0, "The Quick Brown Fox Jumps High"),
         (1, "the quick brown fox jumps low"),
         (2, "THE QUICK BROWN FOX JUMPS AGAIN")],
        ["doc_id", "text"])
    spans = S.duplicate_spans(docs, 5, carry_gram=True).collect()
    assert {r.gram for r in spans} == {"the quick brown fox jumps"}
    assert {r.n_dup for r in spans} == {3}
    by_id = {r.doc_id: r for r in S.mask_duplicate_spans(docs, 5).collect()}
    # doc 0 is the keeper and keeps its original casing verbatim
    assert by_id[0].clean_text == "The Quick Brown Fox Jumps High"
    assert by_id[1].clean_text == "low"
    assert by_id[2].clean_text == "AGAIN"
