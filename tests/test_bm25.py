"""BM25 retrieval (operators/bm25.py) against a from-scratch python
twin of the Okapi/Lucene formula on a hand-built corpus, plus the
index-amortization and top-k determinism contracts. (DuckDB pairing:
rotated `bm25_rank` in queries.py.)"""

from __future__ import annotations

import math

import pytest

from dbpedia_spotlight_spark.operators import bm25 as B

CORPUS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark spark spark tuning guide for spark jobs"),
    (2, "a long document about query planning and query optimization "
        "with many filler words appended here to stretch the length "
        "of this particular document well past the corpus average"),
    (3, "join strategies broadcast join shuffle join sort merge join"),
    (4, "completely unrelated text about gardening and tomatoes"),
    (5, ""),
]


def _py_bm25(corpus, query, k1=B.K1, b=B.B):
    docs = {i: t.strip().lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    q = sorted({t.lower() for t in query})
    out = {}
    for i, words in docs.items():
        score, hits = 0.0, 0
        for t in q:
            tf = words.count(t)
            if not tf:
                continue
            df = sum(1 for w in docs.values() if t in w)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(words) / avgdl))
            hits += 1
        if hits:
            out[i] = (score, hits)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_scores_match_python_twin(docs):
    got = {r.doc_id: (r.score, r.n_hit)
           for r in B.bm25_scores(docs, ["spark", "query", "join"])
           .collect()}
    want = _py_bm25(CORPUS, ["spark", "query", "join"])
    assert set(got) == set(want)          # only matching docs, no 4/5
    for i in want:
        assert got[i][1] == want[i][1]
        assert abs(got[i][0] - want[i][0]) < 1e-9


def test_tf_saturation_and_length_norm(docs):
    s = {r.doc_id: r.score for r in
         B.bm25_scores(docs, ["spark"]).collect()}
    # tf saturates: 5 occurrences score more than 1 but far under 5x
    assert s[1] > s[0]
    assert s[1] < 3 * s[0]
    s2 = {r.doc_id: r.score for r in
          B.bm25_scores(docs, ["query"]).collect()}
    assert list(s2) == [2]                # only the long doc matches
    # length normalization: the long doc's per-term score is damped
    # below a hypothetical average-length doc with the same tf
    n, df = len(CORPUS), 1
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    undamped = idf * 2 * (B.K1 + 1) / (2 + B.K1)
    assert s2[2] < undamped


def test_prematerialized_index_path_identical(docs):
    post = B.term_postings(docs)
    dl = B.doc_lengths(docs)
    a = sorted((r.doc_id, round(r.score, 12)) for r in
               B.bm25_scores(docs, ["spark", "join"]).collect())
    b = sorted((r.doc_id, round(r.score, 12)) for r in
               B.bm25_scores(docs, ["spark", "join"],
                             postings=post, lengths=dl).collect())
    assert a == b


def test_topk_deterministic_order(docs):
    top = B.bm25_topk(docs, ["spark", "join"], k=2).collect()
    assert len(top) == 2
    assert top[0].score >= top[1].score
    want = _py_bm25(CORPUS, ["spark", "join"])
    best = sorted(want, key=lambda i: (-want[i][0], i))[:2]
    assert [r.doc_id for r in top] == best


def test_empty_query_raises(docs):
    with pytest.raises(ValueError):
        B.bm25_scores(docs, ["  "])


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        B.bm25_scores(empty, ["spark"])


def test_query_terms_stripped_and_deduped(docs):
    a = sorted((r.doc_id, round(r.score, 12)) for r in
               B.bm25_scores(docs, ["spark", "join"]).collect())
    b = sorted((r.doc_id, round(r.score, 12)) for r in
               B.bm25_scores(docs, ["  Spark ", "JOIN", "join "])
               .collect())
    assert a == b
