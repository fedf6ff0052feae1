"""Property test: the DuckDB duplicate-span oracle (queries.py::
_sql_dup_grams construction, k parameterized) equals the from-scratch
python reference on ARBITRARY corpora — hardens the oracle beyond the
fixed driver corpus. A 3-word alphabet forces dense duplication at
k=3; whitespace noise exercises the trim/split parity pins. (The Spark
side is covered by the hash-exact contract tests at both SFs and by
tests/test_spandedup.py.)"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from dbpedia_spotlight_spark.queries import _sql_dup_grams
from tests.test_spandedup import _py_dup, _py_stats

K = 3

_word = st.sampled_from(["a", "b", "c", "ab"])
_sep = st.sampled_from([" ", "  ", " \t "])
_doc = st.tuples(st.lists(_word, max_size=25), _sep,
                 st.sampled_from(["", " ", "  "]))
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _render(doc) -> str:
    words, sep, pad = doc
    return pad + sep.join(words) + pad


def _oracle(texts: list[str], k: int):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    spans = con.execute(
        _sql_dup_grams(k) + " SELECT doc_id, pos, g, n_dup FROM spans"
    ).fetchall()
    stats = con.execute(_sql_dup_grams(k) + f""",
      cov AS (
        SELECT DISTINCT doc_id, pos + j AS p
        FROM spans, LATERAL (SELECT unnest(generate_series(0, {k}-1)) AS j)
      ),
      pg AS (SELECT doc_id, count(*) AS n_dup_grams FROM spans
             GROUP BY doc_id),
      pp AS (SELECT doc_id, count(*) AS dup_positions FROM cov
             GROUP BY doc_id)
      SELECT w.doc_id, len(w.w), coalesce(pg.n_dup_grams, 0),
             coalesce(pp.dup_positions, 0)
      FROM w LEFT JOIN pg USING (doc_id) LEFT JOIN pp USING (doc_id)
    """).fetchall()
    return spans, stats


@settings(max_examples=60, deadline=None)
@given(_corpus)
def test_oracle_matches_python_reference(corpus):
    texts = [_render(d) for d in corpus]
    items = list(enumerate(texts))
    spans, stats = _oracle(texts, K)

    dup = _py_dup(items, K)
    want_spans = {(d, p, g, len({dd for dd, _ in v}))
                  for g, v in dup.items() for d, p in v}
    assert {tuple(r) for r in spans} == want_spans

    want_stats = _py_stats(items, K)
    got_stats = {r[0]: (r[1], r[2], r[3]) for r in stats}
    assert got_stats == want_stats
