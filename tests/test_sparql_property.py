"""Property test: the SPARQL TEXT front-end lowers every generated
query to exactly the structured-API plan — solutions identical as
multisets. The generator covers variable/constant mixes in all three
positions, prefixed + full-IRI predicates, OPTIONAL, FILTER, DISTINCT
and projection subsets; both forms share the planner, so divergence
means a parser bug (term handling, keyword scan, group splitting)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

TERMS = ["a", "b", "c", "d"]
VARS = ["?x", "?y", "?z"]
PREDS = ["ex:p", "ex:q", "<http://ex.org/r>"]
PRED_VALS = {"ex:p": "ex:p", "ex:q": "ex:q",
             "<http://ex.org/r>": "http://ex.org/r"}

term_s = st.sampled_from(TERMS + VARS)
pred_s = st.sampled_from(PREDS + ["?p"])
pattern_s = st.tuples(term_s, pred_s, term_s)


def _vars_of(pats):
    out = []
    for p in pats:
        for t in p:
            if t.startswith("?") and t[1:] not in out:
                out.append(t[1:])
    return out


def _structured(pat):
    s, p, o = pat
    return (s, PRED_VALS.get(p, p), o)


@st.composite
def queries(draw):
    pats = draw(st.lists(pattern_s, min_size=1, max_size=3))
    req_vars = _vars_of(pats)
    opt = None
    if req_vars and draw(st.booleans()):
        shared = draw(st.sampled_from(req_vars))
        new = next((v[1:] for v in VARS if v[1:] not in req_vars), None)
        obj = "?" + new if new and draw(st.booleans()) \
            else draw(st.sampled_from(TERMS))
        opt = (("?" + shared), draw(st.sampled_from(PREDS)), obj)
    filt = None
    if req_vars and draw(st.booleans()):
        filt = (draw(st.sampled_from(req_vars)),
                draw(st.sampled_from(TERMS)))
    all_vars = _vars_of(pats + ([opt] if opt else []))
    proj = draw(st.sampled_from([None] + all_vars)) if all_vars else None
    distinct = draw(st.booleans())
    return pats, opt, filt, proj, distinct


@settings(max_examples=40, deadline=None)
@given(queries())
def test_text_form_equals_structured_form(spark_prop, q):
    from dbpedia_spotlight_spark.operators.ontology import (
        bgp_match, bgp_select)
    from dbpedia_spotlight_spark.operators.sparql import sparql
    pats, opt, filt, proj, distinct = q
    kg = spark_prop
    body = " . ".join(" ".join(p) for p in pats)
    if opt:
        body += " OPTIONAL { %s } " % " ".join(opt)
    if filt:
        body += " FILTER(?%s != '%s') " % filt
    sel = ("?" + proj) if proj else "*"
    text = "PREFIX ex: <urn:ex:> SELECT %s%s WHERE { %s }" % (
        "DISTINCT " if distinct else "", sel, body)

    def to_struct(p):
        s, pr, o = p
        pr = PRED_VALS.get(pr, pr)
        if pr.startswith("<"):
            pr = pr[1:-1]
        elif pr.startswith("ex:"):
            pr = "urn:ex:" + pr[3:]
        return (s, pr, o)

    kwargs = dict(
        optional=[[to_struct(opt)]] if opt else None,
        filters=["%s != '%s'" % filt] if filt else None,
    )
    try:
        want_df = bgp_select(
            kg, [to_struct(p) for p in pats],
            select_vars=(["?" + proj] if proj else None),
            distinct=distinct, **kwargs)
    except ValueError:
        import pytest
        with pytest.raises(ValueError):
            sparql(kg, text).collect()
        return
    got_df = sparql(kg, text)
    assert sorted(got_df.columns) == sorted(want_df.columns), text
    cols = sorted(got_df.columns)
    got = Counter(tuple(r[c] for c in cols) for r in got_df.collect())
    want = Counter(tuple(r[c] for c in cols) for r in want_df.collect())
    assert got == want, text
