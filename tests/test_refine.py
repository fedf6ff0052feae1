"""KG refinement (operators/refine.py): entity_summary ranking
semantics, schema_graph quotient counts, predict_types SDType math —
each against an independent python reference on mixed fixtures."""

from __future__ import annotations

import math

import pytest

from dbpedia_spotlight_spark.operators.refine import (
    entity_summary, predict_types, schema_graph)


def _kg(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


# ---------------------------------------------------------------------------
# entity_summary

def test_entity_summary_prefers_distinguishing_facts(spark):
    # e1/e2/e3 all share type=Person (idf 0 → never summarizable first);
    # e1 alone has a birthPlace value nobody shares
    rows = [
        ("e1", "type", "Person"), ("e2", "type", "Person"),
        ("e3", "type", "Person"),
        ("e1", "birthPlace", "Springfield"),
        ("e2", "birthPlace", "Shelbyville"), ("e3", "birthPlace", "Shelbyville"),
        ("e1", "award", "Gold Medal"),
        ("e1", "award", "Gold Medal"),          # dup assertion: collapsed
    ]
    out = entity_summary(_kg(spark, rows), k=2).collect()
    by = {}
    for r in out:
        by.setdefault(r.subj, []).append(r)
    for subj in by:
        by[subj].sort(key=lambda r: r.rank)
    # e1: award (idf ln(3/1)=1.0986, excl 1) beats birthPlace
    # (idf ln(3/3)=0 ... wait birthPlace used by all 3 → idf 0) —
    # top fact must be award, then birthPlace/type tie on score 0,
    # pred name breaks the tie (birthPlace < type)
    assert [r.pred for r in by["e1"]] == ["award", "birthPlace"]
    assert by["e1"][0].obj == "Gold Medal"
    assert by["e1"][0].score == pytest.approx(math.log(3), abs=1e-9)
    # e2/e3 share birthPlace value: exclusivity 1/2, idf 0 → score 0
    assert by["e2"][0].score == 0.0
    # k bound respected and ranks are 1..k dense
    assert all(len(v) <= 2 and [r.rank for r in v] == list(
        range(1, len(v) + 1)) for v in by.values())


def test_entity_summary_python_reference(spark):
    """Full parity on a 60-fact random-ish fixture."""
    preds = ["p0", "p1", "p2", "p3"]
    rows = []
    for i in range(20):
        e = f"e{i}"
        rows.append((e, preds[i % 4], f"v{i % 7}"))
        rows.append((e, preds[(i + 1) % 4], f"v{i % 3}"))
        rows.append((e, "common", "shared"))
    facts = sorted(set(rows))
    n_subj = len({s for s, _, _ in facts})
    np_ = {}
    nv = {}
    for p in {p for _, p, _ in facts}:
        np_[p] = len({s for s, q, _ in facts if q == p})
    for key in {(p, o) for _, p, o in facts}:
        nv[key] = len({s for s, p, o in facts if (p, o) == key})
    want = {}
    for s, p, o in facts:
        idf = round(math.log(n_subj / np_[p]), 9)
        excl = round(1.0 / nv[(p, o)], 9)
        want.setdefault(s, []).append(
            (-round(idf * excl, 9), p, o))
    for s in want:
        want[s] = [(p, o) for _, p, o in sorted(want[s])][:3]
    got = {}
    for r in entity_summary(_kg(spark, rows), k=3).collect():
        got.setdefault(r.subj, []).append((r.rank, r.pred, r.obj))
    got = {s: [(p, o) for _, p, o in sorted(v)] for s, v in got.items()}
    assert got == want
    with pytest.raises(ValueError, match="k"):
        entity_summary(_kg(spark, rows), k=0)


# ---------------------------------------------------------------------------
# schema_graph

def test_schema_graph_quotient(spark):
    kg = _kg(spark, [
        ("a", "knows", "b"), ("a", "knows", "c"), ("b", "knows", "c"),
        ("a", "owns", "x"),
        ("a", "rdf:type", "Person"),       # typing rows excluded as edges
        ("a", "knows", "b"),               # dup fact: counted once
    ])
    types = _kg(spark, [
        ("a", "rdf:type", "Person"), ("b", "rdf:type", "Person"),
        ("c", "rdf:type", "Robot"), ("c", "rdf:type", "Agent"),
    ])
    got = {(r.src_type, r.pred, r.dst_type): (r.n_triples, r.n_subjects)
           for r in schema_graph(kg, types).collect()}
    assert got == {
        ("Person", "knows", "Person"): (1, 1),    # a→b
        ("Person", "knows", "Robot"): (2, 2),     # a→c, b→c
        ("Person", "knows", "Agent"): (2, 2),     # multi-type c
        ("Person", "owns", "owl:Thing"): (1, 1),  # untyped object
    }


def test_schema_graph_untyped_subject_and_custom_label(spark):
    kg = _kg(spark, [("u", "p", "a")])
    types = _kg(spark, [("a", "rdf:type", "T")])
    (r,) = schema_graph(kg, types, untyped="UNK").collect()
    assert (r.src_type, r.pred, r.dst_type) == ("UNK", "p", "T")


# ---------------------------------------------------------------------------
# predict_types

def _sdtype_reference(facts, typing, min_conf, top_k):
    facts = sorted({(s, p, o) for s, p, o in facts if p != "rdf:type"})
    t = {}
    for e, tt in typing:
        t.setdefault(e, set()).add(tt)
    slots = sorted({(s, p, "out") for s, p, _ in facts}
                   | {(o, p, "in") for _, p, o in facts})
    # conditional distribution per slot over the typed population
    pop = {}
    bytype = {}
    for e, p, d in slots:
        if e in t:
            pop.setdefault((p, d), set()).add(e)
            for tt in t[e]:
                bytype.setdefault((p, d, tt), set()).add(e)
    conf = {k: len(v) / len(pop[(k[0], k[1])]) for k, v in bytype.items()}
    w = {}
    for (p, d, tt), c in conf.items():
        w[(p, d)] = w.get((p, d), 0.0) + c * c
    out = {}
    for e in sorted({e for e, _, _ in slots}):
        if e in t:
            continue
        mine = [(p, d) for (ee, p, d) in slots if ee == e]
        den = sum(w.get(s, 0.0) for s in mine if s in w)
        if den == 0:
            continue
        num = {}
        for (p, d) in mine:
            for tt in {tt for (pp, dd, tt) in conf if (pp, dd) == (p, d)}:
                num[tt] = num.get(tt, 0.0) + w[(p, d)] * conf[(p, d, tt)]
        ranked = sorted(((round(n / den, 9), tt) for tt, n in num.items()),
                        key=lambda x: (-x[0], x[1]))
        out[e] = [(tt, sc) for sc, tt in ranked if sc >= min_conf][:top_k]
    return {e: v for e, v in out.items() if v}


def test_predict_types_basic_inheritance(spark):
    """An untyped entity filling a slot only Persons fill gets Person
    with confidence 1; a slot split 2:1 yields the 2/3-1/3 split."""
    rows = [
        ("p1", "worksFor", "c1"), ("p2", "worksFor", "c1"),
        ("r1", "worksFor", "c2"),
        ("x", "worksFor", "c1"),          # untyped: 2 Person, 1 Robot
    ]
    types = _kg(spark, [
        ("p1", "rdf:type", "Person"), ("p2", "rdf:type", "Person"),
        ("r1", "rdf:type", "Robot"),
        ("c1", "rdf:type", "Org"), ("c2", "rdf:type", "Org"),
    ])
    got = {(r.subj, r.type): (r.score, r.rank)
           for r in predict_types(_kg(spark, rows), types).collect()}
    assert got[("x", "Person")] == (pytest.approx(2 / 3), 1)
    assert got[("x", "Robot")] == (pytest.approx(1 / 3), 2)
    assert not any(s != "x" for s, _ in got)   # typed entities: no rows


def test_predict_types_python_reference(spark):
    """Parity with the from-scratch SDType reference on a mixed graph:
    multi-slot evidence, discriminative weighting, abstention."""
    facts = []
    typing = []
    for i in range(12):
        e = f"t{i}"
        typing.append((e, ["A", "B", "C"][i % 3]))
        facts.append((e, f"p{i % 3}", f"o{i % 4}"))      # pred aligned w/ type
        facts.append((e, "shared", f"o{i % 2}"))          # uninformative slot
    # untyped probes: u0 strongly A-slotted, u1 mixed, u2 evidence-free slot
    facts += [("u0", "p0", "o1"), ("u0", "shared", "o0"),
              ("u1", "p1", "o2"), ("u1", "p2", "o3"),
              ("u2", "brandnew", "nowhere")]
    # objects are o*/nowhere — untyped, they form 'in' slots for typed pop
    kg = _kg(spark, facts)
    types = _kg(spark, [(e, "rdf:type", tt) for e, tt in typing])
    for min_conf, top_k in [(0.0, 3), (0.3, 2), (0.0, 1)]:
        want = _sdtype_reference(facts, typing, min_conf, top_k)
        got = {}
        for r in predict_types(kg, types, min_conf=min_conf,
                               top_k=top_k).collect():
            got.setdefault(r.subj, []).append((r.rank, r.type, r.score))
        got = {e: [(tt, sc) for _, tt, sc in sorted(v)]
               for e, v in got.items()}
        assert set(got) == set(want)
        for e in want:
            assert [tt for tt, _ in got[e]] == [tt for tt, _ in want[e]], e
            for (tt_g, sc_g), (tt_w, sc_w) in zip(got[e], want[e]):
                assert sc_g == pytest.approx(sc_w, abs=1e-9), (e, tt_g)
    # u2's only slot was never filled by a typed entity: abstains
    assert "u2" not in {r.subj for r in predict_types(kg, types).collect()}
    with pytest.raises(ValueError, match="top_k"):
        predict_types(kg, types, top_k=0)


def test_predict_types_layout_independence(spark):
    facts = [(f"e{i}", f"p{i % 4}", f"e{(i + 3) % 15}") for i in range(30)]
    typing = [(f"e{i}", ["X", "Y"][i % 2]) for i in range(0, 15, 2)]
    kg = _kg(spark, facts)
    types = _kg(spark, [(e, "rdf:type", t) for e, t in typing])
    base = sorted(map(tuple, predict_types(kg, types).collect()))
    shuf = sorted(map(tuple, predict_types(
        kg.repartition(7, "obj"), types).collect()))
    assert base == shuf
