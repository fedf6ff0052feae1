"""Entity resolution (operators/er.py): blocking, the quadratic guard,
both verify rules, and the compose-through to canonicalize_triples."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _kg(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_er_candidates_blocks_on_shared_keys_and_counts(spark):
    from dbpedia_spotlight_spark.operators.er import er_candidates
    kg = _kg(spark, [
        ("E1", "ex:homepage", "https://acme.example/"),
        ("E2", "ex:homepage", "https://acme.example/"),
        ("E1", "ex:vatid", "VAT-7"),
        ("E2", "ex:vatid", "VAT-7"),
        ("E3", "ex:homepage", "https://other.example/"),
        ("E1", "foaf:name", "Acme"),          # non-key pred — ignored
        ("E3", "foaf:name", "Acme"),
    ])
    got = {(r.a, r.b, r.n_shared) for r in er_candidates(
        kg, ["ex:homepage", "ex:vatid"]).collect()}
    assert got == {("E1", "E2", 2)}


def test_er_candidates_drops_overcap_blocks(spark):
    from dbpedia_spotlight_spark.operators.er import er_candidates
    rows = [(f"E{i}", "ex:country", "X") for i in range(6)]
    rows += [("E0", "ex:vatid", "V"), ("E1", "ex:vatid", "V")]
    got = {(r.a, r.b) for r in er_candidates(
        _kg(spark, rows), ["ex:country", "ex:vatid"],
        max_block=4).collect()}
    # the 6-member country block is boilerplate (over cap) — only the
    # 2-member vatid block survives
    assert got == {("E0", "E1")}


def test_er_sameas_verify_rules(spark):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    kg = _kg(spark, [
        # pair 1: one shared key, names 1 edit apart → name rule fires
        ("E1", "ex:homepage", "https://a.example/"),
        ("E1v", "ex:homepage", "https://a.example/"),
        ("E1", "foaf:name", "Acme Corp"),
        ("E1v", "foaf:name", "Acme Corp."),
        # pair 2: one shared key, names far apart → dropped
        ("E2", "ex:homepage", "https://b.example/"),
        ("E2x", "ex:homepage", "https://b.example/"),
        ("E2", "foaf:name", "Globex"),
        ("E2x", "foaf:name", "Initech Holdings"),
        # pair 3: TWO shared keys, no names at all → min_shared rule
        ("E3", "ex:homepage", "https://c.example/"),
        ("E3v", "ex:homepage", "https://c.example/"),
        ("E3", "ex:vatid", "VAT-3"),
        ("E3v", "ex:vatid", "VAT-3"),
    ])
    got = {(r.a, r.b, r.n_shared, r.name_dist) for r in er_sameas(
        kg, ["ex:homepage", "ex:vatid"], max_name_dist=1,
        min_shared=2).collect()}
    assert got == {("E1", "E1v", 1, 1), ("E3", "E3v", 2, None)}


def test_er_sameas_casefolds_and_takes_best_name_pair(spark):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    kg = _kg(spark, [
        ("E1", "ex:k", "K"), ("E2", "ex:k", "K"),
        ("E1", "foaf:name", "ACME"),
        ("E1", "foaf:name", "Totally Different"),
        ("E2", "foaf:name", "acme"),
    ])
    [r] = er_sameas(kg, ["ex:k"], max_name_dist=0, min_shared=2).collect()
    assert (r.a, r.b, r.name_dist) == ("E1", "E2", 0)


def test_er_sameas_feeds_canonicalize(spark):
    """Discovered edges collapse variant URIs in the snapshot — the
    full repair loop: er_sameas → canonicalize_triples."""
    from dbpedia_spotlight_spark.operators.er import er_sameas
    from dbpedia_spotlight_spark.triples import canonicalize_triples
    kg = _kg(spark, [
        ("E1", "ex:homepage", "https://a.example/"),
        ("E1v", "ex:homepage", "https://a.example/"),
        ("E1", "foaf:name", "Acme"),
        ("E1v", "foaf:name", "Acme"),
        ("m1", "itsrdf:taIdentRef", "E1"),
        ("m2", "itsrdf:taIdentRef", "E1v"),
    ])
    edges = er_sameas(kg, ["ex:homepage"], max_name_dist=1, min_shared=2)
    fixed = canonicalize_triples(kg, edges.select("a", "b"))
    objs = {r.obj for r in fixed.filter(
        F.col("pred") == "itsrdf:taIdentRef").collect()}
    assert objs == {"E1"}
    # the two homepage triples collapsed into one
    assert fixed.filter(F.col("pred") == "ex:homepage").count() == 1


def test_er_plan_has_no_cartesian(spark):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    kg = _kg(spark, [("E1", "ex:k", "K"), ("E2", "ex:k", "K"),
                     ("E1", "foaf:name", "a"), ("E2", "foaf:name", "b")])
    plan = (er_sameas(kg, ["ex:k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_er_star_mode_survives_mega_blocks(spark):
    """A block past max_block is dropped in 'all' mode but yields
    linear founder edges in 'star' mode — the verify stage then keeps
    only true matches, so the clone family still resolves."""
    from dbpedia_spotlight_spark.operators.er import (
        er_candidates, er_sameas)
    rows = []
    for i in range(8):                       # one 8-member homepage block
        rows += [(f"E{i}", "ex:homepage", "https://big.example/"),
                 (f"E{i}", "foaf:name",
                  "Acme" if i < 3 else f"Other {i} Inc")]
    kg = _kg(spark, rows)
    assert er_candidates(kg, ["ex:homepage"], max_block=4).count() == 0
    star = {(r.a, r.b) for r in er_candidates(
        kg, ["ex:homepage"], mode="star").collect()}
    assert star == {("E0", f"E{i}") for i in range(1, 8)}
    verified = {(r.a, r.b) for r in er_sameas(
        kg, ["ex:homepage"], max_name_dist=0, min_shared=2,
        mode="star").collect()}
    # only the founder's true clones (same name) survive the verify
    assert verified == {("E0", "E1"), ("E0", "E2")}


def test_er_star_counts_shared_keys_across_blocks(spark):
    from dbpedia_spotlight_spark.operators.er import er_candidates
    kg = _kg(spark, [
        ("E1", "ex:homepage", "H"), ("E2", "ex:homepage", "H"),
        ("E1", "ex:vatid", "V"), ("E2", "ex:vatid", "V"),
    ])
    [r] = er_candidates(kg, ["ex:homepage", "ex:vatid"],
                        mode="star").collect()
    assert (r.a, r.b, r.n_shared) == ("E1", "E2", 2)
