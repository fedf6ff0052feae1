"""SPARQL text front-end (operators/sparql.py): the parser must
dispatch to the same ontology operators the structured API uses —
these tests mirror test_ontology.py expectations through query text."""

from __future__ import annotations

import pytest

from dbpedia_spotlight_spark.operators.sparql import sparql

KG = [
    ("m1", "nif:anchorOf", "Spark"),
    ("m1", "itsrdf:taIdentRef", "Apache_Spark"),
    ("m2", "nif:anchorOf", "Hadoop"),
    ("m2", "itsrdf:taIdentRef", "Apache_Hadoop"),
    ("m3", "nif:anchorOf", "Spark"),
    ("m3", "itsrdf:taIdentRef", "Apache_Spark"),
    ("Apache_Spark", "rdf:type", "Software"),
    ("Apache_Hadoop", "rdf:type", "Software"),
    ("Software", "rdfs:subClassOf", "Work"),
    ("Work", "rdfs:subClassOf", "Thing"),
]


@pytest.fixture()
def kg(spark):
    return spark.createDataFrame(
        KG, "subj string, pred string, obj string")


def test_select_join_and_a_keyword(kg):
    got = {(r.m, r.e) for r in sparql(kg, """
        SELECT ?m ?e WHERE {
          ?m itsrdf:taIdentRef ?e .
          ?e a Software .
        }""").collect()}
    assert got == {("m1", "Apache_Spark"), ("m3", "Apache_Spark"),
                   ("m2", "Apache_Hadoop")}


def test_semicolon_and_comma_abbreviations(kg):
    got = {(r.sf, r.e) for r in sparql(kg, """
        SELECT ?sf ?e WHERE {
          ?m nif:anchorOf ?sf ; itsrdf:taIdentRef ?e .
        }""").collect()}
    assert got == {("Spark", "Apache_Spark"), ("Hadoop", "Apache_Hadoop")}


def test_distinct_order_limit_offset(kg):
    rows = sparql(kg, """
        SELECT DISTINCT ?e WHERE { ?m itsrdf:taIdentRef ?e }
        ORDER BY DESC(?e) LIMIT 1""").collect()
    assert [r.e for r in rows] == ["Apache_Spark"]
    rows = sparql(kg, """
        SELECT DISTINCT ?e WHERE { ?m itsrdf:taIdentRef ?e }
        ORDER BY ?e LIMIT 1 OFFSET 1""").collect()
    assert [r.e for r in rows] == ["Apache_Spark"]


def test_filter_logic_and_string_functions(kg):
    got = {r.sf for r in sparql(kg, """
        SELECT ?sf WHERE {
          ?m nif:anchorOf ?sf .
          FILTER(?sf != 'Hadoop' && STRLEN(?sf) > 3)
        }""").collect()}
    assert got == {"Spark"}
    got = {r.sf for r in sparql(kg, """
        SELECT DISTINCT ?sf WHERE {
          ?m nif:anchorOf ?sf . FILTER(REGEX(?sf, '^Ha'))
        }""").collect()}
    assert got == {"Hadoop"}


def test_optional_keeps_unmatched(kg, spark):
    kg2 = kg.unionByName(spark.createDataFrame(
        [("m4", "nif:anchorOf", "Flink")],
        "subj string, pred string, obj string"))
    rows = {(r.sf, r.e) for r in sparql(kg2, """
        SELECT ?sf ?e WHERE {
          ?m nif:anchorOf ?sf .
          OPTIONAL { ?m itsrdf:taIdentRef ?e }
        }""").collect()}
    assert ("Flink", None) in rows
    assert ("Spark", "Apache_Spark") in rows


def test_values_and_bind(kg):
    got = {(r.e, r.len) for r in sparql(kg, """
        SELECT ?e ?len WHERE {
          ?m itsrdf:taIdentRef ?e .
          VALUES ?e { Apache_Spark }
          BIND(STRLEN(?e) AS ?len)
        }""").collect()}
    assert got == {("Apache_Spark", 12)}


def test_aggregate_group_by_having(kg):
    rows = sparql(kg, """
        SELECT ?e (COUNT(*) AS ?n) WHERE {
          ?m itsrdf:taIdentRef ?e .
        } GROUP BY ?e HAVING (?n > 1)""").collect()
    assert [(r.e, r.n) for r in rows] == [("Apache_Spark", 2)]


def test_global_aggregate_without_group(kg):
    [r] = sparql(kg, """
        SELECT (COUNT(DISTINCT ?e) AS ?n_entities) WHERE {
          ?m itsrdf:taIdentRef ?e .
        }""").collect()
    assert r.n_entities == 2


def test_property_path_and_minus(kg):
    got = {r.sup for r in sparql(kg, """
        SELECT ?sup WHERE { Software rdfs:subClassOf+ ?sup }""").collect()}
    assert got == {"Work", "Thing"}
    got = {r.e for r in sparql(kg, """
        SELECT ?e WHERE {
          ?m itsrdf:taIdentRef ?e .
          MINUS { ?n nif:anchorOf Hadoop . ?n itsrdf:taIdentRef ?e }
        }""").collect()}
    assert got == {"Apache_Spark"}


def test_filter_not_exists(kg, spark):
    kg2 = kg.unionByName(spark.createDataFrame(
        [("m9", "itsrdf:taIdentRef", "Untyped_Entity")],
        "subj string, pred string, obj string"))
    got = {r.e for r in sparql(kg2, """
        SELECT DISTINCT ?e WHERE {
          ?m itsrdf:taIdentRef ?e .
          FILTER NOT EXISTS { ?e rdf:type ?t }
        }""").collect()}
    assert got == {"Untyped_Entity"}


def test_ask_and_construct(kg):
    assert sparql(kg, "ASK { ?m itsrdf:taIdentRef Apache_Spark }") is True
    assert sparql(kg, "ASK { ?m itsrdf:taIdentRef Missing }") is False
    got = {(r.subj, r.pred, r.obj) for r in sparql(kg, """
        CONSTRUCT { ?sf ex:linksTo ?e } WHERE {
          ?m nif:anchorOf ?sf ; itsrdf:taIdentRef ?e .
        }""").collect()}
    assert got == {("Spark", "ex:linksTo", "Apache_Spark"),
                   ("Hadoop", "ex:linksTo", "Apache_Hadoop")}


def test_prefix_expansion_and_iri_terms(spark):
    kg = spark.createDataFrame([
        ("m1", "itsrdf:taIdentRef", "http://dbpedia.org/resource/Berlin"),
        ("http://dbpedia.org/resource/Berlin", "rdf:type", "City"),
    ], "subj string, pred string, obj string")
    got = {r.m for r in sparql(kg, """
        PREFIX dbr: <http://dbpedia.org/resource/>
        SELECT ?m WHERE { ?m itsrdf:taIdentRef dbr:Berlin }""").collect()}
    assert got == {"m1"}
    got = {r.m for r in sparql(kg, """
        SELECT ?m WHERE {
          ?m itsrdf:taIdentRef <http://dbpedia.org/resource/Berlin>
        }""").collect()}
    assert got == {"m1"}


def test_comments_and_string_escapes(spark):
    kg = spark.createDataFrame(
        [("a", "p", "it's here")], "subj string, pred string, obj string")
    got = sparql(kg, """
        # leading comment
        SELECT ?s WHERE {
          ?s p 'it\\'s here' .   # trailing comment
        }""").collect()
    assert [r.s for r in got] == ["a"]


def test_parse_errors(kg):
    with pytest.raises(ValueError, match="query must be"):
        sparql(kg, "LOAD <http://x.example/data.nt>")
    with pytest.raises(ValueError, match="concrete term"):
        sparql(kg, "DESCRIBE ?x")
    with pytest.raises(ValueError, match="WHERE"):
        sparql(kg, "SELECT ?x")
    with pytest.raises(ValueError, match="dangling term"):
        sparql(kg, "SELECT ?x WHERE { ?x p }")
    with pytest.raises(ValueError, match="GROUP BY without aggregate"):
        sparql(kg, "SELECT ?e WHERE { ?m p ?e } GROUP BY ?e")


def test_describe_text(kg):
    got = {(r.subj, r.pred, r.obj)
           for r in sparql(kg, "DESCRIBE Apache_Spark").collect()}
    assert ("Apache_Spark", "rdf:type", "Software") in got
    assert ("m1", "itsrdf:taIdentRef", "Apache_Spark") in got


def test_update_text_delete_insert_where(kg, spark):
    kg2 = spark.createDataFrame([
        ("m1", "ex:oldRef", "E1"),
        ("m2", "itsrdf:taIdentRef", "E2"),
    ], "subj string, pred string, obj string")
    out = {(r.subj, r.pred, r.obj) for r in sparql(kg2, """
        DELETE { ?m ex:oldRef ?e }
        INSERT { ?m itsrdf:taIdentRef ?e }
        WHERE { ?m ex:oldRef ?e }""").collect()}
    assert out == {("m1", "itsrdf:taIdentRef", "E1"),
                   ("m2", "itsrdf:taIdentRef", "E2")}
    # delete-only form
    out = {(r.subj, r.pred, r.obj) for r in sparql(kg2, """
        DELETE { ?m ex:oldRef ?e } WHERE { ?m ex:oldRef ?e }""").collect()}
    assert out == {("m2", "itsrdf:taIdentRef", "E2")}


def test_union_groups(kg):
    got = {(r.e if r.e is not None else r.sup) for r in sparql(kg, """
        SELECT * WHERE {
          { ?m itsrdf:taIdentRef ?e . ?e a Software }
          UNION
          { Software rdfs:subClassOf ?sup }
        }""").collect()}
    assert got == {"Apache_Spark", "Apache_Hadoop", "Work"}
    # aggregate over the union via the manual finish path
    [r] = sparql(kg, """
        SELECT (COUNT(*) AS ?n) WHERE {
          { ?m nif:anchorOf Spark } UNION { ?m nif:anchorOf Hadoop }
        }""").collect()
    assert r.n == 3


def test_subselect_in_text(kg):
    """Per-type mention counts aggregated bottom-up, joined into the
    outer group on the shared variable — mirrors the structured
    test_bgp_subquery_join_and_product."""
    got = {(r.e, r.t, r.n_in_type) for r in sparql(kg, """
        SELECT ?e ?t ?n_in_type WHERE {
          ?e a ?t .
          { SELECT ?t (COUNT(*) AS ?n_in_type) WHERE {
              ?m itsrdf:taIdentRef ?e2 . ?e2 a ?t .
            } GROUP BY ?t }
        }""").collect()}
    assert got == {("Apache_Spark", "Software", 3),
                   ("Apache_Hadoop", "Software", 3)}


def test_full_iri_predicates_and_path_suffix(spark):
    """Declared-prefix and <IRI> predicates must stay UNSPLIT (their
    slashes are not sequence-path separators), including with a path
    modifier on a protected IRI."""
    kg = spark.createDataFrame([
        ("a", "http://ex.org/p", "b"),
        ("b", "http://ex.org/p", "c"),
    ], "subj string, pred string, obj string")
    got = {r.y for r in sparql(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?y WHERE { a ex:p ?y }""").collect()}
    assert got == {"b"}
    got = {r.y for r in sparql(kg, """
        SELECT ?y WHERE { a <http://ex.org/p>+ ?y }""").collect()}
    assert got == {"b", "c"}


def test_keyword_like_terms_not_misparsed(spark):
    """ex:minus / ?filter must not trigger the MINUS/FILTER keyword
    scanner."""
    kg = spark.createDataFrame(
        [("a", "ex:minus", "b"), ("b", "ex:p", "c")],
        "subj string, pred string, obj string")
    got = {(r.x, r.y, r.z) for r in sparql(kg, """
        SELECT ?x ?y ?z WHERE {
          ?x ex:minus ?y . OPTIONAL { ?y ex:p ?z }
        }""").collect()}
    assert got == {("a", "b", "c")}
    got = {r.filter for r in sparql(kg, """
        SELECT ?filter WHERE { a ex:minus ?filter }""").collect()}
    assert got == {"b"}


def test_graph_clause_variable_and_constant(spark):
    """GRAPH ?g binds the provenance graph; GRAPH <iri> pins it."""
    from dbpedia_spotlight_spark.triples import as_quads
    triples = spark.createDataFrame([
        ("http://a.example/p1#char=0,5", "itsrdf:taIdentRef", "dbr:X"),
        ("http://b.example/p2#char=3,9", "itsrdf:taIdentRef", "dbr:X"),
        ("http://b.example/p2#char=12,20", "itsrdf:taIdentRef", "dbr:Y"),
    ], "subj string, pred string, obj string")
    kg = as_quads(triples)
    got = {(r.e, r.g) for r in sparql(kg, """
        SELECT ?e ?g WHERE { GRAPH ?g { ?m itsrdf:taIdentRef ?e } }
        """).collect()}
    assert got == {("dbr:X", "http://a.example/p1"),
                   ("dbr:X", "http://b.example/p2"),
                   ("dbr:Y", "http://b.example/p2")}
    got = {r.e for r in sparql(kg, """
        SELECT ?e WHERE {
          GRAPH <http://b.example/p2> { ?m itsrdf:taIdentRef ?e }
        }""").collect()}
    assert got == {"dbr:X", "dbr:Y"}


def test_graph_clause_joins_outside_patterns(spark):
    """Patterns outside GRAPH match the union graph and join on shared
    vars; aggregates over the graph variable work."""
    kg = spark.createDataFrame([
        ("m1", "itsrdf:taIdentRef", "E1", "u1"),
        ("m2", "itsrdf:taIdentRef", "E1", "u2"),
        ("m3", "itsrdf:taIdentRef", "E2", "u1"),
        ("E1", "rdf:type", "T1", "u1"),
        ("E2", "rdf:type", "T1", "u1"),
    ], "subj string, pred string, obj string, graph string")
    got = {(r.e, r.n) for r in sparql(kg, """
        SELECT ?e (COUNT(DISTINCT ?g) AS ?n) WHERE {
          GRAPH ?g { ?m itsrdf:taIdentRef ?e }
          ?e a T1 .
        } GROUP BY ?e""").collect()}
    assert got == {("E1", 2), ("E2", 1)}


def test_graph_clause_rejects_nested_keywords(spark):
    kg = spark.createDataFrame(
        [("a", "p", "b", "g")],
        "subj string, pred string, obj string, graph string")
    import pytest
    with pytest.raises(ValueError, match="plain triple patterns"):
        sparql(kg, """SELECT ?x WHERE {
            GRAPH ?g { ?x p ?y . FILTER(?y != 'b') } }""")


def test_group_concat_and_sample_aggregates(spark):
    """GROUP_CONCAT (sorted, deterministic) with and without a
    SEPARATOR literal, DISTINCT form, and SAMPLE → min."""
    kg = spark.createDataFrame([
        ("E1", "ex:label", "beta"),
        ("E1", "ex:label", "alpha"),
        ("E1", "ex:label", "alpha"),
        ("E2", "ex:label", "gamma"),
    ], "subj string, pred string, obj string")
    got = {(r.e, r.names, r.one) for r in sparql(kg, """
        SELECT ?e (GROUP_CONCAT(DISTINCT ?l; SEPARATOR=", ") AS ?names)
               (SAMPLE(?l) AS ?one)
        WHERE { ?e ex:label ?l } GROUP BY ?e""").collect()}
    assert got == {("E1", "alpha, beta", "alpha"),
                   ("E2", "gamma", "gamma")}
    got = {r.names for r in sparql(kg, """
        SELECT (GROUP_CONCAT(?l) AS ?names)
        WHERE { E2 ex:label ?l }""").collect()}
    assert got == {"gamma"}


def test_graph_clause_with_property_path(spark):
    """p+ inside GRAPH closes per graph (never across the boundary)."""
    kg = spark.createDataFrame([
        ("a", "ex:p", "b", "g1"),
        ("b", "ex:p", "c", "g2"),
    ], "subj string, pred string, obj string, graph string")
    got = {(r.x, r.g) for r in sparql(kg, """
        SELECT ?x ?g WHERE { GRAPH ?g { a ex:p+ ?x } }""").collect()}
    assert got == {("b", "g1")}


def test_update_quad_store_graph_templates(spark):
    """DELETE/INSERT over a quad snapshot: GRAPH templates move a
    statement between graphs; the snapshot key is the full quad."""
    kg = spark.createDataFrame([
        ("a", "ex:status", "draft", "g1"),
        ("b", "ex:status", "final", "g1"),
        ("a", "ex:other", "x", "g2"),
    ], "subj string, pred string, obj string, graph string")
    out = sparql(kg, """
        DELETE { GRAPH ?g { ?s ex:status draft } }
        INSERT { GRAPH archive { ?s ex:status draft } }
        WHERE  { GRAPH ?g { ?s ex:status draft } }""")
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("b", "ex:status", "final", "g1"),
        ("a", "ex:other", "x", "g2"),
        ("a", "ex:status", "draft", "archive"),
    }


def test_update_quad_store_rejects_triple_templates(spark):
    import pytest
    kg = spark.createDataFrame(
        [("a", "ex:p", "b", "g1")],
        "subj string, pred string, obj string, graph string")
    with pytest.raises(ValueError, match="arity"):
        sparql(kg, """
            DELETE { ?s ex:p ?o } WHERE { ?s ex:p ?o }""").collect()


def test_graph_inside_optional_minus_exists(spark):
    """GRAPH clauses nested in OPTIONAL/MINUS/FILTER (NOT) EXISTS are
    threaded through as quad patterns (bgp_match accepts quads in every
    group) — round-5 ADVICE, upgraded from reject to support."""
    kg = spark.createDataFrame([
        ("a", "p", "b", "g1"),
        ("x", "p", "y", "g1"),
        ("b", "q", "c", "g2"),
        ("a", "r", "k", "g2"),
    ], "subj string, pred string, obj string, graph string")

    # OPTIONAL { GRAPH ?g {...} }: the graph var binds on match, nulls
    # on no-match — the standard OPTIONAL padding
    got = {(r.s, r.g, r.z) for r in sparql(kg, """
        SELECT ?s ?g ?z WHERE {
          ?s p ?o . OPTIONAL { GRAPH ?g { ?o q ?z } } }""").collect()}
    assert got == {("a", "g2", "c"), ("x", None, None)}

    # MINUS { GRAPH <iri> {...} }: graph-pinned removal
    got = {r.s for r in sparql(kg, """
        SELECT ?s WHERE {
          ?s p ?o . MINUS { GRAPH g2 { ?s r ?k } } }""").collect()}
    assert got == {"x"}

    # FILTER EXISTS / NOT EXISTS with a GRAPH body
    got = {r.s for r in sparql(kg, """
        SELECT ?s WHERE {
          ?s p ?o . FILTER EXISTS { GRAPH g2 { ?s r ?k } } }""").collect()}
    assert got == {"a"}
    got = {r.s for r in sparql(kg, """
        SELECT ?s WHERE {
          ?s p ?o .
          FILTER NOT EXISTS { GRAPH ?g { ?s r ?k } } }""").collect()}
    assert got == {"x"}

    # a GRAPH sub-group still holds plain patterns only — nested
    # structure inside it stays a loud error, wherever it appears
    for q in (
        "SELECT ?x WHERE { ?x p ?y . OPTIONAL { GRAPH ?g { "
        "?x q ?z . FILTER(?z != 'c') } } }",
        "SELECT ?x WHERE { GRAPH ?g { OPTIONAL { ?x q ?z } } }",
    ):
        with pytest.raises(ValueError, match="plain triple patterns"):
            sparql(kg, q)


def test_union_default_graph_is_set_based(spark):
    """A triple asserted in several named graphs is ONE solution for a
    3-element pattern over a quad snapshot — non-DISTINCT aggregates
    must not inflate by assertion multiplicity (round-5 ADVICE)."""
    kg = spark.createDataFrame([
        ("m1", "ref", "E1", "g1"),
        ("m1", "ref", "E1", "g2"),   # same triple, second graph
        ("m1", "ref", "E1", "g3"),   # and a third
        ("m2", "ref", "E1", "g1"),
        ("E1", "rdf:type", "T1", "schema"),
    ], "subj string, pred string, obj string, graph string")
    got = {(r.e, r.n) for r in sparql(kg, """
        SELECT ?e (COUNT(*) AS ?n) WHERE {
          ?m ref ?e . ?e a T1 .
        } GROUP BY ?e""").collect()}
    assert got == {("E1", 2)}
    # the quad form still sees per-graph multiplicity
    got = {(r.e, r.n) for r in sparql(kg, """
        SELECT ?e (COUNT(*) AS ?n) WHERE {
          GRAPH ?g { ?m ref ?e } . ?e a T1 .
        } GROUP BY ?e""").collect()}
    assert got == {("E1", 4)}


def test_filter_inside_optional_minus_exists_groups(spark):
    """Group-local FILTERs inside OPTIONAL/MINUS/FILTER (NOT) EXISTS
    (round-5: the old tokenizer silently read FILTER tokens as garbage
    constant patterns that matched nothing — the same class as the
    GRAPH-in-group advice item)."""
    kg = spark.createDataFrame([
        ("a", "p", "b"), ("x", "p", "y"),
        ("b", "q", "c"), ("y", "q", "zz"),
    ], "subj string, pred string, obj string")

    got = {(r.s, r.z) for r in sparql(kg, """
        SELECT ?s ?z WHERE {
          ?s p ?o . OPTIONAL { ?o q ?z . FILTER(?z != 'c') } }""").collect()}
    assert got == {("a", None), ("x", "zz")}

    got = {r.s for r in sparql(kg, """
        SELECT ?s WHERE {
          ?s p ?o . MINUS { ?o q ?z . FILTER(STRLEN(?z) > 1) } }""").collect()}
    assert got == {"a"}

    got = {r.s for r in sparql(kg, """
        SELECT ?s WHERE {
          ?s p ?o . FILTER EXISTS { ?o q ?z . FILTER(?z = 'c') } }""").collect()}
    assert got == {"a"}

    # a filter naming an outer-only variable is a loud analysis error
    # (unresolved column), never a silent wrong answer
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        sparql(kg, """
            SELECT ?s WHERE {
              ?s p ?o . OPTIONAL { ?o q ?z . FILTER(?z != ?s) } }
        """).collect()


def test_nested_group_patterns(spark):
    """Full GroupGraphPattern recursion (round-5): OPTIONAL / MINUS /
    EXISTS groups may themselves contain OPTIONAL, BIND, VALUES and
    FILTER (NOT) EXISTS — solved bottom-up by bgp_match recursion."""
    kg = spark.createDataFrame([
        ("a", "p", "b"), ("x", "p", "y"),
        ("b", "q", "c"), ("y", "q", "zz"),
        ("c", "q", "d"),
    ], "subj string, pred string, obj string")

    # OPTIONAL inside OPTIONAL (W3C data-r2/optional complex shape)
    got = {(r.s, r.z, r.w) for r in sparql(kg, """
        SELECT ?s ?z ?w WHERE {
          ?s p ?o . OPTIONAL { ?o q ?z . OPTIONAL { ?z q ?w } } }
    """).collect()}
    assert got == {("a", "c", "d"), ("x", "zz", None)}

    # BIND inside OPTIONAL: computed only where the group matched
    got = {(r.s, r.k) for r in sparql(kg, """
        SELECT ?s ?k WHERE {
          ?s p ?o . OPTIONAL { ?o q ?z . BIND(CONCAT(?z, '!') AS ?k) } }
    """).collect()}
    assert got == {("a", "c!"), ("x", "zz!")}

    # VALUES inside OPTIONAL restricts the group, not the outer part
    got = {(r.s, r.z) for r in sparql(kg, """
        SELECT ?s ?z WHERE {
          ?s p ?o . OPTIONAL { ?o q ?z . VALUES ?z { 'c' } } }
    """).collect()}
    assert got == {("a", "c"), ("x", None)}

    # FILTER EXISTS inside MINUS: only group rows whose ?z has a
    # further q-edge count against the outer solutions
    got = {r.s for r in sparql(kg, """
        SELECT ?s WHERE {
          ?s p ?o . MINUS { ?o q ?z . FILTER EXISTS { ?z q ?w } } }
    """).collect()}
    assert got == {"x"}
