"""W3C SPARQL 1.1 conformance battery (round-5 VERDICT item #4).

Cases ported in spirit from the PUBLIC W3C SPARQL 1.1 test suite
(https://www.w3.org/2009/sparql/docs/tests/ — the `data-r2` and
`data-sparql11` evaluation + negative-syntax groups), adapted to this
engine's data model: every RDF term is a plain string column over a
(subj, pred, obj[, graph]) frame.

DOCUMENTED EXCLUSIONS (features the engine does not model — each is a
data-model or scope decision recorded in operators/sparql.py's module
docstring, not an untested gap):
  - typed literals / numeric promotion (`"1"^^xsd:integer` vs
    `"1.0"^^xsd:decimal`), language tags and `LANG()`/`LANGMATCHES`,
    `DATATYPE()` — terms are untyped strings;
  - blank-node scoping and result isomorphism — no bnode type;
  - FROM / FROM NAMED dataset construction — pre-filter the quad
    frame's `graph` column instead (documented alternative);
  - SERVICE / federation, entailment regimes;
  - UNDEF rows in VALUES;
  - `sameTerm` (≡ `=` on strings here), `IRI()`/`BNODE()` constructors;
  - aggregate error-propagation subtleties (e.g. `SUM` over a mixed
    bag is Spark-SQL cast semantics, not xsd errors);
  - MINUS with NO shared variable: the W3C answer is "removes
    nothing"; this engine RAISES instead (a silent no-op MINUS is a
    query bug in every practical case) — pinned below as a deviation;
  - GROUP_CONCAT order: implementation-defined per spec; pinned SORTED
    here (deterministic, partition-layout-independent).
"""

from __future__ import annotations

import pytest

from dbpedia_spotlight_spark.operators.sparql import sparql


@pytest.fixture(scope="module")
def g1(spark):
    """data-r2/basic-flavored graph: people, names, emails, types."""
    return spark.createDataFrame([
        ("ex:alice", "foaf:name", "Alice"),
        ("ex:alice", "foaf:mbox", "mailto:alice@example.org"),
        ("ex:alice", "rdf:type", "foaf:Person"),
        ("ex:bob", "foaf:name", "Bob"),
        ("ex:bob", "rdf:type", "foaf:Person"),
        ("ex:carol", "foaf:name", "Carol"),
        ("ex:carol", "foaf:mbox", "mailto:carol@example.org"),
        ("ex:carol", "rdf:type", "foaf:Agent"),
        ("ex:dave", "foaf:knows", "ex:alice"),
        ("ex:alice", "foaf:knows", "ex:bob"),
        ("ex:bob", "foaf:knows", "ex:carol"),
    ], "subj string, pred string, obj string")


@pytest.fixture(scope="module")
def g2(spark):
    """data-sparql11/aggregates-flavored graph: books with prices
    (numeric-valued strings; Spark-SQL casts cover the arithmetic)."""
    return spark.createDataFrame([
        ("ex:book1", "ex:price", "42"),
        ("ex:book1", "ex:tag", "scifi"),
        ("ex:book2", "ex:price", "23"),
        ("ex:book2", "ex:tag", "scifi"),
        ("ex:book3", "ex:price", "17"),
        ("ex:book3", "ex:tag", "crime"),
        ("ex:book4", "ex:price", "23"),
    ], "subj string, pred string, obj string")


def rows(df, *cols):
    return {tuple(getattr(r, c) for c in cols) for r in df.collect()}


# ---------------------------------------------------------------------------
# Basic graph patterns (data-r2/basic, triple-match)
# ---------------------------------------------------------------------------


def test_bgp_spoo_all_vars(g1):
    assert len(sparql(g1, "SELECT ?s ?p ?o WHERE { ?s ?p ?o }")
               .collect()) == 11


def test_bgp_constant_subject(g1):
    got = rows(sparql(g1, "SELECT ?p ?o WHERE { ex:alice ?p ?o }"),
               "p", "o")
    assert got == {("foaf:name", "Alice"),
                   ("foaf:mbox", "mailto:alice@example.org"),
                   ("rdf:type", "foaf:Person"),
                   ("foaf:knows", "ex:bob")}


def test_bgp_constant_pred_and_obj(g1):
    got = rows(sparql(
        g1, "SELECT ?s WHERE { ?s rdf:type foaf:Person }"), "s")
    assert got == {("ex:alice",), ("ex:bob",)}


def test_bgp_no_match_is_empty(g1):
    assert sparql(
        g1, "SELECT ?s WHERE { ?s ex:nope ?o }").collect() == []


def test_bgp_join_on_shared_subject(g1):
    got = rows(sparql(g1, """SELECT ?name ?mbox WHERE {
        ?x foaf:name ?name . ?x foaf:mbox ?mbox }"""), "name", "mbox")
    assert got == {("Alice", "mailto:alice@example.org"),
                   ("Carol", "mailto:carol@example.org")}


def test_bgp_a_keyword_is_rdf_type(g1):
    got = rows(sparql(g1, "SELECT ?s WHERE { ?s a foaf:Agent }"), "s")
    assert got == {("ex:carol",)}


def test_bgp_chain_join_object_to_subject(g1):
    got = rows(sparql(g1, """SELECT ?a ?c WHERE {
        ?a foaf:knows ?b . ?b foaf:knows ?c }"""), "a", "c")
    assert got == {("ex:dave", "ex:bob"), ("ex:alice", "ex:carol")}


def test_bgp_predicate_object_lists(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        ?x a foaf:Person ; foaf:name ?n , ?n2 .
        FILTER(?n = ?n2) }"""), "x")
    assert got == {("ex:alice",), ("ex:bob",)}


def test_bgp_repeated_variable_within_pattern(spark):
    kg = spark.createDataFrame(
        [("a", "p", "a"), ("a", "p", "b")],
        "subj string, pred string, obj string")
    got = rows(sparql(kg, "SELECT ?x WHERE { ?x p ?x }"), "x")
    assert got == {("a",)}


# ---------------------------------------------------------------------------
# FILTER (data-r2/expr-builtin, expr-ops, regex)
# ---------------------------------------------------------------------------


def test_filter_equality(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        ?x foaf:name ?n . FILTER(?n = 'Bob') }"""), "x")
    assert got == {("ex:bob",)}


def test_filter_inequality(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x a foaf:Person . ?x foaf:name ?n .
        FILTER(?n != 'Bob') }"""), "n")
    assert got == {("Alice",)}


def test_filter_numeric_comparison_via_cast(g2):
    got = rows(sparql(g2, """SELECT ?b WHERE {
        ?b ex:price ?p . FILTER(CAST(?p AS INT) > 20) }"""), "b")
    assert got == {("ex:book1",), ("ex:book2",), ("ex:book4",)}


def test_filter_logical_and_or_not(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n .
        FILTER(?n = 'Alice' || (?n != 'Bob' && !(?n = 'Carol'))) }"""),
        "n")
    assert got == {("Alice",)}


def test_filter_regex(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n . FILTER REGEX(?n, '^A') }"""), "n")
    assert got == {("Alice",)}


def test_filter_strlen_ucase_lcase(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n .
        FILTER(STRLEN(?n) = 5 && UCASE(?n) = 'ALICE'
               && LCASE(?n) = 'alice') }"""), "n")
    assert got == {("Alice",)}


def test_filter_strstarts_strends_contains(g1):
    got = rows(sparql(g1, """SELECT ?m WHERE {
        ?x foaf:mbox ?m .
        FILTER(STRSTARTS(?m, 'mailto:') && STRENDS(?m, '.org')
               && CONTAINS(?m, 'carol')) }"""), "m")
    assert got == {("mailto:carol@example.org",)}


def test_filter_substr_replace(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n .
        FILTER(SUBSTR(?n, 1, 3) = 'Car'
               && REPLACE(?n, 'ol', 'la') = 'Carla') }"""), "n")
    assert got == {("Carol",)}


def test_filter_in_operator(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n . FILTER(?n IN ('Alice', 'Carol')) }"""), "n")
    assert got == {("Alice",), ("Carol",)}


def test_filter_placement_is_group_scoped(g1):
    # a FILTER before the patterns it references is still group-end
    got = rows(sparql(g1, """SELECT ?x WHERE {
        FILTER(?n = 'Bob') ?x foaf:name ?n . }"""), "x")
    assert got == {("ex:bob",)}


# ---------------------------------------------------------------------------
# OPTIONAL (data-r2/optional, optional-filter)
# ---------------------------------------------------------------------------


def test_optional_basic_null_padding(g1):
    got = rows(sparql(g1, """SELECT ?name ?mbox WHERE {
        ?x a foaf:Person . ?x foaf:name ?name .
        OPTIONAL { ?x foaf:mbox ?mbox } }"""), "name", "mbox")
    assert got == {("Alice", "mailto:alice@example.org"), ("Bob", None)}


def test_optional_two_groups(g1):
    got = rows(sparql(g1, """SELECT ?name ?mbox ?friend WHERE {
        ?x foaf:name ?name .
        OPTIONAL { ?x foaf:mbox ?mbox }
        OPTIONAL { ?x foaf:knows ?friend } }"""),
        "name", "mbox", "friend")
    assert got == {
        ("Alice", "mailto:alice@example.org", "ex:bob"),
        ("Bob", None, "ex:carol"),
        ("Carol", "mailto:carol@example.org", None)}


def test_optional_bound_filter_negation_by_failure(g1):
    # the classic !BOUND idiom (pre-1.1 negation)
    got = rows(sparql(g1, """SELECT ?name WHERE {
        ?x a foaf:Person . ?x foaf:name ?name .
        OPTIONAL { ?x foaf:mbox ?mbox }
        FILTER(!BOUND(?mbox)) }"""), "name")
    assert got == {("Bob",)}


def test_optional_chains_bind_for_later_joins(g1):
    # a variable first bound inside an OPTIONAL joins later groups
    got = rows(sparql(g1, """SELECT ?name ?fname WHERE {
        ?x foaf:name ?name .
        OPTIONAL { ?x foaf:knows ?f . ?f foaf:name ?fname } }"""),
        "name", "fname")
    assert got == {("Alice", "Bob"), ("Bob", "Carol"), ("Carol", None)}


# ---------------------------------------------------------------------------
# Negation: MINUS / EXISTS / NOT EXISTS (data-sparql11/negation)
# ---------------------------------------------------------------------------


def test_minus_removes_shared_solutions(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        ?x foaf:name ?n . MINUS { ?x foaf:mbox ?m } }"""), "x")
    assert got == {("ex:bob",)}


def test_minus_disjoint_variables_raises_documented_deviation(g1):
    # W3C: MINUS with no shared variable removes nothing. This engine
    # raises instead — a silent no-op MINUS is a query bug in practice.
    with pytest.raises(ValueError, match="shares no variable"):
        sparql(g1, """SELECT ?s WHERE {
            ?s foaf:name ?n . MINUS { ?a foaf:mbox ?b } }""")


def test_not_exists_removes(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        ?x foaf:name ?n . FILTER NOT EXISTS { ?x foaf:mbox ?m } }"""),
        "x")
    assert got == {("ex:bob",)}


def test_exists_keeps(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        ?x foaf:name ?n . FILTER EXISTS { ?x foaf:mbox ?m } }"""), "x")
    assert got == {("ex:alice",), ("ex:carol",)}


def test_exists_constant_probe_short_circuits(g1):
    # no shared variable: a constant condition over the whole solution
    assert sparql(g1, """SELECT ?x WHERE {
        ?x foaf:name ?n .
        FILTER EXISTS { ex:nobody foaf:name ?z } }""").collect() == []
    assert len(sparql(g1, """SELECT ?x WHERE {
        ?x foaf:name ?n .
        FILTER NOT EXISTS { ex:nobody foaf:name ?z } }""")
        .collect()) == 3


# ---------------------------------------------------------------------------
# UNION (data-r2/algebra)
# ---------------------------------------------------------------------------


def test_union_basic(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        { ?x a foaf:Person } UNION { ?x a foaf:Agent } }"""), "x")
    assert got == {("ex:alice",), ("ex:bob",), ("ex:carol",)}


def test_union_pads_unshared_vars_with_null(g1):
    got = rows(sparql(g1, """SELECT ?name ?mbox WHERE {
        { ?x foaf:name ?name } UNION { ?x foaf:mbox ?mbox } }"""),
        "name", "mbox")
    assert (None, "mailto:alice@example.org") in got
    assert ("Alice", None) in got
    assert len(got) == 5


def test_union_three_branches(g1):
    got = rows(sparql(g1, """SELECT ?x WHERE {
        { ?x a foaf:Person } UNION { ?x a foaf:Agent }
        UNION { ?x foaf:knows ex:alice } }"""), "x")
    assert got == {("ex:alice",), ("ex:bob",), ("ex:carol",),
                   ("ex:dave",)}


def test_union_branch_with_join_inside(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        { ?x a foaf:Agent . ?x foaf:name ?n }
        UNION { ?x foaf:knows ex:bob . ?x foaf:name ?n } }"""), "n")
    assert got == {("Carol",), ("Alice",)}


# ---------------------------------------------------------------------------
# VALUES / BIND (data-sparql11/bindings, bind)
# ---------------------------------------------------------------------------


def test_values_single_var(g1):
    got = rows(sparql(g1, """SELECT ?x ?n WHERE {
        ?x foaf:name ?n . VALUES ?n { 'Alice' 'Bob' } }"""), "x", "n")
    assert got == {("ex:alice", "Alice"), ("ex:bob", "Bob")}


def test_values_multi_var_rows(g1):
    got = rows(sparql(g1, """SELECT ?x ?n WHERE {
        ?x foaf:name ?n .
        VALUES (?x ?n) { (ex:alice 'Alice') (ex:bob 'Nope') } }"""),
        "x", "n")
    assert got == {("ex:alice", "Alice")}


def test_bind_computes_new_var(g1):
    got = rows(sparql(g1, """SELECT ?n ?len WHERE {
        ?x foaf:name ?n . BIND(STRLEN(?n) AS ?len) }"""), "n", "len")
    assert got == {("Alice", 5), ("Bob", 3), ("Carol", 5)}


def test_bind_then_filter_on_bound_var(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n . BIND(UCASE(?n) AS ?u)
        FILTER(?u = 'BOB') }"""), "n")
    assert got == {("Bob",)}


# ---------------------------------------------------------------------------
# Aggregates (data-sparql11/aggregates)
# ---------------------------------------------------------------------------


def test_agg_count_star_group_by(g2):
    got = rows(sparql(g2, """SELECT ?tag (COUNT(*) AS ?n) WHERE {
        ?b ex:tag ?tag } GROUP BY ?tag"""), "tag", "n")
    assert got == {("scifi", 2), ("crime", 1)}


def test_agg_count_distinct(g2):
    got = rows(sparql(g2, """SELECT (COUNT(DISTINCT ?p) AS ?n) WHERE {
        ?b ex:price ?p }"""), "n")
    assert got == {(3,)}


def test_agg_sum_avg_min_max(g2):
    r = sparql(g2, """SELECT (SUM(CAST(?p AS INT)) AS ?s)
        (AVG(CAST(?p AS INT)) AS ?a) (MIN(CAST(?p AS INT)) AS ?lo)
        (MAX(CAST(?p AS INT)) AS ?hi)
        WHERE { ?b ex:price ?p }""").collect()[0]
    assert (r.s, r.lo, r.hi) == (105, 17, 42) and abs(r.a - 26.25) < 1e-9


def test_agg_having(g2):
    got = rows(sparql(g2, """SELECT ?tag (COUNT(*) AS ?n) WHERE {
        ?b ex:tag ?tag } GROUP BY ?tag HAVING (COUNT(*) > 1)"""),
        "tag", "n")
    assert got == {("scifi", 2)}


def test_agg_global_without_group_by(g1):
    got = rows(sparql(
        g1, "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"), "n")
    assert got == {(11,)}


def test_agg_group_concat_sorted_pin(g2):
    got = rows(sparql(g2, """SELECT ?tag
        (GROUP_CONCAT(?b; SEPARATOR=',') AS ?books)
        WHERE { ?b ex:tag ?tag } GROUP BY ?tag"""), "tag", "books")
    assert got == {("scifi", "ex:book1,ex:book2"),
                   ("crime", "ex:book3")}


def test_agg_sample_deterministic_min_pin(g2):
    got = rows(sparql(g2, """SELECT (SAMPLE(?b) AS ?one) WHERE {
        ?b ex:tag 'scifi' }"""), "one")
    assert got == {("ex:book1",)}


def test_agg_group_by_two_keys(g2):
    got = rows(sparql(g2, """SELECT ?tag ?p (COUNT(*) AS ?n) WHERE {
        ?b ex:tag ?tag . ?b ex:price ?p } GROUP BY ?tag ?p"""),
        "tag", "p", "n")
    assert got == {("scifi", "42", 1), ("scifi", "23", 1),
                   ("crime", "17", 1)}


# ---------------------------------------------------------------------------
# Property paths (data-sparql11/property-path)
# ---------------------------------------------------------------------------


def test_path_one_or_more(g1):
    got = rows(sparql(
        g1, "SELECT ?y WHERE { ex:dave foaf:knows+ ?y }"), "y")
    assert got == {("ex:alice",), ("ex:bob",), ("ex:carol",)}


def test_path_zero_or_more_includes_reflexive(g1):
    got = rows(sparql(
        g1, "SELECT ?y WHERE { ex:dave foaf:knows* ?y }"), "y")
    assert got == {("ex:dave",), ("ex:alice",), ("ex:bob",),
                   ("ex:carol",)}


def test_path_zero_or_one(g1):
    got = rows(sparql(
        g1, "SELECT ?y WHERE { ex:alice foaf:knows? ?y }"), "y")
    assert got == {("ex:alice",), ("ex:bob",)}


def test_path_inverse(g1):
    got = rows(sparql(
        g1, "SELECT ?y WHERE { ex:alice ^foaf:knows ?y }"), "y")
    assert got == {("ex:dave",)}


def test_path_alternation(g1):
    got = rows(sparql(g1, """SELECT ?o WHERE {
        ex:carol foaf:name|foaf:mbox ?o }"""), "o")
    assert got == {("Carol",), ("mailto:carol@example.org",)}


def test_path_sequence(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ex:dave foaf:knows/foaf:name ?n }"""), "n")
    assert got == {("Alice",)}


def test_path_sequence_with_closure_step(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ex:dave foaf:knows+/foaf:name ?n }"""), "n")
    assert got == {("Alice",), ("Bob",), ("Carol",)}


def test_path_negated_property_set(g1):
    got = rows(sparql(g1, """SELECT ?o WHERE {
        ex:alice !foaf:knows|rdf:type ?o }"""), "o")
    assert got == {("Alice",), ("mailto:alice@example.org",)}


# ---------------------------------------------------------------------------
# Solution modifiers (data-r2/sort, distinct, limit-offset)
# ---------------------------------------------------------------------------


def test_modifier_distinct(g2):
    got = [r.p for r in sparql(g2, """SELECT DISTINCT ?p WHERE {
        ?b ex:price ?p } ORDER BY ?p""").collect()]
    assert got == ["17", "23", "42"]


def test_modifier_order_asc_desc(g1):
    asc = [r.n for r in sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n } ORDER BY ?n""").collect()]
    desc = [r.n for r in sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n } ORDER BY DESC(?n)""").collect()]
    assert asc == ["Alice", "Bob", "Carol"] and desc == asc[::-1]


def test_modifier_limit_offset_page(g1):
    got = [r.n for r in sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n } ORDER BY ?n LIMIT 1 OFFSET 1""").collect()]
    assert got == ["Bob"]


def test_modifier_order_by_two_keys(g2):
    got = [(r.b, r.p) for r in sparql(g2, """SELECT ?b ?p WHERE {
        ?b ex:price ?p } ORDER BY DESC(?p) ?b""").collect()]
    assert got == [("ex:book1", "42"), ("ex:book2", "23"),
                   ("ex:book4", "23"), ("ex:book3", "17")]


# ---------------------------------------------------------------------------
# Query forms: ASK / CONSTRUCT / DESCRIBE (data-r2/ask, construct)
# ---------------------------------------------------------------------------


def test_ask_true_false(g1):
    assert sparql(g1, "ASK { ex:alice foaf:knows ex:bob }") is True
    assert sparql(g1, "ASK { ex:bob foaf:knows ex:alice }") is False


def test_ask_with_filter(g1):
    assert sparql(g1, """ASK { ?x foaf:name ?n .
        FILTER(STRLEN(?n) > 4) }""") is True
    assert sparql(g1, """ASK { ?x foaf:name ?n .
        FILTER(STRLEN(?n) > 40) }""") is False


def test_construct_rewrites_template(g1):
    got = rows(sparql(g1, """CONSTRUCT { ?x ex:hasName ?n } WHERE {
        ?x a foaf:Person . ?x foaf:name ?n }"""),
        "subj", "pred", "obj")
    assert got == {("ex:alice", "ex:hasName", "Alice"),
                   ("ex:bob", "ex:hasName", "Bob")}


def test_construct_multi_pattern_template(g1):
    got = rows(sparql(g1, """CONSTRUCT {
        ?x ex:label ?n . ?x a ex:Named . } WHERE {
        ?x foaf:name ?n . FILTER(?n = 'Bob') }"""),
        "subj", "pred", "obj")
    assert got == {("ex:bob", "ex:label", "Bob"),
                   ("ex:bob", "rdf:type", "ex:Named")}


def test_describe_returns_cbd_edges(g1):
    got = rows(sparql(g1, "DESCRIBE ex:alice"), "subj", "pred", "obj")
    assert ("ex:alice", "foaf:name", "Alice") in got
    assert ("ex:dave", "foaf:knows", "ex:alice") in got


# ---------------------------------------------------------------------------
# Subqueries (data-sparql11/subquery)
# ---------------------------------------------------------------------------


def test_subselect_joins_outer(g1):
    got = rows(sparql(g1, """SELECT ?n WHERE {
        ?x foaf:name ?n .
        { SELECT ?x WHERE { ?x foaf:mbox ?m } } }"""), "n")
    assert got == {("Alice",), ("Carol",)}


def test_subselect_with_aggregate(g2):
    got = rows(sparql(g2, """SELECT ?b WHERE {
        ?b ex:price ?hi .
        { SELECT (MAX(CAST(?p AS INT)) AS ?m) WHERE { ?b2 ex:price ?p } }
        FILTER(CAST(?hi AS INT) = ?m) }"""), "b")
    assert got == {("ex:book1",)}


# ---------------------------------------------------------------------------
# Negative syntax (data-r2/syntax-* neg groups, adapted)
# ---------------------------------------------------------------------------


NEG_SYNTAX = [
    # unclosed group
    "SELECT ?s WHERE { ?s ?p ?o",
    # BIND without AS
    "SELECT ?s WHERE { ?s ?p ?o . BIND(STRLEN(?o)) }",
    # VALUES without var or row block
    "SELECT ?s WHERE { ?s ?p ?o . VALUES }",
    # bare nested group that is neither subselect nor UNION branch
    "SELECT ?s WHERE { { ?s ?p ?o . FILTER(?o = 'x') } ?s ?p ?o2 }",
    # GRAPH needs a term
    "SELECT ?s WHERE { GRAPH { ?s ?p ?o } }",
    # nested keyword inside GRAPH group
    "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o . FILTER(?o = 'x') } }",
    # GRAPH (in any position — here inside OPTIONAL, which is itself
    # supported) demands a QUAD snapshot; g1 has no graph column
    "SELECT ?s WHERE { ?s ?p ?o OPTIONAL { GRAPH ?g { ?s ?q ?z } } }",
    # nested property path: closure of inverse
    "SELECT ?s WHERE { ?s ^foaf:knows+ ?o }",
    # nested property path: closure of alternation
    "SELECT ?s WHERE { ?s (foaf:a|foaf:b)+ ?o }",
    # negated set of a closure step
    "SELECT ?s WHERE { ?s !foaf:knows+ ?o }",
    # MINUS with no shared variable (documented deviation: raises)
    "SELECT ?s WHERE { ?s foaf:name ?n . MINUS { ?a foaf:mbox ?b } }",
    # OPTIONAL with no shared variable (same rationale)
    "SELECT ?s WHERE { ?s foaf:name ?n . OPTIONAL { ?a foaf:mbox ?b } }",
]


@pytest.mark.parametrize("query", NEG_SYNTAX,
                         ids=[f"neg{i:02d}" for i in range(len(NEG_SYNTAX))])
def test_negative_syntax_raises(g1, query):
    with pytest.raises(ValueError):
        sparql(g1, query)


# data-r2/optional-filter (adapted): filters scoped inside OPTIONAL
def test_optional_with_inner_filter(g2):
    got = {(r.b, r.p) for r in sparql(g2, """
        SELECT ?b ?p WHERE {
          ?b ex:tag ?t .
          OPTIONAL { ?b ex:price ?p . FILTER(CAST(?p AS INT) < 20) } }
    """).collect()}
    assert all(p is None or int(p) < 20 for _, p in got)
    assert any(p is not None for _, p in got)
    assert any(p is None for _, p in got)


def test_minus_with_inner_filter(g1):
    got = {r.s for r in sparql(g1, """
        SELECT ?s WHERE {
          ?s rdf:type foaf:Person .
          MINUS { ?s foaf:mbox ?m . FILTER(CONTAINS(?m, 'alice')) } }
    """).collect()}
    assert got == {"ex:bob"}


# data-r2/optional/complex (adapted): OPTIONAL nested inside OPTIONAL,
# evaluated bottom-up (well-designed pattern)
def test_nested_optional(g1):
    got = {(r.x, r.n, r.m) for r in sparql(g1, """
        SELECT ?x ?n ?m WHERE {
          ?x rdf:type foaf:Person .
          OPTIONAL { ?x foaf:name ?n . OPTIONAL { ?x foaf:mbox ?m } } }
    """).collect()}
    assert got == {("ex:alice", "Alice", "mailto:alice@example.org"),
                   ("ex:bob", "Bob", None)}


def test_nested_optional_chain(g1):
    got = {(r.x, r.z, r.m) for r in sparql(g1, """
        SELECT ?x ?z ?m WHERE {
          ?x foaf:knows ?y .
          OPTIONAL { ?y foaf:knows ?z . OPTIONAL { ?z foaf:mbox ?m } } }
    """).collect()}
    assert got == {("ex:dave", "ex:bob", None),
                   ("ex:alice", "ex:carol", "mailto:carol@example.org"),
                   ("ex:bob", None, None)}
