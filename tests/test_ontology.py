"""Ontology reasoning + BGP matching (operators/ontology.py): closure
semantics on planted hierarchies (chains, diamonds, cycles), rdfs:9
inheritance, and the pattern matcher's join planning / edge cases. The
corpus-scale rotated pair (`infer_types`, `bgp_typed_mentions`) lives
in test_rotated_queries.py; these are the operator-contract tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.ontology import (
    RDF_TYPE,
    bgp_match,
    infer_property_axioms,
    infer_subproperties,
    infer_types,
    subclass_closure,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "sub string, sup string")


def test_closure_chain_depths(spark):
    clos = subclass_closure(_edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "d")]))
    got = {(r.sub, r.sup): r.depth for r in clos.collect()}
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2,
        ("a", "d"): 3,
    }


def test_closure_diamond_takes_min_depth(spark):
    # a ⊑ {b, c} ⊑ d plus a direct shortcut a ⊑ d: shortest path wins
    clos = subclass_closure(_edges(spark, [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")]))
    got = {(r.sub, r.sup): r.depth for r in clos.collect()}
    assert got[("a", "d")] == 1
    assert got[("b", "d")] == 1 and got[("a", "b")] == 1


def test_closure_cycle_terminates_without_self_paths(spark):
    clos = subclass_closure(_edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "a")]))
    rows = {(r.sub, r.sup) for r in clos.collect()}
    # every distinct ordered pair, never (x, x)
    assert rows == {("a", "b"), ("b", "c"), ("c", "a"),
                    ("a", "c"), ("b", "a"), ("c", "b")}


def test_closure_deep_chain_with_checkpoint_dir(spark, tmp_path):
    n = 24
    clos = subclass_closure(
        _edges(spark, [(f"c{i}", f"c{i+1}") for i in range(n)]),
        max_depth=n + 2, checkpoint_dir=str(tmp_path))
    assert clos.count() == n * (n + 1) // 2
    deep = clos.filter((F.col("sub") == "c0") & (F.col("sup") == f"c{n}"))
    assert deep.collect()[0].depth == n


def test_infer_types_inherits_through_closure(spark):
    clos = subclass_closure(_edges(spark, [
        ("Politician", "Person"), ("Person", "Agent")]))
    stmts = spark.createDataFrame(
        [("e1", RDF_TYPE, "Politician"), ("e2", RDF_TYPE, "Agent"),
         ("e1", "otherPred", "ignored")],
        "subj string, pred string, obj string")
    got = {(r.subj, r.obj) for r in infer_types(stmts, clos).collect()}
    assert got == {("e1", "Politician"), ("e1", "Person"), ("e1", "Agent"),
                   ("e2", "Agent")}
    assert infer_types(stmts, clos).select("pred").distinct().collect()[0][
        0] == RDF_TYPE


KG = [
    ("m1", "nif:anchorOf", "spark"),
    ("m1", "itsrdf:taIdentRef", "Apache_Spark"),
    ("m2", "itsrdf:taIdentRef", "Apache_Spark"),
    ("Apache_Spark", "rdf:type", "Software"),
    ("m3", "itsrdf:taIdentRef", "Customer"),
    ("Customer", "rdf:type", "Agent"),
    ("loop", "selfPred", "loop"),
]


def _kg(spark):
    return spark.createDataFrame(KG, "subj string, pred string, obj string")


def test_bgp_two_pattern_join(spark):
    out = bgp_match(_kg(spark), [
        ("?m", "itsrdf:taIdentRef", "?e"),
        ("?e", "rdf:type", "Software"),
    ])
    assert out.columns == ["e", "m"]
    assert {(r.e, r.m) for r in out.collect()} == {
        ("Apache_Spark", "m1"), ("Apache_Spark", "m2")}


def test_bgp_constant_only_and_repeated_var(spark):
    # fully-bound pattern: zero variables, acts as an ASK (row count)
    assert bgp_match(_kg(spark), [
        ("Customer", "rdf:type", "Agent")]).count() == 1
    # ?x in subj AND obj of one pattern = intra-row equality
    out = bgp_match(_kg(spark), [("?x", "selfPred", "?x")])
    assert [r.x for r in out.collect()] == ["loop"]


def test_bgp_disconnected_patterns_fall_back_to_product(spark):
    out = bgp_match(_kg(spark), [
        ("?e", "rdf:type", "?t"),
        ("?m", "nif:anchorOf", "spark"),
    ])
    assert out.count() == 2  # 2 typed entities × 1 anchor row
    assert set(out.columns) == {"e", "t", "m"}


def test_bgp_three_pattern_plan_is_all_equijoins(spark):
    out = bgp_match(_kg(spark), [
        ("?m", "nif:anchorOf", "?sf"),
        ("?m", "itsrdf:taIdentRef", "?e"),
        ("?e", "rdf:type", "?t"),
    ])
    assert {(r.m, r.sf, r.e, r.t) for r in out.collect()} == {
        ("m1", "spark", "Apache_Spark", "Software")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bgp_empty_patterns_raise(spark):
    with pytest.raises(ValueError):
        bgp_match(_kg(spark), [])


def test_canonicalize_triples_rewrites_both_positions(spark):
    kg = spark.createDataFrame([
        ("m1", "itsrdf:taIdentRef", "E_dup2"),
        ("m2", "itsrdf:taIdentRef", "E_canon"),
        ("E_dup1", "rdf:type", "Software"),
        ("E_canon", "rdf:type", "Software"),
        ("m3", "itsrdf:taIdentRef", "Other"),
    ], "subj string, pred string, obj string")
    # chain E_canon ~ E_dup1 ~ E_dup2: one class, canonical = min uri
    sameas = spark.createDataFrame(
        [("E_canon", "E_dup1"), ("E_dup1", "E_dup2")], "a string, b string")
    from dbpedia_spotlight_spark.triples import canonicalize_triples
    got = {(r.subj, r.pred, r.obj)
           for r in canonicalize_triples(kg, sameas).collect()}
    assert got == {
        ("m1", "itsrdf:taIdentRef", "E_canon"),
        ("m2", "itsrdf:taIdentRef", "E_canon"),
        ("E_canon", "rdf:type", "Software"),  # dup1/canon rows collapsed
        ("m3", "itsrdf:taIdentRef", "Other"),  # untouched passthrough
    }


def test_bgp_optional_keeps_unmatched_solutions(spark):
    # Apache_Spark is typed, Customer is typed, Other is not: an
    # OPTIONAL type pattern must keep untyped entities with t = null
    kg = spark.createDataFrame(KG + [("m4", "itsrdf:taIdentRef", "Other")],
                               "subj string, pred string, obj string")
    out = bgp_match(
        kg, [("?m", "itsrdf:taIdentRef", "?e")],
        optional=[[("?e", "rdf:type", "?t")]])
    got = {(r.e, r.m, r.t) for r in out.collect()}
    assert got == {
        ("Apache_Spark", "m1", "Software"),
        ("Apache_Spark", "m2", "Software"),
        ("Customer", "m3", "Agent"),
        ("Other", "m4", None),
    }


def test_bgp_optional_group_must_share_a_variable(spark):
    with pytest.raises(ValueError):
        bgp_match(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                  optional=[[("?x", "rdf:type", "?t")]])


def test_predicate_closure_over_snapshot(spark):
    kg = spark.createDataFrame(
        [("a", "rdfs:subClassOf", "b"), ("b", "rdfs:subClassOf", "c"),
         ("a", "otherPred", "z")],
        "subj string, pred string, obj string")
    from dbpedia_spotlight_spark.operators.ontology import predicate_closure
    got = {(r.sub, r.sup): r.depth
           for r in predicate_closure(kg, "rdfs:subClassOf").collect()}
    # otherPred edge never enters the closure
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 2}


def test_bgp_property_path_predicate(spark):
    kg = spark.createDataFrame(KG + [
        ("Software", "rdfs:subClassOf", "Work"),
        ("Work", "rdfs:subClassOf", "Thing"),
        ("Agent", "rdfs:subClassOf", "Thing"),
    ], "subj string, pred string, obj string")
    out = bgp_match(kg, [
        ("?e", "rdf:type", "?c"),
        ("?c", "rdfs:subClassOf+", "?sup"),
    ])
    got = {(r.e, r.c, r.sup) for r in out.collect()}
    assert got == {
        ("Apache_Spark", "Software", "Work"),
        ("Apache_Spark", "Software", "Thing"),
        ("Customer", "Agent", "Thing"),
    }


def test_bgp_filters_apply_at_group_end(spark):
    kg = spark.createDataFrame(KG + [("m4", "itsrdf:taIdentRef", "Other")],
                               "subj string, pred string, obj string")
    # required-var filter prunes entities; optional-var filter drops the
    # null binding (SPARQL group-end FILTER semantics)
    out = bgp_match(
        kg, [("?m", "itsrdf:taIdentRef", "?e")],
        optional=[[("?e", "rdf:type", "?t")]],
        filters=["e <> 'Apache_Spark'", "t IS NOT NULL"])
    assert {(r.e, r.m, r.t) for r in out.collect()} == {
        ("Customer", "m3", "Agent")}


def test_functional_violations_flags_multi_object_subjects(spark):
    from dbpedia_spotlight_spark.triples import functional_violations
    kg = spark.createDataFrame([
        ("m1", "itsrdf:taIdentRef", "A"),
        ("m1", "itsrdf:taIdentRef", "B"),
        ("m1", "itsrdf:taIdentRef", "B"),   # dup object: still 2 distinct
        ("m2", "itsrdf:taIdentRef", "A"),
        ("m1", "nif:anchorOf", "x"),        # other predicate never counts
    ], "subj string, pred string, obj string")
    rows = functional_violations(kg, "itsrdf:taIdentRef").collect()
    assert [(r.subj, r.n_objects, r.first_obj, r.last_obj)
            for r in rows] == [("m1", 2, "A", "B")]


def test_construct_materializes_template_triples(spark):
    from dbpedia_spotlight_spark.operators.ontology import construct
    out = construct(
        _kg(spark),
        [("?m", "itsrdf:taIdentRef", "?e"), ("?e", "rdf:type", "?t")],
        template=[("?m", "ex:mentionType", "?t"),
                  ("?e", "ex:wasLinked", "true")])
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    # m1/m2 both link Apache_Spark: the entity-level template row
    # collapses under set semantics
    assert got == {
        ("m1", "ex:mentionType", "Software"),
        ("m2", "ex:mentionType", "Software"),
        ("m3", "ex:mentionType", "Agent"),
        ("Apache_Spark", "ex:wasLinked", "true"),
        ("Customer", "ex:wasLinked", "true"),
    }


def test_construct_skips_null_optional_bindings(spark):
    from dbpedia_spotlight_spark.operators.ontology import construct
    kg = spark.createDataFrame(KG + [("m4", "itsrdf:taIdentRef", "Other")],
                               "subj string, pred string, obj string")
    out = construct(
        kg, [("?m", "itsrdf:taIdentRef", "?e")],
        template=[("?e", "ex:type", "?t")],
        optional=[[("?e", "rdf:type", "?t")]])
    got = {(r.subj, r.obj) for r in out.collect()}
    # Other has no type: its incomplete template triple is not emitted
    assert got == {("Apache_Spark", "Software"), ("Customer", "Agent")}


def test_construct_empty_template_raises(spark):
    from dbpedia_spotlight_spark.operators.ontology import construct
    with pytest.raises(ValueError):
        construct(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                  template=[])


def _entailed(counts_df):
    return {(r.subj, r.obj) for r in counts_df.collect()}


def test_entailment_counts_match_infer_types(spark):
    from dbpedia_spotlight_spark.operators.ontology import (
        entailment_counts, infer_types, subclass_closure)
    clos = subclass_closure(_edges(spark, [
        ("Politician", "Person"), ("Person", "Agent")]))
    stmts = spark.createDataFrame(
        [("e1", RDF_TYPE, "Politician"), ("e1", RDF_TYPE, "Person"),
         ("e2", RDF_TYPE, "Agent")],
        "subj string, pred string, obj string")
    counts = entailment_counts(stmts, clos)
    got = {(r.subj, r.obj): r.n_derivations for r in counts.collect()}
    # e1/Person derived twice: asserted + inherited from Politician
    assert got == {("e1", "Politician"): 1, ("e1", "Person"): 2,
                   ("e1", "Agent"): 2, ("e2", "Agent"): 1}
    assert _entailed(counts) == {
        (r.subj, r.obj) for r in infer_types(stmts, clos).collect()}


def test_maintain_entailment_removal_keeps_multi_derived(spark):
    from dbpedia_spotlight_spark.operators.ontology import (
        entailment_counts, maintain_entailment, subclass_closure)
    clos = subclass_closure(_edges(spark, [
        ("Politician", "Person"), ("Person", "Agent")]))
    stmts = spark.createDataFrame(
        [("e1", RDF_TYPE, "Politician"), ("e1", RDF_TYPE, "Person")],
        "subj string, pred string, obj string")
    counts = entailment_counts(stmts, clos)
    delta = spark.createDataFrame(
        [("e1", RDF_TYPE, "Politician", "removed")],
        "subj string, pred string, obj string, change string")
    new_counts, ent_delta = maintain_entailment(counts, delta, clos)
    # Person/Agent survive (still derived from asserted Person);
    # only Politician leaves the entailed view
    assert {(r.subj, r.pred, r.obj, r.change)
            for r in ent_delta.collect()} == {
        ("e1", RDF_TYPE, "Politician", "removed")}
    assert _entailed(new_counts) == {("e1", "Person"), ("e1", "Agent")}


def test_maintain_entailment_matches_full_recompute_over_random_batches(spark):
    import random
    from dbpedia_spotlight_spark.operators.ontology import (
        entailment_counts, infer_types, maintain_entailment,
        subclass_closure)
    rng = random.Random(7)
    classes = [f"C{i}" for i in range(8)]
    edges = [("C1", "C0"), ("C2", "C0"), ("C3", "C1"), ("C4", "C1"),
             ("C5", "C2"), ("C6", "C3"), ("C7", "C5")]
    clos = subclass_closure(_edges(spark, edges)).localCheckpoint()
    schema = "subj string, pred string, obj string"
    asserted: set[tuple[str, str]] = set()
    counts = entailment_counts(spark.createDataFrame([], schema), clos)
    for _ in range(5):
        adds = {(f"e{rng.randrange(6)}", rng.choice(classes))
                for _ in range(rng.randrange(1, 5))} - asserted
        removes = {p for p in asserted if rng.random() < 0.3}
        asserted = (asserted | adds) - removes
        delta = spark.createDataFrame(
            [(s, RDF_TYPE, o, "added") for s, o in sorted(adds)]
            + [(s, RDF_TYPE, o, "removed") for s, o in sorted(removes)],
            schema + ", change string")
        counts, ent_delta = maintain_entailment(counts, delta, clos)
        counts = counts.localCheckpoint()
        full = infer_types(
            spark.createDataFrame(
                [(s, RDF_TYPE, o) for s, o in sorted(asserted)], schema),
            clos)
        assert _entailed(counts) == {(r.subj, r.obj)
                                     for r in full.collect()}
        # the emitted delta is exactly the entailed-view set difference
        for r in ent_delta.collect():
            assert (r.change == "added") == ((r.subj, r.obj)
                                             in _entailed(counts))


def test_maintain_entailed_types_follows_kg_delta_log(spark, lexicon,
                                                      web_pages, model_bc,
                                                      tmp_path):
    """End-to-end incremental KG-type construction: fold the KG
    maintenance delta log, generation by generation, through the two
    counting states (entity presence, entailment) and land on exactly
    the entailed view a full recompute over the final snapshot gives.
    Generation 1 is a recrawl that replaces 2 urls' content with other
    pages' html, so some entities' link counts genuinely move."""
    import datetime

    from dbpedia_spotlight_spark.operators.ontology import (
        entailment_counts, infer_types, maintain_entailed_types,
        subclass_closure)
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        KGStore, apply_pages_batch)
    from dbpedia_spotlight_spark.triples import PRED_IDENT

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    store = KGStore(spark, str(tmp_path / "kg"))
    apply_pages_batch(spark, spark.createDataFrame(rows, schema),
                      model_bc, store, batch_id=0, cfg=cfg)
    recrawl = [
        (rows[i][0], rows[i][1] + datetime.timedelta(days=1),
         bytes(rows[i + 7][2]), rows[i][3], rows[i][4])
        for i in range(2)
    ]
    apply_pages_batch(spark, spark.createDataFrame(recrawl, schema),
                      model_bc, store, batch_id=1, cfg=cfg)
    assert store.latest_gen() == 1

    ent_types = spark.createDataFrame(
        lexicon.entities[["uri", "types"]].explode("types")
        .rename(columns={"types": "typ"}))
    closure = subclass_closure(spark.createDataFrame(
        [(t, "owl:Thing") for t in
         sorted(lexicon.entities["types"].explode().unique())],
        "sub string, sup string")).localCheckpoint()

    link_counts = spark.createDataFrame([], "uri string, n_links long")
    type_counts = entailment_counts(
        spark.createDataFrame([], "subj string, pred string, obj string"),
        closure)
    log = store.read_log()
    for gen in sorted(r.gen for r in log.select("gen").distinct().collect()):
        delta = log.filter(F.col("gen") == gen)
        link_counts, type_counts, ent_delta = maintain_entailed_types(
            link_counts, type_counts, delta, ent_types, closure)
        link_counts = link_counts.localCheckpoint()
        type_counts = type_counts.localCheckpoint()
        if gen == 0:
            assert ent_delta.filter(
                F.col("change") == "added").count() > 0

    live = (store.read().filter(F.col("pred") == PRED_IDENT)
            .select(F.col("obj").alias("uri")).distinct())
    asserted = (live.join(ent_types, "uri")
                .select(F.col("uri").alias("subj"),
                        F.lit(RDF_TYPE).alias("pred"),
                        F.col("typ").alias("obj")))
    expect = {(r.subj, r.obj)
              for r in infer_types(asserted, closure).collect()}
    assert _entailed(type_counts) == expect
    # link-count state mirrors the live snapshot exactly
    per_entity = {r.uri: r.n for r in
                  store.read().filter(F.col("pred") == PRED_IDENT)
                  .groupBy(F.col("obj").alias("uri"))
                  .agg(F.count("*").alias("n")).collect()}
    assert {r.uri: r.n_links for r in link_counts.collect()} == per_entity


def test_bgp_inverse_and_alternation_paths(spark):
    # inverse: (?e, ^taIdentRef, ?m) ≡ (?m, taIdentRef, ?e)
    out = bgp_match(_kg(spark), [("?e", "^itsrdf:taIdentRef", "?m")])
    assert {(r.e, r.m) for r in out.collect()} == {
        ("Apache_Spark", "m1"), ("Apache_Spark", "m2"),
        ("Customer", "m3")}
    # alternation: anchor OR link rows of one mention
    out = bgp_match(_kg(spark),
                    [("m1", "nif:anchorOf|itsrdf:taIdentRef", "?x")])
    assert {r.x for r in out.collect()} == {"spark", "Apache_Spark"}


def test_bgp_nested_property_paths_raise(spark):
    for bad in ("^itsrdf:taIdentRef+", "a|b+", "^a|b"):
        with pytest.raises(ValueError):
            bgp_match(_kg(spark), [("?s", bad, "?o")])


def test_entail_store_catchup_heals_orphaned_generation(spark, lexicon,
                                                        web_pages, model_bc,
                                                        tmp_path):
    """Crash contract: catchup writes a generation's states BEFORE
    flipping the pointer, so a crash in between leaves an orphaned gen
    dir. A re-run must refold that generation (mode=overwrite) and land
    on the same state as an uninterrupted run."""
    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        EntailStore, KGStore, apply_pages_batch)

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    pages = spark.createDataFrame(
        web_pages.select(*cols).limit(6).collect(),
        schema=web_pages.select(*cols).schema)
    store = KGStore(spark, str(tmp_path / "kg"))
    apply_pages_batch(spark, pages, model_bc, store, batch_id=0, cfg=cfg)

    ent_types = spark.createDataFrame(
        lexicon.entities[["uri", "types"]].explode("types")
        .rename(columns={"types": "typ"}))
    closure = spark.createDataFrame([], "sub string, sup string, depth int")

    # simulate the torn state: gen-00000 dir holds garbage parquet,
    # pointer never flipped
    estore = EntailStore(spark, str(tmp_path / "entail"))
    spark.createDataFrame([("junk", 99)], "uri string, n_links long") \
        .write.parquet(f"{estore._gen_path(0)}/links")
    assert estore.latest_gen() is None

    stats = estore.catchup(store, ent_types, closure)
    assert stats["gens_folded"] == 1 and stats["gen"] == 0
    live = {r.uri for r in
            store.read().filter(F.col("pred") == "itsrdf:taIdentRef")
            .select(F.col("obj").alias("uri")).distinct().collect()}
    assert {r.uri for r in estore.read_links().collect()} == live
    assert "junk" not in {r.uri for r in estore.read_links().collect()}


def test_bgp_zero_or_more_and_zero_or_one_paths(spark):
    kg = spark.createDataFrame([
        ("a", "sub", "b"), ("b", "sub", "c"),
        ("a", "other", "z"),
    ], "subj string, pred string, obj string")
    terms = {"a", "b", "c", "z"}
    # p*: closure plus (x, x) for every term in the graph
    out = bgp_match(kg, [("?x", "sub*", "?y")])
    got = {(r.x, r.y) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c")} | {
        (t, t) for t in terms}
    # p?: direct edges plus reflexive, no 2-step paths
    out = bgp_match(kg, [("?x", "sub?", "?y")])
    got = {(r.x, r.y) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c")} | {(t, t) for t in terms}
    # constant endpoint prunes the reflexive domain
    out = bgp_match(kg, [("a", "sub*", "?y")])
    assert {r.y for r in out.collect()} == {"a", "b", "c"}


def test_bgp_union_pads_branch_exclusive_vars_with_null(spark):
    from dbpedia_spotlight_spark.operators.ontology import bgp_union
    out = bgp_union(_kg(spark), [
        [("?m", "itsrdf:taIdentRef", "?e"), ("?e", "rdf:type", "Software")],
        [("?m", "nif:anchorOf", "?sf")],
    ])
    assert out.columns == ["e", "m", "sf"]
    got = {(r.e, r.m, r.sf) for r in out.collect()}
    assert got == {
        ("Apache_Spark", "m1", None),
        ("Apache_Spark", "m2", None),
        (None, "m1", "spark"),
    }


def test_bgp_union_accepts_kwarg_groups_and_group_end_filter(spark):
    from dbpedia_spotlight_spark.operators.ontology import bgp_union
    out = bgp_union(_kg(spark), [
        {"patterns": [("?m", "itsrdf:taIdentRef", "?e")],
         "optional": [[("?e", "rdf:type", "?t")]]},
        {"patterns": [("?m", "nif:anchorOf", "?sf")],
         "bind": {"?t": "'Anchor'"}},
    ], filters=["t IS NOT NULL"])
    got = {(r.m, r.t) for r in out.collect()}
    # m3's entity Customer is typed Agent; anchor branch BINDs 'Anchor'
    assert got == {("m1", "Software"), ("m2", "Software"),
                   ("m3", "Agent"), ("m1", "Anchor")}


def test_bgp_union_empty_groups_raise(spark):
    from dbpedia_spotlight_spark.operators.ontology import bgp_union
    with pytest.raises(ValueError):
        bgp_union(_kg(spark), [])


def test_bgp_values_constrains_and_products(spark):
    # shared var: VALUES acts as an inline whitelist join
    out = bgp_match(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                    values=(["?e"], [("Customer",)]))
    assert {(r.e, r.m) for r in out.collect()} == {("Customer", "m3")}
    # multi-column VALUES carries extra bindings alongside the key
    out = bgp_match(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                    values=(["?e", "?lang"],
                            [("Apache_Spark", "en"), ("Customer", "de")]))
    got = {(r.m, r.e, r.lang) for r in out.collect()}
    assert got == {("m1", "Apache_Spark", "en"), ("m2", "Apache_Spark", "en"),
                   ("m3", "Customer", "de")}
    # no shared var: SPARQL product semantics
    out = bgp_match(_kg(spark), [("?m", "nif:anchorOf", "?sf")],
                    values=(["?k"], [("x",), ("y",)]))
    assert out.count() == 2
    # UNDEF rows are rejected
    with pytest.raises(ValueError):
        bgp_match(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                  values=(["?e"], [(None,)]))


def test_bgp_bind_computes_in_order_and_rejects_rebinding(spark):
    out = bgp_match(
        _kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
        bind={"?elen": "length(e)", "?big": "elen > 8"},
        filters=["big"])
    got = {(r.e, r.elen, r.big) for r in out.collect()}
    assert got == {("Apache_Spark", 12, True)}
    with pytest.raises(ValueError):
        bgp_match(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                  bind={"?e": "'x'"})


def test_bgp_minus_removes_compatible_solutions(spark):
    # MINUS the typed entities: only the untyped-entity mentions stay
    kg = spark.createDataFrame(KG + [("m4", "itsrdf:taIdentRef", "Other")],
                               "subj string, pred string, obj string")
    out = bgp_match(kg, [("?m", "itsrdf:taIdentRef", "?e")],
                    minus=[[("?e", "rdf:type", "?t")]])
    assert {(r.e, r.m) for r in out.collect()} == {("Other", "m4")}
    # disjoint-domain MINUS raises instead of silently removing nothing
    with pytest.raises(ValueError):
        bgp_match(kg, [("?m", "nif:anchorOf", "?sf")],
                  minus=[[("?x", "rdf:type", "?t")]])


def test_bgp_minus_keeps_null_shared_binding(spark):
    # an unmatched-OPTIONAL null never matches an anti-join key: the
    # unbound solution survives MINUS (conservative SPARQL compatibility)
    kg = spark.createDataFrame(KG + [("m4", "itsrdf:taIdentRef", "Other")],
                               "subj string, pred string, obj string")
    out = bgp_match(kg, [("?m", "itsrdf:taIdentRef", "?e")],
                    optional=[[("?e", "rdf:type", "?t")]],
                    minus=[[("?x", "rdf:type", "?t")]])
    got = {(r.m, r.t) for r in out.collect()}
    assert got == {("m4", None)}


def test_ask_short_circuits(spark):
    from dbpedia_spotlight_spark.operators.ontology import ask
    assert ask(_kg(spark), [("?m", "itsrdf:taIdentRef", "Apache_Spark")])
    assert not ask(_kg(spark), [("?m", "itsrdf:taIdentRef", "NoSuch")])


def _kg_rows(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_infer_domain_range_entails_and_lifts_through_closure(spark):
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_domain_range)
    kg = _kg_rows(spark, [
        ("m1", "anchor", "Spark"),
        ("m1", "ident", "dbr:Spark"),
        ("m2", "ident", "dbr:Flink"),
        ("dbr:Spark", RDF_TYPE, "Software"),  # rdf:type stmt: no decl
    ])
    doms = spark.createDataFrame(
        [("anchor", "Phrase"), ("ident", "Phrase")], "pred string, cls string")
    rans = spark.createDataFrame(
        [("ident", "Concept")], "pred string, cls string")

    got = {(r.subj, r.pred, r.obj)
           for r in infer_domain_range(kg, doms, rans).collect()}
    # m1 types once despite two declaring predicates (set semantics)
    assert got == {
        ("m1", RDF_TYPE, "Phrase"), ("m2", RDF_TYPE, "Phrase"),
        ("dbr:Spark", RDF_TYPE, "Concept"),
        ("dbr:Flink", RDF_TYPE, "Concept"),
    }

    clos = subclass_closure(_edges(spark, [("Concept", "Thing")]))
    lifted = {(r.subj, r.obj) for r in
              infer_domain_range(kg, doms, rans, closure=clos).collect()}
    # Concept lifts to Thing (rdfs:9 compose); Phrase has no supertype
    assert ("dbr:Spark", "Thing") in lifted and ("m1", "Thing") not in lifted
    assert lifted == {(s, o) for s, _, o in got} | {
        ("dbr:Spark", "Thing"), ("dbr:Flink", "Thing")}


def test_bgp_aggregate_groups_counts_and_having(spark):
    from dbpedia_spotlight_spark.operators.ontology import bgp_aggregate
    kg = _kg_rows(spark, [
        ("m1", "ident", "e1"), ("m2", "ident", "e1"),
        ("m3", "ident", "e2"), ("m4", "ident", "e3"),
        ("e1", RDF_TYPE, "A"), ("e2", RDF_TYPE, "A"),
        ("e3", RDF_TYPE, "B"),
    ])
    pats = [("?m", "ident", "?e"), ("?e", RDF_TYPE, "?t")]
    got = {(r.t, r.n_mentions, r.n_entities) for r in bgp_aggregate(
        kg, pats, group_by=["?t"],
        aggregates={"n_mentions": "count(*)",
                    "n_entities": "count(distinct e)"}).collect()}
    assert got == {("A", 3, 2), ("B", 1, 1)}

    # HAVING over an aggregate alias
    kept = bgp_aggregate(
        kg, pats, group_by=["?t"], aggregates={"n_mentions": "count(*)"},
        having="n_mentions >= 2").collect()
    assert [(r.t, r.n_mentions) for r in kept] == [("A", 3)]

    # empty group_by = one global group (SPARQL implicit group)
    row = bgp_aggregate(kg, pats, group_by=[],
                        aggregates={"n": "count(*)"}).collect()
    assert [(r.n,) for r in row] == [(4,)]

    with pytest.raises(ValueError, match="at least one aggregate"):
        bgp_aggregate(kg, pats, group_by=["?t"], aggregates={})


def test_bgp_aggregate_full_sparql11_aggregate_set(spark):
    """The complete SPARQL 1.1 aggregate vocabulary maps onto Spark SQL
    aggregate exprs through bgp_aggregate: COUNT / SUM / MIN / MAX /
    AVG (over a BIND-computed numeric), SAMPLE (any_value over a
    one-value group — deterministic there), GROUP_CONCAT with separator
    (sorted collect_list + array_join for a deterministic row)."""
    from dbpedia_spotlight_spark.operators.ontology import bgp_aggregate
    kg = _kg_rows(spark, [
        ("m1", "ident", "e1"), ("m2", "ident", "e1"),
        ("m3", "ident", "e2"),
        ("e1", RDF_TYPE, "A"), ("e2", RDF_TYPE, "A"),
    ])
    pats = [("?m", "ident", "?e"), ("?e", RDF_TYPE, "?t")]
    got = bgp_aggregate(
        kg, pats, group_by=["?t"],
        aggregates={
            "n": "count(*)",
            "sum_len": "sum(length(m))",
            "min_m": "min(m)",
            "max_m": "max(m)",
            "avg_len": "avg(length(e))",
            "sample_t": "any_value(t)",          # SAMPLE
            "mentions": "array_join(sort_array(collect_list(m)), ';')",
        }).first()                                # GROUP_CONCAT(m; ';')
    assert (got["n"], got["sum_len"]) == (3, 6)
    assert (got["min_m"], got["max_m"]) == ("m1", "m3")
    assert got["avg_len"] == 2.0
    assert got["sample_t"] == "A"
    assert got["mentions"] == "m1;m2;m3"


def test_pmi_edges_match_hand_computation(spark):
    import math

    from dbpedia_spotlight_spark.operators.graph import pmi_edges
    # N=4 docs: {a,b} ×2, {a,c}, {b} alone — a,b co-occur at chance,
    # a,c positively associated
    links = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "a"), (1, "b"), (2, "a"), (2, "c"),
         (3, "b"), (2, "a")],  # duplicate mention collapses
        "doc_id int, uri string")
    got = {(r.uri_a, r.uri_b):
           (r.n_ab, r.n_a, r.n_b, r.pmi, r.npmi)
           for r in pmi_edges(links).collect()}
    assert set(got) == {("a", "b"), ("a", "c")}
    n_ab, n_a, n_b, pmi, npmi = got[("a", "b")]
    assert (n_ab, n_a, n_b) == (2, 3, 3)
    assert pmi == round(math.log(2 * 4 / 9), 9)
    assert npmi == round(math.log(8 / 9) / -math.log(2 / 4), 9)
    n_ab, n_a, n_b, pmi, npmi = got[("a", "c")]
    assert (n_ab, n_a, n_b) == (1, 3, 1)
    assert pmi == round(math.log(4 / 3), 9)


def test_bgp_select_modifiers_and_describe(spark):
    from dbpedia_spotlight_spark.operators.ontology import (
        bgp_select, describe)
    kg = _kg_rows(spark, [
        ("m1", "ident", "e1"), ("m2", "ident", "e1"),
        ("m3", "ident", "e2"), ("m4", "ident", "e3"),
        ("e1", RDF_TYPE, "A"), ("e2", RDF_TYPE, "A"),
        ("e3", RDF_TYPE, "B"),
    ])
    pats = [("?m", "ident", "?e"), ("?e", RDF_TYPE, "?t")]
    # projection + DISTINCT collapses the per-mention fan-out
    got = bgp_select(kg, pats, select_vars=["?e", "?t"], distinct=True,
                     order_by=["?e"]).collect()
    assert [(r.e, r.t) for r in got] == [("e1", "A"), ("e2", "A"),
                                         ("e3", "B")]
    # ORDER BY desc + OFFSET + LIMIT page (total order via tie-break)
    page = bgp_select(kg, pats, select_vars=["?m"],
                      order_by=[("?m", "desc")], offset=1, limit=2)
    assert [r.m for r in page.collect()] == ["m3", "m2"]
    # DESCRIBE: subject and object occurrences, set semantics
    desc = {(r.subj, r.pred, r.obj) for r in describe(kg, "e1").collect()}
    assert desc == {("m1", "ident", "e1"), ("m2", "ident", "e1"),
                    ("e1", RDF_TYPE, "A")}


def test_bgp_sequence_property_paths(spark):
    # m → entity → type in one sequence step; bag multiplicity per
    # intermediate preserved (the SPARQL fresh-variable translation)
    out = bgp_match(_kg(spark),
                    [("?m", "itsrdf:taIdentRef/rdf:type", "?t")])
    assert out.columns == ["m", "t"]  # __seq internals never projected
    assert {(r.m, r.t) for r in out.collect()} == {
        ("m1", "Software"), ("m2", "Software"), ("m3", "Agent")}

    # each step may itself be a path form: inverse-first sequence
    out = bgp_match(_kg(spark), [("?sf", "^nif:anchorOf/rdf:type", "?t")])
    assert {(r.sf, r.t) for r in out.collect()} == set()  # m1 untyped
    out = bgp_match(_kg(spark),
                    [("?sf", "^nif:anchorOf/itsrdf:taIdentRef", "?e")])
    assert {(r.sf, r.e) for r in out.collect()} == {("spark", "Apache_Spark")}

    # sequence inside an OPTIONAL group; internals stay group-local
    out = bgp_match(
        _kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
        optional=[[("?m", "itsrdf:taIdentRef/rdf:type", "?t")]])
    got = {(r.m, r.t) for r in out.collect()}
    assert got == {("m1", "Software"), ("m2", "Software"), ("m3", "Agent")}

    with pytest.raises(ValueError, match="empty step"):
        bgp_match(_kg(spark), [("?a", "p//q", "?b")])


def test_maintain_comention_matches_full_recompute(spark):
    """Randomized add/remove batches folded through maintain_comention
    must keep the edge state ≡ cooccurrence_edges over the live
    incidence, and emit exactly the structural edge delta."""
    import random

    from dbpedia_spotlight_spark.operators.graph import (
        cooccurrence_edges, maintain_comention)
    from dbpedia_spotlight_spark.triples import PRED_IDENT

    rng = random.Random(7)
    urls = [f"u{i}" for i in range(5)]
    ents = [f"e{i}" for i in range(6)]
    live: set[tuple[str, str, str]] = set()  # (url, subj-frag, uri)
    inc = spark.createDataFrame([], "url string, uri string, n_links long")
    edges = spark.createDataFrame(
        [], "uri_a string, uri_b string, n_docs long")

    def fold(batch, inc, edges):
        delta = spark.createDataFrame(
            [(u, s, PRED_IDENT, e, c) for (u, s, e), c in batch],
            "url string, subj string, pred string, obj string, "
            "change string")
        inc, edges, edge_delta = maintain_comention(inc, edges, delta)
        inc = inc.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        return inc, edges, edge_delta

    for step in range(6):
        batch = []
        # removals of present links, additions of absent ones
        for cand in rng.sample(sorted(live), k=min(3, len(live))):
            live.discard(cand)
            batch.append((cand, "removed"))
        for _ in range(4):
            u = rng.choice(urls)
            e = rng.choice(ents)
            frag = f"{u}#char={rng.randrange(100)},{rng.randrange(100,200)}"
            cand = (u, frag, e)
            if cand not in live and not any(c[0] == cand for c in batch):
                live.add(cand)
                batch.append((cand, "added"))
        if not batch:
            continue
        inc, edges, edge_delta = fold(batch, inc, edges)

        links = spark.createDataFrame(
            [(u, e) for (u, _, e) in live] or [(None, None)],
            "url string, uri string").dropna()
        expect = {(r.uri_a, r.uri_b, r.n_docs) for r in
                  cooccurrence_edges(links, "url", "uri").collect()}
        got = {(r.uri_a, r.uri_b, r.n_docs) for r in edges.collect()}
        assert got == expect, f"divergence at step {step}"

    # structural delta check: edge_delta must be EXACTLY the
    # before/after key diff of the edge table
    by_url = {}
    for u, _, e in live:
        by_url.setdefault(u, set()).add(e)
    u_multi = next(u for u in urls if len(by_url.get(u, ())) >= 2)
    drop = sorted(c for c in live if c[0] == u_multi)
    before = {(r.uri_a, r.uri_b) for r in edges.collect()}
    for c in drop:
        live.discard(c)
    inc, edges, edge_delta = fold([(c, "removed") for c in drop],
                                  inc, edges)
    after = {(r.uri_a, r.uri_b) for r in edges.collect()}
    got_delta = {(r.uri_a, r.uri_b, r.change) for r in edge_delta.collect()}
    expect_delta = ({(a, b, "removed") for a, b in before - after}
                    | {(a, b, "added") for a, b in after - before})
    assert got_delta == expect_delta and (before - after)


def test_bgp_filter_exists_and_not_exists(spark):
    pats = [("?m", "itsrdf:taIdentRef", "?e")]
    # EXISTS: only mentions of typed entities survive
    out = bgp_match(_kg(spark), pats,
                    exists=[[("?e", "rdf:type", "?t")]])
    assert {(r.m, r.e) for r in out.collect()} == {
        ("m1", "Apache_Spark"), ("m2", "Apache_Spark"),
        ("m3", "Customer")}
    # NOT EXISTS with a constant: entities not typed Software
    out = bgp_match(_kg(spark), pats,
                    not_exists=[[("?e", "rdf:type", "Software")]])
    assert {r.e for r in out.collect()} == {"Customer"}
    # group variables never leak into the output
    assert out.columns == ["e", "m"]
    # constant-condition groups (no shared variable) short-circuit
    assert bgp_match(_kg(spark), pats,
                     exists=[[("loop", "selfPred", "loop")]]).count() == 3
    assert bgp_match(_kg(spark), pats,
                     not_exists=[[("loop", "selfPred", "loop")]]).count() == 0
    assert bgp_match(_kg(spark), pats,
                     exists=[[("nope", "selfPred", "nope")]]).count() == 0
    # null shared binding (unmatched OPTIONAL) is kept by NOT EXISTS
    out = bgp_match(
        _kg(spark), pats,
        optional=[[("?e", "rdf:type", "?t")]],
        not_exists=[[("?t", "never:pred", "?z")]])
    assert out.count() == 3


def test_bgp_negated_property_set(spark):
    out = bgp_match(_kg(spark),
                    [("?s", "!itsrdf:taIdentRef|rdf:type", "?o")])
    assert {(r.s, r.o) for r in out.collect()} == {
        ("m1", "spark"), ("loop", "loop")}
    with pytest.raises(ValueError, match="negated set"):
        bgp_match(_kg(spark), [("?s", "!^p", "?o")])


def test_bgp_select_order_limit_plan_is_top_k(spark):
    """The docstring's plan claim, pinned: ORDER BY + LIMIT compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge), never a
    global Sort + Exchange."""
    from dbpedia_spotlight_spark.operators.ontology import bgp_select
    page = bgp_select(_kg(spark), [("?m", "itsrdf:taIdentRef", "?e")],
                      order_by=["?m"], limit=2)
    plan = page._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_infer_domain_range_plan_broadcasts_declarations(spark):
    """The (pred, cls) declaration frames are the broadcast side —
    the corpus-scale statement stream never shuffles for these joins."""
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_domain_range)
    kg = _kg(spark)
    doms = spark.createDataFrame([("nif:anchorOf", "Phrase")],
                                 "pred string, cls string")
    rans = spark.createDataFrame([("itsrdf:taIdentRef", "Concept")],
                                 "pred string, cls string")
    plan = (infer_domain_range(kg, doms, rans)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_bgp_subquery_join_and_product(spark):
    """SPARQL 1.1 subselects: a subquery's solutions frame joins into
    the outer group on shared variables (here: per-type mention counts
    aggregated bottom-up, then each entity row enriched with its
    type's count), and a no-shared-variable subquery crosses in."""
    from dbpedia_spotlight_spark.operators.ontology import (
        bgp_aggregate, bgp_match,
    )
    kg = _kg_rows(spark, [
        ("m1", "ident", "e1"), ("m2", "ident", "e1"),
        ("m3", "ident", "e2"), ("m4", "ident", "e3"),
        ("e1", RDF_TYPE, "A"), ("e2", RDF_TYPE, "A"),
        ("e3", RDF_TYPE, "B"),
    ])
    sub = bgp_aggregate(
        kg, [("?m", "ident", "?e"), ("?e", RDF_TYPE, "?t")],
        group_by=["?t"], aggregates={"n_in_type": "count(*)"})
    got = {(r.e, r.t, r.n_in_type) for r in bgp_match(
        kg, [("?e", RDF_TYPE, "?t")], subqueries=[sub]).collect()}
    assert got == {("e1", "A", 3), ("e2", "A", 3), ("e3", "B", 1)}

    # disjoint subquery → product (the SPARQL rule)
    glob = bgp_aggregate(kg, [("?m", "ident", "?x")], group_by=[],
                         aggregates={"total": "count(*)"})
    rows = bgp_match(kg, [("?e", RDF_TYPE, "?t")],
                     subqueries=[glob]).collect()
    assert len(rows) == 3 and all(r["total"] == 4 for r in rows)


# ------------------------------------------------------- SHACL-lite shapes

def test_validate_shapes_all_components(spark):
    from dbpedia_spotlight_spark.operators.shapes import validate_shapes
    kg = _kg_rows(spark, [
        ("p1", RDF_TYPE, "Person"),
        ("p2", RDF_TYPE, "Person"),
        ("p3", RDF_TYPE, "Person"),
        ("o1", RDF_TYPE, "Org"),
        ("p1", "foaf:name", "Ada"),
        ("p2", "foaf:name", "Grace"),
        ("p2", "foaf:name", "G."),              # maxCount 1 violated
        # p3 has no name                        → minCount 1 violated
        ("p1", "ex:homepage", "https://ada.example/"),
        ("p2", "ex:homepage", "gopher noise"),  # pattern + nodeKind IRI
        ("p1", "ex:knows", "p2"),
        ("p2", "ex:knows", "o1"),               # sh:class Person violated
        ("o1", "ex:member", "p3"),              # only p3 has ^ex:member
    ])
    shapes = [{
        "shape": "PersonShape", "target_class": "Person",
        "constraints": [
            {"path": "foaf:name", "min_count": 1, "max_count": 1},
            {"path": "ex:homepage", "pattern": "^https://",
             "node_kind": "IRI"},
            {"path": "ex:knows", "cls": "Person"},
            {"path": "ex:member", "inverse": True, "has_value": "o1"},
        ],
    }]
    rows = {(r.shape, r.focus, r.path, r.component, r.value, r.got)
            for r in validate_shapes(kg, shapes).collect()}
    assert rows == {
        ("PersonShape", "p2", "foaf:name", "maxCount", None, 2),
        ("PersonShape", "p3", "foaf:name", "minCount", None, 0),
        ("PersonShape", "p2", "ex:homepage", "pattern",
         "gopher noise", None),
        ("PersonShape", "p2", "ex:homepage", "nodeKind",
         "gopher noise", None),
        ("PersonShape", "p2", "ex:knows", "class", "o1", None),
        ("PersonShape", "p1", "^ex:member", "hasValue", "o1", None),
        ("PersonShape", "p2", "^ex:member", "hasValue", "o1", None),
    }


def test_validate_shapes_subjects_target_in_set_and_literal(spark):
    from dbpedia_spotlight_spark.operators.shapes import validate_shapes
    kg = _kg_rows(spark, [
        ("d1", "ex:status", "active"),
        ("d2", "ex:status", "bogus"),
        ("d1", "ex:label", "plain words"),
        ("d2", "ex:label", "ex:notaliteral"),   # nodeKind Literal viol
    ])
    shapes = [{
        "shape": "DocShape", "target_subjects_of": "ex:status",
        "constraints": [
            {"path": "ex:status", "in_set": ["active", "dormant"]},
            {"path": "ex:label", "node_kind": "Literal"},
        ],
    }]
    rows = {(r.focus, r.component, r.value)
            for r in validate_shapes(kg, shapes).collect()}
    assert rows == {("d2", "in", "bogus"),
                    ("d2", "nodeKind", "ex:notaliteral")}


def test_validate_shapes_conformant_and_entailed_types(spark):
    """Empty report on a conformant KG; passing infer_types() output as
    ``types`` switches focus targeting to the RDFS closure."""
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_types, subclass_closure)
    from dbpedia_spotlight_spark.operators.shapes import validate_shapes
    kg = _kg_rows(spark, [
        ("p1", RDF_TYPE, "Politician"),
        ("p1", "foaf:name", "Ada"),
    ])
    shape = [{"shape": "PersonShape", "target_class": "Person",
              "constraints": [{"path": "foaf:name", "min_count": 1}]}]
    # asserted types only: Politician is not Person → no focus nodes
    assert validate_shapes(kg, shape).count() == 0
    clos = subclass_closure(spark.createDataFrame(
        [("Politician", "Person")], "sub string, sup string"))
    ent = infer_types(kg.filter(F.col("pred") == RDF_TYPE), clos)
    # entailed: p1 IS a Person and conforms
    assert validate_shapes(kg, shape, types=ent).count() == 0
    shape[0]["constraints"].append({"path": "ex:homepage", "min_count": 1})
    viol = validate_shapes(kg, shape, types=ent).collect()
    assert [(r.focus, r.component, r.got) for r in viol] == [
        ("p1", "minCount", 0)]


def test_validate_shapes_requires_a_target(spark):
    from dbpedia_spotlight_spark.operators.shapes import validate_shapes
    with pytest.raises(ValueError, match="needs target"):
        validate_shapes(_kg_rows(spark, [("a", "b", "c")]),
                        [{"shape": "S", "constraints": []}]).collect()


def test_drop_nonconforming_and_summary(spark):
    from dbpedia_spotlight_spark.operators.shapes import (
        drop_nonconforming, shape_summary, validate_shapes)
    kg = _kg_rows(spark, [
        ("p1", RDF_TYPE, "Person"),
        ("p2", RDF_TYPE, "Person"),
        ("p1", "foaf:name", "Ada"),
        # p2 nameless → minCount violation; p2's OTHER assertions must
        # also go, but p2 as an OBJECT stays (dangling ref is reported,
        # not invalid)
        ("p2", "ex:homepage", "https://b.example/"),
        ("p1", "ex:knows", "p2"),
    ])
    shapes = [{"shape": "PersonShape", "target_class": "Person",
               "constraints": [{"path": "foaf:name", "min_count": 1}]}]
    report = validate_shapes(kg, shapes)
    kept = {(r.subj, r.pred, r.obj)
            for r in drop_nonconforming(kg, report).collect()}
    assert kept == {("p1", RDF_TYPE, "Person"), ("p1", "foaf:name", "Ada"),
                    ("p1", "ex:knows", "p2")}
    [s] = shape_summary(report).collect()
    assert (s.shape, s.path, s.component, s.n_violations, s.n_focus) == (
        "PersonShape", "foaf:name", "minCount", 1, 1)


# ------------------------------------------------------- SPARQL UPDATE

def test_update_kg_delete_insert_where(spark):
    """Predicate migration: rewrite every ex:oldRef edge to
    itsrdf:taIdentRef in one DELETE/INSERT WHERE pass."""
    from dbpedia_spotlight_spark.operators.ontology import update_kg
    kg = _kg_rows(spark, [
        ("m1", "ex:oldRef", "E1"),
        ("m2", "ex:oldRef", "E2"),
        ("m3", "itsrdf:taIdentRef", "E3"),
        ("E1", RDF_TYPE, "Thing"),
    ])
    out = {(r.subj, r.pred, r.obj) for r in update_kg(
        kg, [("?m", "ex:oldRef", "?e")],
        delete=[("?m", "ex:oldRef", "?e")],
        insert=[("?m", "itsrdf:taIdentRef", "?e")]).collect()}
    assert out == {
        ("m1", "itsrdf:taIdentRef", "E1"),
        ("m2", "itsrdf:taIdentRef", "E2"),
        ("m3", "itsrdf:taIdentRef", "E3"),
        ("E1", RDF_TYPE, "Thing"),
    }


def test_update_kg_where_sees_prestate_and_filters(spark):
    """WHERE matches the PRE-update graph once: a delete that would
    invalidate another solution's match must not cascade."""
    from dbpedia_spotlight_spark.operators.ontology import update_kg
    kg = _kg_rows(spark, [
        ("a", "ex:next", "b"),
        ("b", "ex:next", "c"),
        ("c", "ex:next", "d"),
    ])
    # delete every edge whose SOURCE is itself a target — b→c and c→d.
    # naive sequential deletion of b→c would free c→d; spec says both go
    out = {(r.subj, r.obj) for r in update_kg(
        kg, [("?x", "ex:next", "?y"), ("?y", "ex:next", "?z")],
        delete=[("?y", "ex:next", "?z")]).collect()}
    assert out == {("a", "b")}


def test_update_kg_insert_only_and_delete_only(spark):
    from dbpedia_spotlight_spark.operators.ontology import update_kg
    kg = _kg_rows(spark, [
        ("e1", RDF_TYPE, "Person"), ("e1", "foaf:name", "Ada")])
    ins = update_kg(kg, [("?e", RDF_TYPE, "Person")],
                    insert=[("?e", RDF_TYPE, "Agent")])
    assert ins.count() == 3
    dele = update_kg(kg, [("?e", RDF_TYPE, "Person")],
                     delete=[("?e", "foaf:name", "Ada")])
    assert {(r.subj, r.pred, r.obj) for r in dele.collect()} == {
        ("e1", RDF_TYPE, "Person")}
    with pytest.raises(ValueError, match="delete and/or insert"):
        update_kg(kg, [("?e", RDF_TYPE, "Person")])


def test_update_kg_triple_in_both_delete_and_insert_survives(spark):
    from dbpedia_spotlight_spark.operators.ontology import update_kg
    kg = _kg_rows(spark, [("e1", RDF_TYPE, "Person")])
    out = update_kg(kg, [("?e", RDF_TYPE, "Person")],
                    delete=[("?e", RDF_TYPE, "Person")],
                    insert=[("?e", RDF_TYPE, "Person")])
    assert [(r.subj, r.pred, r.obj) for r in out.collect()] == [
        ("e1", RDF_TYPE, "Person")]


def test_validate_shapes_delta_equals_full_revalidation(spark):
    """Incremental report after a recrawl delta ≡ full revalidation —
    including the cross-node case: a TYPE change on a value node must
    flip an sh:class verdict for an UNTOUCHED focus node."""
    from dbpedia_spotlight_spark.operators.shapes import (
        validate_shapes, validate_shapes_delta)
    shapes = [{
        "shape": "PersonShape", "target_class": "Person",
        "constraints": [
            {"path": "foaf:name", "min_count": 1},
            {"path": "ex:knows", "cls": "Person"},
        ],
    }]
    kg0_rows = [
        ("p1", RDF_TYPE, "Person"), ("p1", "foaf:name", "Ada"),
        ("p2", RDF_TYPE, "Person"), ("p2", "foaf:name", "Bo"),
        ("p1", "ex:knows", "x1"),          # x1 untyped → class viol
        ("x1", "foaf:name", "Mystery"),
    ]
    kg0 = _kg_rows(spark, kg0_rows)
    report0 = validate_shapes(kg0, shapes)
    assert {(r.focus, r.component) for r in report0.collect()} == {
        ("p1", "class")}
    # delta: x1 BECOMES a Person (fixes p1's class viol without
    # touching p1), p2 loses its name (new minCount viol), p3 appears
    # nameless (new focus, minCount viol)
    added = [("x1", RDF_TYPE, "Person"), ("p3", RDF_TYPE, "Person")]
    removed = [("p2", "foaf:name", "Bo")]
    kg1 = _kg_rows(spark, [r for r in kg0_rows if r not in removed]
                   + added)
    delta = spark.createDataFrame(
        [r + ("added",) for r in added] + [r + ("removed",)
                                           for r in removed],
        "subj string, pred string, obj string, change string")
    inc = validate_shapes_delta(kg1, delta, shapes, report0)
    full = validate_shapes(kg1, shapes)
    assert (sorted(map(tuple, inc.collect()))
            == sorted(map(tuple, full.collect())))
    got = {(r.focus, r.component) for r in inc.collect()}
    assert got == {("p2", "minCount"), ("p3", "minCount")}


# --- rdfs:5/7 subproperties + OWL property axioms -------------------

def test_infer_subproperties_lifts_through_closure(spark):
    # influenced ⊑ related ⊑ linked: rdfs:5 closes the hierarchy,
    # rdfs:7 lifts each statement to every STRICT superproperty.
    kg = _kg_rows(spark, [
        ("a", "ex:influenced", "b"),
        ("c", "ex:related", "d"),
        ("e", "ex:other", "f"),
    ])
    sub = spark.createDataFrame(
        [("ex:influenced", "ex:related"), ("ex:related", "ex:linked")],
        "sub string, sup string")
    got = {(r.subj, r.pred, r.obj)
           for r in infer_subproperties(kg, sub).collect()}
    assert got == {
        ("a", "ex:related", "b"), ("a", "ex:linked", "b"),
        ("c", "ex:linked", "d"),
    }


def test_property_axioms_inverse_both_directions(spark):
    kg = _kg_rows(spark, [
        ("a", "ex:parentOf", "b"),
        ("c", "ex:childOf", "d"),
    ])
    inv = spark.createDataFrame([("ex:parentOf", "ex:childOf")],
                                "pred string, inv string")
    got = {(r.subj, r.pred, r.obj)
           for r in infer_property_axioms(kg, inverses=inv).collect()}
    assert got == {
        ("b", "ex:childOf", "a"),
        ("d", "ex:parentOf", "c"),
    }


def test_property_axioms_symmetric_excludes_asserted(spark):
    # (b, knows, a) is already asserted — derived output must not
    # repeat it (anti-join contract), only add the missing directions.
    kg = _kg_rows(spark, [
        ("a", "ex:knows", "b"),
        ("b", "ex:knows", "a"),
        ("b", "ex:knows", "c"),
        ("x", "ex:likes", "y"),
    ])
    got = {(r.subj, r.pred, r.obj) for r in infer_property_axioms(
        kg, symmetric=["ex:knows"]).collect()}
    assert got == {("c", "ex:knows", "b")}


def test_property_axioms_transitive_chain(spark):
    kg = _kg_rows(spark, [
        ("a", "ex:ancestorOf", "b"),
        ("b", "ex:ancestorOf", "c"),
        ("c", "ex:ancestorOf", "d"),
        ("x", "ex:other", "y"),
    ])
    got = {(r.subj, r.pred, r.obj) for r in infer_property_axioms(
        kg, transitive=["ex:ancestorOf"]).collect()}
    assert got == {
        ("a", "ex:ancestorOf", "c"),
        ("a", "ex:ancestorOf", "d"),
        ("b", "ex:ancestorOf", "d"),
    }


def test_property_axioms_symmetric_transitive_fixpoint(spark):
    # connectedTo symmetric AND transitive: a-b, c-b ⊢ every ordered
    # pair of {a,b,c} except self-loops — the one-alternation schedule
    # must reach the genuine fixpoint.
    kg = _kg_rows(spark, [
        ("a", "ex:connectedTo", "b"),
        ("c", "ex:connectedTo", "b"),
    ])
    got = {(r.subj, r.obj) for r in infer_property_axioms(
        kg, symmetric=["ex:connectedTo"],
        transitive=["ex:connectedTo"]).collect()}
    assert got == {("b", "a"), ("b", "c"),
                   ("a", "c"), ("c", "a"),
                   ("a", "a"), ("b", "b"), ("c", "c")}


def test_property_axioms_inverse_of_transitive(spark):
    # ancestorOf transitive with inverse descendantOf: the inverse
    # image of the closure must land in descendantOf.
    kg = _kg_rows(spark, [
        ("a", "ex:ancestorOf", "b"),
        ("b", "ex:ancestorOf", "c"),
        # z descendantOf b ⊢ b ancestorOf z ⊢ a ancestorOf z (chain)
        ("z", "ex:descendantOf", "b"),
    ])
    inv = spark.createDataFrame([("ex:ancestorOf", "ex:descendantOf")],
                                "pred string, inv string")
    got = {(r.subj, r.pred, r.obj) for r in infer_property_axioms(
        kg, inverses=inv, transitive=["ex:ancestorOf"]).collect()}
    anc = {(s, o) for (s, p, o) in got if p == "ex:ancestorOf"}
    dec = {(s, o) for (s, p, o) in got if p == "ex:descendantOf"}
    assert anc == {("a", "c"), ("b", "z"), ("a", "z")}
    # descendantOf = swap of the FULL ancestorOf closure, minus asserted
    assert dec == {("b", "a"), ("c", "b"), ("c", "a"),
                   ("z", "a")}


def test_property_axioms_requires_a_declaration(spark):
    with pytest.raises(ValueError):
        infer_property_axioms(_kg_rows(spark, [("a", "p", "b")]))


# --- quad (named-graph) patterns ------------------------------------

def _quads(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")


def test_bgp_quad_constant_and_variable_graph(spark):
    kg = _quads(spark, [
        ("a", "ex:p", "b", "g1"),
        ("a", "ex:p", "c", "g2"),
        ("b", "ex:q", "d", "g1"),
    ])
    got = {r.x for r in bgp_match(
        kg, [("a", "ex:p", "?x", "g1")]).collect()}
    assert got == {"b"}
    got = {(r.x, r.g) for r in bgp_match(
        kg, [("a", "ex:p", "?x", "?g")]).collect()}
    assert got == {("b", "g1"), ("c", "g2")}
    # shared graph variable joins the two patterns within one graph
    got = {(r.x, r.y, r.g) for r in bgp_match(
        kg, [("a", "ex:p", "?x", "?g"),
             ("?x", "ex:q", "?y", "?g")]).collect()}
    assert got == {("b", "d", "g1")}


def test_bgp_quad_mixed_with_triple_patterns(spark):
    # a triple pattern matches regardless of graph (the union/default
    # graph view); the quad pattern pins its own graph
    kg = _quads(spark, [
        ("a", "ex:p", "b", "g1"),
        ("b", "ex:q", "d", "g2"),
    ])
    got = {(r.x, r.y) for r in bgp_match(
        kg, [("a", "ex:p", "?x", "g1"), ("?x", "ex:q", "?y")]).collect()}
    assert got == {("b", "d")}


def test_bgp_quad_requires_graph_column(spark):
    triples = _kg_rows(spark, [("a", "ex:p", "b")])
    with pytest.raises(ValueError, match="graph"):
        bgp_match(triples, [("a", "ex:p", "?x", "?g")])


def test_bgp_quad_path_closes_per_graph(spark):
    # the a→b→c chain spans two graphs: p+ inside GRAPH must NOT cross
    # the boundary, while the triple-pattern (union graph) form does
    kg = _quads(spark, [
        ("a", "ex:p", "b", "g1"),
        ("b", "ex:p", "c", "g2"),
        ("c", "ex:p", "d", "g2"),
    ])
    got = {(r.x, r.g) for r in bgp_match(
        kg, [("a", "ex:p+", "?x", "?g")]).collect()}
    assert got == {("b", "g1")}
    got = {(r.x, r.g) for r in bgp_match(
        kg, [("b", "ex:p+", "?x", "?g")]).collect()}
    assert got == {("c", "g2"), ("d", "g2")}
    got = {r.x for r in bgp_match(kg, [("a", "ex:p+", "?x")]).collect()}
    assert got == {"b", "c", "d"}
    # zero-length domain is graph-scoped: a exists only in g1
    got = {(r.x, r.g) for r in bgp_match(
        kg, [("a", "ex:p*", "?x", "?g")]).collect()}
    assert got == {("a", "g1"), ("b", "g1")}


def test_bgp_quad_inverse_and_alternation_carry_graph(spark):
    kg = _quads(spark, [
        ("a", "ex:p", "b", "g1"),
        ("c", "ex:q", "a", "g2"),
    ])
    # (a ^q ?x) ≡ (?x q a): the g2 assertion (c, q, a) answers it
    got = {(r.x, r.g) for r in bgp_match(
        kg, [("a", "^ex:q", "?x", "?g")]).collect()}
    assert got == {("c", "g2")}
    got = {(r.x, r.g) for r in bgp_match(
        kg, [("a", "ex:p|ex:r", "?x", "?g")]).collect()}
    assert got == {("b", "g1")}


def test_validate_shapes_length_and_datatype(spark):
    from dbpedia_spotlight_spark.operators.shapes import validate_shapes
    kg = _kg_rows(spark, [
        ("E1", "rdf:type", "Thing"),
        ("E1", "ex:code", "AB"),          # too short
        ("E1", "ex:code", "ABCDE"),       # ok
        ("E1", "ex:code", "ABCDEFGHIJK"), # too long
        ("E1", "ex:age", "42"),
        ("E1", "ex:born", "not-a-date"),
        ("E2", "rdf:type", "Thing"),
        ("E2", "ex:age", "forty"),
        ("E2", "ex:born", "1984-02-29T12:00:00Z"),
    ])
    shapes = [{"shape": "S", "target_class": "Thing", "constraints": [
        {"path": "ex:code", "min_length": 3, "max_length": 8},
        {"path": "ex:age", "datatype": "integer"},
        {"path": "ex:born", "datatype": "dateTime"},
    ]}]
    got = {(r.focus, r.component, r.value)
           for r in validate_shapes(kg, shapes).collect()}
    assert got == {
        ("E1", "minLength", "AB"),
        ("E1", "maxLength", "ABCDEFGHIJK"),
        ("E1", "datatype", "not-a-date"),
        ("E2", "datatype", "forty"),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError, match="datatype"):
        validate_shapes(kg, [{"shape": "S", "target_class": "Thing",
                              "constraints": [{"path": "ex:age",
                                               "datatype": "float128"}]}]
                        ).collect()


def test_per_graph_closure_rounds_track_max_depth_not_graph_count(spark):
    """The grouped fixpoint closes ALL graphs in one shared loop: 40
    graphs of depth ≤3 must finish in 3 rounds (depth column never
    exceeds 3), not 40 separate iterations — the scale property that
    makes per-graph paths affordable."""
    from dbpedia_spotlight_spark.operators.ontology import (
        predicate_closure)
    rows = []
    for g in range(40):
        # chain a->b->c->d inside graph g
        for i, (s, o) in enumerate([("a", "b"), ("b", "c"), ("c", "d")]):
            rows.append((f"{s}{g}", "ex:p", f"{o}{g}", f"g{g}"))
    kg = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")
    clo = predicate_closure(kg, "ex:p", per_graph=True)
    got = clo.groupBy("graph").count().collect()
    assert len(got) == 40 and all(r["count"] == 6 for r in got)
    assert clo.agg(F.max("depth")).first()[0] == 3
    # no cross-graph leakage: a0 never reaches d1
    leak = clo.filter((F.col("sub") == "a0") & (F.col("sup") == "d1"))
    assert leak.isEmpty()


def test_infer_functional_sameas(spark):
    """prp-ifp merges subjects sharing a declared-IFP value; prp-fp
    merges objects of one subject under a declared-FP; a dirty key
    (group > max_group) is excluded whole; non-declared predicates and
    singleton groups yield nothing; duplicate assertions dedup; pairs
    come out a < b."""
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_functional_sameas)
    rows = [
        # ifp lane: e1,e2 share isbn X; e3 alone on Y
        ("e1", "ex:isbn", "X"), ("e2", "ex:isbn", "X"),
        ("e2", "ex:isbn", "X"),          # duplicate assertion
        ("e3", "ex:isbn", "Y"),
        # dirty key: 4 entities share '' under max_group=3
        ("d1", "ex:isbn", ""), ("d2", "ex:isbn", ""),
        ("d3", "ex:isbn", ""), ("d4", "ex:isbn", ""),
        # fp lane: s1 has two mothers -> they are the same entity
        ("s1", "ex:mother", "m2"), ("s1", "ex:mother", "m1"),
        ("s2", "ex:mother", "m3"),
        # non-declared predicate with heavy sharing: ignored
        ("e1", "ex:tag", "t"), ("e2", "ex:tag", "t"),
    ]
    kg = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    got = {tuple(r) for r in infer_functional_sameas(
        kg, functional=["ex:mother"], inverse_functional=["ex:isbn"],
        max_group=3).collect()}
    assert got == {("e1", "e2", "ex:isbn", "prp-ifp"),
                   ("m1", "m2", "ex:mother", "prp-fp")}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="declaration"):
        infer_functional_sameas(kg)


def test_infer_functional_sameas_feeds_canonicalization(spark):
    """The inferred identity edges drive the standard sameAs consumers:
    connected components over a transitively-shared key chain collapse
    e1-e2-e3 into one canonical entity."""
    from dbpedia_spotlight_spark.operators.components import (
        connected_components)
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_functional_sameas)
    rows = [("e1", "ex:key", "K1"), ("e2", "ex:key", "K1"),
            ("e2", "ex:key", "K2"), ("e3", "ex:key", "K2")]
    kg = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    edges = infer_functional_sameas(kg, inverse_functional=["ex:key"])
    nodes = kg.select(F.col("subj").alias("id")).distinct()
    labels = connected_components(nodes, edges.select("a", "b"))
    assert {(r.id, r.comp) for r in labels.collect()} == {
        ("e1", "e1"), ("e2", "e1"), ("e3", "e1")}


def test_equivalence_edges_feed_closure_and_types(spark):
    """cax-eqc via the standard reduction: equivalentClass(A, B) means
    mutual subsumption, so after unioning equivalence_edges with the
    asserted hierarchy, infer_types lifts an instance of A to B and an
    instance of B up A's chain; self-equivalences drop."""
    from dbpedia_spotlight_spark.operators.ontology import (
        equivalence_edges, subclass_closure, infer_types)
    equiv = spark.createDataFrame(
        [("A", "B"), ("C", "C")], "a string, b string")
    edges = equivalence_edges(equiv)
    assert {tuple(r) for r in edges.collect()} == {("A", "B"), ("B", "A")}
    sub = spark.createDataFrame([("A", "Top")], "sub string, sup string")
    clo = subclass_closure(sub.unionByName(edges))
    types = spark.createDataFrame(
        [("x", RDF_TYPE, "A"), ("y", RDF_TYPE, "B")],
        "subj string, pred string, obj string")
    got = {(r.subj, r.obj) for r in infer_types(types, clo).collect()}
    # x:A -> B, Top; y:B -> A, Top — plus the 2-cycle's self-paths
    # (A subClassOf B subClassOf A re-derives the asserted type), which
    # is exactly cax-eqc semantics: entailed set, union-idempotent
    assert got == {("x", "A"), ("x", "B"), ("x", "Top"),
                   ("y", "A"), ("y", "B"), ("y", "Top")}


def test_validate_owl_all_rules(spark):
    """One planted KG exercising every rule: a cax-dw clash (declared
    either orientation reports once, canonical a<b), a prp-pdw clash,
    an irreflexive self-loop, an asymmetric mutual pair AND self-loop,
    and an eq-diff1 contradiction asserted in opposite orientations;
    clean lanes for each rule yield nothing."""
    from dbpedia_spotlight_spark.operators.ontology import validate_owl
    rows = [
        # cax-dw: x is both Person and Place (disjoint); z only Person
        ("x", RDF_TYPE, "Person"), ("x", RDF_TYPE, "Place"),
        ("z", RDF_TYPE, "Person"),
        # prp-pdw: (u likes v) and (u dislikes v); w only likes
        ("u", "ex:likes", "v"), ("u", "ex:dislikes", "v"),
        ("w", "ex:likes", "v"),
        # prp-irp: p properPartOf p; q properPartOf r is fine
        ("p", "ex:properPartOf", "p"), ("q", "ex:properPartOf", "r"),
        # prp-asyp: a beats b and b beats a; c beats d (one way) fine;
        # e beats e is a self-loop violation of asymmetry
        ("a", "ex:beats", "b"), ("b", "ex:beats", "a"),
        ("c", "ex:beats", "d"), ("e", "ex:beats", "e"),
        # eq-diff1: opposite orientations still one clash
        ("m", "owl:sameAs", "n"), ("n", "owl:differentFrom", "m"),
        ("m", "owl:sameAs", "o"),
    ]
    kg = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    got = {tuple(r) for r in validate_owl(
        kg,
        disjoint_classes=spark.createDataFrame(
            [("Place", "Person")], "a string, b string"),
        disjoint_properties=spark.createDataFrame(
            [("ex:likes", "ex:dislikes")], "a string, b string"),
        irreflexive=["ex:properPartOf"],
        asymmetric=["ex:beats"],
        check_different=True).collect()}
    assert got == {
        ("cax-dw", "x", "", "Person", "Place"),
        ("prp-pdw", "u", "v", "ex:dislikes", "ex:likes"),
        ("prp-irp", "p", "p", "ex:properPartOf", ""),
        ("prp-asyp", "a", "b", "ex:beats", ""),
        ("prp-asyp", "e", "e", "ex:beats", ""),
        ("eq-diff1", "m", "n", "owl:sameAs", "owl:differentFrom"),
    }

    with pytest.raises(ValueError, match="axiom"):
        validate_owl(kg)


def test_validate_owl_under_entailed_types(spark):
    """The profile's cax-dw is over the ENTAILED type frame: an
    instance typed only with SUBCLASSES of two disjoint classes
    clashes after composing infer_types upstream, and is (correctly)
    invisible to the asserted-only check."""
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_types, subclass_closure, validate_owl)
    sub = spark.createDataFrame(
        [("City", "Place"), ("Singer", "Person")],
        "sub string, sup string")
    types = spark.createDataFrame(
        [("x", RDF_TYPE, "City"), ("x", RDF_TYPE, "Singer")],
        "subj string, pred string, obj string")
    disj = spark.createDataFrame([("Person", "Place")],
                                 "a string, b string")
    assert validate_owl(types, disjoint_classes=disj).count() == 0
    entailed = types.unionByName(
        infer_types(types, subclass_closure(sub))
        .select("subj", F.lit(RDF_TYPE).alias("pred"), "obj"))
    got = {tuple(r) for r in validate_owl(
        entailed, disjoint_classes=disj).collect()}
    assert got == {("cax-dw", "x", "", "Person", "Place")}


def test_infer_property_chains(spark):
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_property_chains,
    )
    kg = spark.createDataFrame(
        [("a", "hasParent", "b"), ("b", "hasParent", "c"),
         ("c", "hasParent", "d"), ("a", "hasGrandparent", "x")],
        "subj string, pred string, obj string")
    got = sorted(map(tuple, infer_property_chains(
        kg, [("hasGrandparent", ["hasParent", "hasParent"]),
             ("hasGreatGrandparent",
              ["hasParent", "hasParent", "hasParent"])]).collect()))
    assert got == [("a", "hasGrandparent", "c"),
                   ("a", "hasGreatGrandparent", "d"),
                   ("b", "hasGrandparent", "d")]
    # asserted derivations are excluded (derived-minus-asserted)
    kg2 = kg.unionByName(spark.createDataFrame(
        [("a", "hasGrandparent", "c")],
        "subj string, pred string, obj string"))
    got2 = {tuple(r) for r in infer_property_chains(
        kg2, [("hasGrandparent", ["hasParent", "hasParent"])]).collect()}
    assert got2 == {("b", "hasGrandparent", "d")}
    # heterogeneous chain (p1 != p2)
    kg3 = spark.createDataFrame(
        [("x", "memberOf", "band"), ("band", "basedIn", "berlin")],
        "subj string, pred string, obj string")
    got3 = {tuple(r) for r in infer_property_chains(
        kg3, [("livesNear", ["memberOf", "basedIn"])]).collect()}
    assert got3 == {("x", "livesNear", "berlin")}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        infer_property_chains(kg, [("p", ["q"])])


def test_infer_restrictions_all_rules(spark):
    from dbpedia_spotlight_spark.operators.ontology import (
        infer_restrictions,
    )
    kg = spark.createDataFrame(
        [("u1", "worksFor", "acme"), ("acme", "rdf:type", "Company"),
         ("u2", "worksFor", "ghost"),
         ("m1", "rdf:type", "AcmeEmployee"),
         ("t1", "rdf:type", "ParisOffice"), ("t1", "hasSite", "s9")],
        "subj string, pred string, obj string")
    r = spark.createDataFrame(
        [("Employee", "worksFor", "someValuesFrom", "Company"),
         ("Linked", "worksFor", "someValuesFrom", "owl:Thing"),
         ("AcmeEmployee", "worksFor", "hasValue", "acme"),
         ("ParisOffice", "hasSite", "allValuesFrom", "Site")],
        "cls string, on_prop string, kind string, value string")
    got = {tuple(x) for x in infer_restrictions(kg, r).collect()}
    assert got == {
        ("u1", "rdf:type", "Employee"),        # cls-svf1
        ("u1", "rdf:type", "Linked"),          # cls-svf2
        ("u2", "rdf:type", "Linked"),          # cls-svf2 (untyped obj)
        ("u1", "rdf:type", "AcmeEmployee"),    # cls-hv2
        ("m1", "worksFor", "acme"),            # cls-hv1
        ("s9", "rdf:type", "Site"),            # cls-avf
    }
    # composing to fixpoint: hv1's derived edge makes m1 an svf2 match
    kg2 = kg.unionByName(infer_restrictions(kg, r))
    got2 = {tuple(x) for x in infer_restrictions(kg2, r).collect()}
    assert ("m1", "rdf:type", "Linked") in got2
    assert ("m1", "rdf:type", "Employee") in got2
