"""Ontology reasoning over the materialized KG (north_rule "graph
materialize" read/inference path).

The reference's /annotate responses carry per-entity ontology types
drawn from the DBpedia class hierarchy; ``triples.type_triples``
materializes those as rdf:type statements. This module adds the two
RDFS entailments a KG consumer expects over that store — subclass
transitive closure (rdfs:11) and type inheritance (rdfs:9) — plus a
SPARQL-style basic-graph-pattern matcher, so the materialized triple
store is *queryable*, not just dumpable.

Scale notes (10^12-doc build): the ontology side is structurally tiny —
the DBpedia class hierarchy is <10^3 classes — so the closure and every
closure join compile to broadcast hash joins; the corpus-scale side
(type statements, BGP base patterns) is only ever filtered and joined,
never collected. The closure loop is semi-naive (each round extends
only last round's *new* paths, with an anti-join against everything
known), so a DAG of depth d costs d rounds of frontier-sized joins, not
d self-joins of the full closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer

RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_DOMAIN = "rdfs:domain"
RDFS_RANGE = "rdfs:range"


def subclass_closure(edges: DataFrame, max_depth: int = 20,
                     checkpoint_dir: str | None = None) -> DataFrame:
    """Transitive closure of a subClassOf DAG: (sub, sup, depth) with
    depth = length of the SHORTEST subclass path (direct edges are
    depth 1). rdfs:11 entailment.

    Semi-naive iteration: round d joins only round d-1's new paths
    against the direct edges, anti-joins the already-known set (which
    also makes accidental cycles terminate instead of looping), and
    stops on the first empty frontier. Per-round lineage is cut through
    ``RoundCheckpointer`` — ``localCheckpoint`` by default, reliable
    ``checkpoint_dir`` parquet generations for deep hierarchies (same
    two modes as connected_components).

    The emptiness probe is one action per round on a frontier that only
    shrinks; class hierarchies are tiny (DBpedia: ~800 classes, depth
    ~7), so every join here broadcasts under AQE."""
    return _closure(edges, [], max_depth, checkpoint_dir, "subclass")


def _closure(edges: DataFrame, keys: list[str], max_depth: int,
             checkpoint_dir: str | None, name: str) -> DataFrame:
    """Shared semi-naive transitive-closure fixpoint over (sub, sup,
    *keys) edges: paths never cross a ``keys`` boundary (each key tuple
    — e.g. a named graph — closes independently, the extra columns
    simply join along), rounds = max depth across all key groups."""
    spark = edges.sparkSession
    ck = RoundCheckpointer(spark, checkpoint_dir, name=name)
    e = edges.select("sub", "sup", *keys).dropDuplicates() \
        .filter(F.col("sub") != F.col("sup"))
    # exactly ONE cut per round (the known set): RoundCheckpointer's
    # dir mode keeps only the last two generations on disk, so a second
    # cut per round would delete a generation the known frame still
    # reads. The frontier is a filter over the checkpointed known set —
    # free to recompute, never separately materialized.
    known = ck.cut(e.withColumn("depth", F.lit(1)))
    pair = ["sub", "sup"] + keys
    for d in range(2, max_depth + 1):
        frontier = known.filter(F.col("depth") == d - 1)
        nxt = (
            frontier.select(F.col("sub"), F.col("sup").alias("mid"),
                            *keys)
            .join(e.withColumnRenamed("sub", "mid"), ["mid"] + keys)
            .select(*pair).dropDuplicates()
            .filter(F.col("sub") != F.col("sup"))
            .join(known.select(*pair), pair, "left_anti")
            .withColumn("depth", F.lit(d))
        )
        if nxt.isEmpty():
            break
        known = ck.cut(known.unionByName(nxt))
    return known


def infer_types(type_stmts: DataFrame, closure: DataFrame) -> DataFrame:
    """rdfs:9 entailment: (x, rdf:type, C) ∧ (C ⊑* D) ⊢ (x, rdf:type, D).
    Returns the DEDUCTIVE CLOSURE of the rdf:type statements — asserted
    types plus every inherited supertype — as (subj, pred, obj) with
    set semantics.

    One explode-free plan: the corpus-scale statement stream is joined
    once against the broadcast subclass closure (ontology side is
    always the small side) and unioned with the asserted statements;
    the distinct collapses diamond-inheritance duplicates. Nothing
    keys on url/doc, so corpus skew never reaches the exchange."""
    t = (type_stmts.filter(F.col("pred") == RDF_TYPE)
         .select("subj", "obj").dropDuplicates())
    inherited = (
        t.join(F.broadcast(closure.select(F.col("sub").alias("obj"),
                                          F.col("sup"))), "obj")
        .select("subj", F.col("sup").alias("obj"))
    )
    return (
        t.unionByName(inherited)
        .dropDuplicates(["subj", "obj"])
        .select("subj", F.lit(RDF_TYPE).alias("pred"), "obj")
    )


def infer_domain_range(kg: DataFrame, domains: DataFrame,
                       ranges: DataFrame,
                       closure: DataFrame | None = None) -> DataFrame:
    """rdfs:2/3 entailment — the property-schema half of RDFS typing:

        (s, p, o) ∧ (p rdfs:domain C) ⊢ (s, rdf:type, C)     [rdfs:2]
        (s, p, o) ∧ (p rdfs:range  C) ⊢ (o, rdf:type, C)     [rdfs:3]

    ``domains`` / ``ranges`` are (pred, cls) declaration frames — the
    property vocabulary, structurally tiny like the class hierarchy, so
    both joins broadcast and the corpus-scale statement stream is never
    collected or exploded (a statement whose predicate declares k
    classes yields k rows; real schemas declare 1). With ``closure``
    (``subclass_closure`` output), the derived assertions are lifted
    through rdfs:9 so domain/range classes inherit upward — the
    composed rdfs:2/3∘9 chain a KG consumer expects. Returns (subj,
    rdf:type, obj) with set semantics (a subject reached through
    several predicates/positions types once)."""
    stmts = kg.select("subj", "pred", "obj")
    d = (stmts.join(F.broadcast(domains.select("pred", "cls")), "pred")
         .select("subj", F.col("cls").alias("obj")))
    r = (stmts.join(F.broadcast(ranges.select("pred", "cls")), "pred")
         .select(F.col("obj").alias("subj"), F.col("cls").alias("obj")))
    out = (d.unionByName(r).dropDuplicates(["subj", "obj"])
           .select("subj", F.lit(RDF_TYPE).alias("pred"), "obj"))
    if closure is not None:
        out = infer_types(out, closure)
    return out


def _reflexive_terms(kg: DataFrame, per_graph: bool = False) -> DataFrame:
    """(x, x) for every term occurring as subject or object — the
    SPARQL zero-length-path domain. One distinct over the two term
    columns of the snapshot. ``per_graph``: the domain is scoped to
    each named graph (a term's zero-length path exists only in graphs
    that mention it)."""
    cols = ["graph"] if per_graph else []
    terms = (kg.select(F.col("subj").alias("t"), *cols)
             .unionByName(kg.select(F.col("obj").alias("t"), *cols))
             .distinct())
    return terms.select(F.col("t").alias("sub"), F.col("t").alias("sup"),
                        *cols)


def predicate_closure(kg: DataFrame, predicate: str, max_depth: int = 20,
                      checkpoint_dir: str | None = None,
                      per_graph: bool = False) -> DataFrame:
    """SPARQL 1.1 property path ``predicate+`` over a triple snapshot:
    (subj, obj, depth) for every pair reachable through one or more
    ``predicate`` edges, depth = shortest such path. The edge extraction
    is a pushed equality filter on the scan; the iteration is the same
    semi-naive loop as ``subclass_closure`` (cycle-safe via the
    anti-join, lineage cut per round).

    Pass a MATERIALIZED snapshot (stored table / checkpointed frame):
    the loop runs one action per round, so a kg that is itself a heavy
    pipeline would recompute per round.

    ``per_graph=True`` (quad snapshots): paths stay INSIDE each named
    graph — the graph column becomes an extra join key of the same
    fixpoint (SPARQL evaluates a path within the active graph), and the
    result carries it. Round count = max depth across graphs; the work
    per round is still one frontier-sized join."""
    cols = ["graph"] if per_graph else []
    edges = (kg.filter(F.col("pred") == predicate)
             .select(F.col("subj").alias("sub"),
                     F.col("obj").alias("sup"), *cols))
    return _closure(edges, cols, max_depth, checkpoint_dir, "predpath")


def infer_subproperties(kg: DataFrame, subprops: DataFrame,
                        max_depth: int = 20,
                        checkpoint_dir: str | None = None) -> DataFrame:
    """rdfs:5/7 entailment — the property half of the RDFS hierarchy
    rules (subclass twin: ``subclass_closure`` + ``infer_types``):

        (p rdfs:subPropertyOf q) ∧ (q rdfs:subPropertyOf r)
            ⊢ (p rdfs:subPropertyOf r)                        [rdfs:5]
        (s, p, o) ∧ (p rdfs:subPropertyOf q) ⊢ (s, q, o)      [rdfs:7]

    ``subprops`` is the (sub, sup) property-hierarchy frame — schema-
    sized like the class hierarchy, so its rdfs:5 closure reuses the
    ``subclass_closure`` fixpoint and the rdfs:7 lift is ONE broadcast
    join against the corpus-scale statement stream (a statement whose
    predicate has k strict superproperties yields k rows; real
    vocabularies declare ~1). Returns only the DERIVED (s, q, o)
    statements with set semantics — union+distinct with ``kg`` gives
    the deductive closure, matching ``infer_domain_range``'s
    contract."""
    clo = subclass_closure(subprops, max_depth=max_depth,
                           checkpoint_dir=checkpoint_dir)
    return (
        kg.select("subj", "pred", "obj")
        .join(F.broadcast(clo.select(F.col("sub").alias("pred"),
                                     F.col("sup").alias("__q"))), "pred")
        .filter(F.col("__q") != F.col("pred"))
        .select("subj", F.col("__q").alias("pred"), "obj")
        .dropDuplicates()
    )


def infer_property_axioms(kg: DataFrame,
                          inverses: DataFrame | None = None,
                          symmetric: list[str] | None = None,
                          transitive: list[str] | None = None,
                          max_depth: int = 20,
                          checkpoint_dir: str | None = None) -> DataFrame:
    """OWL-RL property-axiom entailment over the statement stream —
    the three rules that, with rdfs:2/3/5/7/9/11 (``infer_domain_range``,
    ``infer_subproperties``, ``infer_types``) and owl:sameAs
    (``triples.canonicalize_triples``), complete the materialization
    rule set a DBpedia-style KG consumer expects:

        (p owl:inverseOf q)        ∧ (s p o) ⊢ (o q s)   [prp-inv1/2]
        (p a owl:SymmetricProperty) ∧ (s p o) ⊢ (o p s)   [prp-symp]
        (p a owl:TransitiveProperty) ∧ (s p o)(o p z) ⊢ (s p z) [prp-trp]

    ``inverses`` is a (pred, inv) declaration frame (one row per pair —
    both directions are entailed); ``symmetric`` / ``transitive`` are
    predicate lists. All three declaration sets are schema-sized: the
    inverse/symmetric rules are ONE broadcast join / pushed-isin filter
    + column swap over the corpus-scale stream (no shuffle at all), and
    each transitive predicate runs ``predicate_closure``'s semi-naive
    fixpoint over its own pushed-filter edge slice.

    Rule interaction is handled by ordering, not a generic fixpoint:
    inverse+symmetric first AUGMENT the stream, each transitive closure
    runs over the augmented slice, and the inverse/symmetric rules are
    applied once more to the new transitive edges. That alternation IS
    the fixpoint here: the closure of a symmetrized edge set is itself
    symmetric, and the inverse image of p's closure equals q's closure
    of the inverse image — so no rule can fire again on the output
    (deeper chains like q-subPropertyOf-r belong to
    ``infer_subproperties``, composed upstream).

    Returns the derived (subj, pred, obj) statements NOT already
    asserted (one final anti-join on the triple key), with set
    semantics — union with ``kg`` gives the deductive closure. Pass a
    MATERIALIZED snapshot when using ``transitive`` (the fixpoint runs
    one action per round, like ``predicate_closure``)."""
    stmts = kg.select("subj", "pred", "obj")

    def _swap(df: DataFrame, pred_col: str = "pred") -> DataFrame:
        return df.select(F.col("obj").alias("subj"),
                         F.col(pred_col).alias("pred"),
                         F.col("subj").alias("obj"))

    def _inv_sym(df: DataFrame) -> list[DataFrame]:
        out = []
        if inverses is not None:
            both = (inverses.select("pred", "inv")
                    .unionByName(inverses.select(
                        F.col("inv").alias("pred"),
                        F.col("pred").alias("inv")))
                    .dropDuplicates())
            out.append(_swap(df.join(F.broadcast(both), "pred"), "inv"))
        if symmetric:
            out.append(_swap(df.filter(F.col("pred").isin(
                list(symmetric)))))
        return out

    derived = _inv_sym(stmts)
    if transitive:
        base = stmts
        for extra in derived:
            base = base.unionByName(extra)
        for p in transitive:
            clo = predicate_closure(base, p, max_depth=max_depth,
                                    checkpoint_dir=checkpoint_dir)
            # subclass_closure's fixpoint is deliberately irreflexive
            # (cycle guard for class DAGs), but prp-trp DOES entail
            # (x p x) whenever x sits on a p-cycle — i.e. some pair
            # exists in the closure in both directions. One self-sized
            # semi-join recovers exactly those.
            pairs = clo.select("sub", "sup")
            loops = (pairs.join(
                pairs.select(F.col("sup").alias("sub"),
                             F.col("sub").alias("sup")),
                ["sub", "sup"], "left_semi")
                .select("sub").distinct())
            new = (clo.filter(F.col("depth") > 1)
                   .select(F.col("sub").alias("subj"),
                           F.lit(p).alias("pred"),
                           F.col("sup").alias("obj"))
                   .unionByName(loops.select(
                       F.col("sub").alias("subj"),
                       F.lit(p).alias("pred"),
                       F.col("sub").alias("obj"))))
            derived.append(new)
            derived.extend(_inv_sym(new))
    if not derived:
        raise ValueError(
            "infer_property_axioms needs at least one declaration "
            "(inverses, symmetric or transitive)")
    out = derived[0]
    for d in derived[1:]:
        out = out.unionByName(d)
    return (out.dropDuplicates()
            .join(stmts, ["subj", "pred", "obj"], "left_anti"))


def infer_property_chains(kg: DataFrame,
                          chains: list[tuple[str, list[str]]]
                          ) -> DataFrame:
    """OWL 2 RL prp-spo2 — property-chain axioms:

        (p owl:propertyChainAxiom (p1 … pn)) ∧ (x0 p1 x1) ∧ …
        ∧ (x(n-1) pn xn) ⊢ (x0 p xn)

    the classic ``hasParent ∘ hasParent ⇒ hasGrandparent`` rule — with
    prp-fp/ifp (``infer_functional_sameas``) and the axioms in
    ``infer_property_axioms`` this covers every property rule of the
    RL profile that fires on instance data.

    ``chains`` is declaration-sized driver data (like the
    symmetric/transitive lists): ``[(super_pred, [p1, …, pn]), …]``,
    n ≥ 2. Each chain compiles to n pushed-``pred=`` filter slices of
    the statement stream joined end-to-start — n−1 equi-joins keyed on
    instance terms, never a corpus self-join without a predicate
    slice. Output = derived minus asserted, set semantics.

    Single pass over the provided snapshot: a chain firing on another
    chain's (or closure's) OUTPUT needs the usual augment-and-reapply
    composition the other reasoning operators document — at KG scale
    the materialization loop unions each operator's derivations into
    the snapshot and re-runs until no rule adds a row."""
    stmts = kg.select("subj", "pred", "obj")
    derived = []
    for sup, steps in chains:
        if len(steps) < 2:
            raise ValueError(
                f"chain for {sup!r} needs ≥ 2 steps (got {steps!r}) — "
                "a 1-step chain is rdfs:subPropertyOf "
                "(infer_subproperties)")
        cur = (stmts.filter(F.col("pred") == steps[0])
               .select(F.col("subj").alias("x0"),
                       F.col("obj").alias("x")))
        for p in steps[1:]:
            nxt = (stmts.filter(F.col("pred") == p)
                   .select(F.col("subj").alias("x"),
                           F.col("obj").alias("x_next")))
            cur = (cur.join(nxt, "x")
                   .select("x0", F.col("x_next").alias("x")))
        derived.append(cur.select(
            F.col("x0").alias("subj"), F.lit(sup).alias("pred"),
            F.col("x").alias("obj")))
    if not derived:
        raise ValueError("infer_property_chains needs ≥ 1 chain")
    out = derived[0]
    for d in derived[1:]:
        out = out.unionByName(d)
    return (out.dropDuplicates()
            .join(stmts, ["subj", "pred", "obj"], "left_anti"))


def infer_restrictions(kg: DataFrame, restrictions: DataFrame,
                       type_pred: str = "rdf:type") -> DataFrame:
    """OWL 2 RL class-restriction rules — the cls-* family that fires
    on instance data:

        cls-svf1: (C ≡ ∃p.D)        ∧ (u p v) ∧ (v type D) ⊢ (u type C)
        cls-svf2: (C ≡ ∃p.owl:Thing) ∧ (u p v)              ⊢ (u type C)
        cls-hv1:  (C ≡ p∋v)         ∧ (u type C)            ⊢ (u p v)
        cls-hv2:  (C ≡ p∋v)         ∧ (u p v)               ⊢ (u type C)
        cls-avf:  (C ≡ ∀p.D)        ∧ (u type C) ∧ (u p v)  ⊢ (v type D)

    ``restrictions`` carries the schema-sized declarations:
    (cls, on_prop, kind, value) with kind ∈ {'someValuesFrom',
    'allValuesFrom', 'hasValue'}; for someValuesFrom/allValuesFrom
    ``value`` is the filler class (``owl:Thing`` selects cls-svf2's
    unconditional form), for hasValue the individual. Declarations
    BROADCAST onto the statement stream (same discipline as every
    reasoning operator here); the only instance-keyed join is
    cls-svf1's (v type D) probe and cls-avf's (u p v) extension, both
    equi-joins on instance terms. Output = derived minus asserted
    (both new type statements and cls-hv1's new property statements).
    Single pass — compose to fixpoint like infer_property_chains."""
    stmts = kg.select("subj", "pred", "obj")
    types = (stmts.filter(F.col("pred") == type_pred)
             .select(F.col("subj").alias("inst"),
                     F.col("obj").alias("cls_of")))
    r = F.broadcast(restrictions.select("cls", "on_prop", "kind", "value")
                    .dropDuplicates())
    svf = r.filter(F.col("kind") == "someValuesFrom")
    hv = r.filter(F.col("kind") == "hasValue")
    avf = r.filter(F.col("kind") == "allValuesFrom")
    edged = stmts.join(svf, stmts.pred == svf.on_prop)
    svf2 = (edged.filter(F.col("value") == "owl:Thing")
            .select("subj", F.lit(type_pred).alias("pred"),
                    F.col("cls").alias("obj")))
    svf1 = (edged.filter(F.col("value") != "owl:Thing")
            .join(types, (F.col("obj") == F.col("inst"))
                  & (F.col("value") == F.col("cls_of")), "left_semi")
            .select("subj", F.lit(type_pred).alias("pred"),
                    F.col("cls").alias("obj")))
    hv_edged = stmts.join(
        hv, (stmts.pred == hv.on_prop) & (stmts.obj == hv.value))
    hv2 = hv_edged.select("subj", F.lit(type_pred).alias("pred"),
                          F.col("cls").alias("obj"))
    hv1 = (types.join(hv, types.cls_of == hv.cls)
           .select(F.col("inst").alias("subj"),
                   F.col("on_prop").alias("pred"),
                   F.col("value").alias("obj")))
    avf_t = types.join(avf, types.cls_of == avf.cls)
    avf_d = (avf_t.join(stmts, (stmts.subj == avf_t.inst)
                        & (stmts.pred == avf_t.on_prop))
             .select(F.col("obj").alias("subj"),
                     F.lit(type_pred).alias("pred"),
                     F.col("value").alias("obj_")))
    avf_d = avf_d.select("subj", "pred", F.col("obj_").alias("obj"))
    out = svf2
    for d in (svf1, hv2, hv1, avf_d):
        out = out.unionByName(d)
    return (out.dropDuplicates()
            .join(stmts, ["subj", "pred", "obj"], "left_anti"))


def infer_functional_sameas(kg: DataFrame,
                            functional: list[str] | None = None,
                            inverse_functional: list[str] | None = None,
                            max_group: int = 64) -> DataFrame:
    """OWL-RL prp-fp / prp-ifp — owl:sameAs inference from declared
    (inverse-)functional properties, the rule pair `infer_property_axioms`
    deliberately leaves out because its conclusion is an IDENTITY, not a
    statement:

        (p a owl:FunctionalProperty)        ∧ (x p y1)(x p y2) ⊢ y1 sameAs y2
        (p a owl:InverseFunctionalProperty) ∧ (x1 p y)(x2 p y) ⊢ x1 sameAs x2

    prp-ifp is the formal twin of `er.er_candidates`' quasi-key
    blocking: a declared IFP (ISBN, email, canonical URL) is an exact
    key, so sharing a value IS identity — no verify stage needed. The
    returned (a, b, via, rule) edges (a < b, distinct) feed the same
    consumers as `er_sameas`: `connected_components`,
    `triples.canonicalize_triples`, `canonicalize_relations`, or a
    SameasStore fold.

    ``max_group`` is the dirty-key guard (same role as er_candidates'
    ``max_block``): a value shared by more than ``max_group`` entities
    under a declared functional key is with near-certainty a data
    defect (empty string, placeholder, parser artifact) — pairing it
    is both semantically wrong and quadratically explosive, so the
    whole group is excluded rather than truncated (truncation would
    make the output layout-dependent).

    Scale: one pushed-isin filter per declaration list (schema-sized),
    one count aggregate + semi-join to apply the cap, one self-join
    keyed on (pred, key-side) whose per-key fan-out is ≤ max_group by
    construction — the shuffle key includes the property, so a hot
    value of one key never concentrates another's partitions. No UDFs,
    no windows."""
    if not functional and not inverse_functional:
        raise ValueError(
            "infer_functional_sameas needs at least one declaration "
            "(functional or inverse_functional)")

    def pairs(preds: list[str], key_col: str, out_col: str,
              rule: str) -> DataFrame:
        s = (kg.filter(F.col("pred").isin(list(preds)))
             .select("pred", F.col(key_col).alias("k"),
                     F.col(out_col).alias("v"))
             .dropDuplicates())
        grp = (s.groupBy("pred", "k").agg(F.count("*").alias("_n"))
               .filter((F.col("_n") >= 2) & (F.col("_n") <= max_group))
               .drop("_n"))
        s = s.join(grp, ["pred", "k"], "left_semi")
        a, b = s.alias("a"), s.alias("b")
        return (a.join(b, ["pred", "k"])
                .filter(F.col("a.v") < F.col("b.v"))
                .select(F.col("a.v").alias("a"), F.col("b.v").alias("b"),
                        F.col("pred").alias("via"),
                        F.lit(rule).alias("rule")))

    derived = []
    if inverse_functional:
        derived.append(pairs(inverse_functional, "obj", "subj",
                             "prp-ifp"))
    if functional:
        derived.append(pairs(functional, "subj", "obj", "prp-fp"))
    out = derived[0]
    for d in derived[1:]:
        out = out.unionByName(d)
    return out.dropDuplicates()


def equivalence_edges(equiv: DataFrame) -> DataFrame:
    """OWL-RL equivalence normalization — cax-eqc1/2 and prp-eqp1/2 in
    their standard reduction: an ``owl:equivalentClass`` (or
    ``owl:equivalentProperty``) declaration (a, b) is exactly the pair
    of sub-edges a ⊑ b and b ⊑ a, so equivalence support costs nothing
    new — normalize the declarations and feed the existing machinery
    (``subclass_closure`` + ``infer_types`` for classes,
    ``infer_subproperties`` for properties). The closure's cycle guard
    already handles the mutual edges (equivalent classes subsume each
    other without looping).

    Input: (a, b) declaration frame (schema-sized). Output: (sub, sup)
    edges in BOTH directions, distinct — union with the asserted
    sub-edge frame before building the closure. Pure projection +
    union; no shuffle beyond the dedup of a schema-sized frame."""
    return (equiv.select(F.col("a").alias("sub"), F.col("b").alias("sup"))
            .unionByName(equiv.select(F.col("b").alias("sub"),
                                      F.col("a").alias("sup")))
            .filter(F.col("sub") != F.col("sup"))
            .dropDuplicates())


def validate_owl(kg: DataFrame,
                 disjoint_classes: DataFrame | None = None,
                 disjoint_properties: DataFrame | None = None,
                 irreflexive: list[str] | None = None,
                 asymmetric: list[str] | None = None,
                 check_different: bool = False,
                 type_pred: str = RDF_TYPE,
                 sameas_pred: str = "owl:sameAs",
                 different_pred: str = "owl:differentFrom") -> DataFrame:
    """OWL 2 RL consistency checking — the FALSE-consequence half of
    the profile that the entailment operators (`infer_*`) deliberately
    leave out because their conclusion is a violation report, not a
    statement. One row per detected inconsistency:

        (c1 owl:disjointWith c2) ∧ (x type c1)(x type c2) ⊢ ⊥ [cax-dw]
        (p owl:propertyDisjointWith q) ∧ (x p y)(x q y)    ⊢ ⊥ [prp-pdw]
        (p a owl:IrreflexiveProperty) ∧ (x p x)            ⊢ ⊥ [prp-irp]
        (p a owl:AsymmetricProperty) ∧ (x p y)(y p x)      ⊢ ⊥ [prp-asyp]
        (x sameAs y) ∧ (x differentFrom y)                 ⊢ ⊥ [eq-diff1]

    At KG-construction scale this is the QA gate run after every
    entailment/canonicalization pass: disjointness violations are
    almost always upstream linking errors (one surface form
    disambiguated into incompatible classes), and eq-diff1 catches an
    ER merge contradicting curated distinctness. Compose with
    ``subclass_closure``+``infer_types`` upstream if violations under
    the class HIERARCHY (not just asserted types) are wanted — cax-dw
    over the entailed type frame is the profile's semantics.

    Returns (rule, s, o, a, b): the focus pair (s, o) and the clashing
    declaration pair (a, b), both canonically ordered so symmetric
    clashes report once and output is layout-independent. Empty frame =
    consistent (w.r.t. the declared axioms).

    Scale: declaration frames are schema-sized (broadcast); each rule
    is one pushed filter over the statement stream plus at most one
    self-join keyed on the instance/pair key — never on url/host, no
    windows, no UDFs. Rules only union; pass None/[] to skip a rule
    entirely (its scan is never built)."""
    stmts = kg.select("subj", "pred", "obj")
    reports: list[DataFrame] = []

    def _norm_pairs(decl: DataFrame) -> DataFrame:
        # canonical a<b orientation; declarations are symmetric, so a
        # pair asserted either way (or both ways) is ONE declaration
        return (decl.select(F.least("a", "b").alias("a"),
                            F.greatest("a", "b").alias("b"))
                .filter(F.col("a") != F.col("b"))
                .dropDuplicates())

    if disjoint_classes is not None:
        d = _norm_pairs(disjoint_classes)
        t = (stmts.filter(F.col("pred") == type_pred)
             .select("subj", F.col("obj").alias("cls"))
             .dropDuplicates())
        # slice the type stream to classes mentioned in a declaration
        # FIRST (broadcast semi-join) — the instance-keyed self-join
        # then runs over the declaration-relevant slice only
        mentioned = (d.select(F.col("a").alias("cls"))
                     .unionByName(d.select(F.col("b").alias("cls")))
                     .dropDuplicates())
        t = t.join(F.broadcast(mentioned), "cls", "left_semi")
        left = t.select("subj", F.col("cls").alias("a"))
        right = t.select("subj", F.col("cls").alias("b"))
        reports.append(
            left.join(right, "subj")
            .join(F.broadcast(d), ["a", "b"], "left_semi")
            .select(F.lit("cax-dw").alias("rule"),
                    F.col("subj").alias("s"), F.lit("").alias("o"),
                    "a", "b"))
    if disjoint_properties is not None:
        d = _norm_pairs(disjoint_properties)
        e = stmts.dropDuplicates()
        mentioned = (d.select(F.col("a").alias("pred"))
                     .unionByName(d.select(F.col("b").alias("pred")))
                     .dropDuplicates())
        e = e.join(F.broadcast(mentioned), "pred", "left_semi")
        left = e.select("subj", "obj", F.col("pred").alias("a"))
        right = e.select("subj", "obj", F.col("pred").alias("b"))
        reports.append(
            left.join(right, ["subj", "obj"])
            .join(F.broadcast(d), ["a", "b"], "left_semi")
            .select(F.lit("prp-pdw").alias("rule"),
                    F.col("subj").alias("s"), F.col("obj").alias("o"),
                    "a", "b"))
    if irreflexive:
        reports.append(
            stmts.filter(F.col("pred").isin(list(irreflexive))
                         & (F.col("subj") == F.col("obj")))
            .select(F.lit("prp-irp").alias("rule"),
                    F.col("subj").alias("s"), F.col("obj").alias("o"),
                    F.col("pred").alias("a"), F.lit("").alias("b"))
            .dropDuplicates())
    if asymmetric:
        e = (stmts.filter(F.col("pred").isin(list(asymmetric)))
             .select("subj", "pred", "obj").dropDuplicates())
        swapped = e.select(F.col("obj").alias("subj"), "pred",
                           F.col("subj").alias("obj"))
        # (x p y)(y p x) both survive the semi-join; canonical order
        # emits the clash once (x==y self-loops violate asymmetry too
        # and survive subj<=obj)
        reports.append(
            e.join(swapped, ["subj", "pred", "obj"], "left_semi")
            .filter(F.col("subj") <= F.col("obj"))
            .select(F.lit("prp-asyp").alias("rule"),
                    F.col("subj").alias("s"), F.col("obj").alias("o"),
                    F.col("pred").alias("a"), F.lit("").alias("b")))
    if check_different:
        def _unordered(pred: str) -> DataFrame:
            return (stmts.filter(F.col("pred") == pred)
                    .select(F.least("subj", "obj").alias("s"),
                            F.greatest("subj", "obj").alias("o"))
                    .filter(F.col("s") != F.col("o"))
                    .dropDuplicates())
        reports.append(
            _unordered(sameas_pred)
            .join(_unordered(different_pred), ["s", "o"], "left_semi")
            .select(F.lit("eq-diff1").alias("rule"), "s", "o",
                    F.lit(sameas_pred).alias("a"),
                    F.lit(different_pred).alias("b")))
    if not reports:
        raise ValueError(
            "validate_owl needs at least one axiom set (disjoint_classes, "
            "disjoint_properties, irreflexive, asymmetric or "
            "check_different)")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.dropDuplicates()


def entailment_counts(type_stmts: DataFrame, closure: DataFrame) -> DataFrame:
    """Initial state for counting-based incremental maintenance of the
    rdfs:9 entailment: (subj, obj, n_derivations), where the count is
    the number of ASSERTED types of ``subj`` that derive (subj, rdf:type,
    obj) — the asserted type itself (reflexive derivation) plus one per
    asserted subtype reaching ``obj`` through the closure.
    ``infer_types`` ≡ the rows with n_derivations > 0; the counts are
    what make DELETION maintainable without recomputing (an entailed
    type survives the removal of one asserted type iff another asserted
    type still derives it).

    Same shuffle budget as infer_types plus the counting groupBy —
    map-side combinable, keyed on (subj, obj), never on url/host."""
    t = (type_stmts.filter(F.col("pred") == RDF_TYPE)
         .select("subj", "obj").dropDuplicates())
    return _derivations(t, closure, F.lit(1)).groupBy("subj", "obj").agg(
        F.sum("w").cast("long").alias("n_derivations"))


def _derivations(asserted: DataFrame, closure: DataFrame,
                 w: F.Column) -> DataFrame:
    """Bag of (subj, obj, w) derivations of an asserted-type frame: the
    self derivation plus one per closure supertype. Closure rows are
    distinct pairs, so each asserted type derives each supertype exactly
    once. ``w`` is +1 for inserts, the signed column for deltas."""
    d1 = asserted.select("subj", "obj", w.alias("w"))
    d2 = (asserted.withColumnRenamed("obj", "sub")
          .join(F.broadcast(closure.select("sub", "sup")), "sub")
          .select("subj", F.col("sup").alias("obj"), w.alias("w")))
    return d1.unionByName(d2)


def maintain_entailment(counts: DataFrame, type_delta: DataFrame,
                        closure: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One counting-IVM step over the entailed type store: fold a delta
    of ASSERTED rdf:type statements — (subj, obj, change) with change ∈
    {'added', 'removed'}, the shape ``triples.triple_delta`` emits —
    into the (subj, obj, n_derivations) state from
    ``entailment_counts``. Returns ``(new_counts, entailed_delta)``
    where entailed_delta is the added/removed rows of the ENTAILED view
    (n_derivations crossing zero), in the same (subj, pred, obj, change)
    shape, ready for a downstream delta log.

    Precondition: the delta is consistent with the asserted store the
    counts were built from ('removed' rows were present, 'added' rows
    were absent) — exactly what triple_delta guarantees against the
    snapshot it diffed. The DERIVATION work is delta-sized (signed
    derivations of the delta through one broadcast closure join, one
    counting groupBy on delta keys); the state merge is one full outer
    join against the counts frame — the same state-sized-but-
    co-partitionable merge shape as ``triples.apply_delta`` (bucket the
    stored counts by subj and the join never re-shuffles the state).
    What it never does is re-run the corpus-scale entailment: at a
    10^12-doc build the entailed store follows each micro-batch for
    the price of the batch plus one state merge."""
    sign = (F.when(F.col("change") == "added", F.lit(1))
            .otherwise(F.lit(-1)))
    d = (type_delta.filter(F.col("pred") == RDF_TYPE)
         if "pred" in type_delta.columns else type_delta)
    d = d.select("subj", "obj", sign.alias("w"))
    d_counts = (_derivations(d, closure, F.col("w"))
                .groupBy("subj", "obj")
                .agg(F.sum("w").cast("long").alias("dw")))
    new_counts, crossing = _merge_counts(counts, d_counts,
                                         ["subj", "obj"], "n_derivations")
    entailed_delta = crossing.select(
        "subj", F.lit(RDF_TYPE).alias("pred"), "obj", "change")
    return new_counts, entailed_delta


def _merge_counts(state: DataFrame, delta_counts: DataFrame,
                  keys: list[str], n_col: str) -> tuple[DataFrame, DataFrame]:
    """Shared counting-IVM merge: fold (keys…, dw) into (keys…, n_col),
    drop keys reaching zero, and return ``(new_state, crossing)`` where
    crossing carries the keys whose positivity flipped, with change ∈
    {'added', 'removed'}. One full outer join keyed on ``keys`` —
    co-partitionable with a bucketed state store."""
    merged = (state.join(delta_counts, keys, "full")
              .select(*keys,
                      (F.coalesce(F.col(n_col), F.lit(0))
                       + F.coalesce(F.col("dw"), F.lit(0)))
                      .cast("long").alias("n_new"),
                      F.coalesce(F.col(n_col), F.lit(0)).alias("n_old")))
    new_state = (merged.filter(F.col("n_new") > 0)
                 .select(*keys, F.col("n_new").alias(n_col)))
    crossing = (
        merged.filter((F.col("n_old") > 0) != (F.col("n_new") > 0))
        .select(*keys,
                F.when(F.col("n_new") > 0, F.lit("added"))
                 .otherwise(F.lit("removed")).alias("change")))
    return new_state, crossing


def maintain_entity_presence(link_counts: DataFrame,
                             link_delta: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Counting state over the KG's entity-link triples: (uri, n_links)
    with n_links = number of live mention→entity links (pred =
    itsrdf:taIdentRef). Folding a snapshot delta returns the new state
    plus the PRESENCE delta — entities whose link count crossed zero,
    i.e. entered or left the KG — which is exactly when their asserted
    rdf:type statements appear/disappear. Initial state: an empty
    (uri string, n_links long) frame."""
    from dbpedia_spotlight_spark.triples import PRED_IDENT
    sign = (F.when(F.col("change") == "added", F.lit(1))
            .otherwise(F.lit(-1)))
    d = (link_delta.filter(F.col("pred") == PRED_IDENT)
         .groupBy(F.col("obj").alias("uri"))
         .agg(F.sum(sign).cast("long").alias("dw")))
    return _merge_counts(link_counts, d, ["uri"], "n_links")


def maintain_entailed_types(link_counts: DataFrame, type_counts: DataFrame,
                            link_delta: DataFrame, entity_types: DataFrame,
                            closure: DataFrame
                            ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """End-to-end incremental KG-type construction: fold one snapshot
    delta (the KG maintenance delta log's added/removed triples) into
    the ENTAILED type store, without ever recomputing corpus-scale
    entailment. Three delta-sized steps chained through two counting
    states:

    1. ``maintain_entity_presence`` — which entities entered/left the
       KG (their live-link count crossed zero);
    2. presence delta × broadcast ``entity_types`` (uri, typ — the
       model store's type map) → the ASSERTED rdf:type delta;
    3. ``maintain_entailment`` — counting rdfs:9 maintenance of the
       inferred view through the broadcast subclass ``closure``.

    Returns (new_link_counts, new_type_counts, entailed_delta); the
    caller persists the two states per generation exactly like the
    triple snapshot itself (see KGStore.advance)."""
    new_links, presence = maintain_entity_presence(link_counts, link_delta)
    type_delta = (presence
                  .join(F.broadcast(entity_types), "uri")
                  .select(F.col("uri").alias("subj"),
                          F.lit(RDF_TYPE).alias("pred"),
                          F.col("typ").alias("obj"), "change"))
    new_types, entailed_delta = maintain_entailment(type_counts, type_delta,
                                                    closure)
    return new_links, new_types, entailed_delta


def _pattern_frame(kg: DataFrame, pat: tuple[str, str, str]) -> tuple[DataFrame, set[str]]:
    """One triple pattern → (bindings frame, its variable set). Terms
    starting with '?' are variables; everything else is a constant
    equality filter that reaches the parquet scan as a pushed filter.
    A variable repeated WITHIN the pattern (?x ?p ?x) becomes an
    intra-row equality filter.

    Constant predicates support the SPARQL 1.1 property-path forms:
    - ``p+``   one-or-more: the pattern frame becomes the transitive
      closure of ``p`` (``predicate_closure``) instead of a base scan;
    - ``p*``   zero-or-more and ``p?`` zero-or-one: the one-or-more /
      direct-edge frame unioned with the REFLEXIVE frame — per the
      SPARQL zero-length-path rule, (x, x) for every term x occurring
      as a subject or object anywhere in the graph, which costs one
      distinct over the snapshot's two term columns (documented: these
      two are the only forms whose cost is graph-sized rather than
      predicate-sized);
    - ``^p``   inverse: subj/obj swap — (s, ^p, o) ≡ (o, p, s);
    - ``p|q``  alternation: an isin filter on the pred column.
    The forms don't nest (``^p+``/``(p|q)+`` raise) — compose those by
    materializing the inner step first. Sequence paths (``p/q``) are
    handled one level up (``_expand_sequences``): they rewrite to
    chained patterns before reaching here, so each step may be any of
    the single-step forms above.

    A 4-element pattern is a QUAD: the 4th term (variable or constant)
    matches the snapshot's ``graph`` column — SPARQL named-graph
    semantics over a quad store (provenance: which page/generation
    asserted the statement). Scan-transform predicate forms (inverse,
    alternation, negated set) compose with quads — the graph column
    just rides along the projection; the closure forms (``+ * ?``)
    switch to the PER-GRAPH fixpoint (``predicate_closure(per_graph=
    True)``) — paths never cross a graph boundary, per SPARQL's
    active-graph evaluation."""
    pred = pat[1]
    quad = len(pat) == 4
    if quad and "graph" not in kg.columns:
        raise ValueError(
            "quad pattern over a triple snapshot without a 'graph' "
            f"column: {pat}")
    gcols = ["graph"] if quad else []
    already_set = False
    if not pred.startswith("?") and pred[-1] in "+*?" and len(pred) > 1:
        inner = pred[:-1]
        if inner.startswith(("^", "!")) or "|" in inner:
            raise ValueError(f"unsupported nested property path: {pred}")
        sel = ["sub", "sup"] + gcols
        if pred.endswith("+"):
            step = predicate_closure(kg, inner,
                                     per_graph=quad).select(*sel)
        elif pred.endswith("*"):
            step = (predicate_closure(kg, inner, per_graph=quad)
                    .select(*sel)
                    .unionByName(_reflexive_terms(kg, per_graph=quad)))
        else:  # p? — direct edge or zero-length
            step = (kg.filter(F.col("pred") == inner)
                    .select(F.col("subj").alias("sub"),
                            F.col("obj").alias("sup"), *gcols)
                    .unionByName(_reflexive_terms(kg, per_graph=quad)))
        df = step.dropDuplicates(sel).select(
            F.col("sub").alias("subj"), F.lit(pred).alias("pred"),
            F.col("sup").alias("obj"), *gcols)
        already_set = True  # closure dedup above is the set guarantee
    elif not pred.startswith("?") and pred.startswith("^"):
        inner = pred[1:]
        if inner.endswith("+") or "|" in inner:
            raise ValueError(f"unsupported nested property path: {pred}")
        df = (kg.filter(F.col("pred") == inner)
              .select(F.col("obj").alias("subj"),
                      F.lit(pred).alias("pred"),
                      F.col("subj").alias("obj"), *gcols))
    elif not pred.startswith("?") and pred.startswith("!"):
        # negated property set !p / !p|q — any edge whose predicate is
        # NOT in the set (SPARQL !(p|q)); still one pushed scan filter
        alts = pred[1:].split("|")
        if any(not a or a[-1] in "+*?" or a.startswith("^") for a in alts):
            raise ValueError(f"unsupported form in negated set: {pred}")
        df = (kg.filter(~F.col("pred").isin(alts))
              .select("subj", F.lit(pred).alias("pred"), "obj", *gcols))
    elif not pred.startswith("?") and "|" in pred:
        alts = pred.split("|")
        df = (kg.filter(F.col("pred").isin(alts))
              .select("subj", F.lit(pred).alias("pred"), "obj", *gcols))
    else:
        df = kg.select("subj", "pred", "obj", *gcols)
    var_pos: dict[str, str] = {}
    for pos, term in zip(("subj", "pred", "obj", "graph"), pat):
        if term.startswith("?"):
            var = term[1:]
            if var in var_pos:
                df = df.filter(F.col(pos) == F.col(var_pos[var]))
            else:
                var_pos[var] = pos
        else:
            df = df.filter(F.col(pos) == term)
    if not quad and not already_set and "graph" in kg.columns:
        # SPARQL union default graph is SET-based: a triple asserted in
        # several named graphs is ONE solution, not one per graph —
        # without this, non-DISTINCT aggregates and bag-semantics joins
        # inflate by the assertion multiplicity. Dedup AFTER the
        # constant filters (predicate-sized, not graph-sized); the
        # closure branch (+ * ?) already dedups via dropDuplicates(sel).
        df = df.dropDuplicates(["subj", "pred", "obj"])
    out = df.select(*[F.col(p).alias(v) for v, p in var_pos.items()])
    return out, set(var_pos)


def _expand_sequences(patterns: list[tuple[str, str, str]],
                      counter) -> list[tuple[str, str, str]]:
    """SPARQL 1.1 sequence property paths: a constant predicate
    containing '/' (``"p/q"``, ``"^p/q+"``) expands into chained
    patterns through fresh internal variables — exactly the spec's
    translation of sequence paths to triple patterns, so solution
    multiplicity over distinct intermediates is preserved (bag
    semantics). Each step may itself be any supported single-step form
    (+ * ? ^ |). ``counter`` is shared across ALL groups of one query
    so an internal variable can never collide with (and accidentally
    join against) another group's. Predicates are normally CURIE-style
    (the KG's vocabulary); a constant containing ``://`` is a full IRI
    predicate and is passed through UNSPLIT (its slashes are not path
    separators) — sequence paths cannot use full-IRI steps, the one
    escape this DSL doesn't have."""
    out = []
    for pat in patterns:
        s, p, o = pat[0], pat[1], pat[2]
        tail = tuple(pat[3:])  # optional graph term rides along: the
        # steps of a sequence path inside GRAPH g all match within g
        if p.startswith("?") or "/" not in p or "://" in p:
            out.append((s, p, o) + tail)
            continue
        parts = p.split("/")
        if any(not part for part in parts):
            raise ValueError(f"empty step in sequence path: {p}")
        cur = s
        for i, part in enumerate(parts):
            nxt = o if i == len(parts) - 1 else f"?__seq{next(counter)}"
            out.append((cur, part, nxt) + tail)
            cur = nxt
    return out


def _join_patterns(frames: list[tuple[DataFrame, set[str]]]) -> tuple[DataFrame, set[str]]:
    """Greedy join of pattern frames: seed from the most-constant
    (fewest-variable) pattern, then always extend by a pattern sharing
    at least one bound variable; cross join only when nothing connected
    remains."""
    remaining = sorted(frames, key=lambda fv: len(fv[1]))
    out, bound = remaining.pop(0)
    while remaining:
        idx = next((i for i, (_, v) in enumerate(remaining) if v & bound),
                   None)
        if idx is None:
            nxt, nvars = remaining.pop(0)
            out = out.crossJoin(nxt)
        else:
            nxt, nvars = remaining.pop(idx)
            out = out.join(nxt, sorted(nvars & bound))
        bound = bound | nvars
    return out, bound


def bgp_match(kg: DataFrame, patterns: list[tuple[str, str, str]],
              optional: list[list | dict] | None = None,
              filters: list[str] | None = None,
              values: tuple[list[str], list[tuple]] | None = None,
              bind: dict[str, str] | None = None,
              minus: list[list | dict] | None = None,
              exists: list[list | dict] | None = None,
              not_exists: list[list | dict] | None = None,
              subqueries: list[DataFrame] | None = None,
              ) -> DataFrame:
    """SPARQL-style basic-graph-pattern match over a triple snapshot:
    ``patterns`` is a conjunction of (s, p, o) patterns, '?name' terms
    are variables; returns one column per variable and one row per
    solution mapping (bag semantics, as SPARQL SELECT).

    Join planning: patterns are seeded from the most-constant (most
    selective) pattern, then greedily extended by a pattern sharing at
    least one already-bound variable — shared variables become
    equi-join keys, so Catalyst sees plain equi-joins it can reorder /
    broadcast / AQE-skew-split like any other. A pattern with no shared
    variable (a genuinely disconnected BGP) falls back to a cross join
    only when nothing connected remains — the SPARQL product semantics,
    kept as the documented last resort rather than a silent default.

    ``optional`` is a list of OPTIONAL groups (each its own list of
    patterns). Each group is solved with the same planner, then LEFT
    OUTER joined to the required solution on its shared variables — the
    SPARQL OPTIONAL semantics: unmatched solutions survive with the
    group's exclusive variables null. A group must share at least one
    variable with the required part (an unconstrained OPTIONAL product
    is almost always a query bug, so it raises instead of exploding).

    ``filters`` are SPARQL FILTER expressions — Spark SQL strings over
    the variable columns (``"sup <> 'Thing'"``, ``"len(sf) > 3"``) —
    applied at the end of the group, after OPTIONAL joins (the SPARQL
    group-end placement, which also keeps filter-on-optional-variable
    semantics: null bindings fail the filter). A filter that only
    touches required variables is pushed below the left joins and into
    the scans by Catalyst, so the end-of-group placement costs nothing.

    ``values`` is a SPARQL VALUES block — ``(["?e", "?rank"],
    [("dbr:A", "1"), ...])``: an inline solution table joined into the
    group on its shared variables (the standard constrain-to-a-list
    use), or crossed in when it binds only new variables (the SPARQL
    product semantics). The inline table is driver-literal by
    construction (a VALUES block is query text), so the join is always
    a broadcast of a handful of rows. UNDEF rows are not supported —
    pass complete tuples.

    ``bind`` is an ordered {var: spark-SQL-expr} of SPARQL BIND
    clauses, evaluated left-to-right after the required+VALUES join
    (each expr may use previously-bound and previously-BINDed
    variables). Rebinding an existing variable raises, as in SPARQL.
    BINDs run before OPTIONAL/MINUS/FILTER so those can reference the
    computed variables.

    ``exists`` / ``not_exists`` are lists of FILTER EXISTS / FILTER NOT
    EXISTS groups: a solution survives iff the group has ≥1 / 0
    solutions compatible on the shared variables — LEFT SEMI / LEFT
    ANTI joins against the group's distinct shared-variable tuples,
    evaluated at filter time (after OPTIONAL/BIND, with MINUS). The
    substitution subtlety SPARQL defines for unbound variables is
    handled conservatively like MINUS: a null shared binding never
    matches, so EXISTS drops it and NOT EXISTS keeps it. Unlike MINUS,
    a group sharing no variable is a constant condition — legal SPARQL
    — so it collapses to keep-all/keep-none via one ``ask`` probe
    instead of raising.

    ``minus`` is a list of MINUS groups: solutions compatible with any
    solution of the group on their shared variables are removed (LEFT
    ANTI join). Per the SPARQL MINUS disjoint-domain rule, a group
    sharing no variable with the solution removes nothing (and raises
    here, since writing one is a query bug). Null bindings (from an
    unmatched OPTIONAL) never match an anti-join key, which implements
    the unbound-variable-is-compatible-only-if-nothing-else-shared
    case conservatively: an all-null shared tuple survives.

    ``subqueries`` are SPARQL 1.1 subselects: each is an already-solved
    solutions DataFrame (typically from :func:`bgp_select` /
    :func:`bgp_aggregate` — projection IS the subquery's variable
    scope), evaluated bottom-up per the spec and joined into the group
    on the shared variable COLUMNS; a subquery binding only new
    variables crosses in (the SPARQL product rule). Being ordinary
    DataFrames, Catalyst broadcasts the (usually aggregated, small)
    subquery side.

    Every pattern (required, OPTIONAL, MINUS, EXISTS groups alike) may
    be a 4-element QUAD whose last term matches the snapshot's
    ``graph`` column — SPARQL ``GRAPH ?g { … }`` over a quad store; a
    graph variable binds and projects like any other (see
    ``triples.as_quads`` for the provenance-quad producer).

    The snapshot side stays declarative end-to-end: constants are
    pushed filters on the scan, no collect, no UDFs."""
    if not patterns:
        raise ValueError("bgp_match requires at least one pattern")
    import itertools
    seq_counter = itertools.count()
    out, bound = _join_patterns(
        [_pattern_frame(kg, p)
         for p in _expand_sequences(patterns, seq_counter)])
    if values is not None:
        vvars, rows = values
        names = [v[1:] if v.startswith("?") else v for v in vvars]
        if any(any(c is None for c in row) for row in rows):
            raise ValueError("VALUES UNDEF rows are not supported")
        vdf = out.sparkSession.createDataFrame(
            rows, ", ".join(f"{n} string" for n in names))
        shared = sorted(set(names) & bound)
        out = (out.join(F.broadcast(vdf), shared) if shared
               else out.crossJoin(F.broadcast(vdf)))
        bound = bound | set(names)
    for sub in subqueries or []:
        shared = sorted(set(sub.columns) & bound)
        out = out.join(sub, shared) if shared else out.crossJoin(sub)
        bound = bound | set(sub.columns)
    for var, expr in (bind or {}).items():
        name = var[1:] if var.startswith("?") else var
        if name in bound:
            raise ValueError(f"BIND would rebind ?{name}")
        out = out.withColumn(name, F.expr(expr))
        bound = bound | {name}
    def _group_frame(group):
        """A group is a pattern list, a dict {'patterns': [...],
        'filters': [...]} whose filters reference GROUP-LOCAL variables
        (filtering the group frame before the join is LeftJoin/MINUS/
        EXISTS-equivalent exactly when the filter's variables are bound
        by the group — a filter naming an outer-only variable fails
        loudly at analysis with an unresolved-column error, never
        silently), or a full nested GroupGraphPattern: a dict carrying
        any further ``bgp_match`` kwargs (optional/minus/exists/
        not_exists/bind/values/subqueries) is solved by RECURSION —
        bottom-up evaluation, the SPARQL algebra for well-designed
        patterns — and joined on its projected variables. Sequence-path
        internals never leak across levels (each recursion projects its
        own ``__seq`` vars away)."""
        if isinstance(group, dict):
            nested = {k: v for k, v in group.items()
                      if k != "patterns" and v}
            if set(nested) - {"filters"}:
                gdf = bgp_match(kg, group["patterns"], **nested)
                return gdf, set(gdf.columns)
            pats, filts = group["patterns"], group.get("filters", [])
        else:
            pats, filts = group, []
        if not pats:
            raise ValueError("a group needs at least one pattern")
        gdf, gvars = _join_patterns(
            [_pattern_frame(kg, p)
             for p in _expand_sequences(pats, seq_counter)])
        for f in filts:
            gdf = gdf.filter(F.expr(f))
        return gdf, gvars

    for group in optional or []:
        gdf, gvars = _group_frame(group)
        shared = sorted(gvars & bound)
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required "
                f"patterns: {group}")
        out = out.join(gdf, shared, "left")
        bound = bound | gvars
    for group in minus or []:
        gdf, gvars = _group_frame(group)
        shared = sorted(gvars & bound)
        if not shared:
            raise ValueError(
                "MINUS group shares no variable with the solution — per "
                f"SPARQL it would remove nothing: {group}")
        out = out.join(gdf.select(*shared).dropDuplicates(shared),
                       shared, "left_anti")
    for keep, groups in ((True, exists or []), (False, not_exists or [])):
        for group in groups:
            gdf, gvars = _group_frame(group)
            shared = sorted(gvars & bound)
            if not shared:
                # constant condition: one short-circuit probe
                if (len(gdf.take(1)) > 0) != keep:
                    out = out.filter(F.lit(False))
                continue
            out = out.join(gdf.select(*shared).dropDuplicates(shared),
                           shared, "left_semi" if keep else "left_anti")
    for expr in filters or []:
        out = out.filter(F.expr(expr))
    # sequence-path internals are existential, never projected
    return out.select(
        *sorted(v for v in bound if not v.startswith("__seq")))


def bgp_union(kg: DataFrame, groups: list[dict | list],
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL UNION of group graph patterns: each entry of ``groups``
    is either a pattern list or a dict of ``bgp_match`` keyword args
    (``{"patterns": [...], "optional": [...], ...}``). Solutions are
    the bag union of the branch solutions; a variable bound in one
    branch but not another is null (unbound) in the other branch's
    rows — ``unionByName(allowMissingColumns=True)``, the exact SPARQL
    UNION padding rule. ``filters`` apply after the union (group-end
    FILTER over the union's solution sequence).

    Each branch plans independently (its own greedy equi-join order),
    so the union is as scalable as its widest branch; the union itself
    is a zero-shuffle concatenation."""
    if not groups:
        raise ValueError("bgp_union requires at least one group")
    sols = []
    for g in groups:
        kwargs = g if isinstance(g, dict) else {"patterns": g}
        sols.append(bgp_match(kg, **kwargs))
    out = sols[0]
    for s in sols[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    for expr in filters or []:
        out = out.filter(F.expr(expr))
    return out.select(*sorted(out.columns))


def bgp_aggregate(kg: DataFrame, patterns: list[tuple[str, str, str]],
                  group_by: list[str], aggregates: dict[str, str],
                  having: str | None = None, **kwargs) -> DataFrame:
    """SPARQL 1.1 aggregation: GROUP BY + aggregate projections +
    HAVING over the solution sequence of a group graph pattern.
    ``group_by`` lists '?var' grouping keys (empty = one global group,
    the SPARQL implicit-group rule); ``aggregates`` is an ordered
    {output_name: spark-SQL-aggregate-expr} (``{"n": "count(*)",
    "n_e": "count(distinct e)"}``) over the variable columns; ``having``
    filters the grouped rows (may reference the aggregate aliases).
    Remaining kwargs (optional/filters/values/bind/minus) pass through
    to ``bgp_match``.

    SPARQL groups null bindings (an unmatched OPTIONAL variable) as a
    key value like any other — exactly Spark's groupBy null semantics,
    so nothing special is needed. The aggregation itself is ONE
    map-side-combinable shuffle keyed on the grouping variables; when
    those are entity/type-valued the key space is KG-sized, never
    url/host-sized, so corpus skew does not reach this exchange."""
    if not aggregates:
        raise ValueError("bgp_aggregate requires at least one aggregate")
    sols = bgp_match(kg, patterns, **kwargs)
    keys = [v[1:] if v.startswith("?") else v for v in group_by]
    aggs = [F.expr(expr).alias(name) for name, expr in aggregates.items()]
    out = sols.groupBy(*keys).agg(*aggs) if keys else sols.agg(*aggs)
    if having is not None:
        out = out.filter(F.expr(having))
    return out


def bgp_select(kg: DataFrame, patterns: list[tuple[str, str, str]],
               select_vars: list[str] | None = None,
               distinct: bool = False,
               order_by: list[str | tuple[str, str]] | None = None,
               limit: int | None = None, offset: int = 0,
               **kwargs) -> DataFrame:
    """SPARQL SELECT solution modifiers over a group graph pattern:
    projection (``select_vars``, '?var' names; None = SELECT *), then
    DISTINCT, ORDER BY (list of '?var' or ('?var', 'desc')), OFFSET,
    LIMIT — applied in the SPARQL modifier order. Remaining kwargs pass
    through to ``bgp_match``.

    Determinism: a LIMIT/OFFSET page is only well-defined under a TOTAL
    order — include a tie-breaking variable in ``order_by`` (as the
    oracle pair does); SPARQL itself leaves tie order
    implementation-defined. Plan shape: ORDER BY + LIMIT collapses to
    TakeOrderedAndProject (a per-partition top-k + one k-row merge on
    the driver — no global sort shuffle); an un-LIMITed ORDER BY is the
    one genuinely global operation here, kept for the final
    user-facing page, never mid-pipeline."""
    sols = bgp_match(kg, patterns, **kwargs)
    if select_vars is not None:
        sols = sols.select(
            *[v[1:] if v.startswith("?") else v for v in select_vars])
    if distinct:
        sols = sols.dropDuplicates()
    if order_by:
        cols = []
        for o in order_by:
            v, direction = o if isinstance(o, tuple) else (o, "asc")
            c = F.col(v[1:] if v.startswith("?") else v)
            cols.append(c.desc() if direction == "desc" else c.asc())
        sols = sols.orderBy(*cols)
    if offset:
        sols = sols.offset(offset)
    if limit is not None:
        sols = sols.limit(limit)
    return sols


def describe(kg: DataFrame, uri: str) -> DataFrame:
    """SPARQL DESCRIBE (concise-bounded form): every triple in which
    the resource appears as subject or object. One OR-of-equalities
    filter — pushed to the snapshot scan (parquet handles OR of
    point predicates), so a DESCRIBE reads only the row groups whose
    min/max straddle the uri."""
    return (kg.filter((F.col("subj") == uri) | (F.col("obj") == uri))
            .select("subj", "pred", "obj")
            .dropDuplicates(["subj", "pred", "obj"]))


def ask(kg: DataFrame, patterns: list[tuple[str, str, str]],
        **kwargs) -> bool:
    """SPARQL ASK — does at least one solution exist? ``take(1)`` so
    Spark stops at the first produced row (LocalLimit short-circuits
    the scan) instead of counting the full solution set."""
    return len(bgp_match(kg, patterns, **kwargs).take(1)) > 0


def construct(kg: DataFrame, patterns: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]],
              optional: list[list[tuple[str, str, str]]] | None = None,
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL CONSTRUCT — the rule-materialization form of KG
    construction: solve the WHERE block with ``bgp_match``, then
    instantiate every ``template`` triple per solution ('?var' terms
    take the binding, other terms are constants) and union the
    instantiations with set semantics (CONSTRUCT returns a GRAPH, so
    duplicates collapse). A solution whose binding for a template
    position is null (an unmatched OPTIONAL variable) skips that
    template triple — the SPARQL incomplete-triple rule.

    This is how derived predicates get materialized into the snapshot
    (e.g. lift (mention→entity, entity→type) into a direct
    mention→type edge) without a UDF: per template triple it is one
    projection over the solution frame, so the whole thing stays in
    whole-stage codegen; the final dropDuplicates is the one shuffle,
    keyed on the constructed triple (never on url/host)."""
    if not template:
        raise ValueError("construct requires at least one template triple")
    sols = bgp_match(kg, patterns, optional=optional, filters=filters)
    return _instantiate(sols, template)


def _instantiate(sols: DataFrame,
                 template: list[tuple[str, str, str]],
                 cols: tuple[str, ...] = ("subj", "pred", "obj"),
                 ) -> DataFrame:
    """Instantiate template triples (or quads — ``cols`` carries the
    snapshot key) per solution row ('?var' terms take the binding,
    other terms are constants); null bindings skip the row (the SPARQL
    incomplete-triple rule); set semantics."""
    def term(t: str) -> F.Column:
        return F.col(t[1:]) if t.startswith("?") else F.lit(t)

    out = None
    for tpl in template:
        if len(tpl) != len(cols):
            raise ValueError(
                f"template arity {len(tpl)} != snapshot arity "
                f"{len(cols)}: {tpl} — a quad store needs GRAPH "
                "templates (s, p, o, g) and vice versa")
        row = sols.select(*[term(t).alias(c) for t, c in zip(tpl, cols)])
        for c in cols:
            row = row.filter(F.col(c).isNotNull())
        out = row if out is None else out.unionByName(row)
    return out.dropDuplicates(list(cols))


def update_kg(kg: DataFrame, patterns: list[tuple[str, str, str]],
              delete: list[tuple[str, str, str]] | None = None,
              insert: list[tuple[str, str, str]] | None = None,
              optional: list[list[tuple[str, str, str]]] | None = None,
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL 1.1 Update ``DELETE {..} INSERT {..} WHERE {..}`` over a
    snapshot — the rule-based REPAIR move (rename a predicate, retarget
    deprecated entities, drop rule-selected assertions and materialize
    their replacements in one pass).

    Spec semantics (SPARQL 1.1 Update §3.1.3): the WHERE block is
    solved ONCE against the current graph; both template sets
    instantiate from that same solution multiset; deletes apply before
    inserts, so the result graph is ``(G ∖ D) ∪ I`` with set
    semantics — a triple in both D and I survives.

    Plan shape: one bgp_match (the usual broadcast equi-join chain),
    one anti-join of the corpus-scale stream against the instantiated
    delete set keyed on the full triple, one union + distinct for the
    insert set. Returns the NEW snapshot frame; callers persist it as
    the next generation (KGStore) — nothing mutates in place.

    Over a QUAD snapshot (a ``graph`` column — ``triples.as_quads``),
    the templates are 4-element ``GRAPH`` forms (s, p, o, g) — the
    SPARQL 1.1 Update ``DELETE/INSERT { GRAPH … { … } }`` shape — and
    WHERE patterns may be triples or quads as in ``bgp_match``; the
    snapshot key becomes the full quad."""
    if not delete and not insert:
        raise ValueError("update_kg needs delete and/or insert templates")
    cols = ("subj", "pred", "obj") + (
        ("graph",) if "graph" in kg.columns else ())
    sols = bgp_match(kg, patterns, optional=optional,
                     filters=filters).localCheckpoint(eager=True)
    # ONE corpus-scale distinct: when inserts are present the post-union
    # dedup subsumes the upfront one (the anti-join never adds rows)
    out = kg.select(*cols) if insert \
        else kg.select(*cols).dropDuplicates(list(cols))
    if delete:
        out = out.join(_instantiate(sols, delete, cols),
                       list(cols), "left_anti")
    if insert:
        out = out.unionByName(_instantiate(sols, insert, cols)) \
            .dropDuplicates(list(cols))
    return out
