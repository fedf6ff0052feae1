"""KG refinement — the post-construction passes of Paulheim's survey
("Knowledge graph refinement", SWJ 2017): once triples are
materialized, complete what extraction missed and compress what
serving needs. Three operators, all pure DataFrame algebra (zero
UDFs), complementing the family the engine already has (completion:
``graph.link_prediction``; error detection: ``shapes`` /
``ontology.validate_owl``):

- :func:`entity_summary` — per-entity top-k fact selection for
  serving/display (RELIN/FACES lineage: Cheng et al. 2011, Gunaratna
  et al. 2015): rank each (pred, obj) by predicate informativeness ×
  value exclusivity so the summary prefers facts that *distinguish*
  the entity.
- :func:`schema_graph` — SchemEX-style quotient summarization (Konrath
  et al. 2012): collapse the instance graph to (src_type, pred,
  dst_type) edges with triple/subject counts — the schema census a
  consumer reads before writing queries.
- :func:`predict_types` — SDType-style statistical type completion
  (Paulheim & Bizer, ISWC 2013): an untyped entity inherits a type
  distribution from the predicates it participates in, each predicate
  weighted by how discriminative its observed type distribution is.

Scale notes (10^12-doc KG): every statistic here keys on predicate,
(pred, obj), or (pred, dir, type) — vocabulary-shaped aggregates with
map-side partial combine, orders of magnitude below the triple count.
The only fact-shaped shuffles are the final join of those stats back
onto triples (one hash join each) and the per-subject rank window of
``entity_summary`` (keyed on subj — mega-entities are bounded by their
own fact count, and the window never sees other subjects' rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

THING = "owl:Thing"


def entity_summary(kg: DataFrame, k: int = 5,
                   round_digits: int = 9) -> DataFrame:
    """(subj, pred, obj, idf, exclusivity, score, rank) — the ``k``
    highest-scoring facts per subject.

    ``score = idf(pred) × exclusivity(pred, obj)`` rounded to
    ``round_digits`` BEFORE ranking, where ``idf(pred) =
    ln(n_subjects / n_subjects_using_pred)`` (a predicate every entity
    carries says nothing) and ``exclusivity(pred, obj) = 1 /
    n_subjects_sharing(pred, obj)`` (a value shared by one subject
    identifies it). Ties break on (pred, obj) so the cut at ``rank <=
    k`` is deterministic across layouts.

    Duplicate assertions are collapsed first: summaries are
    set-semantic over facts.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    facts = kg.select("subj", "pred", "obj").dropDuplicates(
        ["subj", "pred", "obj"]).cache()  # reused 4×: count + 2 stats + join
    n_subj = facts.select("subj").distinct().count()
    # vocabulary-shaped: one row per predicate
    pred_stats = (facts.select("pred", "subj").distinct()
                  .groupBy("pred")
                  .agg(F.count("*").alias("_np")))
    # value-shaped: one row per (pred, obj) pair
    val_stats = (facts.select("pred", "obj", "subj").distinct()
                 .groupBy("pred", "obj")
                 .agg(F.count("*").alias("_nv")))
    scored = (facts
              .join(F.broadcast(pred_stats), "pred")
              .join(val_stats, ["pred", "obj"])
              .select(
                  "subj", "pred", "obj",
                  F.round(F.log(F.lit(float(n_subj)) / F.col("_np")),
                          round_digits).alias("idf"),
                  F.round(1.0 / F.col("_nv"),
                          round_digits).alias("exclusivity"),
                  F.round(
                      F.round(F.log(F.lit(float(n_subj)) / F.col("_np")),
                              round_digits)
                      * F.round(1.0 / F.col("_nv"), round_digits),
                      round_digits).alias("score")))
    w = Window.partitionBy("subj").orderBy(
        F.desc("score"), "pred", "obj")
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k))


def schema_graph(kg: DataFrame, types: DataFrame,
                 untyped: str = THING) -> DataFrame:
    """(src_type, pred, dst_type, n_triples, n_subjects) — the
    quotient graph: one row per observed (subject-type, predicate,
    object-type) combination, counting the distinct facts and distinct
    subjects beneath it.

    ``types`` is a (subj, pred='rdf:type', obj) frame (the
    ``triples.type_triples`` shape — extra columns ignored); entities
    with no type row fall into ``untyped`` (SchemEX keeps them visible
    rather than dropping edges). Multi-typed entities contribute one
    quotient row per type combination — the standard quotient-by-type
    multiplicity.

    rdf:type rows inside ``kg`` are excluded from the edge census
    (they ARE the typing, not the schema's payload edges).
    """
    facts = (kg.select("subj", "pred", "obj")
             .filter(F.col("pred") != "rdf:type")
             .dropDuplicates(["subj", "pred", "obj"]))
    t = types.select(F.col("subj").alias("_e"),
                     F.col("obj").alias("_t")).distinct()
    src = t.select(F.col("_e").alias("subj"),
                   F.col("_t").alias("src_type"))
    dst = t.select(F.col("_e").alias("obj"),
                   F.col("_t").alias("dst_type"))
    quot = (facts
            .join(src, "subj", "left")
            .join(dst, "obj", "left")
            .select(
                F.coalesce("src_type", F.lit(untyped)).alias("src_type"),
                "pred",
                F.coalesce("dst_type", F.lit(untyped)).alias("dst_type"),
                "subj"))
    return (quot.groupBy("src_type", "pred", "dst_type")
            .agg(F.count("*").alias("n_triples"),
                 F.countDistinct("subj").alias("n_subjects")))


def predict_types(kg: DataFrame, types: DataFrame,
                  min_conf: float = 0.0, top_k: int = 3,
                  round_digits: int = 9) -> DataFrame:
    """(subj, type, score, rank) — SDType-lite type completion for
    entities that carry NO rdf:type assertion.

    Evidence = the distinct (pred, direction) slots an entity fills.
    For each slot, the typed population defines a conditional type
    distribution ``conf(slot, t) = n_typed_entities_of_t_in_slot /
    n_typed_entities_in_slot``; the slot's weight is its squared-sum
    discriminability ``w(slot) = Σ_t conf²`` (a slot whose
    distribution is uniform carries ~1/|types| weight, a
    single-type slot carries 1 — Paulheim & Bizer's weighting, with
    the distribution observed from the KG itself). An untyped entity
    scores ``score(t) = Σ_slot w·conf / Σ_slot w`` over ITS slots,
    keeps ``top_k`` types above ``min_conf``; score is rounded before
    both the threshold and the rank so boundary cases are
    layout-stable (ties break on type name).

    rdf:type rows in ``kg`` are ignored as evidence; direction is
    'out' for subject slots, 'in' for object slots. Entities whose
    every slot is untyped-population-only (no typed entity ever filled
    it) receive no row — SDType abstains without evidence.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    facts = (kg.select("subj", "pred", "obj")
             .filter(F.col("pred") != "rdf:type")
             .dropDuplicates(["subj", "pred", "obj"])
             .cache())  # feeds both slot directions
    t = types.select(F.col("subj").alias("_e"),
                     F.col("obj").alias("_t")).distinct()
    # entity × slot (distinct): the evidence table, both directions
    slots = (facts.select(F.col("subj").alias("_e"), "pred",
                          F.lit("out").alias("dir"))
             .unionByName(
                 facts.select(F.col("obj").alias("_e"), "pred",
                              F.lit("in").alias("dir")))
             .distinct()
             # reused 4× (typed population, untyped application, both
             # sides' stats): cache beats re-running the union+distinct
             # shuffle per branch
             .cache())
    typed_slots = slots.join(t, "_e")  # one row per (entity, slot, type)
    # conditional distributions: vocabulary-shaped aggregates
    slot_pop = (typed_slots.select("pred", "dir", "_e").distinct()
                .groupBy("pred", "dir")
                .agg(F.count("*").alias("_n_slot")))
    slot_type = (typed_slots.groupBy("pred", "dir", "_t")
                 .agg(F.countDistinct("_e").alias("_n_t")))
    # conf/weight are vocabulary-shaped (|preds|×2×|types| rows max)
    # and feed 2-3 consumers each: cache cuts the recomputed agg trees
    # out of every downstream branch
    conf = (slot_type.join(F.broadcast(slot_pop), ["pred", "dir"])
            .select("pred", "dir", "_t",
                    (F.col("_n_t") / F.col("_n_slot")).alias("_conf"))
            .cache())
    weight = (conf.groupBy("pred", "dir")
              .agg(F.sum(F.col("_conf") * F.col("_conf")).alias("_w"))
              .cache())
    model = conf.join(F.broadcast(weight), ["pred", "dir"])
    # untyped entities: anti-join against the type table
    untyped = slots.join(t.select("_e").distinct(), "_e", "left_anti")
    scored = (untyped.join(F.broadcast(model), ["pred", "dir"])
              .groupBy("_e", "_t")
              .agg(F.sum(F.col("_w") * F.col("_conf")).alias("_num")))
    # denominator: Σ w over the entity's slots that HAVE a model row
    denom = (untyped.join(F.broadcast(weight), ["pred", "dir"])
             .groupBy("_e").agg(F.sum("_w").alias("_den")))
    w = Window.partitionBy("subj").orderBy(F.desc("score"), "type")
    return (scored.join(denom, "_e")
            .select(F.col("_e").alias("subj"),
                    F.col("_t").alias("type"),
                    F.round(F.col("_num") / F.col("_den"),
                            round_digits).alias("score"))
            .filter(F.col("score") >= min_conf)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top_k))
