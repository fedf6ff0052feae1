"""Training-data export from the annotated corpus.

A KG-construction pipeline's annotations double as distant supervision:
each (mention, entity) link plus its surrounding text is one training
example for NER / entity-linking models. ``mention_contexts`` exports
exactly that — the mention span and a bounded character window either
side, aligned to the SAME extracted text the pipeline's offsets index.

Scale: ONE url-keyed equi-join (annotations × pages — co-partitioned
when the page store is bucketed by url) followed by pure substring
projections that stay in whole-stage codegen. The window bounds what
the projection keeps: downstream consumers receive ≤ 2·window + |span|
characters per example, never whole documents. Nothing keys on host;
a mega-doc's examples spread per-mention after the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mention_contexts(annotations: DataFrame, pages: DataFrame,
                     window: int = 40,
                     text_col: str = "text") -> DataFrame:
    """(url, begin, end, surface_form, uri, left_ctx, mention_text,
    right_ctx) — one distant-supervision example per annotation.
    ``left_ctx`` is the ≤``window`` characters before the span,
    ``right_ctx`` the ≤``window`` after, ``mention_text`` the exact
    span sliced from ``pages.text_col`` (1-based substring arithmetic,
    clipped at both document edges — identical semantics in Spark and
    DuckDB, which the oracle pair pins). Offsets are the pipeline's:
    character positions into the same text column the annotate run
    read, so ``mention_text`` reproduces the matched surface bytes."""
    if window < 0:
        raise ValueError("window must be >= 0")
    w = int(window)
    p = pages.select("url", F.col(text_col).alias("_doc_text"))
    a = annotations.select("url", "begin", "end", "surface_form", "uri")
    return a.join(p, "url").select(
        "url", "begin", "end", "surface_form", "uri",
        F.expr(f"substring(_doc_text, greatest(1, begin - {w} + 1), "
               f"least({w}, begin))").alias("left_ctx"),
        F.expr("substring(_doc_text, begin + 1, end - begin)")
         .alias("mention_text"),
        F.expr(f"substring(_doc_text, end + 1, {w})").alias("right_ctx"),
    )


def kg_embedding_examples(kg: DataFrame, n_neg: int = 4,
                          salt: str = "kg-embed-v1",
                          filtered: bool = True) -> DataFrame:
    """KG-embedding training examples (TransE/DistMult-style): every
    triple as a positive plus ``n_neg`` DETERMINISTIC corruptions —
    head or tail replaced by a pseudo-uniformly drawn entity — as
    negatives. Returns (subj, pred, obj, label, k): label 1/0, k the
    negative's index (NULL on positives).

    Corruption must be reproducible the same way sampling is
    (operators/sampling.py): ``rand()`` would change the training set
    under repartition or resume. Instead both choices come from
    md5(subj#pred#obj#k#salt): bit-parity of one 60-bit hex slice picks
    head-vs-tail, a second slice mod |entities| picks the replacement.
    Entities get dense ids via ``dense_ids_by`` (bucketed two-phase
    rank — no single-partition window), so the id↔entity mapping is
    itself layout-independent and the draw replays in any engine with
    md5.

    ``filtered=True`` drops negatives that collide with a true triple
    (the standard "filtered" setting — an unfiltered corrupt draw that
    happens to be a real fact is a false negative label); corruptions
    that draw the entity already in place are always dropped.

    Scale shape: ids = one bucketed rank + a scalar count action;
    negatives = ×n_neg sequence explode (no shuffle), ONE equi-join on
    eid against the entity table, and the filtered anti-join keyed on
    (subj, pred, obj). Nothing quadratic, nothing collects beyond the
    entity count and the ≤|alphabet|² bucket offsets inside
    dense_ids_by."""
    from dbpedia_spotlight_spark.plans.model_build import dense_ids_by
    if n_neg < 1:
        raise ValueError("n_neg must be >= 1")
    ents = dense_ids_by(
        kg.select(F.col("subj").alias("term"))
        .unionByName(kg.select(F.col("obj").alias("term")))
        .dropDuplicates(), "term", "eid")
    n = ents.count()
    pos = kg.select("subj", "pred", "obj", F.lit(1).alias("label"),
                    F.lit(None).cast("int").alias("k"))
    negs = kg.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(1), F.lit(int(n_neg)))).alias("k"))
    h = F.md5(F.concat_ws("#", F.col("subj"), F.col("pred"), F.col("obj"),
                          F.col("k").cast("string"), F.lit(salt)))
    negs = (
        negs.withColumn("__h", h)
        .withColumn("__head", F.conv(F.substring("__h", 1, 15), 16, 10)
                    .cast("long") % 2 == 0)
        .withColumn("eid", (F.conv(F.substring("__h", 17, 15), 16, 10)
                            .cast("long") % n).cast("int"))
        .join(ents, "eid")
        .filter(F.when(F.col("__head"), F.col("term") != F.col("subj"))
                .otherwise(F.col("term") != F.col("obj")))
        .select(
            F.when(F.col("__head"), F.col("term"))
            .otherwise(F.col("subj")).alias("subj"),
            "pred",
            F.when(F.col("__head"), F.col("obj"))
            .otherwise(F.col("term")).alias("obj"),
            F.lit(0).alias("label"), "k")
    )
    if filtered:
        negs = negs.join(kg.select("subj", "pred", "obj").dropDuplicates(),
                         ["subj", "pred", "obj"], "left_anti")
    return pos.unionByName(negs)
