"""Triple emission + lineage (SURVEY.md §2.8 E1–E3).

Reference behavior: the NIF/RDF output serializer (rest/.../output/ [U])
emits per-occurrence anchors and entity links. The rebuild materializes
them as a triples table (BASELINE.json north_star):

    subj = '<url>#char=<begin>,<end>'   (NIF-style fragment)
    pred = 'nif:anchorOf'       obj = surface form      (E1 mention triple)
    pred = 'itsrdf:taIdentRef'  obj = DBpedia URI       (E2 link triple)

plus score, per-partition lineage (E3). Written via the catalog
abstraction in ``dbpedia_spotlight_spark.sources.catalog`` (Iceberg when a
catalog is configured; partitioned Parquet + manifest fallback — no
Iceberg jar in this sandbox, SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRED_ANCHOR = "nif:anchorOf"
PRED_IDENT = "itsrdf:taIdentRef"


def subj_col() -> F.Column:
    return F.concat_ws(
        "", F.col("url"), F.lit("#char="), F.col("begin"), F.lit(","), F.col("end")
    ).alias("subj")


def mention_triples(annotations: DataFrame) -> DataFrame:
    """E1: (subj, nif:anchorOf, surface_form)."""
    return annotations.select(
        subj_col(),
        F.lit(PRED_ANCHOR).alias("pred"),
        F.col("surface_form").alias("obj"),
        F.col("similarity_score").alias("score"),
    ).dropDuplicates(["subj", "pred", "obj"])


def link_triples(annotations: DataFrame) -> DataFrame:
    """E2: (subj, itsrdf:taIdentRef, uri) — the P/R-graded set."""
    return annotations.select(
        subj_col(),
        F.lit(PRED_IDENT).alias("pred"),
        F.col("uri").alias("obj"),
        F.col("similarity_score").alias("score"),
    ).dropDuplicates(["subj", "pred", "obj"])


def all_triples(annotations: DataFrame) -> DataFrame:
    """E1 ∪ E2 with lineage columns (E3): partition id + stage tag.

    ONE pass over the annotation stream: each row explodes into its
    mention + link triple (a union of the two E1/E2 branches would
    re-execute the whole upstream annotate pipeline per branch — 2× the
    work at any scale; same plan shape as the contract query).

    ``part_id`` is the *source* partition (spark_partition_id at emission),
    recorded so a resumed run can skip completed partitions
    (SURVEY §4 checkpoint/resume)."""
    po = F.explode(F.array(
        F.struct(F.lit(PRED_ANCHOR).alias("pred"),
                 F.col("surface_form").alias("obj")),
        F.struct(F.lit(PRED_IDENT).alias("pred"),
                 F.col("uri").alias("obj")),
    )).alias("po")
    t = (
        annotations.select(subj_col(), po,
                           F.col("similarity_score").alias("score"))
        .select("subj", F.col("po.pred").alias("pred"),
                F.col("po.obj").alias("obj"), "score")
        .dropDuplicates(["subj", "pred", "obj"])
    )
    return t.withColumn("part_id", F.spark_partition_id()).withColumn(
        "lineage",
        F.struct(
            F.lit("annotate").alias("stage"),
            F.current_timestamp().alias("emitted_at"),
        ),
    )


def triple_prf(emitted: DataFrame, golden: DataFrame) -> dict[str, float]:
    """Set precision/recall/F1 of (subj, pred, obj) vs a golden set —
    the BASELINE P/R≥0.95 gate, computed distributed (no collect of the
    big side; golden is small → broadcast joins)."""
    e = emitted.select("subj", "pred", "obj").dropDuplicates()
    g = golden.select("subj", "pred", "obj").dropDuplicates()
    n_e = e.count()
    n_g = g.count()
    n_hit = e.join(F.broadcast(g), ["subj", "pred", "obj"], "left_semi").count()
    p = n_hit / n_e if n_e else 0.0
    r = n_hit / n_g if n_g else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "emitted": float(n_e), "golden": float(n_g), "hits": float(n_hit)}
