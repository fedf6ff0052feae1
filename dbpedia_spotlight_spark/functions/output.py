"""Annotation output serializers (SURVEY.md §2.1 S6).

Reference behavior: ``rest/.../output/OutputManager.java`` [U] renders
occurrences as JSON / XML / HTML / NIF. Here the NIF-equivalent is the
triples table (triples.py); this module adds the per-document JSON and
XML wire shapes so a reference client reading ``/annotate`` responses
can consume this engine's output.

All rendering is JVM-side column algebra (collect_list + to_json /
concat) — no Python in the serialization path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def annotations_json(annotations: DataFrame) -> DataFrame:
    """One row per document: Spotlight-style JSON
    ``{"@text-url":…, "Resources":[{"@URI":…, "@surfaceForm":…,
    "@offset":…, "@similarityScore":…, "@support":…}, …]}``."""
    res = F.struct(
        F.col("uri").alias("@URI"),
        F.col("surface_form").alias("@surfaceForm"),
        F.col("begin").alias("@offset"),
        F.col("similarity_score").alias("@similarityScore"),
        F.col("percentage_of_second_rank").alias("@percentageOfSecondRank"),
        F.col("support").alias("@support"),
        F.array_join(F.col("types"), ",").alias("@types"),
    )
    per_doc = (
        annotations.withColumn("r", res)
        .groupBy("url")
        .agg(F.sort_array(F.collect_list(F.struct("begin", "r")))
             .alias("ordered"))
        .select(
            "url",
            F.to_json(F.struct(
                F.col("url").alias("@text-url"),
                F.transform(F.col("ordered"), lambda x: x["r"])
                 .alias("Resources"),
            )).alias("json"),
        )
    )
    return per_doc


def annotations_xml(annotations: DataFrame) -> DataFrame:
    """One row per document: Spotlight-style XML
    ``<Annotation text-url="..."><Resources><Resource .../>…``.
    Attribute values are XML-escaped with native replace chains."""
    def esc(c):
        return F.replace(
            F.replace(F.replace(c.cast("string"), F.lit("&"), F.lit("&amp;")),
                      F.lit("<"), F.lit("&lt;")),
            F.lit('"'), F.lit("&quot;"),
        )

    tag = F.concat(
        F.lit('<Resource URI="'), esc(F.col("uri")),
        F.lit('" surfaceForm="'), esc(F.col("surface_form")),
        F.lit('" offset="'), F.col("begin").cast("string"),
        F.lit('" similarityScore="'), F.col("similarity_score").cast("string"),
        F.lit('" support="'), F.col("support").cast("string"),
        F.lit('"/>'),
    )
    return (
        annotations.withColumn("tag", tag)
        .groupBy("url")
        .agg(F.sort_array(F.collect_list(F.struct("begin", "tag")))
             .alias("ordered"))
        .select(
            "url",
            F.concat(
                F.lit('<Annotation text-url="'), esc(F.col("url")),
                F.lit('"><Resources>'),
                F.array_join(
                    F.transform(F.col("ordered"), lambda x: x["tag"]), ""),
                F.lit("</Resources></Annotation>"),
            ).alias("xml"),
        )
    )
