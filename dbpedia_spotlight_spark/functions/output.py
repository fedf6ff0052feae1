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


# ---------------------------------------------------------------------------
# N-Triples (the KG materialization wire format)
# ---------------------------------------------------------------------------

NIF_ANCHOR_IRI = \
    "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#anchorOf"
ITSRDF_IDENT_IRI = "http://www.w3.org/2005/11/its/rdf#taIdentRef"

_PRED_IRIS = {
    "nif:anchorOf": NIF_ANCHOR_IRI,
    "itsrdf:taIdentRef": ITSRDF_IDENT_IRI,
}

# N-Triples literal escapes, backslash FIRST (every later replacement
# introduces backslashes that must not be re-escaped)
_LITERAL_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                    ("\r", "\\r"), ("\t", "\\t"))

# chars forbidden inside an IRIREF, percent-encoded (pinned minimal
# set from the N-Triples grammar; backslash FIRST here too)
_IRI_ESCAPES = (("\\", "%5C"), (" ", "%20"), ("<", "%3C"), (">", "%3E"),
                ('"', "%22"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"),
                ("^", "%5E"), ("`", "%60"))


def _chain(col: F.Column, pairs) -> F.Column:
    for a, b in pairs:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """Render a (subj, pred, obj) table as W3C N-Triples lines — the
    interchange form every triple store loads. subj is always an IRI;
    nif:anchorOf objects are string literals (with the grammar's
    ECHAR escapes), every other object an IRI. The compact prefixes the
    engine uses internally expand to their full IRIs; an already-full
    predicate passes through. All string algebra is JVM-side replace
    chains — nothing here runs in Python."""
    pred_iri = F.coalesce(
        *[F.when(F.col("pred") == k, F.lit(v)) for k, v in
          _PRED_IRIS.items()],
        F.col("pred"))
    obj_term = F.when(
        F.col("pred") == "nif:anchorOf",
        F.concat(F.lit('"'),
                 _chain(F.col("obj"), _LITERAL_ESCAPES), F.lit('"')),
    ).otherwise(
        F.concat(F.lit("<"), _chain(F.col("obj"), _IRI_ESCAPES),
                 F.lit(">")))
    line = F.concat(
        F.lit("<"), _chain(F.col("subj"), _IRI_ESCAPES), F.lit("> <"),
        pred_iri, F.lit("> "), obj_term, F.lit(" ."))
    return triples.select(line.alias("ntriple"))


def write_ntriples(triples: DataFrame, path: str,
                   compression: str = "gzip") -> None:
    """Materialize as sharded .nt text (gzip by default — N-Triples is
    redundant and compresses ~10×; one file per partition, so sizing
    the output shards is the caller's repartition decision)."""
    ntriples_lines(triples).write.mode("overwrite") \
        .option("compression", compression).text(path)
