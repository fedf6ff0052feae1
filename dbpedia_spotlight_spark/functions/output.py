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


# ---------------------------------------------------------------------------
# Turtle serializer — the writer twin of sources/turtle.py (S6 family).
# ---------------------------------------------------------------------------

# default prefix map: the namespaces this engine emits + RDF core.
# Longest-namespace-first matching at render time, so overlapping
# declarations compact deterministically.
TURTLE_PREFIXES = {
    "nif": "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/"
           "nif-core#",
    "itsrdf": "http://www.w3.org/2005/11/its/rdf#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dbr": "http://dbpedia.org/resource/",
    "dbo": "http://dbpedia.org/ontology/",
}

# chars a compacted PN_LOCAL may contain WITHOUT escaping, pinned to a
# conservative subset of the Turtle grammar ('.' excluded entirely so
# the no-trailing-dot rule can't bite; '-' allowed mid-name only)
_PN_LOCAL_RE = "[A-Za-z0-9_][A-Za-z0-9_-]*"


def _iri_term(col: F.Column, prefixes: dict[str, str]) -> F.Column:
    """Prefix-compacted name when the IRI sits in a declared namespace
    and its local part is grammar-safe, else an escaped ``<IRIREF>``.
    Longest namespace wins; pure JVM column algebra (one rlike + one
    substring per declared prefix)."""
    import re as _re
    full = F.concat(F.lit("<"), _chain(col, _IRI_ESCAPES), F.lit(">"))
    arms = []
    for pfx, ns in sorted(prefixes.items(),
                          key=lambda kv: (-len(kv[1]), kv[0])):
        pat = "^" + _re.escape(ns) + _PN_LOCAL_RE + "$"
        arms.append(F.when(
            col.rlike(pat),
            F.concat(F.lit(pfx + ":"),
                     F.substring(col, len(ns) + 1, 1 << 20))))
    return F.coalesce(*arms, full) if arms else full


def turtle_statements(triples: DataFrame,
                      prefixes: dict[str, str] | None = None
                      ) -> DataFrame:
    """Render an RDF frame as Turtle statement blocks — one row
    (column ``turtle``) per SUBJECT, predicates joined with ``;``,
    repeated-predicate objects with ``,``, deterministic (pred, obj)
    order inside the block. Accepts the readers' 6-column shape
    (subj, pred, obj, obj_kind['iri'|'literal'|'bnode'], lang,
    datatype); a bare (subj, pred, obj) frame gets the engine's
    internal convention applied (``nif:anchorOf`` objects are
    literals, everything else an IRI — exactly ``ntriples_lines``).

    One subject-keyed shuffle (the serialization sink's grouping);
    every string is built JVM-side (replace chains + one sorted
    ``aggregate`` fold per subject) — no Python, no window sort."""
    p = dict(TURTLE_PREFIXES if prefixes is None else prefixes)
    pred_iri = F.coalesce(
        *[F.when(F.col("pred") == k, F.lit(v)) for k, v in
          _PRED_IRIS.items()],
        F.col("pred"))
    t = triples
    if "obj_kind" not in t.columns:
        t = (t.withColumn("obj_kind",
                          F.when(F.col("pred") == "nif:anchorOf",
                                 "literal").otherwise("iri"))
             .withColumn("lang", F.lit(None).cast("string"))
             .withColumn("datatype", F.lit(None).cast("string")))
    lit_term = F.concat(
        F.lit('"'), _chain(F.col("obj"), _LITERAL_ESCAPES), F.lit('"'),
        F.when(F.col("lang").isNotNull(),
               F.concat(F.lit("@"), F.col("lang")))
        .when(F.col("datatype").isNotNull(),
              F.concat(F.lit("^^"), _iri_term(F.col("datatype"), p)))
        .otherwise(F.lit("")))
    obj_term = (F.when(F.col("obj_kind") == "literal", lit_term)
                .when(F.col("obj_kind") == "bnode", F.col("obj"))
                .otherwise(_iri_term(F.col("obj"), p)))
    subj_term = F.when(F.col("subj").startswith("_:"), F.col("subj")) \
        .otherwise(_iri_term(F.col("subj"), p))
    po = (t.select(subj_term.alias("s"),
                   _iri_term(pred_iri, p).alias("pt"),
                   obj_term.alias("ot"))
          .dropDuplicates()
          .groupBy("s")
          .agg(F.sort_array(F.collect_list(F.struct("pt", "ot")))
               .alias("arr")))
    body = F.aggregate(
        F.col("arr"),
        F.struct(F.lit("").alias("txt"),
                 F.lit(None).cast("string").alias("prev")),
        lambda acc, x: F.struct(
            F.concat(
                acc["txt"],
                F.when(acc["prev"].isNull(),
                       F.concat(x["pt"], F.lit(" ")))
                .when(acc["prev"] == x["pt"], F.lit(" , "))
                .otherwise(F.concat(F.lit(" ;\n    "), x["pt"],
                                    F.lit(" "))),
                x["ot"]).alias("txt"),
            x["pt"].alias("prev")),
        lambda acc: acc["txt"])
    return po.select(
        F.concat(F.col("s"), F.lit(" "), body, F.lit(" ."))
        .alias("turtle"))


def turtle_header(prefixes: dict[str, str] | None = None) -> str:
    """The ``@prefix`` block matching :func:`turtle_statements`'s
    compaction, sorted for stable bytes."""
    p = TURTLE_PREFIXES if prefixes is None else prefixes
    return "\n".join(f"@prefix {k}: <{v}> ."
                     for k, v in sorted(p.items()))


def write_turtle(triples: DataFrame, path: str,
                 prefixes: dict[str, str] | None = None,
                 compression: str = "gzip") -> None:
    """Materialize as sharded ``.ttl`` text. EVERY shard carries the
    ``@prefix`` header so each file is independently valid Turtle (the
    Wikidata-dump convention — a 1000-executor read never needs a
    side-channel header file). The per-partition header prepend is the
    one genuinely partition-imperative step, so it runs as an RDD
    ``mapPartitions`` over already-rendered strings (no per-row Python
    in the rendering itself)."""
    hdr = turtle_header(prefixes)
    blocks = turtle_statements(triples, prefixes)

    def with_header(it):
        first = True
        for row in it:
            if first:
                yield hdr
                first = False
            yield row[0]

    rdd = blocks.rdd.mapPartitions(with_header)
    df = blocks.sparkSession.createDataFrame(
        rdd.map(lambda s: (s,)), "value string")
    df.write.mode("overwrite").option("compression", compression) \
        .text(path)


# ---------------------------------------------------------------------------
# N-Quads (named-graph wire format — the quad twin of ntriples_lines)
# ---------------------------------------------------------------------------


def nquads_lines(quads: DataFrame) -> DataFrame:
    """Render a (subj, pred, obj[, graph]) table as W3C N-Quads lines.
    A null (or absent) ``graph`` means the default graph — the line is
    then a plain N-Triples statement, exactly the N-Quads grammar's
    optional-fourth-term rule, so one writer serves both the triple
    and the quad snapshots (``triples.as_quads``). Term rendering is
    identical to :func:`ntriples_lines` (same predicate-IRI expansion,
    same nif:anchorOf literal convention, same ECHAR / IRIREF escape
    chains); everything is JVM-side replace/concat algebra."""
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
    if "graph" in quads.columns:
        graph_term = F.when(
            F.col("graph").isNotNull(),
            F.concat(F.lit(" <"), _chain(F.col("graph"), _IRI_ESCAPES),
                     F.lit(">"))).otherwise(F.lit(""))
    else:
        graph_term = F.lit("")
    line = F.concat(
        F.lit("<"), _chain(F.col("subj"), _IRI_ESCAPES), F.lit("> <"),
        pred_iri, F.lit("> "), obj_term, graph_term, F.lit(" ."))
    return quads.select(line.alias("nquad"))


def write_nquads(quads: DataFrame, path: str,
                 compression: str = "gzip") -> None:
    """Materialize as sharded .nq text (gzip default, one file per
    partition — shard sizing is the caller's repartition decision,
    same contract as :func:`write_ntriples`)."""
    nquads_lines(quads).write.mode("overwrite") \
        .option("compression", compression).text(path)


# ---------------------------------------------------------------------------
# JSON-LD serializer (the S6 family's JSON graph shape: one compacted
# node object per subject, shard-independent @context)
# ---------------------------------------------------------------------------

# JSON string escapes, backslash FIRST (the _LITERAL_ESCAPES rule);
# the JSON grammar requires these five — control chars beyond \n\r\t
# don't occur in this engine's term space
_JSON_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                 ("\r", "\\r"), ("\t", "\\t"))


def _jsonld_iri(col: F.Column, prefixes: dict[str, str]) -> F.Column:
    """Prefix-compacted CURIE when the IRI sits in a declared
    namespace with a grammar-safe local part, else the raw IRI string
    (JSON-LD terms are JSON strings — no angle brackets, no percent
    escaping; JSON escapes applied by the caller). Longest namespace
    wins, mirroring the Turtle compactor."""
    import re as _re
    arms = []
    for pfx, ns in sorted(prefixes.items(),
                          key=lambda kv: (-len(kv[1]), kv[0])):
        pat = "^" + _re.escape(ns) + _PN_LOCAL_RE + "$"
        arms.append(F.when(
            col.rlike(pat),
            F.concat(F.lit(pfx + ":"),
                     F.substring(col, len(ns) + 1, 1 << 20))))
    return F.coalesce(*arms, col) if arms else col


def jsonld_statements(triples: DataFrame,
                      prefixes: dict[str, str] | None = None
                      ) -> DataFrame:
    """Render an RDF frame as compacted JSON-LD node objects — one row
    (column ``jsonld``) per SUBJECT: ``{"@id":"dbr:X","pred":[v,…],…}``
    with every value an expanded object (``{"@id":…}`` for IRIs,
    ``{"@value":…[,"@language"|"@type":…]}`` for literals), keys in
    deterministic sorted (pred, value) order and repeated predicates
    folded into one array. Accepts the readers' 6-column shape
    (subj, pred, obj, obj_kind, lang, datatype) or the bare
    (subj, pred, obj) engine convention (nif:anchorOf literal, rest
    IRIs — exactly ``ntriples_lines``).

    Same plan shape as ``turtle_statements``: one subject-keyed
    shuffle, strings built entirely JVM-side (replace chains + one
    sorted ``aggregate`` fold per subject)."""
    p = dict(TURTLE_PREFIXES if prefixes is None else prefixes)
    pred_iri = F.coalesce(
        *[F.when(F.col("pred") == k, F.lit(v)) for k, v in
          _PRED_IRIS.items()],
        F.col("pred"))
    t = triples
    if "obj_kind" not in t.columns:
        t = (t.withColumn("obj_kind",
                          F.when(F.col("pred") == "nif:anchorOf",
                                 "literal").otherwise("iri"))
             .withColumn("lang", F.lit(None).cast("string"))
             .withColumn("datatype", F.lit(None).cast("string")))

    def js(col):
        return _chain(col, _JSON_ESCAPES)

    lit_term = F.concat(
        F.lit('{"@value":"'), js(F.col("obj")), F.lit('"'),
        F.when(F.col("lang").isNotNull(),
               F.concat(F.lit(',"@language":"'), js(F.col("lang")),
                        F.lit('"')))
        .when(F.col("datatype").isNotNull(),
              F.concat(F.lit(',"@type":"'),
                       js(_jsonld_iri(F.col("datatype"), p)),
                       F.lit('"')))
        .otherwise(F.lit("")),
        F.lit("}"))
    obj_term = (F.when(F.col("obj_kind") == "literal", lit_term)
                .otherwise(F.concat(
                    F.lit('{"@id":"'),
                    js(_jsonld_iri(F.col("obj"), p)), F.lit('"}'))))
    po = (t.select(js(_jsonld_iri(F.col("subj"), p)).alias("s"),
                   js(_jsonld_iri(pred_iri, p)).alias("pt"),
                   obj_term.alias("jt"))
          .dropDuplicates()
          .groupBy("s")
          .agg(F.sort_array(F.collect_list(F.struct("pt", "jt")))
               .alias("arr")))
    body = F.aggregate(
        F.col("arr"),
        F.struct(F.lit("").alias("txt"),
                 F.lit(None).cast("string").alias("prev")),
        lambda acc, x: F.struct(
            F.concat(
                acc["txt"],
                F.when(acc["prev"].isNull(),
                       F.concat(F.lit('"'), x["pt"], F.lit('":[')))
                .when(acc["prev"] == x["pt"], F.lit(","))
                .otherwise(F.concat(F.lit('],"'), x["pt"],
                                    F.lit('":['))),
                x["jt"]).alias("txt"),
            x["pt"].alias("prev")),
        lambda acc: acc["txt"])
    return po.select(
        F.concat(F.lit('{"@id":"'), F.col("s"), F.lit('",'),
                 body, F.lit("]}")).alias("jsonld"))


def jsonld_context(prefixes: dict[str, str] | None = None) -> str:
    """The ``@context`` JSON matching :func:`jsonld_statements`'s
    compaction, sorted keys, compact separators — stable bytes."""
    import json
    p = TURTLE_PREFIXES if prefixes is None else prefixes
    return json.dumps(dict(sorted(p.items())), separators=(",", ":"))


def write_jsonld(triples: DataFrame, path: str,
                 prefixes: dict[str, str] | None = None,
                 compression: str = "gzip") -> None:
    """Materialize as sharded ``.jsonld`` text: every non-empty shard
    is an independently valid JSON-LD document
    ``{"@context":…,"@graph":[node, …]}`` (the per-shard-header
    convention of :func:`write_turtle` — no side-channel context
    file). The header/comma wrapping is the one partition-imperative
    step, so it runs as an RDD ``mapPartitions`` over already-rendered
    node strings."""
    ctx = jsonld_context(prefixes)
    nodes = jsonld_statements(triples, prefixes)

    def wrap(it):
        first = True
        for row in it:
            if first:
                yield '{"@context":' + ctx + ',"@graph":['
                yield row[0]
                first = False
            else:
                yield "," + row[0]
        if not first:
            yield "]}"

    rdd = nodes.rdd.mapPartitions(wrap)
    df = nodes.sparkSession.createDataFrame(
        rdd.map(lambda s: (s,)), "value string")
    df.write.mode("overwrite").option("compression", compression) \
        .text(path)
