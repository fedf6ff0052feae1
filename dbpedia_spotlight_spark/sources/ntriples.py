"""N-Triples / N-Quads reader — the ingestion twin of
``functions/output.py::ntriples_lines`` (SURVEY §2.1 S6, which only
renders). A KG-construction engine must also LOAD existing RDF dumps
(DBpedia publishes redirects / disambiguations / instance-types as
N-Triples), so this module parses the W3C N-Triples 1.1 / N-Quads 1.1
line grammar into the engine's triple-frame shape.

Scale design:
- one ``spark.read.text`` scan; a record is one line, so plain files
  split by range and gzip shards parallelize per file (same contract
  as the WARC source);
- the ENTIRE parse — term splitting, literal ECHAR unescaping, and
  numeric ``\\uXXXX`` / ``\\UXXXXXXXX`` UCHAR decoding (including
  legacy Java-style surrogate *pairs*) — is JVM-side column algebra:
  one master ``regexp_extract`` per term plus a tokenize-transform-join
  chain (``regexp_extract_all`` → ``transform`` → ``array_join``) for
  literal bodies. Zero Python UDFs, so the reader stays inside
  whole-stage codegen and scales with the scan.
- malformed lines degrade per-line (dropped from the parse, surfaced
  by :func:`ntriples_errors` for audit) — a 10^12-line dump with a few
  bad records must not fail the job.

Deliberate non-goals (documented, not bugs): IRIs are kept verbatim —
percent-escapes are *part of* an IRI, so ``%20`` is not decoded (the
writer's space→``%20`` encoding is therefore one-way, as in every
conformant N-Triples toolchain); no Turtle prefixes/lists (N-Triples
has none); surrogate-half ``\\uD800``-``\\uDFFF`` escapes outside a
pair decode to U+FFFD like Java's own charset machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbpedia_spotlight_spark.functions.output import _PRED_IRIS

# --- grammar fragments (Java regex source, kept tolerant where the
# spec is stricter: IRI content = anything but '>', bnode label = any
# non-blank run — real dumps violate the letter of the charset rules)
_IRI = r"<[^>]*>"
_BNODE = r"_:[^ \t]+"
_LITERAL = r'"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9\-]*|\^\^<[^>]*>)?'
_SUBJ = rf"(?:{_IRI}|{_BNODE})"
_OBJ = rf"(?:{_IRI}|{_BNODE}|{_LITERAL})"

_TRIPLE_RE = (rf"^[ \t]*({_SUBJ})[ \t]+({_IRI})[ \t]+({_OBJ})"
              rf"[ \t]*\.[ \t]*(?:#.*)?$")
_QUAD_RE = (rf"^[ \t]*({_SUBJ})[ \t]+({_IRI})[ \t]+({_OBJ})"
            rf"(?:[ \t]+({_SUBJ}))?[ \t]*\.[ \t]*(?:#.*)?$")
# a line that is only whitespace and/or a comment is legal and silent
_BLANK_RE = r"^[ \t]*(?:#.*)?$"

# literal-body tokenizer: ordered alternation — surrogate PAIR first
# (legacy Java writers emit astral chars as \uD8xx\uDCxx), then \U,
# then \u, then any other single escape, then a maximal plain run.
_TOKEN_RE = (r"\\u[Dd][89ABab][0-9A-Fa-f]{2}\\u[Dd][C-Fc-f][0-9A-Fa-f]{2}"
             r"|\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}|\\.|[^\\]+")

# ECHAR map (N-Triples 1.1 grammar) — the inverse of the writer's
# _LITERAL_ESCAPES plus the grammar's extra \b \f \' forms
_ECHARS = (("\\t", "\t"), ("\\b", "\b"), ("\\n", "\n"), ("\\r", "\r"),
           ("\\f", "\f"), ('\\"', '"'), ("\\'", "'"), ("\\\\", "\\"))


def _unescape_token(tok: F.Column) -> F.Column:
    """Decode ONE token from the literal-body tokenizer: a surrogate
    pair (12 chars) via UTF-16BE, ``\\UXXXXXXXX`` / ``\\uXXXX`` via
    UTF-32 (JDK charsets — all native), an ECHAR via a literal map,
    anything else verbatim. Unknown ``\\x`` escapes keep x (the
    common tolerant-parser behavior)."""
    first2 = F.substring(tok, 1, 2)
    echar = None
    for esc, plain in _ECHARS:
        cond = first2 == F.lit(esc)
        echar = (F.when(cond, F.lit(plain)) if echar is None
                 else echar.when(cond, F.lit(plain)))
    surrogate = F.decode(
        F.unhex(F.concat(F.substring(tok, 3, 4), F.substring(tok, 9, 4))),
        "UTF-16BE")
    astral = F.decode(F.unhex(F.substring(tok, 3, 8)), "UTF-32")
    bmp = F.decode(F.unhex(F.lpad(F.substring(tok, 3, 4), 8, "0")), "UTF-32")
    # a lone surrogate half OUTSIDE a pair (the pair branch fired first)
    # must become U+FFFD explicitly: left to the JVM, the UTF-32 decode
    # round-trips it into an unpaired char that the String→UTF-8 encode
    # then flattens to '?' — pinned here so both RDF readers (this one
    # and the Turtle parser's python twin) agree byte-for-byte on
    # hazard strings (tests/test_turtle_source.py pins the contract)
    lone_half = F.upper(F.substring(tok, 3, 2)).rlike("^D[89A-F]")
    lone_half_u = F.upper(F.substring(tok, 3, 8)).rlike("^0000D[89A-F]")
    return (
        F.when((F.length(tok) == 12) & (first2 == "\\u"), surrogate)
        .when((first2 == "\\U") & lone_half_u, F.lit("�"))
        .when(first2 == "\\U", astral)
        .when((first2 == "\\u") & lone_half, F.lit("�"))
        .when(first2 == "\\u", bmp)
        .when(F.substring(tok, 1, 1) == "\\",
              F.coalesce(echar, F.substring(tok, 2, 1)))
        .otherwise(tok))


def _unescape_literal(body: F.Column) -> F.Column:
    """N-Triples literal-body unescape as pure column algebra. A
    sequential replace chain cannot do this (``\\\\n`` = escaped
    backslash + n must NOT become a newline), so the body is tokenized
    into escape-or-plain runs first; each token decodes independently."""
    toks = F.regexp_extract_all(body, F.lit(f"({_TOKEN_RE})"), 1)
    return F.array_join(F.transform(toks, _unescape_token), "")


def _term_columns(term: F.Column):
    """Decompose one object term into (obj, obj_kind, lang, datatype).
    IRIs are stripped of <>; literal bodies are unescaped; blank nodes
    pass through with their ``_:`` label."""
    is_iri = F.substring(term, 1, 1) == "<"
    is_lit = F.substring(term, 1, 1) == '"'
    body = F.regexp_extract(term, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract(term, r'"@([A-Za-z][A-Za-z0-9\-]*)$', 1)
    dtype = F.regexp_extract(term, r"\^\^<([^>]*)>$", 1)
    obj = (F.when(is_iri, F.expr("substring(term, 2, length(term) - 2)"))
           .when(is_lit, _unescape_literal(body))
           .otherwise(term))
    kind = (F.when(is_iri, F.lit("iri"))
            .when(is_lit, F.lit("literal"))
            .otherwise(F.lit("bnode")))
    null_if_empty = lambda c: F.when(c != "", c)  # noqa: E731
    return obj, kind, null_if_empty(lang), null_if_empty(dtype)


def _strip_iri(c: F.Column) -> F.Column:
    return F.regexp_extract(c, r"^<(.*)>$", 1)


def parse_ntriples(lines: DataFrame, col: str = "value",
                   quads: bool = False) -> DataFrame:
    """Parse N-Triples (``quads=False``) or N-Quads lines into
    ``(subj, pred, obj, obj_kind, lang, datatype[, graph])``.

    ``subj``/``graph`` are IRIs (stripped of angle brackets) or
    ``_:label`` blank-node tokens; ``pred`` is always an IRI; ``obj``
    is an IRI, a blank-node token, or the UNESCAPED literal body with
    ``lang``/``datatype`` split out (null when absent; a quadless
    N-Quads line yields ``graph`` null = the default graph).
    Malformed lines are dropped — audit them with
    :func:`ntriples_errors`."""
    rex = _QUAD_RE if quads else _TRIPLE_RE
    raw = lines.select(F.col(col).alias("line"))
    parsed = raw.select(
        F.regexp_extract("line", rex, 1).alias("s_term"),
        F.regexp_extract("line", rex, 2).alias("p_term"),
        F.regexp_extract("line", rex, 3).alias("term"),
        *([F.regexp_extract("line", rex, 4).alias("g_term")]
          if quads else []),
    ).filter(F.col("s_term") != "")
    obj, kind, lang, dtype = _term_columns(F.col("term"))
    subj = F.when(F.substring("s_term", 1, 1) == "<",
                  _strip_iri(F.col("s_term"))).otherwise(F.col("s_term"))
    out = [subj.alias("subj"), _strip_iri(F.col("p_term")).alias("pred"),
           obj.alias("obj"), kind.alias("obj_kind"),
           lang.alias("lang"), dtype.alias("datatype")]
    if quads:
        g = (F.when(F.col("g_term") == "", F.lit(None).cast("string"))
             .when(F.substring("g_term", 1, 1) == "<",
                   _strip_iri(F.col("g_term")))
             .otherwise(F.col("g_term")))
        out.append(g.alias("graph"))
    return parsed.select(*out)


def ntriples_errors(lines: DataFrame, col: str = "value",
                    quads: bool = False) -> DataFrame:
    """The audit complement of :func:`parse_ntriples`: every line that
    is neither a valid statement nor blank/comment-only. At scale this
    is the side output a load job writes next to the table."""
    rex = _QUAD_RE if quads else _TRIPLE_RE
    return (lines.select(F.col(col).alias("line"))
            .filter(~F.col("line").rlike(rex))
            .filter(~F.col("line").rlike(_BLANK_RE)))


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Load an ``.nt`` / ``.nt.gz`` dump (one statement per line)."""
    return parse_ntriples(spark.read.text(path))


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Load an ``.nq`` / ``.nq.gz`` dump (named-graph quads)."""
    return parse_ntriples(spark.read.text(path), quads=True)


RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


def subclass_edges(parsed: DataFrame) -> DataFrame:
    """(sub, sup) rdfs:subClassOf edges from a parsed RDF frame — the
    shape ``operators/ontology.py::subclass_closure`` consumes, so a
    published ontology dump loads directly:
    ``subclass_closure(subclass_edges(read_ntriples(spark, path)))``.
    Accepts both the full IRI and the engine's compact
    ``rdfs:subClassOf`` spelling."""
    return (parsed.filter(F.col("pred").isin(RDFS_SUBCLASS,
                                             "rdfs:subClassOf"))
            .filter(F.col("obj_kind") != "literal")
            .select(F.col("subj").alias("sub"),
                    F.col("obj").alias("sup")))


def triples_from_rdf(parsed: DataFrame) -> DataFrame:
    """Adapt a parsed RDF frame to the engine's compact triple shape:
    full predicate IRIs the writer expands (nif:anchorOf,
    itsrdf:taIdentRef) compact back so
    ``triples_from_rdf(parse_ntriples(ntriples_lines(t))) ≡ t`` for
    IRI-clean subjects; unknown predicates keep their full IRI (the
    engine's BGP/ontology operators treat predicates opaquely)."""
    compact = F.coalesce(
        *[F.when(F.col("pred") == iri, F.lit(short))
          for short, iri in _PRED_IRIS.items()],
        F.col("pred"))
    return parsed.select("subj", compact.alias("pred"), "obj")
