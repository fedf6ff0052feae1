"""Turtle reader (sources/turtle.py): grammar lanes (prefixes, 'a',
predicate/object lists, bnode property lists, collections, all literal
forms), @base resolution semantics, escape-hazard agreement with the
N-Triples reader, malformed-document audit + strict mode, .ttl/.ttl.gz
file round-trip, --ontology parity with the .nt path, and the
single-mapInPandas plan pin.
"""

from __future__ import annotations

import gzip

import pytest

from dbpedia_spotlight_spark.sources.ntriples import parse_ntriples
from dbpedia_spotlight_spark.sources.turtle import (
    RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, TurtleSyntaxError,
    parse_turtle, parse_turtle_text, read_turtle, turtle_errors,
)

XSD = "http://www.w3.org/2001/XMLSchema#"

GRAMMAR_DOC = """\
@prefix ex: <http://example.org/> .
@base <http://base.org/dir/> .

ex:alice a ex:Person ;
    ex:name "Alice"@en , "Alicia"@es ;
    ex:age 42 ;
    ex:height 1.75 ;
    ex:ratio .5E-2 ;
    ex:knows [ ex:name "Bob" ; ex:likes ( ex:pizza ex:tea ) ] ;
    ex:page <rel/path> , </rooted> , <#frag> , <//other.net/x> .

_:x ex:p '''multi
line "quoted"''' ; ex:q true , -3.2e4 .
ex:esc\\.dot ex:b 'single' .
"""


def test_grammar_lanes():
    rows = parse_turtle_text(GRAMMAR_DOC)
    by_po = {(r[1], r[3]): r for r in rows}
    ex = "http://example.org/"
    # 'a' keyword
    assert (ex + "alice", RDF_TYPE, ex + "Person", "iri", None, None) \
        in rows
    # object list keeps both language-tagged forms
    names = {(r[2], r[4]) for r in rows if r[1] == ex + "name"
             and r[0] == ex + "alice"}
    assert names == {("Alice", "en"), ("Alicia", "es")}
    # numeric abbreviations: lexical form VERBATIM + correct datatype
    nums = {r[1]: (r[2], r[5]) for r in rows if r[5] and "XMLSchema" in r[5]
            and r[0] in (ex + "alice", "_:x")}
    assert nums[ex + "age"] == ("42", XSD + "integer")
    assert nums[ex + "height"] == ("1.75", XSD + "decimal")
    assert nums[ex + "ratio"] == (".5E-2", XSD + "double")
    assert nums[ex + "q"] in {("true", XSD + "boolean"),
                              ("-3.2e4", XSD + "double")}
    # anonymous bnode property list: fresh _:b0, linked from alice
    knows = by_po[(ex + "knows", "bnode")]
    bob = knows[2]
    assert bob.startswith("_:b")
    assert (bob, ex + "name", "Bob", "literal", None, None) in rows
    # collection lowered to first/rest/nil in order
    likes = next(r[2] for r in rows if r[1] == ex + "likes")
    firsts, node = [], likes
    while node != RDF_NIL:
        cell = {r[1]: r[2] for r in rows if r[0] == node}
        firsts.append(cell[RDF_FIRST])
        node = cell[RDF_REST]
    assert firsts == [ex + "pizza", ex + "tea"]
    # @base resolution: relative-path / rooted / fragment / network
    pages = {r[2] for r in rows if r[1] == ex + "page"}
    assert pages == {"http://base.org/dir/rel/path",
                     "http://base.org/rooted",
                     "http://base.org/dir/#frag",
                     "http://other.net/x"}
    # labeled bnode subject passes through; triple-quoted multiline
    assert ("_:x", ex + "p", 'multi\nline "quoted"', "literal",
            None, None) in rows
    # PN_LOCAL_ESC dot + single-quoted literal
    assert (ex + "esc.dot", ex + "b", "single", "literal",
            None, None) in rows


def test_directives_apply_from_declaration_onward():
    doc = """\
@prefix p: <http://one.org/> .
p:s p:p p:o .
@prefix p: <http://two.org/> .
@base <http://b.org/a/> .
p:s p:p <x> .
BASE <http://c.org/>
PREFIX q: <http://three.org/>
q:s q:p <y> .
"""
    rows = parse_turtle_text(doc)
    assert rows[0][:3] == ("http://one.org/s", "http://one.org/p",
                           "http://one.org/o")
    assert rows[1][:3] == ("http://two.org/s", "http://two.org/p",
                           "http://b.org/a/x")
    # SPARQL-cased directive forms (no trailing dot) rebind both
    assert rows[2][:3] == ("http://three.org/s", "http://three.org/p",
                           "http://c.org/y")


def test_escape_agreement_with_ntriples(spark):
    """Cross-reader contract: the same hazard literal decodes to the
    same python string through both readers (ECHARs, astral UCHAR,
    legacy surrogate pair, lone surrogate half, escaped backslash)."""
    body = ('say \\"hi\\"\\n tail\\\\ caf\\u00e9 \\U0001F600 '
            '\\uD83D\\uDE00 \\uD800 \\U0000DC00 x\\\\u0041')
    nt = f'<http://s> <http://p> "{body}"@en .'
    ttl = f'<http://s> <http://p> "{body}"@en .'
    nt_obj = parse_ntriples(
        spark.createDataFrame([(nt,)], "value string")).collect()[0]["obj"]
    ttl_obj = parse_turtle_text(ttl)[0][2]
    assert nt_obj == ttl_obj
    assert "café" in ttl_obj and "\U0001F600" in ttl_obj
    assert "�" in ttl_obj and "x\\u0041" in ttl_obj


def test_error_audit_and_strict(spark):
    good = "@prefix ex: <http://e/> . ex:s ex:p ex:o ."
    bad = "@prefix ex: <http://e/> .\nex:s ex:p ."   # missing object
    undeclared = "zz:s zz:p zz:o ."                   # unknown prefix
    docs = spark.createDataFrame(
        [(good, "a.ttl"), (bad, "b.ttl"), (undeclared, "c.ttl")],
        "value string, path string")
    parsed = parse_turtle(docs).collect()
    assert {(r.subj, r.obj) for r in parsed} == {("http://e/s",
                                                  "http://e/o")}
    errs = {r.path: (r.line, r.error)
            for r in turtle_errors(docs, path_col="path").collect()}
    assert set(errs) == {"b.ttl", "c.ttl"}
    line, reason = errs["b.ttl"]
    assert line == 2 and reason
    with pytest.raises(Exception, match="line|prefix"):
        parse_turtle(docs, errors="strict").collect()
    with pytest.raises(ValueError):
        parse_turtle(docs, errors="bogus")


def test_file_roundtrip_gzip(spark, tmp_path):
    d = tmp_path / "dump"
    d.mkdir()
    (d / "shard0.ttl").write_text(GRAMMAR_DOC)
    with gzip.open(d / "shard1.ttl.gz", "wt") as f:
        f.write("@prefix ex: <http://example.org/> .\n"
                "ex:gz ex:p ex:o .\n")
    rows = read_turtle(spark, str(d)).collect()
    subjects = {r.subj for r in rows}
    assert "http://example.org/gz" in subjects
    assert "http://example.org/alice" in subjects
    # every tuple from the in-memory parse arrives through the file path
    mem = set(parse_turtle_text(GRAMMAR_DOC))
    got = {tuple(r) for r in rows}
    assert mem <= got


def test_plan_is_single_arrow_stage(spark, tmp_path):
    (tmp_path / "x.ttl").write_text(GRAMMAR_DOC)
    plan = read_turtle(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    # one Arrow-batched python eval over the wholetext scan, no shuffle
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") >= 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan   # no row-at-a-time python


def test_ttl_ontology_drives_kg_maintain(spark, tmp_path, web_pages,
                                         lexicon):
    """--ontology accepts a Turtle dump and entails identically to the
    equivalent N-Triples dump (the published-vocabulary path: most
    ontologies ship .ttl)."""
    from dbpedia_spotlight_spark.datagen import write_lexicon
    from dbpedia_spotlight_spark.run_kg_maintain import main
    from dbpedia_spotlight_spark.streaming.kg_stream import EntailStore

    pages_dir = str(tmp_path / "pages")
    lex_dir = str(tmp_path / "lexicon")
    web_pages.write.mode("overwrite").parquet(pages_dir)
    write_lexicon(spark, lexicon, lex_dir)
    types_present = sorted(lexicon.entities["types"].explode().unique())
    ttl_path = tmp_path / "onto.ttl"
    with open(ttl_path, "w") as f:
        f.write("@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#>"
                " .\n")
        for t in types_present:
            f.write(f"<{t}> rdfs:subClassOf <owl:Thing> .\n")
    nt_path = tmp_path / "onto.nt"
    with open(nt_path, "w") as f:
        for t in types_present:
            f.write(f"<{t}> <http://www.w3.org/2000/01/rdf-schema#"
                    f"subClassOf> <owl:Thing> .\n")

    s_ttl = main(["--pages", pages_dir, "--lexicon", lex_dir,
                  "--kg", str(tmp_path / "kg_t"),
                  "--entail", str(tmp_path / "ent_t"),
                  "--ontology", str(ttl_path)], spark=spark)
    s_nt = main(["--pages", pages_dir, "--lexicon", lex_dir,
                 "--kg", str(tmp_path / "kg_n"),
                 "--entail", str(tmp_path / "ent_n"),
                 "--ontology", str(nt_path)], spark=spark)
    assert s_ttl["entail"]["entailed_added"] == \
        s_nt["entail"]["entailed_added"] > 0
    got_t = {(r.subj, r.obj) for r in EntailStore(
        spark, str(tmp_path / "ent_t")).read_entailed().collect()}
    got_n = {(r.subj, r.obj) for r in EntailStore(
        spark, str(tmp_path / "ent_n")).read_entailed().collect()}
    assert got_t == got_n and len(got_t) > 0


# ---------------------------------------------------------------------------
# Turtle WRITER (functions/output.py::turtle_statements / write_turtle)
# ---------------------------------------------------------------------------

_W_TRIPLES = [
    # prefix-compactable IRI o, repeated pred -> ',' grouping
    ("http://dbpedia.org/resource/Berlin",
     "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://dbpedia.org/ontology/City", "iri", None, None),
    ("http://dbpedia.org/resource/Berlin",
     "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://dbpedia.org/ontology/Place", "iri", None, None),
    # literal with ECHAR hazards + lang
    ("http://dbpedia.org/resource/Berlin",
     "http://www.w3.org/2000/01/rdf-schema#label",
     'Ber"lin\n\ttail\\', "literal", "de", None),
    # typed literal (compactable datatype)
    ("http://dbpedia.org/resource/Berlin",
     "http://dbpedia.org/ontology/population",
     "3769000", "literal", None,
     "http://www.w3.org/2001/XMLSchema#integer"),
    # non-compactable IRI (space + local part with slash), bnode obj
    ("https://host3.example/d/9#char=0,5",
     "http://www.w3.org/2005/11/its/rdf#taIdentRef",
     "http://dbpedia.org/resource/Ent 7", "iri", None, None),
    ("_:b0", "http://dbpedia.org/ontology/near",
     "_:b1", "bnode", None, None),
]


def _writer_frame(spark):
    return spark.createDataFrame(
        _W_TRIPLES,
        "subj string, pred string, obj string, obj_kind string, "
        "lang string, datatype string")


def test_turtle_statements_shape(spark):
    from dbpedia_spotlight_spark.functions.output import turtle_statements
    rows = {r.turtle for r in
            turtle_statements(_writer_frame(spark)).collect()}
    berlin = next(s for s in rows if s.startswith("dbr:Berlin"))
    # one block, ';'-joined preds, ','-joined repeated-pred objects,
    # deterministic sort: dbo:population < rdf:type < rdfs:label
    assert berlin == (
        'dbr:Berlin dbo:population "3769000"^^xsd:integer ;\n'
        '    rdf:type dbo:City , dbo:Place ;\n'
        '    rdfs:label "Ber\\"lin\\n\\ttail\\\\"@de .')
    assert any(s.startswith("_:b0 dbo:near _:b1") for s in rows)
    spaced = next(s for s in rows if "host3" in s)
    assert "<http://dbpedia.org/resource/Ent%207>" in spaced


def test_turtle_writer_roundtrip(spark, tmp_path):
    """write_turtle -> read_turtle is the identity on the RDF graph
    (modulo the one-way %-encoding of the spaced IRI), and every
    shard is independently parseable (header in each file)."""
    from dbpedia_spotlight_spark.functions.output import write_turtle
    df = _writer_frame(spark).repartition(3)
    out = tmp_path / "kg.ttl"
    write_turtle(df, str(out), compression="none")
    back = read_turtle(spark, str(out))
    got = {tuple(r) for r in back.collect()}
    want = {tuple(t) for t in _W_TRIPLES}
    want = {(s, p, o.replace(" ", "%20"), k, lg, dt)
            for s, p, o, k, lg, dt in want}
    assert got == want
    # each non-empty part file parses standalone
    import pathlib
    for f in pathlib.Path(out).glob("part-*"):
        text = f.read_text()
        if text.strip():
            assert text.startswith("@prefix"), f
            parse_turtle_text(text)


def test_turtle_internal_three_column_form(spark):
    """A bare (subj, pred, obj) frame gets the engine's internal
    convention (nif:anchorOf literal, compact preds expand then
    recompact)."""
    from dbpedia_spotlight_spark.functions.output import turtle_statements
    df = spark.createDataFrame(
        [("https://h/d#char=0,5", "nif:anchorOf", "Berlin city"),
         ("https://h/d#char=0,5", "itsrdf:taIdentRef",
          "http://dbpedia.org/resource/Berlin")],
        "subj string, pred string, obj string")
    [row] = turtle_statements(df).collect()
    assert row.turtle == ('<https://h/d#char=0,5> '
                          'itsrdf:taIdentRef dbr:Berlin ;\n'
                          '    nif:anchorOf "Berlin city" .')
