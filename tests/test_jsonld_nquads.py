"""JSON-LD + N-Quads writers (functions/output.py — S6 family):
node objects must be valid JSON with deterministic key/array order,
every non-empty shard an independently valid JSON-LD document whose
context-expansion recovers the input graph; N-Quads must follow the
optional-fourth-term grammar and agree with ntriples_lines on the
default graph."""

from __future__ import annotations

import json
import pathlib

import pytest

from tests.test_turtle_source import _W_TRIPLES, _writer_frame

# prefix map used by the default context (mirrors TURTLE_PREFIXES)
from dbpedia_spotlight_spark.functions.output import TURTLE_PREFIXES


def _expand(term: str) -> str:
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in TURTLE_PREFIXES:
            return TURTLE_PREFIXES[pfx] + local
    return term


def _node_triples(node: dict):
    """JSON-LD node object -> set of 6-tuples in the readers' shape."""
    subj = _expand(node["@id"])
    out = set()
    for pred, vals in node.items():
        if pred == "@id":
            continue
        for v in vals:
            if "@id" in v:
                kind = "bnode" if v["@id"].startswith("_:") else "iri"
                out.add((subj, _expand(pred), _expand(v["@id"]),
                         kind, None, None))
            else:
                out.add((subj, _expand(pred), v["@value"], "literal",
                         v.get("@language"),
                         _expand(v["@type"]) if "@type" in v else None))
    return out


def test_jsonld_nodes_valid_and_deterministic(spark):
    from dbpedia_spotlight_spark.functions.output import jsonld_statements
    rows = sorted(r.jsonld for r in
                  jsonld_statements(_writer_frame(spark)).collect())
    nodes = [json.loads(r) for r in rows]
    berlin = next(n for n in nodes if n["@id"] == "dbr:Berlin")
    # sorted keys, repeated pred folded to a sorted array
    assert list(berlin) == ["@id", "dbo:population", "rdf:type",
                            "rdfs:label"]
    assert berlin["rdf:type"] == [{"@id": "dbo:City"},
                                  {"@id": "dbo:Place"}]
    assert berlin["rdfs:label"] == [
        {"@value": 'Ber"lin\n\ttail\\', "@language": "de"}]
    assert berlin["dbo:population"] == [
        {"@value": "3769000", "@type": "xsd:integer"}]
    # non-compactable IRI stays raw (JSON needs no %-encoding)
    spaced = next(n for n in nodes if "host3" in n["@id"])
    assert spaced["itsrdf:taIdentRef"] == [
        {"@id": "http://dbpedia.org/resource/Ent 7"}]
    # bnodes keep their _: labels
    assert any(n["@id"] == "_:b0" for n in nodes)


def test_jsonld_graph_equals_input(spark):
    from dbpedia_spotlight_spark.functions.output import jsonld_statements
    nodes = [json.loads(r.jsonld) for r in
             jsonld_statements(_writer_frame(spark)).collect()]
    got = set().union(*(_node_triples(n) for n in nodes))
    assert got == {tuple(t) for t in _W_TRIPLES}


def test_jsonld_three_column_form(spark):
    from dbpedia_spotlight_spark.functions.output import jsonld_statements
    df = spark.createDataFrame(
        [("https://h/d#char=0,5", "nif:anchorOf", "Berlin city"),
         ("https://h/d#char=0,5", "itsrdf:taIdentRef",
          "http://dbpedia.org/resource/Berlin")],
        "subj string, pred string, obj string")
    node = json.loads(jsonld_statements(df).collect()[0].jsonld)
    assert node["itsrdf:taIdentRef"] == [{"@id": "dbr:Berlin"}]
    assert node["nif:anchorOf"] == [{"@value": "Berlin city"}]


def test_write_jsonld_shards_standalone(spark, tmp_path):
    from dbpedia_spotlight_spark.functions.output import write_jsonld
    out = tmp_path / "kg.jsonld"
    write_jsonld(_writer_frame(spark).repartition(3), str(out),
                 compression="none")
    got = set()
    n_docs = 0
    for f in pathlib.Path(out).glob("part-*"):
        text = f.read_text()
        if not text.strip():
            continue
        doc = json.loads(text)          # each shard: one valid doc
        assert set(doc) == {"@context", "@graph"}
        assert doc["@context"]["dbr"] == "http://dbpedia.org/resource/"
        n_docs += 1
        got |= set().union(*(_node_triples(n) for n in doc["@graph"]))
    assert n_docs >= 1
    assert got == {tuple(t) for t in _W_TRIPLES}


def test_nquads_lines(spark):
    from dbpedia_spotlight_spark.functions.output import (
        nquads_lines, ntriples_lines)
    quads = spark.createDataFrame(
        [("https://h/d#char=0,5", "nif:anchorOf", 'B"c\n',
          "https://crawl.example/2024-01"),
         ("https://h/d#char=0,5", "itsrdf:taIdentRef",
          "http://dbpedia.org/resource/Ent 7", None)],
        "subj string, pred string, obj string, graph string")
    lines = {r.nquad for r in nquads_lines(quads).collect()}
    assert ('<https://h/d#char=0,5> '
            '<http://persistence.uni-leipzig.org/nlp2rdf/ontologies/'
            'nif-core#anchorOf> "B\\"c\\n" '
            '<https://crawl.example/2024-01> .') in lines
    # null graph -> default graph -> plain triple line, byte-equal to
    # the N-Triples writer
    nt = {r.ntriple for r in
          ntriples_lines(quads.filter("graph IS NULL")
                         .drop("graph")).collect()}
    assert nt <= lines
    # a graph-less frame serializes identically to all-null graphs
    bare = {r.nquad for r in
            nquads_lines(quads.drop("graph")).collect()}
    assert all(l.count("<") >= 2 for l in bare)


def test_write_nquads_roundtrip_gzip(spark, tmp_path):
    from dbpedia_spotlight_spark.functions.output import write_nquads
    quads = spark.createDataFrame(
        [(f"https://h/d{i}", "itsrdf:taIdentRef",
          f"http://dbpedia.org/resource/E{i}",
          None if i % 2 else f"https://g/{i}") for i in range(10)],
        "subj string, pred string, obj string, graph string")
    out = tmp_path / "kg.nq"
    write_nquads(quads, str(out))
    back = spark.read.text(str(out))
    lines = [r.value for r in back.collect()]
    assert len(lines) == 10
    assert all(l.endswith(" .") for l in lines)
    assert sum("<https://g/" in l for l in lines) == 5
