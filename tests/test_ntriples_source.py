"""N-Triples / N-Quads reader (sources/ntriples.py): grammar lanes,
escape round-trips against the engine's own writer, UCHAR decoding,
malformed-line audit, file round-trip through the gzip sink, and the
zero-Python-UDF plan pin.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.output import (
    ntriples_lines, write_ntriples,
)
from dbpedia_spotlight_spark.sources.ntriples import (
    ntriples_errors, parse_ntriples, read_ntriples, triples_from_rdf,
)


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_grammar_lanes(spark):
    lines = [
        "<http://a/s> <http://p> <http://o> .",
        '  <http://s2> <http://p> "say \\"hi\\"\\n tail\\\\" . # cmt',
        '<http://s3> <http://p> "caf\\u00e9 \\U0001F600 '
        '\\uD83D\\uDE00 x\\\\u0041"@en .',
        '_:b1 <http://p> "3.14"'
        "^^<http://www.w3.org/2001/XMLSchema#double> .",
        "# full comment line",
        "",
        "garbage line without dot",
        "<http://s4> <http://p> _:b2 .",
    ]
    rows = {r["subj"]: r for r in
            parse_ntriples(_lines_df(spark, lines)).collect()}
    assert rows["http://a/s"]["obj"] == "http://o"
    assert rows["http://a/s"]["obj_kind"] == "iri"
    assert rows["http://s2"]["obj"] == 'say "hi"\n tail\\'
    # \uXXXX, \UXXXXXXXX and a legacy surrogate PAIR all decode; the
    # escaped backslash before u0041 keeps the sequence literal
    assert rows["http://s3"]["obj"] == "café \U0001F600 " \
                                       "\U0001F600 x\\u0041"
    assert rows["http://s3"]["lang"] == "en"
    assert rows["_:b1"]["datatype"].endswith("#double")
    assert rows["_:b1"]["obj"] == "3.14"
    assert rows["http://s4"]["obj_kind"] == "bnode"
    assert len(rows) == 5
    errs = [r["line"] for r in ntriples_errors(_lines_df(spark, lines))
            .collect()]
    assert errs == ["garbage line without dot"]


def test_nquads_graph_column(spark):
    lines = [
        "<http://s> <http://p> <http://o> <http://g> .",
        '<http://s> <http://p> "lit"@fr <http://g2> .',
        "<http://s> <http://p> <http://o2> .",
        "<http://s> <http://p> <http://o3> _:g3 .",
    ]
    rows = parse_ntriples(_lines_df(spark, lines), quads=True) \
        .orderBy("obj").collect()
    assert [r["obj"] for r in rows] == \
        ["http://o", "http://o2", "http://o3", "lit"]
    assert [r["graph"] for r in rows] == \
        ["http://g", None, "_:g3", "http://g2"]
    assert rows[3]["lang"] == "fr"


def test_writer_parse_roundtrip_seeded_fuzz(spark):
    """ntriples_lines → parse_ntriples → triples_from_rdf is the
    identity on the engine's own output for IRI-clean subjects/objects
    and ARBITRARY literal anchors: 500 seeded strings over a hazard
    alphabet (quotes, backslashes, newlines, tabs, astral plane)."""
    rng = random.Random(20260819)
    hazard = list("ab\\\"'\n\r\t\f\b") + ["é", "\U0001F600", "§", " "]
    triples = []
    for i in range(500):
        lit = "".join(rng.choice(hazard) for _ in range(rng.randrange(12)))
        triples.append((f"http://d/{i}#char=0,5", "nif:anchorOf", lit))
        triples.append((f"http://d/{i}#char=0,5", "itsrdf:taIdentRef",
                        f"http://dbpedia.org/resource/E{i % 37}"))
    t = spark.createDataFrame(triples, "subj string, pred string, obj string")
    back = triples_from_rdf(parse_ntriples(ntriples_lines(t),
                                           col="ntriple"))
    orig = sorted(map(tuple, t.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig


def test_file_roundtrip_gzip(spark, tmp_path):
    t = spark.createDataFrame(
        [(f"http://d/{i}", "itsrdf:taIdentRef", f"http://e/{i % 7}")
         for i in range(50)],
        "subj string, pred string, obj string")
    out = str(tmp_path / "dump_nt")
    write_ntriples(t, out)
    back = triples_from_rdf(read_ntriples(spark, out))
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, t.collect()))


def test_parse_plan_is_pure_jvm(spark):
    """The whole parse — terms, ECHAR unescape, UCHAR decode — must
    stay in JVM column algebra: no Python-UDF eval node may appear
    (the reader's scale contract; SURVEY §2.1 S6)."""
    df = parse_ntriples(_lines_df(spark, ["<a> <b> <c> ."]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # a reader is one scan, no shuffle


def test_nt_ontology_drives_kg_maintain(spark, tmp_path, web_pages,
                                        lexicon):
    """--ontology accepts an N-Triples dump: the rdfs:subClassOf
    statements drive the entailment store exactly like the parquet
    edge form (the published-ontology ingestion path)."""
    import gzip

    from dbpedia_spotlight_spark.datagen import write_lexicon
    from dbpedia_spotlight_spark.run_kg_maintain import main
    from dbpedia_spotlight_spark.streaming.kg_stream import EntailStore

    pages_dir = str(tmp_path / "pages")
    lex_dir = str(tmp_path / "lexicon")
    web_pages.write.mode("overwrite").parquet(pages_dir)
    write_lexicon(spark, lexicon, lex_dir)
    types_present = sorted(lexicon.entities["types"].explode().unique())
    nt_path = tmp_path / "onto.nt.gz"
    with gzip.open(nt_path, "wt") as f:
        f.write("# planted ontology\n")
        for t in types_present:
            f.write(f"<{t}> <http://www.w3.org/2000/01/rdf-schema#"
                    f"subClassOf> <owl:Thing> .\n")
    onto_pq = str(tmp_path / "onto_pq")
    spark.createDataFrame([(t, "owl:Thing") for t in types_present],
                          "sub string, sup string") \
        .write.parquet(onto_pq)

    s_nt = main(["--pages", pages_dir, "--lexicon", lex_dir,
                 "--kg", str(tmp_path / "kg_nt"),
                 "--entail", str(tmp_path / "ent_nt"),
                 "--ontology", str(nt_path)], spark=spark)
    s_pq = main(["--pages", pages_dir, "--lexicon", lex_dir,
                 "--kg", str(tmp_path / "kg_pq"),
                 "--entail", str(tmp_path / "ent_pq"),
                 "--ontology", onto_pq], spark=spark)
    assert s_nt["entail"]["entailed_added"] == \
        s_pq["entail"]["entailed_added"] > 0
    got_nt = {(r.subj, r.obj) for r in EntailStore(
        spark, str(tmp_path / "ent_nt")).read_entailed().collect()}
    got_pq = {(r.subj, r.obj) for r in EntailStore(
        spark, str(tmp_path / "ent_pq")).read_entailed().collect()}
    assert got_nt == got_pq and len(got_nt) > 0
