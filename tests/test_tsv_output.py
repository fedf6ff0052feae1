"""S5 TSV importers round-trip through the model compile; S6 JSON/XML
serializers render well-formed per-document output."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.pipeline import PipelineConfig, annotate


@pytest.fixture(scope="module")
def tsv_dir(tmp_path_factory, lexicon):
    """Write the session lexicon out as wikistats-style TSVs."""
    d = tmp_path_factory.mktemp("wikistats")
    sf_by_id = dict(zip(lexicon.surface_forms["sf_id"],
                        lexicon.surface_forms["sf"]))
    uri_by_id = dict(zip(lexicon.entities["entity_id"],
                         lexicon.entities["uri"]))
    tok_by_id = dict(zip(lexicon.token_types["token_id"],
                         lexicon.token_types["token"]))

    with open(d / "uriCounts.tsv", "w") as f:
        for _, r in lexicon.entities.iterrows():
            f.write(f"{r['uri']}\t{r['support']}\n")
    with open(d / "pairCounts.tsv", "w") as f:
        for _, r in lexicon.pair_counts.iterrows():
            f.write(f"{sf_by_id[r['sf_id']]}\t{uri_by_id[r['entity_id']]}"
                    f"\t{r['count']}\n")
    with open(d / "sfAndTotalCounts.tsv", "w") as f:
        for _, r in lexicon.surface_forms.iterrows():
            f.write(f"{r['sf']}\t{r['annotated_count']}\t{r['total_count']}\n")
    with open(d / "tokenCounts.tsv", "w") as f:
        per_uri: dict[str, dict[str, int]] = {}
        for _, r in lexicon.token_counts.iterrows():
            per_uri.setdefault(uri_by_id[r["entity_id"]], {})[
                tok_by_id[r["token_id"]]] = int(r["count"])
        for uri, toks in per_uri.items():
            f.write(f"{uri}\t{json.dumps(toks)}\n")
    return str(d)


def test_lexicon_from_tsv_roundtrip(spark, tsv_dir, lexicon):
    from dbpedia_spotlight_spark.sources.tsv import lexicon_from_tsv
    tables = lexicon_from_tsv(
        spark,
        f"{tsv_dir}/uriCounts.tsv",
        f"{tsv_dir}/pairCounts.tsv",
        f"{tsv_dir}/sfAndTotalCounts.tsv",
        f"{tsv_dir}/tokenCounts.tsv",
        stopwords=lexicon.stopwords["token"].tolist(),
    )
    assert tables["surface_forms"].count() == len(lexicon.surface_forms)
    assert tables["entities"].count() == len(lexicon.entities)
    assert tables["pair_counts"].count() == len(lexicon.pair_counts)
    # support survives the round trip
    sup = {r.uri: r.support for r in tables["entities"].collect()}
    for _, r in lexicon.entities.iterrows():
        assert sup[r["uri"]] == r["support"]
    # pair counts per (sf, uri) survive
    got_pc = tables["pair_counts"].agg(F.sum("count")).first()[0]
    assert got_pc == lexicon.pair_counts["count"].sum()


def test_tsv_model_annotates(spark, tsv_dir, lexicon, web_pages):
    """A model compiled from the TSV-imported tables must annotate
    (end-to-end S5 → S4 → pipeline)."""
    from dbpedia_spotlight_spark.model import compile_model
    from dbpedia_spotlight_spark.sources.tsv import lexicon_from_tsv
    tables = lexicon_from_tsv(
        spark,
        f"{tsv_dir}/uriCounts.tsv",
        f"{tsv_dir}/pairCounts.tsv",
        f"{tsv_dir}/sfAndTotalCounts.tsv",
        f"{tsv_dir}/tokenCounts.tsv",
        stopwords=lexicon.stopwords["token"].tolist(),
    )
    model = compile_model(
        surface_forms=tables["surface_forms"].toPandas(),
        entities=tables["entities"].toPandas(),
        pair_counts=tables["pair_counts"].toPandas(),
        token_counts=tables["token_counts"].toPandas(),
        token_types=tables["token_types"].toPandas(),
        stopwords=lexicon.stopwords["token"].tolist(),
    )
    bc = spark.sparkContext.broadcast(model)
    ann = annotate(spark, web_pages, bc,
                   PipelineConfig(disambiguator="generative"))
    assert ann.count() > 0


def test_annotations_json_shape(spark, web_pages, model_bc):
    from dbpedia_spotlight_spark.functions.output import annotations_json
    ann = annotate(spark, web_pages, model_bc, PipelineConfig())
    row = annotations_json(ann).first()
    doc = json.loads(row.json)
    assert doc["@text-url"] == row.url
    assert len(doc["Resources"]) >= 1
    r0 = doc["Resources"][0]
    assert set(r0) >= {"@URI", "@surfaceForm", "@offset",
                       "@similarityScore", "@support"}
    # offsets ascend within a document
    offs = [r["@offset"] for r in doc["Resources"]]
    assert offs == sorted(offs)


def test_annotations_xml_parses(spark, web_pages, model_bc):
    from dbpedia_spotlight_spark.functions.output import annotations_xml
    ann = annotate(spark, web_pages, model_bc, PipelineConfig())
    row = annotations_xml(ann).first()
    root = ET.fromstring(row.xml)
    assert root.tag == "Annotation" and root.get("text-url") == row.url
    resources = list(root.iter("Resource"))
    assert resources and all(r.get("URI") for r in resources)


def test_ntriples_lines_and_sink(spark, tmp_path):
    """W3C N-Triples rendering: prefix expansion, literal ECHAR escapes,
    IRI percent-encoding, full-IRI predicate passthrough; the sink
    writes loadable gzip shards."""
    import gzip
    import pandas as pd
    from dbpedia_spotlight_spark.functions.output import (
        ntriples_lines, write_ntriples)

    rows = pd.DataFrame({
        "subj": ["http://e.org/a#char=0,5"] * 3,
        "pred": ["itsrdf:taIdentRef", "nif:anchorOf",
                 "http://example.org/custom"],
        "obj": ["http://dbpedia.org/resource/A B",
                'he said "hi"\n\\end',
                "http://e.org/x"],
    })
    got = sorted(r["ntriple"] for r in
                 ntriples_lines(spark.createDataFrame(rows)).collect())
    assert got == sorted([
        "<http://e.org/a#char=0,5> "
        "<http://www.w3.org/2005/11/its/rdf#taIdentRef> "
        "<http://dbpedia.org/resource/A%20B> .",
        "<http://e.org/a#char=0,5> "
        "<http://persistence.uni-leipzig.org/nlp2rdf/ontologies/"
        "nif-core#anchorOf> "
        '"he said \\"hi\\"\\n\\\\end" .',
        "<http://e.org/a#char=0,5> <http://example.org/custom> "
        "<http://e.org/x> .",
    ])

    out = str(tmp_path / "kg.nt")
    write_ntriples(spark.createDataFrame(rows), out)
    import glob
    lines = []
    for f in glob.glob(f"{out}/part-*.gz"):
        lines += gzip.open(f, "rt").read().splitlines()
    assert sorted(lines) == got
