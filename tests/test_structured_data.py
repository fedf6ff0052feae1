"""JSON-LD + meta-property extraction from raw HTML (the Web-Data-
Commons lane). Cross-engine parity lives in test_rotated_queries."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


def _pages(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, html=h.encode("utf-8")) for u, h in rows])


def test_meta_property_triples(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        meta_property_triples)
    html = ('<html><head>'
            '<meta property="og:title" content="A Page" />'
            '<meta name="description" content="about things">'
            '<meta content="reversed-order" property="og:type">'
            '<meta property="empty" content="">'
            '<meta charset="utf-8">'
            '</head><body>x</body></html>')
    out = {(r.pred, r.obj) for r in meta_property_triples(
        _pages(spark, [("u1", html)])).collect()}
    assert out == {("og:title", "A Page"),
                   ("description", "about things"),
                   ("og:type", "reversed-order")}
    plan = meta_property_triples(_pages(spark, [("u1", html)])) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_jsonld_flat_and_nested(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        jsonld_triples)
    html = ('<html><head><script type="application/ld+json">'
            '{"@id": "ex:bob", "@type": "Person", "name": "Bob",'
            ' "age": 42, "knows": {"@id": "ex:alice", "name": "Alice"},'
            ' "tags": ["x", "y"],'
            ' "address": {"city": "Metropolis"}}'
            '</script></head></html>')
    got = {(r.subj, r.pred, r.obj) for r in jsonld_triples(
        _pages(spark, [("u1", html)])).collect()}
    assert ("ex:bob", "rdf:type", "Person") in got
    assert ("ex:bob", "name", "Bob") in got
    assert ("ex:bob", "age", "42") in got
    assert ("ex:bob", "knows", "ex:alice") in got
    assert ("ex:alice", "name", "Alice") in got
    assert ("ex:bob", "tags", "x") in got and ("ex:bob", "tags", "y") in got
    # nested object without @id gets the deterministic child id
    assert ("ex:bob", "address", "ex:bob/address-0") in got
    assert ("ex:bob/address-0", "city", "Metropolis") in got


def test_jsonld_graph_array_and_malformed(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        jsonld_triples)
    html = ('<script type="application/ld+json">'
            '{"@graph": [{"name": "n0"}, {"name": "n1"}]}</script>'
            '<script type="application/ld+json">{broken json</script>'
            '<script type="application/ld+json">'
            '[{"@type": "Thing"}]</script>')
    got = sorted((r.subj, r.pred, r.obj) for r in jsonld_triples(
        _pages(spark, [("u", html)])).collect())
    # anonymous nodes numbered per page in document order
    assert got == [("u#jsonld-0", "name", "n0"),
                   ("u#jsonld-1", "name", "n1"),
                   ("u#jsonld-2", "rdf:type", "Thing")]


def test_jsonld_layout_independent(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        jsonld_triples)
    rows = [(f"u{i}",
             f'<script type="application/ld+json">{{"@id": "e{i}",'
             f' "v": {i}}}</script>') for i in range(30)]
    one = sorted(map(tuple, jsonld_triples(
        _pages(spark, rows).coalesce(1)).collect()))
    many = sorted(map(tuple, jsonld_triples(
        _pages(spark, rows).repartition(7)).collect()))
    assert one == many
    assert len(one) == 30


def test_microdata_flat_item(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        microdata_triples)
    html = ('<div itemscope itemtype="https://schema.org/Person">'
            '<span itemprop="name">Jane  Doe</span>'
            '<a itemprop="url" href="https://jane.example/">home</a>'
            '<meta itemprop="birthDate" content="1980-01-01">'
            '</div>')
    got = {(r.subj, r.pred, r.obj) for r in microdata_triples(
        _pages(spark, [("u", html)])).collect()}
    assert ("u#md-0", "rdf:type", "https://schema.org/Person") in got
    assert ("u#md-0", "name", "Jane Doe") in got          # ws collapsed
    assert ("u#md-0", "url", "https://jane.example/") in got
    assert ("u#md-0", "birthDate", "1980-01-01") in got


def test_microdata_nested_and_itemid(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        microdata_triples)
    html = ('<div itemscope itemid="ex:book">'
            '<span itemprop="title">Moby Dick</span>'
            '<div itemprop="author" itemscope>'
            '<span itemprop="name">Melville</span></div>'
            '</div>')
    got = {(r.subj, r.pred, r.obj) for r in microdata_triples(
        _pages(spark, [("u", html)])).collect()}
    assert ("ex:book", "title", "Moby Dick") in got
    assert ("ex:book", "author", "u#md-1") in got
    assert ("u#md-1", "name", "Melville") in got


def test_microdata_malformed_tolerant(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        microdata_triples)
    html = '<div itemscope><span itemprop="x">v</span>'  # never closed
    got = {(r.pred, r.obj) for r in microdata_triples(
        _pages(spark, [("u", html)])).collect()}
    assert ("x", "v") in got


# --- review-finding regressions ----------------------------------------


def test_microdata_inline_formatting_inside_prop(spark):
    """Inline <b> inside a text prop must not close the prop or pop
    the scope (review finding: later sibling props were dropped)."""
    from dbpedia_spotlight_spark.sources.structured_data import (
        microdata_triples)
    html = ('<div itemscope><span itemprop="x">v<b>w</b></span>'
            '<span itemprop="y">z</span></div>')
    got = {(r.pred, r.obj) for r in microdata_triples(
        _pages(spark, [("u", html)])).collect()}
    assert got == {("x", "vw"), ("y", "z")}


def test_microdata_scope_on_unusual_tag_closes(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        microdata_triples)
    # itemscope on <p> (not in any whitelist) closes properly, so the
    # sibling scope's prop attributes to the right node
    html = ('<p itemscope itemid="a"><span itemprop="x">1</span></p>'
            '<p itemscope itemid="b"><span itemprop="x">2</span></p>')
    got = {(r.subj, r.obj) for r in microdata_triples(
        _pages(spark, [("u", html)])).collect()}
    assert got == {("a", "1"), ("b", "2")}


def test_jsonld_nonfinite_numbers_do_not_crash(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        jsonld_triples)
    html = ('<script type="application/ld+json">'
            '{"@id": "x", "bad": Infinity, "worse": NaN, "ok": 1.5}'
            '</script>')
    got = {(r.pred, r.obj) for r in jsonld_triples(
        _pages(spark, [("u", html)])).collect()}
    assert got == {("ok", "1.5")}  # finite value kept, non-finite skipped


def test_meta_data_name_attributes_do_not_match(spark):
    from dbpedia_spotlight_spark.sources.structured_data import (
        meta_property_triples)
    html = ('<meta data-name="author-widget" content="z">'
            '<meta data-name="y" name="x" content="c">')
    got = {(r.pred, r.obj) for r in meta_property_triples(
        _pages(spark, [("u", html)])).collect()}
    assert got == {("x", "c")}  # data-name never matches; real name wins


def test_run_pipeline_structured_mode(spark, tmp_path):
    """spark-submit entrypoint: --mode structured extracts all three
    lanes from raw pages into the resumable catalog — no model plane
    touched (no --lexicon content needed)."""
    from pyspark.sql import Row
    from dbpedia_spotlight_spark.run_pipeline import main

    pages = spark.createDataFrame([Row(
        url=f"https://h.example/p{i}",
        html=(f'<html><head>'
              f'<meta property="og:title" content="T{i}"/>'
              f'<script type="application/ld+json">'
              f'{{"@id": "ex:n{i}", "@type": "Thing"}}</script>'
              f'</head><body><div itemscope itemid="ex:m{i}">'
              f'<span itemprop="name">N{i}</span></div>'
              f'</body></html>').encode())
        for i in range(6)])
    corpus = str(tmp_path / "pages")
    pages.write.parquet(corpus)

    stats = main(["--corpus", corpus, "--lexicon", str(tmp_path),
                  "--out", str(tmp_path / "out"),
                  "--mode", "structured"], spark=spark)
    assert stats["rows"] == 18  # 3 triples per page, 3 lanes
    out = spark.read.parquet(str(tmp_path / "out" / "structured_output"))
    lanes = {r["lane"] for r in out.select("lane").distinct().collect()}
    assert lanes == {"meta", "jsonld", "microdata"}
    assert out.filter("lane = 'meta' AND subj = url").count() == 6
