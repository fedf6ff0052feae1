"""M1–M6 model-build plans + K1–K3 closure (SURVEY §5.2 items 3-4)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from dbpedia_spotlight_spark.functions.quantize import quantize
from dbpedia_spotlight_spark.plans.closure import (
    canonicalize_uris, drop_disambiguation, redirect_closure,
    wiki_title_to_dbpedia_uri,
)
from dbpedia_spotlight_spark.plans.model_build import (
    build_model_tables, pair_counts_from_links, quantize_counts,
    sf_total_counts, token_counts_from_corpus, uri_counts,
)


def _links(spark, corpus):
    g = corpus[1].rename(columns={"surface_form": "sf"})
    return spark.createDataFrame(g[["url", "begin", "end", "sf", "uri"]])


def _corpus_text(spark, web_pages):
    return web_pages.select("url", "text")


def test_redirect_closure_chain_and_cycle(spark, lexicon):
    r = spark.createDataFrame(lexicon.redirects)
    closure = {row.src_uri: row.final_uri for row in redirect_closure(r).collect()}
    P = "http://dbpedia.org/resource/"
    assert closure[f"{P}Alias_A"] == f"{P}Thing_0"
    assert closure[f"{P}Alias_B"] == f"{P}Thing_0"
    # 2-cycle: both members resolve to the same deterministic canonical
    assert closure[f"{P}Cycle_X"] == closure[f"{P}Cycle_Y"] == f"{P}Cycle_X"


def test_canonicalize_uris_rewrites_aliases(spark, lexicon):
    r = spark.createDataFrame(lexicon.redirects)
    closure = redirect_closure(r)
    df = spark.createDataFrame(pd.DataFrame({
        "uri": ["http://dbpedia.org/resource/Alias_A",
                "http://dbpedia.org/resource/Thing_5"],
        "x": [1, 2],
    }))
    out = {row.uri for row in canonicalize_uris(df, closure, "uri").collect()}
    assert out == {"http://dbpedia.org/resource/Thing_0",
                   "http://dbpedia.org/resource/Thing_5"}


def test_drop_disambiguation(spark, lexicon):
    ents = spark.createDataFrame(lexicon.entities)
    kept = drop_disambiguation(ents, spark.createDataFrame(lexicon.disambiguations))
    assert kept.count() == ents.count() - 1


def test_uri_encoding_golden_pairs():
    assert wiki_title_to_dbpedia_uri("Berlin Wall") == \
        "http://dbpedia.org/resource/Berlin_Wall"
    assert wiki_title_to_dbpedia_uri("AT&T") == "http://dbpedia.org/resource/AT&T"
    assert wiki_title_to_dbpedia_uri("C# (programming language)") == \
        "http://dbpedia.org/resource/C%23_(programming_language)"
    assert wiki_title_to_dbpedia_uri("Æon Flux").startswith(
        "http://dbpedia.org/resource/%C3%86on")


def test_m1_m2_counts(spark, web_pages, corpus):
    links = _links(spark, corpus)
    m1 = uri_counts(links)
    assert m1.agg(F.sum("count")).first()[0] == links.count()
    m2 = pair_counts_from_links(links)
    assert m2.agg(F.sum("count")).first()[0] == links.count()
    # marginalizing M2 over sf gives M1
    m2_marg = m2.groupBy("uri").agg(F.sum("count").alias("c"))
    diff = m2_marg.join(m1, "uri").filter(F.col("c") != F.col("count")).count()
    assert diff == 0


def test_m3_total_ge_annotated(spark, web_pages, corpus):
    links = _links(spark, corpus)
    sf_names = [r.sf for r in links.select(F.lower("sf").alias("sf")).distinct().collect()]
    m3 = sf_total_counts(_corpus_text(spark, web_pages), links, sf_names)
    bad = m3.filter(F.col("total_count") < F.col("annotated_count")).count()
    assert bad == 0
    assert m3.count() == len(sf_names)


def test_m4_token_counts_only_link_paragraph(spark, web_pages, corpus):
    links = _links(spark, corpus)
    m4 = token_counts_from_corpus(_corpus_text(spark, web_pages), links)
    assert m4.filter(F.col("count") <= 0).count() == 0
    # every uri in m4 must be a link target
    uris = {r.uri for r in links.select("uri").distinct().collect()}
    assert {r.uri for r in m4.select("uri").distinct().collect()} <= uris


def test_m6_quantize_column_matches_python(spark):
    pdf = pd.DataFrame({"count": [0, 1, 5, 16, 17, 100, 1000, 99999]})
    out = quantize_counts(spark.createDataFrame(pdf)).toPandas()
    for _, r in out.iterrows():
        assert int(r["count_q"]) == quantize(int(r["count"]))


def test_self_trained_model_roundtrip(spark, web_pages, corpus):
    """Build lexicon tables from the corpus' own links, compile, re-annotate:
    the self-trained model must recover the training links (high recall) —
    the end-to-end check that M1–M6 produce a usable model."""
    from dbpedia_spotlight_spark.model import compile_model
    from dbpedia_spotlight_spark.pipeline import PipelineConfig, annotate

    links = _links(spark, corpus)
    tables = build_model_tables(
        spark, _corpus_text(spark, web_pages), links,
        stopwords=["the", "and", "of", "a", "to", "in", "is", "on", "for", "with"],
    )
    model = compile_model(
        surface_forms=tables["surface_forms"].toPandas(),
        entities=tables["entities"].toPandas(),
        pair_counts=tables["pair_counts"].toPandas(),
        token_counts=tables["token_counts"].toPandas(),
        token_types=tables["token_types"].toPandas(),
        stopwords=[r.token for r in tables["stopwords"].collect()],
    )
    bc = spark.sparkContext.broadcast(model)
    ann = annotate(spark, web_pages, bc, PipelineConfig(disambiguator="generative"))
    got = {(r.url, r.begin, r.end, r.uri) for r in ann.collect()}
    want = {(r.url, int(r.begin), int(r.end), r.uri) for _, r in corpus[1].iterrows()}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"self-trained recall {recall}"


def test_dense_ids_by_matches_global_window(spark):
    """Prefix-bucket dense ids must equal the single-partition
    row_number(orderBy) form on any layout, including 1-char keys and an
    empty frame."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from dbpedia_spotlight_spark.plans.model_build import dense_ids_by

    keys = ["zebra", "a", "apple", "ant", "b", "zeb", "m", "mango", "μm"]
    df = spark.createDataFrame([(k,) for k in keys], "k string") \
        .repartition(5)
    got = {r["k"]: r["kid"] for r in dense_ids_by(df, "k", "kid").collect()}
    want = {r["k"]: r["kid"] for r in df.withColumn(
        "kid", F.row_number().over(Window.orderBy("k")) - 1).collect()}
    assert got == want

    empty = spark.createDataFrame([], "k string")
    assert dense_ids_by(empty, "k", "kid").count() == 0


def test_collect_surface_forms_streams_1m_lexicon(spark):
    """The driver-side sf materialization must handle a >=1M-entry
    lexicon (VERDICT r3 item 6) and report honest size stats."""
    import pyspark.sql.functions as F
    from dbpedia_spotlight_spark.plans.model_build import (
        collect_surface_forms,
    )

    links = spark.range(1_000_000).select(
        F.concat(F.lit("Surface Form "), F.col("id")).alias("sf"))
    sfs, stats = collect_surface_forms(links)
    assert stats["n_surface_forms"] == 1_000_000
    assert len(sfs) == 1_000_000
    assert len(set(sfs)) == 1_000_000
    assert sfs[0].startswith("surface form ")          # lowercased
    # honest accounting: at least the raw utf-8 payload was counted
    assert stats["approx_driver_bytes"] > sum(
        len(s) for s in sfs[:1000]) * 1000


def test_collect_surface_forms_ceiling_fails_fast(spark):
    import pytest as _pytest
    from dbpedia_spotlight_spark.plans.model_build import (
        collect_surface_forms,
    )
    links = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "sf string")
    with _pytest.raises(RuntimeError, match="driver ceiling"):
        collect_surface_forms(links, byte_ceiling=10)


def test_build_model_tables_reports_sf_stats(spark, tmp_path):
    from dbpedia_spotlight_spark.plans.model_build import build_model_tables
    corpus = spark.createDataFrame(
        [("u1", "berlin is big\nparis is bigger")], "url string, text string")
    links = spark.createDataFrame(
        [("u1", 0, 6, "berlin", "Berlin"), ("u1", 14, 19, "paris", "Paris")],
        "url string, begin int, end int, sf string, uri string")
    stats: dict = {}
    build_model_tables(spark, corpus, links, stats_out=stats)
    assert stats["n_surface_forms"] == 2
    assert stats["approx_driver_bytes"] > 0


def test_merge_count_tables_identity_on_disjoint_halves(spark):
    """Counting over A ∪ B must equal merging counts of disjoint A and B
    — the correctness contract of the incremental model refresh."""
    import pyspark.sql.functions as F
    from dbpedia_spotlight_spark.plans.model_build import (
        merge_count_tables, pair_counts_from_links,
        token_counts_from_corpus, uri_counts,
    )
    from dbpedia_spotlight_spark.datagen import make_corpus, make_lexicon

    lex = make_lexicon(seed=7)
    pages, golden = make_corpus(lex, n_docs=60, seed=5)
    corpus = spark.createDataFrame(pages[["url", "text"]])
    links = spark.createDataFrame(
        golden[["url", "begin", "end", "surface_form", "uri"]]
        .rename(columns={"surface_form": "sf"}))
    gate = F.crc32(F.col("url")) % 2 == 0
    half = [(corpus.filter(gate), links.filter(gate)),
            (corpus.filter(~gate), links.filter(~gate))]

    for fn, keys in ((uri_counts, ["uri"]),
                     (pair_counts_from_links, ["sf", "uri"])):
        merged = merge_count_tables(fn(half[0][1]), fn(half[1][1]), keys)
        whole = fn(links)
        assert sorted(map(tuple, merged.collect())) \
            == sorted(map(tuple, whole.collect())), fn.__name__

    m_tok = merge_count_tables(
        token_counts_from_corpus(*half[0]),
        token_counts_from_corpus(*half[1]), ["uri", "token"])
    w_tok = token_counts_from_corpus(corpus, links)
    assert sorted(map(tuple, m_tok.collect())) \
        == sorted(map(tuple, w_tok.collect()))


def test_merge_model_counts_multi_column(spark):
    from dbpedia_spotlight_spark.plans.model_build import merge_count_tables
    a = spark.createDataFrame(
        [("x", 2, 5), ("y", 1, 1)],
        "sf string, annotated_count long, total_count long")
    b = spark.createDataFrame(
        [("x", 3, 4), ("z", 1, 2)],
        "sf string, annotated_count long, total_count long")
    got = {r["sf"]: (r["annotated_count"], r["total_count"])
           for r in merge_count_tables(
               a, b, ["sf"], ("annotated_count", "total_count")).collect()}
    assert got == {"x": (5, 9), "y": (1, 1), "z": (1, 2)}
