from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("dbpedia-spotlight-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def lexicon():
    from dbpedia_spotlight_spark.datagen import make_lexicon

    return make_lexicon(seed=42)


@pytest.fixture(scope="session")
def corpus(lexicon):
    from dbpedia_spotlight_spark.datagen import make_corpus

    return make_corpus(lexicon, n_docs=120, seed=7)


@pytest.fixture(scope="session")
def model(lexicon):
    from dbpedia_spotlight_spark.model import compile_model

    return compile_model(
        surface_forms=lexicon.surface_forms,
        entities=lexicon.entities,
        pair_counts=lexicon.pair_counts,
        token_counts=lexicon.token_counts,
        token_types=lexicon.token_types,
        stopwords=lexicon.stopwords["token"].tolist(),
    )


@pytest.fixture(scope="session")
def model_bc(spark, model):
    return spark.sparkContext.broadcast(model)


@pytest.fixture(scope="session")
def web_pages(spark, corpus):
    from dbpedia_spotlight_spark.datagen import write_corpus
    import tempfile

    d = tempfile.mkdtemp(prefix="webpages_")
    write_corpus(spark, corpus[0], d, partitions=4)
    return spark.read.parquet(f"{d}/web_pages.parquet")


@pytest.fixture(scope="session")
def spark_prop(spark):
    """A small materialized KG (full-IRI + CURIE-style predicates) for
    the SPARQL text-vs-structured property test — session-scoped so the
    hypothesis loop never rebuilds it."""
    rows = []
    terms = ["a", "b", "c", "d"]
    for i, s in enumerate(terms):
        for j, o in enumerate(terms):
            if (i + j) % 2 == 0:
                rows.append((s, "urn:ex:p", o))
            if (i * j) % 3 == 1:
                rows.append((s, "urn:ex:q", o))
            if i == j:
                rows.append((s, "http://ex.org/r", o))
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    return df.localCheckpoint(eager=True)
