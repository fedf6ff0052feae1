"""Raw wikistats TSV importers (SURVEY.md §2.1 S5).

Reference behavior: ``db/io/{SurfaceFormSource,ResourceSource,
CandidateMapSource,TokenSource}.scala`` [U] read the wikistats TSV files

    uriCounts        uri \t count
    pairCounts       sf \t uri \t count
    sfAndTotalCounts sf \t annotatedCount \t totalCount
    tokenCounts      uri \t JSON-ish [(token,count),...]

into the memory stores. Spark mapping: schema'd ``spark.read.csv`` with
tab separator → the SAME lexicon-table shapes the rest of the engine
consumes (model.load_model / compile_model), with dense ids assigned by
deterministic ordering and URIs canonicalized through the redirect
closure (K1–K3) exactly where WikipediaToDBpediaClosure rewrites raw
wikistats URIs [U].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

URI_COUNTS_SCHEMA = StructType([
    StructField("uri", StringType()),
    StructField("count", LongType()),
])

PAIR_COUNTS_SCHEMA = StructType([
    StructField("sf", StringType()),
    StructField("uri", StringType()),
    StructField("count", LongType()),
])

SF_COUNTS_SCHEMA = StructType([
    StructField("sf", StringType()),
    StructField("annotated_count", LongType()),
    StructField("total_count", LongType()),
])

TOKEN_COUNTS_SCHEMA = StructType([
    StructField("uri", StringType()),
    StructField("token_json", StringType()),
])


def _tsv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.csv(path, sep="\t", schema=schema, header=False)


def read_uri_counts(spark: SparkSession, path: str) -> DataFrame:
    return _tsv(spark, path, URI_COUNTS_SCHEMA)


def read_pair_counts(spark: SparkSession, path: str) -> DataFrame:
    return _tsv(spark, path, PAIR_COUNTS_SCHEMA)


def read_sf_counts(spark: SparkSession, path: str) -> DataFrame:
    # the reference stores "not-seen-in-text" totals as negative counts;
    # floor at annotated (same normalization as model_build.sf_total_counts)
    df = _tsv(spark, path, SF_COUNTS_SCHEMA)
    return df.withColumn(
        "total_count",
        F.greatest(F.col("total_count"), F.col("annotated_count")),
    )


def read_token_counts(spark: SparkSession, path: str) -> DataFrame:
    """tokenCounts TSV: uri \t {"token":count,...} → exploded
    (uri, token, count) rows (from_json map — JVM-side, no UDF)."""
    df = _tsv(spark, path, TOKEN_COUNTS_SCHEMA)
    parsed = df.select(
        "uri",
        F.explode(
            F.from_json(F.col("token_json"), "map<string,bigint>")
        ).alias("token", "count"),
    )
    return parsed


def lexicon_from_tsv(
    spark: SparkSession,
    uri_counts_path: str,
    pair_counts_path: str,
    sf_counts_path: str,
    token_counts_path: str,
    stopwords: list[str] | None = None,
    redirects: DataFrame | None = None,
    disambiguations: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Assemble the engine's lexicon tables from raw wikistats TSVs —
    the S5 → S4 bridge (the reference's model-build ingestion path).
    Dense ids are assigned by deterministic name ordering."""
    from dbpedia_spotlight_spark.plans.closure import (
        canonicalize_uris, redirect_closure,
    )

    uc = read_uri_counts(spark, uri_counts_path)
    pc = read_pair_counts(spark, pair_counts_path)
    sfc = read_sf_counts(spark, sf_counts_path)
    tc = read_token_counts(spark, token_counts_path)

    if redirects is not None:
        closure = redirect_closure(redirects)
        uc = canonicalize_uris(uc, closure, "uri") \
            .groupBy("uri").agg(F.sum("count").alias("count"))
        pc = canonicalize_uris(pc, closure, "uri") \
            .groupBy("sf", "uri").agg(F.sum("count").alias("count"))
        tc = canonicalize_uris(tc, closure, "uri") \
            .groupBy("uri", "token").agg(F.sum("count").alias("count"))
    if disambiguations is not None:
        d = F.broadcast(disambiguations.select("uri"))
        uc = uc.join(d, "uri", "left_anti")
        pc = pc.join(d, "uri", "left_anti")
        tc = tc.join(d, "uri", "left_anti")

    entities = uc.withColumn(
        "entity_id",
        (F.row_number().over(Window.orderBy("uri")) - 1).cast("int"),
    ).select("uri", "entity_id", F.col("count").alias("support"),
             F.array().cast("array<string>").alias("types"))

    surface_forms = sfc.withColumn(
        "sf_id", (F.row_number().over(Window.orderBy("sf")) - 1).cast("int")
    ).select("sf", "sf_id", "annotated_count", "total_count")

    pair_counts = (
        pc.join(surface_forms.select("sf", "sf_id"), "sf")
        .join(entities.select("uri", "entity_id"), "uri")
        .select("sf_id", "entity_id", "count")
    )

    # vocabulary = context tokens ∪ surface-form tokens: the FSA patterns
    # are sf-name token-id sequences, so sf words absent from every
    # context vector would otherwise get no id and silently drop their
    # pattern from the automaton (no spots at all)
    import pandas as pd
    from dbpedia_spotlight_spark.functions.tokenizer import tokenize

    def sf_tokens(batches):
        for pdf in batches:
            toks = sorted({t for sf in pdf["sf"]
                           for (_, _, t) in tokenize(sf)})
            yield pd.DataFrame({"token": toks})

    sf_tok_df = (
        surface_forms.select("sf")
        .mapInPandas(sf_tokens, "token string").distinct()
        .withColumn("count", F.lit(0).cast("long"))
    )
    token_types = (
        tc.select("token", "count").unionByName(sf_tok_df)
        .groupBy("token").agg(F.sum("count").alias("corpus_count"))
        .withColumn("token_id",
                    (F.row_number().over(Window.orderBy("token")) - 1)
                    .cast("int"))
        .select("token", "token_id", "corpus_count")
    )
    token_counts = (
        tc.join(entities.select("uri", "entity_id"), "uri")
        .join(token_types.select("token", "token_id"), "token")
        .select("entity_id", "token_id", "count")
    )

    stop_df = spark.createDataFrame(
        [(s,) for s in (stopwords or [])] or [("",)], "token string"
    ).filter(F.col("token") != "")

    return {
        "surface_forms": surface_forms,
        "entities": entities,
        "pair_counts": pair_counts,
        "token_counts": token_counts,
        "token_types": token_types,
        "stopwords": stop_df,
    }
