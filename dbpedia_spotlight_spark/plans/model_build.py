"""Offline model-build aggregations (SURVEY.md §2.13 M1–M6).

Reference behavior: the statistical backend consumes precomputed wikistats
TSVs — uriCounts, pairCounts, sfAndTotalCounts, tokenCounts — via
``db/io/*Source.scala`` [U]. Rebuilding those counts from an annotated
corpus is the Spark-sweet-spot side of the engine: pure groupBy/agg
DataFrame jobs that scale linearly, with only well-keyed shuffles.

Input shapes:
- ``links``:  (url, begin, end, sf, uri)  — anchor-text training links
  (the wiki-link-anchor equivalent; datagen's golden table has this shape)
- ``corpus``: (url, text)                 — extracted page text

Scale notes (100 TB): every aggregation here is a map-side-combinable
groupBy on a key whose cardinality ≪ row count (uri, sf, token), so AQE
handles partition sizing; the only UDF pass is tokenization (M3/M4),
fused into a single mapInPandas that emits both the per-paragraph token
stream and the sf-occurrence counts in one scan of the corpus.
"""

from __future__ import annotations

import logging
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from dbpedia_spotlight_spark.functions.automaton import build_automaton
from dbpedia_spotlight_spark.functions.tokenizer import tokenize

log = logging.getLogger(__name__)

# Documented driver-memory ceiling for the surface-form lexicon: the
# spot-all automaton is a broadcast structure BUILT on the driver, so
# the distinct-sf list must land driver-side (same memory model as the
# reference's in-RAM MemorySurfaceFormStore [U]). A 10M-sf full-
# Wikipedia lexicon is a few hundred MB of strings — inside this 1 GiB
# default; bigger lexicons must raise it consciously (and size driver
# memory to match) rather than discover the limit as an OOM mid-build.
SF_DRIVER_BYTES_CEILING = 1 << 30


def collect_surface_forms(
    links: DataFrame,
    byte_ceiling: int = SF_DRIVER_BYTES_CEILING,
) -> tuple[list[str], dict]:
    """Stream the distinct lowercase sf lexicon to the driver with
    byte accounting. ``toLocalIterator`` fetches one partition at a
    time (no second full-result buffer in the JVM next to the Python
    list), and the running estimate fails fast past ``byte_ceiling``
    instead of OOMing deep inside the automaton build. Returns
    (sfs, stats) with stats = {n_surface_forms, approx_driver_bytes}."""
    sfs: list[str] = []
    nbytes = 0
    rows = (links.select(F.lower("sf").alias("sf")).distinct()
            .toLocalIterator(prefetchPartitions=True))
    for row in rows:
        s = row[0]
        sfs.append(s)
        nbytes += len(s.encode("utf-8")) + 49   # CPython compact-str floor
        if nbytes > byte_ceiling:
            raise RuntimeError(
                f"surface-form lexicon exceeds the driver ceiling: "
                f"{len(sfs):,} sfs so far, ~{nbytes / 2**20:.0f} MiB > "
                f"{byte_ceiling / 2**20:.0f} MiB — raise byte_ceiling "
                f"(and driver memory) or shard the spot automaton")
    stats = {"n_surface_forms": len(sfs), "approx_driver_bytes": nbytes}
    log.info("model build: %d distinct surface forms (~%.1f MiB) to driver",
             len(sfs), nbytes / 2**20)
    return sfs, stats


def uri_counts(links: DataFrame) -> DataFrame:
    """M1: c(e) — entity support. GROUP BY uri."""
    return links.groupBy("uri").agg(F.count("*").alias("count"))


def pair_counts_from_links(links: DataFrame) -> DataFrame:
    """M2: c(s,e). GROUP BY sf, uri (lowercased sf — the store's lookup
    normalization, MemorySurfaceFormStore [U])."""
    return links.groupBy(F.lower("sf").alias("sf"), "uri").agg(
        F.count("*").alias("count")
    )


TOKEN_STREAM_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("para", IntegerType()),
    StructField("token", StringType()),
])


def corpus_token_stream(corpus: DataFrame) -> DataFrame:
    """One fused tokenization pass: (url, text) → (url, para, token).

    Feeds both M3 (sf total counts, via automaton downstream) and M4
    (per-entity context histograms)."""
    def run(batches):
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["text"]):
                for para, line in enumerate(text.split("\n")):
                    for (_, _, tok) in tokenize(line):
                        rows.append((url, para, tok))
            yield pd.DataFrame(rows, columns=["url", "para", "token"])

    return corpus.select("url", "text").mapInPandas(run, TOKEN_STREAM_SCHEMA)


SF_OCC_SCHEMA = StructType([
    StructField("sf", StringType()),
    StructField("n", LongType()),
])


def sf_total_counts(corpus: DataFrame, links: DataFrame,
                    sf_names: list[str]) -> DataFrame:
    """M3: sfAndTotalCounts — annotated count per sf (marginal of M2) +
    total raw-text occurrence count of the sf token sequence in the corpus
    (spot-all pass with an *ungated* automaton; the annotationProbability
    spot gate is derived from this ratio)."""
    vocab: dict[str, int] = {}
    patterns = []
    for i, name in enumerate(sf_names):
        ids = []
        for (_, _, t) in tokenize(name):
            ids.append(vocab.setdefault(t, len(vocab)))
        patterns.append((tuple(ids), i))
    ac = build_automaton(patterns)

    def run(batches):
        for pdf in batches:
            counts: dict[int, int] = {}
            for text in pdf["text"]:
                ids = [vocab.get(t, -1) for (_, _, t) in tokenize(text)]
                for (_, _, pid) in ac.find_all(ids):
                    counts[pid] = counts.get(pid, 0) + 1
            yield pd.DataFrame(
                [(sf_names[pid], n) for pid, n in counts.items()],
                columns=["sf", "n"],
            )

    totals = (
        corpus.select("text").mapInPandas(run, SF_OCC_SCHEMA)
        .groupBy("sf").agg(F.sum("n").alias("total_count"))
    )
    annotated = links.groupBy(F.lower("sf").alias("sf")).agg(
        F.count("*").alias("annotated_count")
    )
    return (
        annotated.join(totals, "sf", "left")
        .withColumn(
            "total_count",
            F.greatest(F.coalesce("total_count", F.lit(0)), F.col("annotated_count")),
        )
    )


def token_counts_from_corpus(corpus: DataFrame, links: DataFrame) -> DataFrame:
    """M4: per-entity context token histogram — tokens of the paragraph
    each training link sits in. explode → join → GROUP BY uri, token.

    The join key is (url, para): links are located into paragraphs by a
    small derived column, then joined against the token stream. At scale
    the links side per url is small; AQE picks the join strategy."""
    stream = corpus_token_stream(corpus)

    # paragraph index of each link = count of '\n' before `begin`;
    # derived by joining the page text back on (url) — co-partitioned with
    # the stream's shuffle key, no extra scan of the big side
    with_text = links.join(corpus.select("url", "text"), "url")
    links_para = with_text.select(
        "url", "uri",
        (F.size(F.split(F.expr("substring(text, 1, begin)"), "\n")) - 1).alias("para"),
    )

    return (
        stream.join(links_para, ["url", "para"])
        .groupBy("uri", "token").agg(F.count("*").alias("count"))
    )


def quantize_counts(df: DataFrame, count_col: str = "count",
                    base: float = 1.1, exact_max: int = 16) -> DataFrame:
    """M6: int count → int16 code, as a pure column expression
    (SURVEY §2.13; codebook in functions/quantize.py)."""
    c = F.col(count_col)
    code = F.when(
        c <= exact_max, c.cast("int")
    ).otherwise(
        (F.lit(exact_max) + F.round(F.log(c / exact_max) / F.log(F.lit(base)))).cast("int")
    )
    return df.withColumn("count_q", code.cast("short"))


def merge_count_tables(base: DataFrame, delta: DataFrame,
                       key_cols: list[str],
                       count_cols: tuple[str, ...] = ("count",)) -> DataFrame:
    """Incremental model update (M1-M4 refresh without a full rebuild):
    merge a delta batch's count table into the base by summing per key —
    union + one map-side-combinable groupBy, associative/commutative so
    any merge order (daily deltas, backfills, multi-way) yields the same
    table. The reference's TSV stores are rebuilt offline from scratch;
    at a 10^12-doc corpus the delta-merge is the only affordable
    refresh: cost ∝ |base keys| + |delta|, never a corpus re-scan."""
    cols = list(key_cols) + list(count_cols)
    return (
        base.select(cols).unionByName(delta.select(cols))
        .groupBy(key_cols)
        .agg(*[F.sum(c).alias(c) for c in count_cols])
    )


def merge_model_counts(base: dict[str, DataFrame],
                       delta: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Merge a delta model build (the count-bearing tables of
    :func:`build_model_tables` run over a NEW corpus slice) into a base
    build. Count semantics: counting over corpus A ∪ B ≡ merging counts
    of A and B (disjoint slices), which the identity pytest asserts.
    Dense ids / quantization are downstream of the merged counts."""
    return {
        "uri_counts": merge_count_tables(
            base["uri_counts"], delta["uri_counts"], ["uri"]),
        "pair_counts": merge_count_tables(
            base["pair_counts"], delta["pair_counts"], ["sf", "uri"]),
        "sf_counts": merge_count_tables(
            base["sf_counts"], delta["sf_counts"], ["sf"],
            ("annotated_count", "total_count")),
        "token_counts": merge_count_tables(
            base["token_counts"], delta["token_counts"], ["uri", "token"]),
    }


def dense_ids_by(df: DataFrame, key: str, id_name: str) -> DataFrame:
    """Deterministic dense ids (0..n-1) in global ``key`` order WITHOUT a
    global single-partition window: a ``row_number().over(Window.orderBy)``
    sorts the whole table in ONE task — fine at test scale, a serial
    bottleneck for a 10M-row Wikipedia lexicon. Instead: rank within a
    2-char key-prefix bucket (code-point prefix order is consistent with
    full-key order, so bucket-asc + key-asc ≡ global key-asc) and add an
    exclusive scan of bucket counts as the bucket offset. Every heavy
    stage is distributed; the only driver-side state is the ≤ |alphabet|²
    bucket-count list. Ids are identical to the global-window form and
    independent of partition layout (keys are distinct: they're upstream
    group-by keys)."""
    # NULL keys: substring(NULL) is NULL, which an equi-join would drop
    # (silently losing the row AND its id slot) — coalesce to "" so NULL
    # rows land in the first bucket; the window's default nulls-first
    # order ranks them before "" keys, exactly like the global-window
    # form did
    b = df.withColumn(
        "__bucket", F.coalesce(F.substring(F.col(key), 1, 2), F.lit("")))
    # one materialization serves BOTH the bucket-count collect below and
    # the rank join afterwards — without it the two actions re-execute
    # the (often expensive groupBy) upstream lineage twice
    b = b.localCheckpoint(eager=True)
    counts = (b.groupBy("__bucket").agg(F.count("*").alias("__n"))
               .orderBy("__bucket").collect())
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__bucket"], acc))
        acc += r["__n"]
    off_df = df.sparkSession.createDataFrame(
        offsets or [("", 0)], schema="__bucket string, __off long"
    )
    if not offsets:
        off_df = off_df.filter(F.col("__bucket") != "")
    w = Window.partitionBy("__bucket").orderBy(key)
    return (
        b.join(F.broadcast(off_df), "__bucket")
        .withColumn(id_name,
                    (F.row_number().over(w) - 1 + F.col("__off")).cast("int"))
        .drop("__bucket", "__off")
    )


def build_model_tables(
    spark: SparkSession,
    corpus: DataFrame,          # (url, text)
    links: DataFrame,           # (url, begin, end, sf, uri)
    stopwords: Iterable[str] = (),
    redirects: DataFrame | None = None,
    disambiguations: DataFrame | None = None,
    stats_out: dict | None = None,
) -> dict[str, DataFrame]:
    """Full offline model build: corpus + links → the lexicon tables the
    request path consumes (SURVEY §3.3). Applies the canonicalization
    closure (M5/K1–K3) to link targets before counting, exactly like
    WikipediaToDBpediaClosure rewrites raw wikistats URIs [U].

    ``stats_out``: optional dict that receives build telemetry (currently
    the driver-side sf-lexicon size from :func:`collect_surface_forms`)."""
    from dbpedia_spotlight_spark.plans.closure import (
        canonicalize_uris, redirect_closure,
    )

    if redirects is not None and redirects.limit(1).count() > 0:
        closure = redirect_closure(redirects)
        links = canonicalize_uris(links, closure, "uri")
    if disambiguations is not None:
        links = links.join(
            F.broadcast(disambiguations.select(F.col("uri"))), "uri", "left_anti"
        )
    links = links.cache()

    uc = uri_counts(links)
    entities = (
        dense_ids_by(uc, "uri", "entity_id")
        .select("uri", "entity_id", F.col("count").alias("support"),
                F.array().cast("array<string>").alias("types"))
    )

    sf_names, sf_stats = collect_surface_forms(links)
    if stats_out is not None:
        stats_out.update(sf_stats)
    sft = sf_total_counts(corpus, links, sf_names)
    surface_forms = dense_ids_by(sft, "sf", "sf_id").select(
        "sf", "sf_id", "annotated_count", "total_count")

    pc = (
        pair_counts_from_links(links)
        .join(surface_forms.select("sf", "sf_id"), "sf")
        .join(entities.select("uri", "entity_id"), "uri")
        .select("sf_id", "entity_id", "count")
    )

    tc_raw = (
        token_counts_from_corpus(corpus, links)
        .join(entities.select("uri", "entity_id"), "uri")
    )
    token_types = dense_ids_by(
        corpus_token_stream(corpus)
        .groupBy("token").agg(F.count("*").alias("corpus_count")),
        "token", "token_id",
    ).select("token", "token_id", "corpus_count")
    token_counts = (
        tc_raw.join(token_types.select("token", "token_id"), "token")
        .select("entity_id", "token_id", "count")
    )

    stop_df = spark.createDataFrame(
        [(s,) for s in stopwords] or [("",)], schema="token string"
    ).filter(F.col("token") != "")

    return {
        "surface_forms": surface_forms,
        "entities": entities,
        "pair_counts": pc,
        "token_counts": token_counts,
        "token_types": token_types,
        "stopwords": stop_df,
    }
