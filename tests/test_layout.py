"""Bucketed-layout contract: joins and aggregations keyed on the bucket
key are exchange-free by LAYOUT, not by optimizer luck — the structural
answer to 'this join will shuffle 100 TB twice a day'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.layout import (
    bucket_info, co_located_join, write_bucketed,
)


@pytest.fixture()
def bucketed_counts(spark, tmp_path):
    """uriCounts/pairCounts-shaped pair of tables bucketed by uri."""
    uris = spark.range(0, 2000).select(
        F.concat(F.lit("u"), (F.col("id") % 97)).alias("uri"),
        F.col("id").alias("n"))
    pairs = spark.range(0, 3000).select(
        F.concat(F.lit("u"), (F.col("id") % 97)).alias("uri"),
        F.concat(F.lit("sf"), (F.col("id") % 13)).alias("sf"),
        F.lit(1).alias("c"))
    write_bucketed(uris, "t_uri_counts", str(tmp_path / "uc"), "uri",
                   buckets=8)
    write_bucketed(pairs, "t_pair_counts", str(tmp_path / "pc"), "uri",
                   buckets=8)
    yield "t_uri_counts", "t_pair_counts"
    spark.sql("DROP TABLE IF EXISTS t_uri_counts")
    spark.sql("DROP TABLE IF EXISTS t_pair_counts")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_catalog_holds_bucket_spec(spark, bucketed_counts):
    info = bucket_info(spark, bucketed_counts[0])
    assert info["buckets"] == 8
    assert info["bucket_columns"] == ["uri"]
    assert info["sort_columns"] == ["uri"]


def test_bucketed_join_is_exchange_free(spark, bucketed_counts):
    left, right = bucketed_counts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, left, right, "uri")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # values match the unbucketed join exactly
        raw = (spark.table(left).join(spark.table(right), "uri")
               .groupBy().agg(F.count("*"), F.sum("n"), F.sum("c")).first())
        got = j.groupBy().agg(F.count("*"), F.sum("n"), F.sum("c")).first()
        assert raw == got
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_skips_exchange(spark, bucketed_counts):
    agg = spark.table(bucketed_counts[1]).groupBy("uri") \
        .agg(F.sum("c").alias("c"))
    assert "Exchange" not in _plan(agg)


def test_unbucketed_baseline_does_shuffle(spark, bucketed_counts, tmp_path):
    """Control: the same join over plain parquet paths (bucket metadata
    lost) re-introduces the exchanges — the layout, not the data, is
    what removes them."""
    left, right = bucketed_counts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table(left).write.parquet(str(tmp_path / "flat_a"))
        b = spark.table(right).write.parquet(str(tmp_path / "flat_b"))
        j = spark.read.parquet(str(tmp_path / "flat_a")).join(
            spark.read.parquet(str(tmp_path / "flat_b")), "uri")
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_mismatched_bucket_counts_shuffle_one_side(spark, tmp_path):
    """The contract the module docstring warns about: same key but
    different bucket counts is NOT co-located (without coalescing)."""
    a = spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id") % 31).alias("k"),
        F.col("id").alias("v"))
    write_bucketed(a, "t_a8", str(tmp_path / "a8"), "k", buckets=8)
    write_bucketed(a, "t_b4", str(tmp_path / "b4"), "k", buckets=4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled",
                   "false")
    try:
        j = co_located_join(spark, "t_a8", "t_b4", "k")
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled")
        spark.sql("DROP TABLE IF EXISTS t_a8")
        spark.sql("DROP TABLE IF EXISTS t_b4")
