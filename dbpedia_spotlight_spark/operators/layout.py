"""Bucketed table layout: co-located joins and aggregations.

At 100 TB the dominant cost of the model-build / KG-maintenance joins
(uriCounts ⋈ pairCounts, snapshot ⋈ delta, incidence ⋈ edges) is the
exchange — both sides re-hash-partitioned per join. Spark's bucketed
layout removes it structurally: a table written with ``bucketBy(n, k)``
is ALREADY hash-partitioned by k on disk, so a join or aggregation keyed
on k reads co-located buckets and skips the shuffle entirely (and with
``sortBy`` the sort too). The win repeats on every downstream job that
keys on k — you pay one layout write, then every daily
model-refresh/maintenance join is exchange-free.

Rules the tests pin (they're easy to silently lose):

- both sides bucketed by the SAME key into the SAME bucket count
  (mismatched counts re-shuffle one side unless one count divides the
  other and ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on),
- the join key must be exactly the bucket key prefix,
- bucketed tables go through the catalog (``saveAsTable`` — plain
  ``parquet(path)`` writes lose the bucket metadata; reading the files
  directly yields an unbucketed frame).

This module is deliberately thin — the point is the LAYOUT CONTRACT,
not new algebra. ``write_bucketed`` registers an external table at an
explicit path (so the data outlives DROP TABLE and tests can clean up),
``bucket_info`` reports what the catalog thinks, and the plan asserts
live in tests/test_layout.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, path: str, key: str,
                   buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as an external bucketed table ``name`` at ``path``,
    hash-bucketed (and optionally sorted) by ``key``. Re-creating an
    existing name replaces the catalog entry."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = df.write.format("parquet").mode(mode).option("path", path) \
        .bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def bucket_info(spark: SparkSession, name: str) -> dict:
    """Bucket spec the catalog holds for ``name``:
    {'buckets': int, 'bucket_columns': [..], 'sort_columns': [..]}."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    cols = re.findall(r"`([^`]+)`", info.get("Bucket Columns", ""))
    sort_cols = re.findall(r"`([^`]+)`", info.get("Sort Columns", ""))
    n = int(info["Num Buckets"]) if "Num Buckets" in info else 0
    return {"buckets": n, "bucket_columns": cols, "sort_columns": sort_cols}


def co_located_join(spark: SparkSession, left: str, right: str,
                    on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two CATALOG tables — when both are bucketed by the join key
    into the same bucket count this is exchange-free by layout (the
    plan test pins it). Exists so call sites say what they mean; the
    join itself is ordinary DataFrame algebra."""
    return spark.table(left).join(spark.table(right), on, how)
