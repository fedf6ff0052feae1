"""Skew-handling utilities (north_star: "skewed surface forms …
handled with salted repartitioning and candidate-list pruning before the
disambiguation shuffle").

The flagship fused path removes the disambiguation shuffle entirely
(pipeline.py), which is the strongest skew fix. These utilities cover the
cases where a shuffle IS required — the relational twin's per-key windows
and aggregations over skewed keys (stopword-like surface forms, mega-host
urls):

- ``repartition_salted``: spread one hot key over ``n_salt`` partitions.
- ``salted_topk``: two-phase per-key top-k — partial top-k per
  (key, salt) bucket, then final top-k over the survivors. The shuffle
  carries ≤ n_salt·k rows per key instead of the key's full fan-out, so a
  surface form with 10^6 candidate rows costs the final window only
  n_salt·k rows.
- ``salted_count``: two-phase count aggregation (partial per salt →
  merge), the classic salted groupBy.

All are semantics-preserving: tests assert equality against the
unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_salt(df: DataFrame, n_salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt derived from the whole row hash (stable
    across retries — no rand(), which breaks task re-execution)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(n_salt)).cast("int")
    )


def repartition_salted(df: DataFrame, key_cols: list[str], n_salt: int) -> DataFrame:
    """Repartition on (key, salt) so one hot key spans n_salt partitions."""
    salted = with_salt(df, n_salt)
    return salted.repartition(*[F.col(c) for c in key_cols], F.col("_salt")) \
        .drop("_salt")


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list,
    k: int,
    n_salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-key top-k that survives key skew.

    Phase 1: rank within (key, salt) and keep rank ≤ k — executed after a
    shuffle on the salted key, so a hot key's rows are spread n_salt ways.
    Phase 2: final rank over the ≤ n_salt·k survivors per key.
    Result is IDENTICAL to a single window top-k (same deterministic
    order columns)."""
    salted = with_salt(df, n_salt)
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    partial = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        partial.drop("_salt")
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def salted_count(df: DataFrame, key_cols: list[str], n_salt: int = 16,
                 out_col: str = "cnt") -> DataFrame:
    """Two-phase count by key: per-(key, salt) partial counts, then merge.
    (Spark's hash aggregate already partial-aggregates map-side; this form
    is for when the *shuffle key itself* must be salted, e.g. building a
    skewed key's histogram through a repartition.)"""
    salted = with_salt(df, n_salt)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count("*").alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))
