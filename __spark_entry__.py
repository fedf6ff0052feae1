"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fused annotate pipeline (FSA spotting
+ generative disambiguation, SURVEY.md §3.1) on the sf0.001 documents
table. ``queries()`` / ``oracle_sql()`` expose EXACTLY 50 entries (the
driver checks at most the first 50, in order) covering every implemented
operator from SURVEY.md §2 — ALL 50 are paired with an independent
DuckDB oracle, including the fused flagship (imperative parts collapse
to relational algebra on this corpus), the Porter-stemmed annotate, and
the real-table ``ann_ivf`` (its Lloyd iterations unroll as CTE chains
over the same layout-independent sample).

Implementation lives in ``dbpedia_spotlight_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbpedia_spotlight_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_annotate_generative(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
