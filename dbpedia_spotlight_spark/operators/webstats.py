"""Host-level corpus statistics and skew detection for web corpora
(north_star: "mega-hosts … handled with salted repartitioning").

A Common-Crawl-shaped corpus concentrates documents on a few mega-hosts
(re-crawled news sites, wikis, link farms); any per-host shuffle —
dedup-within-host, per-host quality aggregation, host-partitioned writes
— then sees a handful of partitions carrying orders of magnitude more
rows than the rest. These operators make that skew *visible and
actionable* before it becomes a straggler:

- ``host_stats``: one groupBy over the corpus — docs/chars per host.
- ``host_skew_report``: flags hosts above ``skew_factor`` × the mean
  host size and recommends the salt-bucket count
  (``ceil(n_docs / target_docs_per_task)``) to feed
  ``operators.skew.repartition_salted`` / AQE skew-join thresholds.

Everything is native column expressions (JVM-side, one scan, one
well-keyed shuffle whose key cardinality = |hosts| ≪ corpus rows); the
scalar mean joins back via a broadcast one-row aggregate, not a global
window (a ``Window.partitionBy()`` would funnel all hosts through one
task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# scheme-optional authority: 'https://en.site.org/x' and 'en.site.org/x'
# both yield 'en.site.org'; explicit char classes only (Java ≡ RE2)
_HOST_RE = "^(?:[a-z][a-z0-9+.-]*://)?([^/]+)"


def host_col(url_col: F.Column) -> F.Column:
    return F.regexp_extract(url_col, _HOST_RE, 1)


def host_stats(docs: DataFrame, url_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """(host, n_docs, n_chars) — one scan, one |hosts|-key shuffle."""
    return (
        docs.groupBy(host_col(F.col(url_col)).alias("host"))
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.length(F.col(text_col))).alias("n_chars"))
    )


def host_skew_report(docs: DataFrame, url_col: str = "source",
                     text_col: str = "text",
                     skew_factor: float = 10.0,
                     target_docs_per_task: int = 50_000) -> DataFrame:
    """host_stats + skew flag + salt recommendation.

    ``skewed`` = host carries more than ``skew_factor`` × the mean
    host's documents; ``salt_buckets`` = integer-exact
    ``ceil(n_docs / target_docs_per_task)`` (min 1) — the ``n_salt`` to
    pass to ``repartition_salted`` so no single task exceeds the target.
    Integer arithmetic only, so the number replays exactly in any SQL
    engine."""
    stats = host_stats(docs, url_col, text_col)
    mean_row = stats.agg(F.avg("n_docs").alias("mean_docs"))
    t = target_docs_per_task
    return (
        stats.crossJoin(F.broadcast(mean_row))
        .select(
            "host", "n_docs", "n_chars",
            (F.col("n_docs") > F.lit(skew_factor) * F.col("mean_docs"))
            .alias("skewed"),
            # `div` is true integer division (Spark `/` is double)
            F.expr(f"greatest((n_docs + {t} - 1) div {t}, 1L)")
            .alias("salt_buckets"),
        )
    )
