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


def mirror_hosts(docs: DataFrame, url_col: str = "source",
                 text_col: str = "text", min_hosts: int = 2) -> DataFrame:
    """Mirror detection: byte-identical content served from ≥
    ``min_hosts`` distinct hosts (mirror sites, boilerplate farms, CDN
    vhosts). Exact-dedup collapses these to one row but loses the
    cross-host signal; this keeps it — a host appearing in many mirror
    groups is a candidate for host-level filtering. One scan, one
    shuffle keyed by the 128-bit content hash (uniform — no host skew
    reaches this exchange)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"),
                    host_col(F.col(url_col)).alias("host"))
        .groupBy("text_hash")
        .agg(F.countDistinct("host").alias("n_hosts"),
             F.count("*").alias("n_copies"),
             F.min("host").alias("first_host"))
        .filter(F.col("n_hosts") >= min_hosts)
    )


def latest_capture(docs: DataFrame, key_col: str = "url",
                   ts_col: str = "warc_ts",
                   tiebreak_col: str | None = None) -> DataFrame:
    """Recrawl dedup: keep the newest capture per ``key_col`` (input_hint
    shape: Common-Crawl pages carry (url, warc_ts) and popular urls are
    re-crawled many times — annotating every capture multiplies work and
    double-counts triples).

    Plan shape: ``groupBy(key).agg(max(struct(ts, tiebreak, payload)))``
    — ONE shuffle with map-side combine (partial max per input
    partition), so a url recrawled 10^4 times sends ONE row per map
    task into the exchange. The row_number()-over-window alternative
    ships every capture of a hot url into a single task and sorts it —
    exactly the mega-host straggler this module exists to avoid.

    Ties on ``ts_col`` break by ``tiebreak_col`` (largest wins; defaults
    to nothing — ties then resolve by the remaining payload columns'
    struct order, deterministic but arbitrary, so pass a tiebreaker for
    cross-engine replay). Output columns = input columns, one row per
    key."""
    payload = [c for c in docs.columns
               if c not in (key_col, ts_col, tiebreak_col)]
    lead = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    m = F.max(F.struct(*lead, *payload)).alias("m")
    kept = docs.groupBy(key_col).agg(m)
    return kept.select(
        key_col, *[F.col(f"m.{c}").alias(c) for c in lead + payload]
    ).select(docs.columns)


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
