"""Sitemap source + crawl frontier (crawl-discovery edge of the KG
pipeline).

Common-Crawl-style construction starts from discovery: sitemap.xml
files (sitemaps.org protocol — ``<urlset>`` leaves and
``<sitemapindex>`` indirection) advertise what a host wants crawled and
when it last changed. This module parses fetched sitemap bodies into an
entry table and derives the *crawl frontier*: sitemap urls that were
never captured, or whose advertised ``lastmod`` is newer than the
newest stored capture — exactly the incremental slice
``run_pipeline --base-triples`` / ``streaming.kg_stream`` then folds
into the KG.

Scale notes: parsing is one ``mapInPandas`` pass over the fetched
bodies (the XML payload never shuffles — only the extracted entry rows
do); the frontier is ONE left join keyed on the canonical url (uniform
key space — a mega-host's million sitemap entries spread across
partitions), with the crawled side pre-aggregated to one row per url by
a map-side-combinable max. Nothing is quadratic; no window sorts.

Parsing is tolerant by design (real-world sitemaps are frequently
malformed): regex scan, namespace-insensitive, entity-unescaped,
bad ``lastmod`` values degrade to NULL rather than failing the shard —
the same degrade-per-record contract as ``sources/warc.py``.
"""

from __future__ import annotations

import datetime
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dbpedia_spotlight_spark.operators.urlnorm import canonical_url_col

ENTRY_SCHEMA = ("sitemap_url string, kind string, loc string, "
                "lastmod timestamp, changefreq string, priority double")

_ROOT_RE = re.compile(r"<\s*(urlset|sitemapindex)\b", re.I)
_BLOCK_RE = re.compile(r"<\s*(url|sitemap)\s*>(.*?)</\s*\1\s*>",
                       re.I | re.S)
_TAG_RES = {
    tag: re.compile(rf"<\s*{tag}\s*>\s*(.*?)\s*</\s*{tag}\s*>", re.I | re.S)
    for tag in ("loc", "lastmod", "changefreq", "priority")
}
_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&apos;", "'"))


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        if ent in s:
            s = s.replace(ent, ch)
    return s


def _parse_lastmod(raw: str) -> datetime.datetime | None:
    """W3C datetime subset: YYYY-MM-DD or full ISO with optional Z /
    offset; normalized to naive UTC (parquet timestamp convention used
    by the corpus tables). Malformed values degrade to None."""
    raw = raw.strip()
    if not raw:
        return None
    try:
        dt = datetime.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def parse_sitemap(xml: str) -> tuple[str, list[dict]]:
    """(kind, entries) where kind ∈ {'urlset', 'sitemapindex', ''} ('' =
    unrecognized body → zero entries, never an exception). Each entry:
    loc (required; blocks without one are skipped), lastmod
    (datetime|None), changefreq (str|None), priority (float|None)."""
    m = _ROOT_RE.search(xml or "")
    if not m:
        return "", []
    kind = m.group(1).lower()
    want = "sitemap" if kind == "sitemapindex" else "url"
    out: list[dict] = []
    for block_m in _BLOCK_RE.finditer(xml):
        if block_m.group(1).lower() != want:
            continue
        body = block_m.group(2)
        vals: dict = {}
        for tag, rx in _TAG_RES.items():
            t = rx.search(body)
            vals[tag] = _unescape(t.group(1).strip()) if t else None
        if not vals["loc"]:
            continue
        pr = vals["priority"]
        try:
            pr = float(pr) if pr is not None else None
        except ValueError:
            pr = None
        out.append({
            "loc": vals["loc"],
            "lastmod": _parse_lastmod(vals["lastmod"] or ""),
            "changefreq": (vals["changefreq"].lower()
                           if vals["changefreq"] else None),
            "priority": pr,
        })
    return kind, out


def read_sitemaps(docs: DataFrame, url_col: str = "url",
                  body_col: str = "text") -> DataFrame:
    """Fetched sitemap bodies → entry table (ENTRY_SCHEMA). One
    mapInPandas pass; the body bytes stay in their scan partition."""
    cols = [url_col, body_col]
    src = docs.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, body in zip(pdf[url_col], pdf[body_col]):
                kind, entries = parse_sitemap(body or "")
                for e in entries:
                    rows.append((u, kind, e["loc"], e["lastmod"],
                                 e["changefreq"], e["priority"]))
            yield pd.DataFrame(rows, columns=[
                "sitemap_url", "kind", "loc", "lastmod", "changefreq",
                "priority"])

    return src.mapInPandas(run, ENTRY_SCHEMA)


def crawl_frontier(entries: DataFrame, crawled: DataFrame,
                   url_col: str = "url",
                   ts_col: str = "warc_ts") -> DataFrame:
    """Frontier = urlset entries that are (a) never captured ('new') or
    (b) advertised newer than the newest capture ('updated': lastmod >
    max warc_ts). Entries without lastmod on an already-crawled url are
    NOT refetched (absence of lastmod is not evidence of change — the
    recrawl-dedup stage would drop an identical capture anyway).

    Both sides key on the canonical url (subject-key hygiene — mirrors
    and tracking-param variants collapse before the join). The crawled
    side reduces to one row per key via max() with map-side combine,
    then ONE left join decides each entry. Output: (loc, canon_url,
    lastmod, reason)."""
    e = (
        entries.filter(F.col("kind") == "urlset")
        .select(F.col("loc"),
                canonical_url_col(F.col("loc")).alias("canon_url"),
                F.col("lastmod"))
        .groupBy("canon_url")
        .agg(F.min("loc").alias("loc"), F.max("lastmod").alias("lastmod"))
    )
    c = (
        crawled.select(canonical_url_col(F.col(url_col)).alias("canon_url"),
                       F.col(ts_col).alias("_ts"))
        .groupBy("canon_url").agg(F.max("_ts").alias("last_seen"))
    )
    j = e.join(c, "canon_url", "left")
    return (
        j.withColumn(
            "reason",
            F.when(F.col("last_seen").isNull(), F.lit("new"))
            .when(F.col("lastmod").isNotNull()
                  & (F.col("lastmod") > F.col("last_seen")),
                  F.lit("updated")))
        .filter(F.col("reason").isNotNull())
        .select("loc", "canon_url", "lastmod", "reason")
    )


def expand_index(entries: DataFrame) -> DataFrame:
    """sitemapindex entries → the child-sitemap fetch list (loc +
    canonical key, deduplicated) — the next fetch round's input. The
    fetch itself is I/O outside this engine; the expansion is pure."""
    return (
        entries.filter(F.col("kind") == "sitemapindex")
        .select(F.col("loc"),
                canonical_url_col(F.col("loc")).alias("canon_url"))
        .dropDuplicates(["canon_url"])
    )


def fetch_rounds(frontier: DataFrame, per_host_limit: int = 100,
                 url_col: str = "canon_url",
                 salt: str = "fetch") -> DataFrame:
    """Politeness scheduling: split the frontier into fetch rounds so
    one round touches ≈ ``per_host_limit`` urls per host (a crawler
    drains round 0 everywhere, then round 1, … — per-host request rate
    is bounded by round pacing, not by a per-host queue).

    Skew design: the obvious ``row_number() over (partition by host)``
    funnels a mega-host's millions of frontier urls through ONE sort
    task. Instead: one map-side-combinable per-host count, one join to
    attach ``n_rounds = ceil(n/limit)``, and a pure-projection round
    assignment ``md5bucket(url#salt) % n_rounds`` — deterministic,
    layout-independent (same property as ``operators.sampling``), and
    replayable in SQL. Rounds hold ~limit urls per host in expectation
    (multinomial, not exact-capped); the exact-cap window form is only
    safe for small frontiers.

    Output: frontier columns + (host, n_rounds, fetch_round)."""
    if per_host_limit < 1:
        raise ValueError("per_host_limit must be >= 1")
    from dbpedia_spotlight_spark.operators.webstats import host_col
    f = frontier.withColumn("host", F.lower(host_col(F.col(url_col))))
    counts = (f.groupBy("host").agg(F.count("*").alias("_n"))
              .withColumn("n_rounds",
                          F.ceil(F.col("_n") / per_host_limit)
                          .cast("int"))
              .drop("_n"))
    # 60-bit md5 prefix: exact in a signed long, mirrors in DuckDB via
    # CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)
    bucket = F.conv(F.substring(
        F.md5(F.concat_ws("#", F.col(url_col), F.lit(salt))), 1, 15),
        16, 10).cast("long")
    return (f.join(counts, "host")
            .withColumn("fetch_round",
                        (bucket % F.col("n_rounds")).cast("int")))
