"""Anchor-text lexicon construction from raw web pages.

The reference's surface-form lexicon (pairCounts: c(sf, entity)) is
built from Wikipedia anchor statistics. At web scale the same signal
comes from the crawl itself: every ``<a href>`` is a (surface form →
target) vote, and aggregating those votes yields a lexicon delta that
``plans/model_build.merge_count_tables`` can fold into the base model
without a corpus re-scan — the KG-construct loop closes (crawl →
anchors → lexicon → better spotting on the next crawl).

Two stages, each scale-shaped:

- ``extract_anchors``: ONE ``mapInPandas`` pass over (url, html) with a
  tolerant stdlib HTMLParser (same tolerance contract as
  ``functions/extraction.strip_html`` — malformed pages degrade, never
  crash). The html payload is projected away before anything downstream
  can shuffle it; output rows are tiny (url, href, anchor_text).
- ``anchor_lexicon``: canonicalize the href (``operators/urlnorm`` —
  the same subject-key hygiene used for triples), then ONE map-side-
  combinable groupBy on (sf, uri). Key cardinality = |distinct anchor
  phrases × targets| ≪ corpus rows; no skew beyond what the salting
  utilities already handle for stopword-like anchors.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BooleanType, StringType, StructField,
                               StructType)

ANCHOR_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("href", StringType()),
    StructField("anchor_text", StringType()),
    StructField("nofollow", BooleanType()),
])



class _AnchorParser(HTMLParser):
    """Collect (href, visible text) per <a href=...> element. Nested
    inline markup inside the anchor contributes its text; anchors do
    not nest in valid HTML — a nested <a> closes the outer one, which
    is the browser behavior too."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[tuple[str, str, bool]] = []
        self.meta_noindex = False
        self.meta_nofollow = False
        self._href: str | None = None
        self._nofollow = False
        self._parts: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            text = " ".join("".join(self._parts).split())
            if text:
                self.out.append((self._href, text, self._nofollow))
        self._href, self._nofollow, self._parts = None, False, []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "a":
            self._flush()
            a = dict(attrs)
            href = a.get("href")
            self._href = href if href else None
            rel = (a.get("rel") or "").lower().split()
            self._nofollow = "nofollow" in rel
        elif tag == "meta":
            a = {k: (v or "") for k, v in attrs}
            if a.get("name", "").lower() == "robots":
                directives = {
                    d.strip() for d in a.get("content", "").lower().split(",")
                }
                self.meta_noindex |= bool({"noindex", "none"} & directives)
                self.meta_nofollow |= bool({"nofollow", "none"} & directives)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._parts.append(data)


def _parse(html: bytes | str) -> _AnchorParser:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _AnchorParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p._flush()
    return p


def parse_anchors(html: bytes | str) -> list[tuple[str, str, bool]]:
    """Pure per-page form: [(href, anchor_text, nofollow)], document
    order. Fragment-only links (href starting '#') are intra-page
    navigation, not entity votes — dropped here. A page-level
    ``<meta name="robots" content="nofollow">`` marks EVERY anchor
    nofollow (the directive's defined meaning)."""
    p = _parse(html)
    return [(h, t, nf or p.meta_nofollow) for (h, t, nf) in p.out
            if not h.startswith("#")]


def parse_robots_meta(html: bytes | str) -> tuple[bool, bool]:
    """(noindex, nofollow) from <meta name=robots>; 'none' ≡ both."""
    p = _parse(html)
    return p.meta_noindex, p.meta_nofollow


def extract_anchors(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """(url, href, anchor_text) — one Arrow-batched pass; the html
    payload never leaves the scan stage."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, html in zip(b[url_col], b[html_col]):
                if html is None:
                    continue
                for href, text, nofollow in parse_anchors(html):
                    rows.append((url, href, text, nofollow))
            yield pd.DataFrame(
                rows, columns=["url", "href", "anchor_text", "nofollow"])

    return pages.select(url_col, html_col).mapInPandas(run, ANCHOR_SCHEMA)


def robots_meta(pages: DataFrame, html_col: str = "html",
                url_col: str = "url") -> DataFrame:
    """(url, noindex, nofollow) page gate from <meta name=robots> —
    noindex pages must not reach corpus emission / triple subjects;
    nofollow pages contribute no anchor votes. Same one-pass,
    payload-stays-in-scan shape as extract_anchors. The key column's
    type follows the input (url string or numeric doc id alike)."""
    schema = StructType([
        StructField("url", pages.schema[url_col].dataType),
        StructField("noindex", BooleanType()),
        StructField("nofollow", BooleanType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, html in zip(b[url_col], b[html_col]):
                if html is None:
                    rows.append((url, False, False))
                    continue
                ni, nf = parse_robots_meta(html)
                rows.append((url, ni, nf))
            yield pd.DataFrame(rows, columns=["url", "noindex", "nofollow"])

    return pages.select(url_col, html_col).mapInPandas(run, schema)


def anchor_lexicon(anchors: DataFrame, min_count: int = 1,
                   canonicalize: bool = True,
                   include_nofollow: bool = False) -> DataFrame:
    """Aggregate anchors into a pairCounts-shaped delta (sf, uri, count)
    — lowercased sf, matching the store's lookup normalization
    (plans/model_build.pair_counts_from_links), so the result feeds
    merge_count_tables(base, delta, ["sf", "uri"]) directly.
    rel=nofollow anchors (spam/UGC links — explicitly not endorsements)
    are excluded from the vote by default."""
    from dbpedia_spotlight_spark.operators.urlnorm import canonical_url_col
    if not include_nofollow and "nofollow" in anchors.columns:
        anchors = anchors.filter(~F.col("nofollow"))
    uri = F.col("href")
    if canonicalize:
        uri = canonical_url_col(uri)
    out = (
        anchors.select(F.lower("anchor_text").alias("sf"), uri.alias("uri"))
        .groupBy("sf", "uri")
        .agg(F.count("*").alias("count"))
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def host_link_edges(anchors: DataFrame, url_col: str = "url",
                    include_nofollow: bool = False,
                    min_count: int = 1) -> DataFrame:
    """Host-level web graph from anchors: (uri_a=source host,
    uri_b=target host, n_docs=link count), cross-host edges only
    (intra-site navigation would dominate and says nothing about
    authority). Column names match ``operators/graph.pagerank``'s edge
    contract, so ``pagerank(host_link_edges(extract_anchors(pages)))``
    composes directly — rank over the undirected co-citation
    approximation that op implements. ONE groupBy whose key cardinality
    is |host pairs| ≪ |anchors|. Only absolute hrefs (scheme://) carry a
    target host — relative links are intra-site by definition and drop
    with the self-edge filter."""
    from dbpedia_spotlight_spark.operators.urlnorm import canonical_url_col
    from dbpedia_spotlight_spark.operators.webstats import host_col
    if not include_nofollow and "nofollow" in anchors.columns:
        anchors = anchors.filter(~F.col("nofollow"))
    e = anchors.select(
        host_col(F.col(url_col)).alias("uri_a"),
        F.regexp_extract(canonical_url_col(F.col("href")),
                         "^[a-z][a-z0-9+.-]*://([^/]+)", 1).alias("uri_b"),
    ).filter(
        (F.col("uri_a") != F.col("uri_b"))
        & (F.col("uri_a") != "") & (F.col("uri_b") != "")
    )
    out = e.groupBy("uri_a", "uri_b").agg(F.count("*").alias("n_docs"))
    if min_count > 1:
        out = out.filter(F.col("n_docs") >= min_count)
    return out
