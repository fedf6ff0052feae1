"""Structured-data extraction from raw HTML — the Web-Data-Commons-
style KG source: most real-world KG construction from Common Crawl
starts from embedded JSON-LD blocks and OpenGraph/meta properties, not
from running text, so a "switchable" engine needs both lanes next to
the NLP annotate pipeline.

Two extractors over (url, html) pages:

- :func:`meta_property_triples` — ``<meta property|name=… content=…>``
  tags (OpenGraph ``og:*``, ``twitter:*``, ``article:*``, plain
  ``description``/``keywords``) as (url, pred, obj) triples. Pure
  native expressions: one ``regexp_extract_all`` for the tags, two
  nested ``regexp_extract`` for the attributes — JVM-side end to end,
  no Python in the scan. Attribute order inside the tag doesn't
  matter; unquoted/malformed tags are skipped (regex simply doesn't
  match), which is the tolerant-parse convention of the anchors lane.
- :func:`jsonld_triples` — ``<script type="application/ld+json">``
  blocks parsed with the stdlib JSON parser in one Arrow-batched pass
  (JSON-LD is JSON; a regex cannot parse it — this is the honest
  Python boundary, same shape as ``extract_anchors``). Each top-level
  node (or each element of a top-level array / ``@graph``) flattens to
  triples: ``@id`` names the node (else ``url#jsonld-<i>``), ``@type``
  emits ``rdf:type``, scalars emit (node, key, value), arrays emit one
  triple per element, nested objects emit an edge to a deterministic
  child id (``<parent>/<key>-<j>``). Malformed JSON skips the block,
  counted nowhere — crawl reality.

Scale shape: both extractors are per-page maps — no shuffle at all;
the html payload never leaves the scan stage. Output triples are
small; dedup/aggregation is the caller's choice.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

META_TAG_RE = r"(?i)<meta\s[^>]*>"
# the (?:^|[\s"']) boundary stops data-name=/data-content= style
# attributes from matching as substrings; RE2-compatible (no
# lookbehind) because the DuckDB oracle must run the SAME pattern
_PROP_RE = r'(?i)(?:^|[\s"\'])(?:property|name)\s*=\s*"([^"]+)"'
_CONTENT_RE = r'(?i)(?:^|[\s"\'])content\s*=\s*"([^"]*)"'

JSONLD_BLOCK_RE = (r'(?is)<script[^>]*type\s*=\s*"application/ld\+json"'
                   r"[^>]*>(.*?)</script>")

TRIPLE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
])


def meta_property_triples(pages: DataFrame, html_col: str = "html",
                          url_col: str = "url") -> DataFrame:
    """(url, pred, obj) from ``<meta property=… content=…>`` tags —
    JVM-native (regexp only), zero Python, zero shuffle. The page url
    is the implicit subject."""
    html = F.decode(F.col(html_col), "UTF-8")
    tags = F.regexp_extract_all(html, F.lit(META_TAG_RE), 0)
    parsed = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, _PROP_RE, 1).alias("pred"),
            F.regexp_extract(t, _CONTENT_RE, 1).alias("obj")))
    return (pages.select(F.col(url_col).alias("url"),
                         F.explode(parsed).alias("m"))
            .select("url", "m.pred", "m.obj")
            .filter((F.col("pred") != "") & (F.col("obj") != "")))


def _flatten_node(url: str, node, idx: int, out: list,
                  node_id: str | None = None) -> None:
    if not isinstance(node, dict):
        return
    nid = node_id or node.get("@id") or f"{url}#jsonld-{idx}"
    if not isinstance(nid, str):
        nid = f"{url}#jsonld-{idx}"
    for key in sorted(node):
        if key == "@id":
            continue
        val = node[key]
        pred = "rdf:type" if key == "@type" else key
        vals = val if isinstance(val, list) else [val]
        for j, v in enumerate(vals):
            if isinstance(v, dict):
                child = v.get("@id")
                if not isinstance(child, str):
                    child = f"{nid}/{key}-{j}"
                out.append((url, nid, pred, child))
                _flatten_node(url, v, idx, out, node_id=child)
            elif v is None:
                continue
            else:
                if isinstance(v, bool):
                    v = "true" if v else "false"
                elif isinstance(v, float):
                    # stdlib json accepts Infinity/NaN — int(v) would
                    # raise; non-finite numbers are invalid JSON, skip
                    if v != v or v in (float("inf"), float("-inf")):
                        continue
                    if v == int(v):
                        v = int(v)
                out.append((url, nid, pred, str(v)))


def jsonld_triples(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """(url, subj, pred, obj) from every embedded JSON-LD block — one
    Arrow-batched pass (stdlib json; malformed blocks skipped)."""
    import re
    block_re = re.compile(JSONLD_BLOCK_RE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list = []
            for url, html in zip(b[url_col], b[html_col]):
                if html is None:
                    continue
                text = (bytes(html).decode("utf-8", "replace")
                        if not isinstance(html, str) else html)
                idx = 0
                for block in block_re.findall(text):
                    try:
                        doc = json.loads(block)
                    except (ValueError, TypeError):
                        continue
                    nodes = (doc.get("@graph", [doc])
                             if isinstance(doc, dict) else doc)
                    if not isinstance(nodes, list):
                        continue
                    for node in nodes:
                        _flatten_node(url, node, idx, rows)
                        idx += 1
            yield pd.DataFrame(rows,
                               columns=["url", "subj", "pred", "obj"])

    return pages.select(url_col, html_col).mapInPandas(run, TRIPLE_SCHEMA)


class _MicrodataParser:
    """HTML5-microdata walker on the stdlib HTMLParser with a real
    element stack: an ``itemscope`` opens a node (``itemtype`` →
    rdf:type; nested scopes become edges to deterministic child ids),
    ``itemprop`` binds the next value — an href/src/content attribute
    if present, else the element's text content. An end tag pops the
    stack to its matching open tag (popping any frames the markup left
    open — tolerant recovery); a stray end tag is ignored; frames
    still open at EOF are flushed, so never-closed markup keeps its
    triples. Inline formatting inside a text prop (``<b>``, ``<i>``…)
    pushes a plain frame and cannot close the prop or a scope — the
    defect class a tag-name-whitelist close heuristic has."""

    VALUE_ATTRS = ("content", "href", "src", "datetime")
    VOID = {"meta", "link", "img", "br", "hr", "input", "source",
            "area", "base", "col", "embed", "track", "wbr"}

    def __init__(self, url: str):
        from html.parser import HTMLParser

        self.url = url
        self.rows: list[tuple[str, str, str, str]] = []
        self._n = 0
        self._scopes: list[str] = []
        # element stack: (tag, kind, payload); kind 'scope' | 'prop'
        # (payload = [nid, prop, buf]) | 'plain'
        self._stack: list[tuple] = []

        outer = self

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                outer._start(tag, dict(attrs),
                             self_closing=tag in outer.VOID)

            def handle_startendtag(self, tag, attrs):
                outer._start(tag, dict(attrs), self_closing=True)

            def handle_endtag(self, tag):
                outer._end(tag)

            def handle_data(self, data):
                # innermost open text prop collects the data
                for frame in reversed(outer._stack):
                    if frame[1] == "prop":
                        frame[2][2].append(data)
                        break

        self._parser = P(convert_charrefs=True)

    def _new_id(self, attrs) -> str:
        nid = attrs.get("itemid") or f"{self.url}#md-{self._n}"
        self._n += 1
        return nid

    def _start(self, tag: str, attrs: dict, self_closing: bool) -> None:
        is_scope = "itemscope" in attrs
        prop = attrs.get("itemprop")
        if is_scope:
            nid = self._new_id(attrs)
            if prop and self._scopes:
                self.rows.append((self.url, self._scopes[-1], prop, nid))
            for t in (attrs.get("itemtype") or "").split():
                self.rows.append((self.url, nid, "rdf:type", t))
            if not self_closing:
                self._scopes.append(nid)
                self._stack.append((tag, "scope", None))
            return
        if prop and self._scopes:
            for a in self.VALUE_ATTRS:
                if attrs.get(a):
                    self.rows.append(
                        (self.url, self._scopes[-1], prop, attrs[a]))
                    break
            else:
                if not self_closing:
                    self._stack.append(
                        (tag, "prop", [self._scopes[-1], prop, []]))
                    return
            if not self_closing:
                self._stack.append((tag, "plain", None))
            return
        if not self_closing:
            self._stack.append((tag, "plain", None))

    def _close_frame(self, frame) -> None:
        _tag, kind, payload = frame
        if kind == "scope":
            if self._scopes:
                self._scopes.pop()
        elif kind == "prop":
            nid, prop, buf = payload
            text = " ".join("".join(buf).split())
            if text:
                self.rows.append((self.url, nid, prop, text))

    def _end(self, tag: str) -> None:
        if not any(f[0] == tag for f in self._stack):
            return  # stray end tag — ignore (tolerant convention)
        while self._stack:
            frame = self._stack.pop()
            self._close_frame(frame)
            if frame[0] == tag:
                break

    def parse(self, html: str):
        try:
            self._parser.feed(html)
            self._parser.close()
        except Exception:
            pass
        while self._stack:         # flush never-closed markup at EOF
            self._close_frame(self._stack.pop())
        return self.rows


def microdata_triples(pages: DataFrame, html_col: str = "html",
                      url_col: str = "url") -> DataFrame:
    """(url, subj, pred, obj) from HTML5 microdata (itemscope /
    itemprop / itemtype) — the third structured-data lane beside
    JSON-LD and meta properties. One Arrow-batched pass per page, no
    shuffle; anonymous scopes get deterministic ``url#md-<i>`` ids."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list = []
            for url, html in zip(b[url_col], b[html_col]):
                if html is None:
                    continue
                text = (bytes(html).decode("utf-8", "replace")
                        if not isinstance(html, str) else html)
                rows.extend(_MicrodataParser(url).parse(text))
            yield pd.DataFrame(rows,
                               columns=["url", "subj", "pred", "obj"])

    return pages.select(url_col, html_col).mapInPandas(run, TRIPLE_SCHEMA)
