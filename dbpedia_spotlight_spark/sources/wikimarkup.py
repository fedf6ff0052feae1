"""Wiki-markup source (SURVEY.md §2.1 S3) — strip markup, keep link
anchors as spots.

Reference behavior: ``core/.../spot/WikiMarkupSpotter.scala`` [U] treats
``[[Target|anchor]]`` links in wikitext as pre-annotated spots. The same
parse is how the wikistats training counts are produced upstream, so this
source does double duty here: (a) a spotter input, (b) the training-link
extractor feeding the offline model build (plans/model_build.py M1–M4).

Pure-python deterministic parser (no mwparserfromhell in sandbox):
templates ``{{..}}`` (nested), refs/comments, bold/italic quotes and
headings are removed; ``[[Target|anchor]]`` / ``[[Target]]`` emit the
anchor text into the output with exact char offsets recorded.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from dbpedia_spotlight_spark.plans.closure import wiki_title_to_dbpedia_uri

_LINK_RE = re.compile(r"\[\[([^\[\]|]+)(?:\|([^\[\]]*))?\]\]")
_REF_RE = re.compile(r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>", re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_HEADING_RE = re.compile(r"^=+\s*(.*?)\s*=+\s*$", re.MULTILINE)


def _drop_templates(s: str) -> str:
    """Remove {{...}} with nesting, deterministically."""
    out = []
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        if s.startswith("{{", i):
            depth += 1
            i += 2
        elif s.startswith("}}", i) and depth > 0:
            depth -= 1
            i += 2
        else:
            if depth == 0:
                out.append(s[i])
            i += 1
    return "".join(out)


def strip_wiki_markup(wikitext: str) -> tuple[str, list[tuple[int, int, str, str]]]:
    """→ (plain_text, anchors) with anchors = [(begin, end, anchor, target)]
    and begin/end char offsets into plain_text (offset bookkeeping as in
    the annotate path — anchors are the planted training truth)."""
    s = _COMMENT_RE.sub("", wikitext)
    s = _REF_RE.sub("", s)
    s = _drop_templates(s)
    s = _HEADING_RE.sub(lambda m: m.group(1), s)
    s = s.replace("'''", "").replace("''", "")

    out_parts: list[str] = []
    anchors: list[tuple[int, int, str, str]] = []
    pos = 0
    out_len = 0
    for m in _LINK_RE.finditer(s):
        pre = s[pos:m.start()]
        out_parts.append(pre)
        out_len += len(pre)
        target = m.group(1).strip()
        anchor = m.group(2) if m.group(2) is not None else m.group(1)
        anchor = anchor.strip()
        if target.lower().startswith(("file:", "image:", "category:")):
            pos = m.end()
            continue  # media/category links render nothing
        if anchor:
            anchors.append((out_len, out_len + len(anchor), anchor, target))
            out_parts.append(anchor)
            out_len += len(anchor)
        pos = m.end()
    tail = s[pos:]
    out_parts.append(tail)
    return "".join(out_parts), anchors


WIKI_LINKS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("begin", IntegerType()),
    StructField("end", IntegerType()),
    StructField("sf", StringType()),
    StructField("uri", StringType()),
])

WIKI_TEXT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("text", StringType()),
])


def wiki_links(df: DataFrame, wikitext_col: str = "wikitext",
               url_col: str = "url") -> DataFrame:
    """(url, wikitext) → training links (url, begin, end, sf, uri) —
    the wikistats pairCounts source shape (db/io/* [U]); targets encoded
    as DBpedia URIs (K3)."""
    def run(batches):
        for pdf in batches:
            rows = []
            for url, wt in zip(pdf[url_col], pdf[wikitext_col]):
                _, anchors = strip_wiki_markup(wt)
                for (b, e, anchor, target) in anchors:
                    rows.append((url, b, e, anchor,
                                 wiki_title_to_dbpedia_uri(target)))
            yield pd.DataFrame(rows, columns=[f.name for f in WIKI_LINKS_SCHEMA.fields])

    return df.select(url_col, wikitext_col).mapInPandas(run, WIKI_LINKS_SCHEMA)


def wiki_text(df: DataFrame, wikitext_col: str = "wikitext",
              url_col: str = "url") -> DataFrame:
    """(url, wikitext) → (url, text) extracted corpus rows."""
    def run(batches):
        for pdf in batches:
            rows = []
            for url, wt in zip(pdf[url_col], pdf[wikitext_col]):
                text, _ = strip_wiki_markup(wt)
                rows.append((url, text))
            yield pd.DataFrame(rows, columns=["url", "text"])

    return df.select(url_col, wikitext_col).mapInPandas(run, WIKI_TEXT_SCHEMA)
