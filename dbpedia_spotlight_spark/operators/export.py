"""Training-data export from the annotated corpus.

A KG-construction pipeline's annotations double as distant supervision:
each (mention, entity) link plus its surrounding text is one training
example for NER / entity-linking models. ``mention_contexts`` exports
exactly that — the mention span and a bounded character window either
side, aligned to the SAME extracted text the pipeline's offsets index.

Scale: ONE url-keyed equi-join (annotations × pages — co-partitioned
when the page store is bucketed by url) followed by pure substring
projections that stay in whole-stage codegen. The window bounds what
the projection keeps: downstream consumers receive ≤ 2·window + |span|
characters per example, never whole documents. Nothing keys on host;
a mega-doc's examples spread per-mention after the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mention_contexts(annotations: DataFrame, pages: DataFrame,
                     window: int = 40,
                     text_col: str = "text") -> DataFrame:
    """(url, begin, end, surface_form, uri, left_ctx, mention_text,
    right_ctx) — one distant-supervision example per annotation.
    ``left_ctx`` is the ≤``window`` characters before the span,
    ``right_ctx`` the ≤``window`` after, ``mention_text`` the exact
    span sliced from ``pages.text_col`` (1-based substring arithmetic,
    clipped at both document edges — identical semantics in Spark and
    DuckDB, which the oracle pair pins). Offsets are the pipeline's:
    character positions into the same text column the annotate run
    read, so ``mention_text`` reproduces the matched surface bytes."""
    if window < 0:
        raise ValueError("window must be >= 0")
    w = int(window)
    p = pages.select("url", F.col(text_col).alias("_doc_text"))
    a = annotations.select("url", "begin", "end", "surface_form", "uri")
    return a.join(p, "url").select(
        "url", "begin", "end", "surface_form", "uri",
        F.expr(f"substring(_doc_text, greatest(1, begin - {w} + 1), "
               f"least({w}, begin))").alias("left_ctx"),
        F.expr("substring(_doc_text, begin + 1, end - begin)")
         .alias("mention_text"),
        F.expr(f"substring(_doc_text, end + 1, {w})").alias("right_ctx"),
    )
