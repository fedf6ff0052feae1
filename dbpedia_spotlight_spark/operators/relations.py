"""Open relation extraction between co-mentioned entities.

The KG so far carries (mention, itsrdf:taIdentRef, entity) link triples
and co-mention edges; this operator adds RELATION CANDIDATES between
entities: for every pair of ADJACENT mentions in a document (no third
mention between them — adjacency in offset order gives that for free),
the normalized token span between them becomes a candidate predicate
surface, and (subj_uri, predicate, obj_uri) candidates aggregate into a
counted relation table — the ReVerb/OLLIE shape without a POS tagger
(no tagger exists in this sandbox): the deterministic gates are a
bounded character gap, no sentence punctuation inside the span, a
bounded token count, and distinct endpoint entities. Downstream, high-n
rows are the open-IE edges a curator would promote to typed KG
predicates.

Scale shape (100 TB):

- One shuffle of MENTION rows (begin/end/uri — tens of bytes each)
  groups them into per-doc sorted arrays; document text is NOT in that
  shuffle.
- One doc-keyed join co-locates the mention array with the text.
  Bucket both sides by doc_id (operators/layout.py) to make it
  exchange-free; mentions produced in the same job can simply keep the
  annotate output's partitioning.
- Pair building, span slicing, normalization and all gates run inside
  whole-stage codegen (sequence/transform/filter/substr — zero UDFs);
  the only strings that leave the document row are the ≤ ``max_gap``-
  char predicate surfaces.
- The final aggregate is two map-side-combinable hash aggregations
  ((s,pred,o,doc) then (s,pred,o)) — no window, no sort; skewed
  predicates ("of", "and") stay safe because the key includes both
  entity URIs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extract_relations(mentions: DataFrame, docs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_gap: int = 80, max_pred_tokens: int = 4,
                      min_count: int = 1) -> DataFrame:
    """(subj_uri, predicate, obj_uri, n, n_docs) relation candidates.

    ``mentions``: (id_col, begin, end, uri) with the repo-wide offset
    convention (0-based char offsets, end exclusive — SURVEY §2.8), at
    most one mention per begin (disambiguated output). ``docs``:
    (id_col, text_col). A pair qualifies when the second mention starts
    after the first ends, the gap is in (0, max_gap] chars, the span
    contains no sentence punctuation ([.!?;:]), its whitespace-collapsed
    lowercase form has 1..max_pred_tokens tokens, and the two entity
    URIs differ. ``n`` counts occurrences, ``n_docs`` distinct
    documents; rows below ``min_count`` occurrences are dropped."""
    ms = (mentions
          .groupBy(F.col(id_col).alias("_id"))
          .agg(F.array_sort(F.collect_list(
              F.struct(F.col("begin").alias("b"),
                       F.col("end").alias("e"),
                       F.col("uri").alias("u")))).alias("ms")))
    j = (docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
         .join(ms, "_id"))
    # adjacent pairs -> predicate surface, all inside codegen; the
    # sequence() guard matters: Spark's sequence(0, -1) DESCENDS, so a
    # 1-mention doc must yield an empty array explicitly
    pairs = F.when(F.size("ms") >= 2, F.expr(f"""
        filter(
          transform(sequence(0, size(ms) - 2), i -> named_struct(
            's', ms[i].u, 'o', ms[i + 1].u,
            'pred', regexp_replace(trim(lower(
                substr(_t, ms[i].e + 1, ms[i + 1].b - ms[i].e))),
                '\\\\s+', ' '),
            'gap', ms[i + 1].b - ms[i].e)),
          p -> p.gap > 0 AND p.gap <= {int(max_gap)}
               AND p.s != p.o AND p.pred != ''
               AND NOT p.pred rlike '[.!?;:]'
               AND size(split(p.pred, ' ')) <= {int(max_pred_tokens)})
    """)).otherwise(F.array().cast(
        "array<struct<s:string,o:string,pred:string,gap:int>>"))
    occ = (j.select(F.col("_id"), F.explode(pairs).alias("p"))
           .select("_id", F.col("p.s").alias("subj_uri"),
                   F.col("p.pred").alias("predicate"),
                   F.col("p.o").alias("obj_uri")))
    per_doc = (occ.groupBy("subj_uri", "predicate", "obj_uri", "_id")
               .agg(F.count("*").alias("_n")))
    out = (per_doc.groupBy("subj_uri", "predicate", "obj_uri")
           .agg(F.sum("_n").alias("n"),
                F.count("*").cast("long").alias("n_docs")))
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def relation_triples(relations: DataFrame,
                     min_docs: int = 2) -> DataFrame:
    """Promote counted relation candidates to (subj, pred, obj) triple
    shape for the KG write path: predicate surfaces become
    ``rel:<slugified-surface>`` URIs, gated on ``n_docs >= min_docs``
    (a relation asserted by one document is an extraction artifact
    until corroborated). Pure projection + filter."""
    slug = F.concat(F.lit("rel:"),
                    F.regexp_replace(F.col("predicate"), " ", "_"))
    return (relations.filter(F.col("n_docs") >= min_docs)
            .select(F.col("subj_uri").alias("subj"),
                    slug.alias("pred"),
                    F.col("obj_uri").alias("obj"),
                    "n", "n_docs"))
