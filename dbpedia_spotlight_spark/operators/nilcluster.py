"""NIL clustering — group unlinkable mentions into emergent entities.

The disambiguator drops a spot when its surface form has no candidate
above threshold (pipeline.py:254,339 — C3 NIL handling). At web scale
those NIL mentions are not noise: they are the *new* entities the KG
has never seen, and the standard KB-population task (TAC-KBP entity
discovery; Ji & Grishman 2011) is to cluster them cross-document so
each emergent entity gets ONE provisional node instead of millions of
dangling mentions. This module is that step, built from pieces the
engine already trusts:

1. **Block** on the casefolded surface key (``decontam._norm`` — the
   1:1 translate casefold both engines share). Same-key mentions are
   the only merge candidates: NIL clustering is conservative by
   definition (merging 'John Smith' with 'J. Smith' is an ER problem
   for ``operators/er.py`` AFTER provisional nodes exist).
2. **Sorted-neighborhood pairs** within a block (Hernández & Stolfo
   1998): mentions ranked by id, each compared to its next ``window``
   neighbors — cost |block| × window, never C(|block|, 2). The window
   join is one hash-partitioned row_number per key; blocks share
   partitions, so one mega-key cannot straggle beyond its own sort.
3. **Context verify**: a neighbor pair connects iff the cosine of the
   two mentions' hashed context embeddings (``operators/embed.py`` —
   deterministic, L2-normalized, zero UDFs) clears ``threshold``.
   Cosine = dot product of unit vectors, rounded to ``round_digits``
   BEFORE the threshold compare so cross-engine float noise cannot
   flip a boundary pair (the ann_topk contract).
4. **Resolve**: connected components (min-label propagation,
   ``operators/components.py``) over the verified pairs; every mention
   gets ``cluster`` = min mention id reachable, singletons keep their
   own id. ``nil_uri`` = ``nil:<surface_key>#<cluster>`` — a
   deterministic, layout-independent provisional URI that
   ``triples.py`` emitters can use like any entity URI.

Skew (the 10^12-doc hazard): surface-form frequency is zipfian — a
handful of keys ('John Smith', boilerplate nav text the extractor
missed) dominate. ``max_block`` bounds the pairwise zone: keys whose
mention count exceeds it are split out FIRST (one map-side-combinable
count + a broadcast of the few offending keys) and handled per
``big_block``: ``'single'`` collapses the whole key to one cluster
(cluster = min id, the coarse-but-linear fallback — a surface with
10^6 unlinkable mentions is one prominent emergent entity far more
often than 10^6 distinct ones), ``'drop'`` excludes them (cluster =
own id, flagged ``oversize``). Neither path ever ranks or pairs a
mega-block.

Scale shape: embeddings are two map-side-combinable aggregates
(cost ∝ context tokens); the window join shuffles mentions once on the
key; components rounds ∝ cluster diameter ≤ chain length through the
window (real clusters interconnect within the window, keeping
diameters shallow — ``require_converged`` raises rather than returning
partial labels when ``max_iter`` is genuinely too small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .components import connected_components
from .decontam import _norm
from .embed import text_embeddings
from .similarity import _dot


def nil_clusters(mentions: DataFrame,
                 id_col: str = "mention_id",
                 sf_col: str = "surface_form",
                 context_col: str = "context",
                 dim: int = 32,
                 threshold: float = 0.25,
                 window: int = 4,
                 max_block: int = 10_000,
                 big_block: str = "single",
                 max_iter: int = 12,
                 round_digits: int = 9,
                 require_converged: bool = False,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """(mention_id, surface_key, cluster, nil_uri, oversize) — one row
    per input mention. ``cluster`` is the min mention id of the
    emergent entity; ``nil_uri`` its provisional node URI (spaces in
    the key become '_', the one char the key cannot otherwise lose).

    ``mentions`` needs (id_col BIGINT-unique, sf_col, context_col);
    duplicate ids raise downstream ambiguity, not here — dedup first.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if big_block not in ("single", "drop"):
        raise ValueError("big_block must be 'single' or 'drop'")
    m = mentions.select(
        F.col(id_col).cast("long").alias("id"),
        _norm(F.col(sf_col)).alias("surface_key"),
        F.col(context_col).alias("_ctx"))

    # zipfian guard: the few keys above max_block never enter the
    # rank/pair zone — their count frame is tiny by construction
    # (count > max_block) and broadcasts
    big = (m.groupBy("surface_key").agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block)
            .select("surface_key"))
    small = m.join(F.broadcast(big), "surface_key", "left_anti")
    over = m.join(F.broadcast(big), "surface_key", "left_semi")

    vecs = text_embeddings(small.select("id", "_ctx"), dim=dim,
                           id_col="id", text_col="_ctx") \
        .withColumnRenamed("embedding", "_v")
    ranked = (small.join(vecs, "id")
              .withColumn("_r", F.row_number().over(
                  Window.partitionBy("surface_key").orderBy("id"))))
    a = ranked.select("surface_key", F.col("id").alias("a"),
                      F.col("_r").alias("_ra"), F.col("_v").alias("_va"))
    b = ranked.select("surface_key", F.col("id").alias("b"),
                      F.col("_r").alias("_rb"), F.col("_v").alias("_vb"))
    pairs = (a.join(b, "surface_key")
             .filter((F.col("_rb") > F.col("_ra"))
                     & (F.col("_rb") <= F.col("_ra") + window))
             .filter(F.round(_dot(F.col("_va"), F.col("_vb")),
                             round_digits) >= threshold)
             .select("a", "b"))
    labels = connected_components(
        small.select("id"), pairs, max_iter=max_iter,
        require_converged=require_converged,
        checkpoint_dir=checkpoint_dir)

    resolved = (small.select("id", "surface_key")
                .join(labels, "id")
                .select("id", "surface_key",
                        F.col("comp").alias("cluster"),
                        F.lit(False).alias("oversize")))
    if big_block == "single":
        over_r = (over.groupBy("surface_key")
                  .agg(F.min("id").alias("cluster"))
                  .join(over.select("id", "surface_key"), "surface_key")
                  .select("id", "surface_key", "cluster",
                          F.lit(True).alias("oversize")))
    else:  # 'drop': oversize mentions stay singletons, flagged
        over_r = over.select("id", "surface_key",
                             F.col("id").alias("cluster"),
                             F.lit(True).alias("oversize"))
    out = resolved.unionByName(over_r)
    return out.select(
        F.col("id").alias(id_col), "surface_key", "cluster",
        F.concat(F.lit("nil:"),
                 F.regexp_replace("surface_key", " ", "_"),
                 F.lit("#"), F.col("cluster")).alias("nil_uri"),
        "oversize")


PRED_LABEL = "skos:prefLabel"
PRED_TYPE = "rdf:type"
EMERGENT_TYPE = "spotlight:EmergentEntity"


def promote_nil_entities(nil_spot_frame: DataFrame,
                         **cluster_kwargs) -> DataFrame:
    """NIL spots → provisional-entity triples, closing the loop from
    :func:`pipeline.nil_spots` into the KG lifecycle: the emergent
    entity becomes an ordinary node the stores / canonicalization / ER
    machinery already handle (a later ``er.sameas`` match against a
    real entity merges it away via ``canonicalize_triples``, exactly
    the KB-population promotion path).

    Input: (url, begin, end, surface_form, context) — the
    ``nil_spots`` schema. Emits one triple frame:

        (<url>#char=<b>,<e>, itsrdf:taIdentRef, <nil_uri>)  per mention
        (<nil_uri>, rdf:type,      spotlight:EmergentEntity) per node
        (<nil_uri>, skos:prefLabel, <surface_key>)           per node

    — the link rows are shaped exactly like ``triples.link_triples``
    output, so the union drops straight into a ``KGStore`` delta.

    ``mention_id`` is ``xxhash64(url, begin, end)``: deterministic and
    layout-independent. A 64-bit collision aliases two mentions into
    one clustering node — at 10^12 docs that is a handful of spurious
    pair-edges among ~10^13, each still subject to the cosine verify;
    acceptable for provisional ids (dense unique ids would cost a
    global zipWithIndex pass this path deliberately avoids).
    """
    from ..triples import PRED_IDENT, subj_col

    m = nil_spot_frame.withColumn(
        "mention_id", F.xxhash64("url", "begin", "end"))
    clusters = nil_clusters(m, context_col="context", **cluster_kwargs)
    linked = m.join(clusters, "mention_id")
    links = linked.select(
        subj_col(), F.lit(PRED_IDENT).alias("pred"),
        F.col("nil_uri").alias("obj"))
    # node metadata: one row per emergent entity, not per mention —
    # the distinct is cluster-count-sized, far below mention count
    nodes = clusters.select("nil_uri", "surface_key").distinct()
    types = nodes.select(
        F.col("nil_uri").alias("subj"), F.lit(PRED_TYPE).alias("pred"),
        F.lit(EMERGENT_TYPE).alias("obj"))
    labels = nodes.select(
        F.col("nil_uri").alias("subj"), F.lit(PRED_LABEL).alias("pred"),
        F.col("surface_key").alias("obj"))
    return links.unionByName(types).unionByName(labels)
