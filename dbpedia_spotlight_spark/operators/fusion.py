"""Truth discovery / knowledge fusion: resolve conflicting claims from
multiple sources into one believed value per fact.

The data-fusion stage of KG construction (Dong et al., *Data Fusion:
Resolving Data Conflicts for Integration*, VLDB 2009 tutorial; Yin et
al., *TruthFinder*, KDD 2007; Dong et al., *Knowledge Vault*, KDD
2014): after extraction (``operators/relations.py``), canonicalization
(``canonicalize_triples`` / ``canonicalize_relations``) and identity
resolution (``operators/er.py``), the same data item ``(subj, pred)``
typically carries CONFLICTING object values asserted by different
sources (hosts, crawls, extractors). Majority voting treats a spam
mirror and a curated source alike; truth discovery iterates the
fixpoint "a claim is believable if trusted sources assert it; a source
is trustworthy if its claims are believable".

Model (the normalized-voting form — every quantity stays in [0, 1],
so the iteration needs no dampening and the DuckDB oracle replays it
exactly):

- ``trust[s]``      starts at ``prior`` for every source.
- ``vote[i, v]``    = Σ trust[s] over sources asserting value ``v``
  for item ``i = (subj, pred)``.
- ``belief[i, v]``  = vote[i, v] / Σ_v' vote[i, v']   (per-item
  normalization — beliefs of one item's candidate values sum to 1).
- ``trust[s]``      = mean belief over the claims ``s`` asserts.
- repeat ``iters`` times; a fixed small iteration count (default 5)
  is the literature's practice — the fixpoint is a smooth reweighting,
  not a combinatorial search, and converges geometrically.

Determinism / layout independence: claims are deduplicated on the full
``(source, subj, pred, obj)`` key before the first vote, so replayed
or multiply-partitioned inputs change nothing; every step is a sum /
mean of doubles in [0, 1] (bounded mass ⇒ reduce-order noise stays at
machine epsilon scale); the published ``belief`` is rounded to the
repo-wide 9 dp engine contract and the winner flag derives from the
ROUNDED belief with a total ``obj`` tie-break — so the boolean can
never flip across libm / reduce-order differences the rounding
absorbs.

Scale shape (100 TB): the trust table has one row per SOURCE (hosts /
crawl ids — at most millions, kilobytes to megabytes) and is
``F.broadcast`` back onto the claims every round; votes and item
totals are map-side-combinable sums keyed on the claim key and the
item key; the trust update is a combinable mean keyed on source (tiny
result). Per round: 3 shuffles of claim-sized frames, 0 windows, 0
UDFs, nothing driver-side. Mega-items (a subj,pred asserted by
millions of sources — the stopword-entity analogue) stay safe because
both aggregations are partial-agg sums, not collects. Lineage across
rounds is cut with ``RoundCheckpointer`` (local mode by default,
reliable ``checkpoint_dir`` mode for deep runs) above
``checkpoint_after`` rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer

_CLAIM = ["subj", "pred", "obj"]
_ITEM = ["subj", "pred"]


def _dedup_claims(claims: DataFrame, source_col: str) -> DataFrame:
    return (claims
            .select(F.col(source_col).alias("source"), *_CLAIM)
            .dropDuplicates(["source", *_CLAIM]))


def _iterate_trust(c: DataFrame, iters: int, prior: float,
                   checkpoint_after: int,
                   checkpoint_dir: str | None) -> DataFrame:
    """Run the fixpoint; returns the final per-source trust frame
    ``(source, trust)``. ``c`` must already be deduplicated."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    trust = (c.select("source").distinct()
             .withColumn("trust", F.lit(float(prior))))
    ckpt = RoundCheckpointer(c.sparkSession, checkpoint_dir,
                             name="fusion-trust")
    for r in range(iters):
        votes = (c.join(F.broadcast(trust), "source")
                 .groupBy(*_CLAIM).agg(F.sum("trust").alias("vote")))
        totals = votes.groupBy(*_ITEM).agg(F.sum("vote").alias("tot"))
        beliefs = (votes.join(totals, _ITEM)
                   .select(*_CLAIM,
                           (F.col("vote") / F.col("tot")).alias("b")))
        trust = (c.join(beliefs, _CLAIM)
                 .groupBy("source").agg(F.avg("b").alias("trust")))
        # the trust frame is the only state carried between rounds —
        # cutting it (not the claim-sized beliefs) keeps the
        # checkpoint small while still bounding plan depth
        if r >= checkpoint_after - 1:
            trust = ckpt.cut(trust)
    return trust


def truth_discovery(claims: DataFrame, iters: int = 5,
                    prior: float = 0.8, source_col: str = "source",
                    checkpoint_after: int = 4,
                    checkpoint_dir: str | None = None) -> DataFrame:
    """Per-claim belief report: ``(subj, pred, obj, n_sources, belief,
    winner)`` — ``belief`` rounded to 9 dp, ``winner`` true on the
    item's highest-belief value (obj-ascending tie-break, derived from
    the ROUNDED belief so the flag is engine-stable)."""
    c = _dedup_claims(claims, source_col)
    trust = _iterate_trust(c, iters, prior, checkpoint_after,
                           checkpoint_dir)
    votes = (c.join(F.broadcast(trust), "source")
             .groupBy(*_CLAIM).agg(F.sum("trust").alias("vote"),
                                   F.count("*").alias("n_sources")))
    totals = votes.groupBy(*_ITEM).agg(F.sum("vote").alias("tot"))
    beliefs = (votes.join(totals, _ITEM)
               .select(*_CLAIM, "n_sources",
                       F.round(F.col("vote") / F.col("tot"), 9)
                       .alias("belief")))
    # winner from the rounded belief: rank-1 under (belief desc, obj
    # asc). A per-item window is safe here — items hold a handful of
    # candidate VALUES (votes are already aggregated over sources), so
    # no mega-partition can form even when a mega-item has millions of
    # asserting sources.
    w = Window.partitionBy(*_ITEM).orderBy(F.col("belief").desc(),
                                           F.col("obj").asc())
    return (beliefs
            .withColumn("winner", F.row_number().over(w) == 1))


def source_trust(claims: DataFrame, iters: int = 5, prior: float = 0.8,
                 source_col: str = "source",
                 checkpoint_after: int = 4,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Final per-source reliability: ``(source, n_claims, trust)``,
    trust rounded to 9 dp."""
    c = _dedup_claims(claims, source_col)
    trust = _iterate_trust(c, iters, prior, checkpoint_after,
                           checkpoint_dir)
    n = c.groupBy("source").agg(F.count("*").alias("n_claims"))
    return (n.join(trust, "source")
            .select("source", "n_claims",
                    F.round("trust", 9).alias("trust")))


def fused_triples(claims: DataFrame, iters: int = 5, prior: float = 0.8,
                  source_col: str = "source",
                  min_belief: float = 0.5) -> DataFrame:
    """The KG-facing composition: winning values with belief ≥
    ``min_belief`` as clean ``(subj, pred, obj, belief)`` triples —
    the fusion analogue of ``relations.relation_triples``'s
    corroboration gate."""
    return (truth_discovery(claims, iters=iters, prior=prior,
                            source_col=source_col)
            .filter(F.col("winner") & (F.col("belief") >= min_belief))
            .select(*_CLAIM, "belief"))
