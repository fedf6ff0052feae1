"""Ranking-quality metrics: MRR / Hits@k / mean rank at corpus scale.

The evaluation half of the KG-embedding workflow
(``operators/export.py::kg_embedding_examples`` produces the training/
eval pool; a scorer attaches model scores; this computes the standard
link-prediction metrics) — and equally the quality loop for ANN
retrieval (``operators/similarity.py``) or any candidate-ranking stage.

Semantics (KG-embedding eval protocol): each POSITIVE row is ranked
against its query's full candidate pool. Rank under score ties is the
caller's choice — ``optimistic`` (ties rank best), ``pessimistic``
(ties rank worst) or ``mean`` (the literature's "realistic" setting:
1 + #strictly-higher + (#tied − 1)/2). Multi-positive queries are
supported: every positive gets its own rank row against the whole pool
(the UNFILTERED setting; for filtered eval drop competing positives
upstream, e.g. with the filtered ``kg_embedding_examples``).

Scale shape: ONE equi-join of the pool against the (much smaller)
positive slice on the query key, one groupBy per (query, positive) —
both keyed on query ids, never on url/host — then a single global
aggregate. No windows, no sorts, no collects: ranks come from
higher/tied COUNTS, not from materializing an ordering, so a 10^9-row
pool never sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TIES = ("optimistic", "pessimistic", "mean")


def positive_ranks(scores: DataFrame, qid_col: str = "qid",
                   cand_col: str = "cand", score_col: str = "score",
                   label_col: str = "is_positive",
                   tie: str = "mean") -> DataFrame:
    """(qid, cand, rank) — one row per positive, rank within its
    query's candidate pool (1 = best)."""
    if tie not in _TIES:
        raise ValueError(f"tie must be one of {_TIES}")
    pool = scores.select(F.col(qid_col).alias("qid"),
                         F.col(score_col).alias("s"))
    pos = scores.filter(F.col(label_col)).select(
        F.col(qid_col).alias("qid"), F.col(cand_col).alias("cand"),
        F.col(score_col).alias("pos_s"))
    j = pool.join(pos, "qid")
    counted = j.groupBy("qid", "cand", "pos_s").agg(
        F.sum(F.when(F.col("s") > F.col("pos_s"), 1)
              .otherwise(0)).alias("n_higher"),
        F.sum(F.when(F.col("s") == F.col("pos_s"), 1)
              .otherwise(0)).alias("n_tied"))   # includes the positive
    if tie == "optimistic":
        rank = F.col("n_higher") + F.lit(1.0)
    elif tie == "pessimistic":
        rank = (F.col("n_higher") + F.col("n_tied")).cast("double")
    else:
        rank = (F.col("n_higher") + 1
                + (F.col("n_tied") - 1) / 2.0).cast("double")
    return counted.select("qid", "cand", rank.alias("rank"))


def ranking_metrics(scores: DataFrame, qid_col: str = "qid",
                    cand_col: str = "cand", score_col: str = "score",
                    label_col: str = "is_positive",
                    ks: tuple[int, ...] = (1, 3, 10),
                    tie: str = "mean") -> DataFrame:
    """One-row summary: n_queries (positive rows ranked), mrr,
    mean_rank and hits_at_<k> for each k — all rounded to 9dp so the
    figure is engine-portable."""
    ranks = positive_ranks(scores, qid_col, cand_col, score_col,
                           label_col, tie)
    aggs = [F.count("*").alias("n_queries"),
            F.round(F.avg(1.0 / F.col("rank")), 9).alias("mrr"),
            F.round(F.avg("rank"), 9).alias("mean_rank")]
    for k in ks:
        aggs.append(F.round(F.avg(
            F.when(F.col("rank") <= k, 1.0).otherwise(0.0)), 9)
            .alias(f"hits_at_{k}"))
    return ranks.agg(*aggs)
