"""In-Spark n-gram language-model training + perplexity scoring — the
CCNet-style quality signal (Wenzek et al. 2020 score Common Crawl with a
KenLM n-gram model and keep the low-perplexity head/middle buckets).

No KenLM wheel here and none needed: an interpolated add-α bigram LM is
pure relational algebra end-to-end, so BOTH training and scoring stay
JVM-side with zero UDFs:

- **train** (:func:`train_bigram_lm`): two map-side-combinable counts
  over the reference corpus — C(w) unigrams and C(w1,w2) bigrams — plus
  the vocab size. One shuffle each, keyed on the token / token pair;
  at 100 TB the combiners reduce each partition to vocab-sized state
  before the exchange.
- **score** (:func:`doc_perplexity`): explode each doc into its
  (BOS-prefixed) bigram stream, LEFT join the count tables (absent →
  0 via coalesce — that IS the smoothing path, no OOV special-casing),
  then one avg keyed on doc id.  The count tables are vocab-sized, so
  Catalyst/AQE broadcasts them; the corpus side shuffles only once for
  the final per-doc aggregate.

  p(w2|w1) = (C(w1,w2) + α) / (C(w1) + α·(V+1))      (add-α, +1 = OOV)

Cross-engine contract: per-bigram ln p is exact in both engines (same
doubles, same division); the per-doc mean is rounded to 9dp like the
PMI/score contracts elsewhere in this repo, and perplexity is derived
from the already-rounded mean so both engines exponentiate the same
number.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from .decontam import _norm

BOS = "<s>"


class BigramLM(NamedTuple):
    """A trained bigram LM as two count DataFrames + scalars. The
    frames are vocab-sized (NOT corpus-sized) — persist or write them
    once, broadcast at score time."""
    unigrams: DataFrame   # (w, c)     — includes BOS with c = n_docs
    bigrams: DataFrame    # (w1, w2, c)
    vocab_size: int       # distinct non-BOS tokens in training
    alpha: float


def _token_arr(text_col) -> F.Column:
    return F.split(_norm(text_col), " ")


def _bigram_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — each doc's token stream with one BOS prepended, so
    every real token is predicted exactly once (n_bigrams = n_tokens).
    The BOS'd token array is projected ONCE before the per-bigram
    lambda — referencing the normalize+split tree inside the lambda
    would re-evaluate it per bigram (HOF lambdas defeat CSE; measured
    6-8x on the driver corpus)."""
    bos_toks = F.concat(F.array(F.lit(BOS)), _token_arr(F.col(text_col)))
    toks = F.col("_toks")
    return docs.select(
        F.col(id_col).alias("id"), bos_toks.alias("_toks"),
    ).select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(F.element_at(toks, i + 1).alias("w1"),
                               F.element_at(toks, i + 2).alias("w2")),
        )).alias("bg"),
    ).select("id", "bg.w1", "bg.w2")


def train_bigram_lm(ref_docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    alpha: float = 0.1) -> BigramLM:
    """Count-train on a reference corpus (typically a high-quality
    slice — the CCNet 'target domain'). Two aggregations, both
    map-side combinable; the single action is the scalar vocab count."""
    bg = _bigram_stream(ref_docs, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    unigrams = (bg.groupBy(F.col("w1").alias("w"))
                  .agg(F.count("*").alias("c")))
    vocab = (bg.filter(F.col("w2") != BOS)
               .select(F.countDistinct("w2").alias("v")).first()["v"])
    return BigramLM(unigrams=unigrams, bigrams=bigrams,
                    vocab_size=int(vocab), alpha=alpha)


def doc_perplexity(docs: DataFrame, lm: BigramLM,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Score every doc: (id, n_tokens, avg_lnp, perplexity).

    avg_lnp = mean over the doc's bigrams of ln p(w2|w1), rounded to
    9dp (the repo's cross-engine float contract); perplexity =
    exp(−avg_lnp) of the rounded mean. Lower perplexity = more like
    the reference corpus."""
    denom_v = float(lm.alpha) * (lm.vocab_size + 1)
    stream = _bigram_stream(docs, id_col, text_col)
    scored = (
        stream
        .join(F.broadcast(lm.bigrams.withColumnRenamed("c", "c_bg")),
              ["w1", "w2"], "left")
        .join(F.broadcast(lm.unigrams
                          .withColumnRenamed("w", "w1")
                          .withColumnRenamed("c", "c_ug")),
              ["w1"], "left")
        .select(
            "id",
            F.log((F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(lm.alpha))
                  / (F.coalesce(F.col("c_ug"), F.lit(0)) + F.lit(denom_v)))
            .alias("lnp"),
        )
    )
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg("lnp"), 9).alias("avg_lnp"))
            .select(F.col("id").alias(id_col), "n_tokens", "avg_lnp",
                    F.round(F.exp(-F.col("avg_lnp")), 6).alias("perplexity")))


def perplexity_buckets(scored: DataFrame, head_max: float,
                       middle_max: float,
                       ppl_col: str = "perplexity") -> DataFrame:
    """CCNet head/middle/tail split by EXPLICIT thresholds (CCNet
    derives them from a sample's percentiles once per language, then
    applies them as constants — a pure projection, no global sort or
    window at score time)."""
    p = F.col(ppl_col)
    return scored.withColumn(
        "bucket",
        F.when(p <= head_max, F.lit("head"))
         .when(p <= middle_max, F.lit("middle"))
         .otherwise(F.lit("tail")))


def ppl_thresholds(scored: DataFrame, qs: tuple[float, float] = (1 / 3, 2 / 3),
                   ppl_col: str = "perplexity") -> tuple[float, float]:
    """Derive the CCNet bucket thresholds from a scored SAMPLE (exact
    percentile — run this on a capped sample, not the full corpus; the
    two floats then drive :func:`perplexity_buckets` as constants)."""
    row = scored.select(
        F.expr(f"percentile({ppl_col}, {qs[0]})").alias("a"),
        F.expr(f"percentile({ppl_col}, {qs[1]})").alias("b")).first()
    return float(row["a"]), float(row["b"])


class KNBigramLM(NamedTuple):
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1999's interpolated form) as count DataFrames + scalars —
    the smoothing KenLM actually ships, and the reason a CCNet-style
    gate prefers it to add-α: continuation probability ranks a token by
    how many DISTINCT contexts it follows, so "Francisco" (frequent but
    only after "San") stops outscoring genuinely versatile tokens.
    Every frame is vocab-sized; broadcast at score time."""
    unigrams: DataFrame   # (w, c)      — left-context totals C(w1 ·)
    bigrams: DataFrame    # (w1, w2, c) — C(w1, w2)
    fanout: DataFrame     # (w1, n1p)   — N1+(w1 ·) distinct successors
    cont: DataFrame       # (w2, n1p)   — N1+(· w2) distinct contexts
    n_bigram_types: int   # N1+(· ·)    — distinct bigram types
    vocab_size: int       # distinct non-BOS tokens in training
    discount: float       # absolute discount D ∈ (0, 1)


def train_kn_bigram_lm(ref_docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       discount: float = 0.75) -> KNBigramLM:
    """Count-train interpolated Kneser-Ney on a reference corpus. Four
    aggregations over the same bigram stream — C(w1,w2), C(w1·),
    N1+(w1·), N1+(·w2) — all map-side combinable, keyed on tokens /
    token pairs (vocab-sized shuffle keys regardless of corpus size);
    the only actions are the two scalar counts. D = 0.75 is the
    Chen-Goodman fixed-discount default [PINNED: no reference mount to
    read a value from]."""
    if not 0.0 < discount < 1.0:
        raise ValueError("discount must be in (0, 1)")
    bg = _bigram_stream(ref_docs, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    unigrams = (bg.groupBy(F.col("w1").alias("w"))
                  .agg(F.count("*").alias("c")))
    fanout = (bigrams.groupBy("w1")
              .agg(F.count("*").alias("n1p")))
    cont = (bigrams.groupBy("w2")
            .agg(F.count("*").alias("n1p")))
    n_types = bigrams.count()
    vocab = (bg.filter(F.col("w2") != BOS)
               .select(F.countDistinct("w2").alias("v")).first()["v"])
    return KNBigramLM(unigrams=unigrams, bigrams=bigrams, fanout=fanout,
                      cont=cont, n_bigram_types=int(n_types),
                      vocab_size=int(vocab), discount=float(discount))


def kn_doc_perplexity(docs: DataFrame, lm: KNBigramLM,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Score every doc under interpolated Kneser-Ney; same output
    contract as :func:`doc_perplexity` (9dp mean-ln, ppl from the
    rounded mean).

        p_cont(w2)  = (N1+(·w2) + 1) / (N1+(··) + V + 1)
        p(w2|w1)    = (max(C(w1,w2) − D, 0)
                       + D · N1+(w1·) · p_cont(w2)) / C(w1·)
        unseen w1   → p(w2|w1) = p_cont(w2)

    The +1/(V+1) add-one on the continuation distribution is the
    totality device (every token, OOV included, gets mass — the same
    role the '+1 OOV' slot plays in the add-α path); the discounted
    mass D·N1+(w1·)/C(w1·) is exactly what discounting max(c−D,0)
    removed, so p(·|w1) sums to 1 over the (V+1)-point event space.
    Scoring is four broadcast left joins (all vocab-sized) + one
    per-doc aggregate — the corpus shuffles once, zero UDFs."""
    d = float(lm.discount)
    pc_denom = float(lm.n_bigram_types + lm.vocab_size + 1)
    stream = _bigram_stream(docs, id_col, text_col)
    pc = ((F.coalesce(F.col("c_cont"), F.lit(0)) + F.lit(1.0))
          / F.lit(pc_denom))
    # coalesce BEFORE greatest: engines disagree on greatest(NULL, x)
    # (Spark skips NULLs, DuckDB propagates) — with the explicit 0 the
    # expression is NULL-free in both
    seen = ((F.greatest(F.coalesce(F.col("c_bg"), F.lit(0))
                        .cast("double") - F.lit(d), F.lit(0.0))
             + F.lit(d) * F.col("n1p_fan").cast("double") * pc)
            / F.col("c_ug").cast("double"))
    scored = (
        stream
        .join(F.broadcast(lm.bigrams.withColumnRenamed("c", "c_bg")),
              ["w1", "w2"], "left")
        .join(F.broadcast(lm.unigrams
                          .withColumnRenamed("w", "w1")
                          .withColumnRenamed("c", "c_ug")),
              ["w1"], "left")
        .join(F.broadcast(lm.fanout
                          .withColumnRenamed("n1p", "n1p_fan")),
              ["w1"], "left")
        .join(F.broadcast(lm.cont
                          .withColumnRenamed("n1p", "c_cont")),
              ["w2"], "left")
        .select(
            "id",
            F.log(F.when(F.col("c_ug").isNull(), pc)
                  .otherwise(seen)).alias("lnp"),
        )
    )
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg("lnp"), 9).alias("avg_lnp"))
            .select(F.col("id").alias(id_col), "n_tokens", "avg_lnp",
                    F.round(F.exp(-F.col("avg_lnp")), 6).alias("perplexity")))
