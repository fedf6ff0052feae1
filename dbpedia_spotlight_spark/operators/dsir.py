"""DSIR data selection — importance resampling toward a target corpus.

Implements the Data Selection with Importance Resampling recipe
(Xie et al., NeurIPS 2023): fit bag-of-hashed-n-gram unigram models on
a small TARGET corpus (the quality reference — e.g. a Wikipedia/books
slice) and on the RAW corpus, score every raw document with the
log-importance weight

    log w(d) = Σ_{g ∈ grams(d)} [ log p_target(bucket(g))
                                  − log p_raw(bucket(g)) ]

(add-α smoothed bucket probabilities over ``n_buckets`` hashed
unigram+bigram features), then select k documents by Gumbel top-k —
``log w + Gumbel(0,1)`` is the classic without-replacement sample
∝ w, and with a hash-derived uniform it is fully deterministic and
layout/append-stable per (doc, salt).

Scale notes (the 100 TB shape):

- The target corpus is small by construction (a curated reference);
  its distribution is a ≤ ``n_buckets``-row table. The raw
  distribution is one scan of the corpus: explode grams → two-level
  hash aggregate onto ≤ ``n_buckets`` rows — map-side combine means
  the shuffle carries at most ``n_buckets`` rows per task, never the
  grams.
- The per-document score joins the exploded grams against the
  broadcast ≤ ``n_buckets``-row ratio table and sums per doc_id — with
  partial aggregation the shuffle is ~one (doc_id, partial-sum) row
  per doc per task; document TEXT never shuffles.
- Selection is ``ORDER BY key DESC LIMIT k`` — Spark plans TakeOrdered
  (per-partition top-k, then a k-row merge at the driver), not a
  global sort. Winners come back as a k-row frame; callers semi-join
  the corpus against it (broadcast, k rows) to materialize the subset.
- Everything is JVM-side built-ins (md5/conv/ln/transform/aggregate);
  no UDFs of any kind.

Cross-engine contract (the DuckDB oracle replays all of it): tokens
are the repo-wide ``ws_tokens`` whitespace split; features are
unigrams + space-joined bigrams; the bucket hash is the repo-wide
md5-60-bit idiom (``conv(substr(md5(gram#salt),1,15),16,10) %
n_buckets``); the Gumbel uniform is ``(md5₆₀(id#salt-g) % 2²⁰ + 0.5) /
2²⁰``; log-weights and selection keys cross libm ``ln`` so they carry
the repo-wide round(9) contract, and the top-k ORDER key is the
*rounded* key with doc_id tiebreak so a float-tied boundary cannot
flip rows between engines.

Semantics callers should know (inherent to DSIR, not quirks of this
implementation): the weight is a SUM over gram log-ratios, so it is
length-sensitive — under add-α smoothing every gram's contribution is
usually negative, and longer documents drift lower unless their grams
are genuinely target-frequent; compare weights across comparable
lengths or normalize upstream. And because the denominator is the raw
corpus distribution, a document duplicated many times raises its own
grams' raw probability and LOWERS its weight — DSIR is dedup-aware by
construction (tests pin both properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbpedia_spotlight_spark.operators.textstats import ws_tokens

_GUMBEL_BUCKETS = 1 << 20


def _h60(col: F.Column, salt: str) -> F.Column:
    """The repo-wide 60-bit md5 hash (exact in a signed 64-bit long,
    identical to DuckDB's ``('0x' || substr(md5(..),1,15))::BIGINT``)."""
    return F.conv(F.substring(
        F.md5(F.concat_ws("#", col, F.lit(salt))), 1, 15), 16, 10) \
        .cast("long")


def gram_buckets(text_col: F.Column, n_buckets: int,
                 salt: str = "dsir") -> F.Column:
    """``array<long>`` of hashed feature-bucket ids for a text column:
    one entry per unigram and per space-joined bigram of the
    ``ws_tokens`` whitespace tokenization (multiplicity preserved —
    DSIR features are counts, not sets). Empty text → empty array."""
    toks = ws_tokens(text_col)
    bis = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + F.lit(2))))
    grams = F.concat(toks, bis)
    return F.transform(grams, lambda g: _h60(g, salt) % n_buckets)


def bucket_counts(docs: DataFrame, text_col: str = "text",
                  n_buckets: int = 4096,
                  salt: str = "dsir") -> DataFrame:
    """(bucket, n) hashed-feature counts over a corpus — one scan,
    explode → hash aggregate with map-side combine, ≤ ``n_buckets``
    result rows regardless of corpus size."""
    return (docs
            .select(F.explode(gram_buckets(F.col(text_col), n_buckets,
                                           salt)).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


def dsir_log_ratio(raw_docs: DataFrame, target_docs: DataFrame,
                   text_col: str = "text", n_buckets: int = 4096,
                   alpha: float = 1.0,
                   salt: str = "dsir") -> DataFrame:
    """(bucket, log_ratio) importance table: add-α smoothed
    ``ln p_target(b) − ln p_raw(b)`` per feature bucket. Buckets seen
    in neither corpus are absent (they can never occur in a scored
    document). Both totals are one-row aggregates crossed back in via
    broadcast — no driver action."""
    tgt = bucket_counts(target_docs, text_col, n_buckets, salt)
    raw = bucket_counts(raw_docs, text_col, n_buckets, salt)
    tt = tgt.agg(F.sum("n").alias("_tt"))
    rt = raw.agg(F.sum("n").alias("_rt"))
    ab = float(alpha) * n_buckets
    joined = (tgt.withColumnRenamed("n", "t_n")
              .join(raw.withColumnRenamed("n", "r_n"), "bucket",
                    "full_outer")
              .crossJoin(F.broadcast(tt))
              .crossJoin(F.broadcast(rt)))
    return joined.select(
        "bucket",
        (F.log((F.coalesce("t_n", F.lit(0)) + F.lit(float(alpha)))
               / (F.coalesce("_tt", F.lit(0)) + F.lit(ab)))
         - F.log((F.coalesce("r_n", F.lit(0)) + F.lit(float(alpha)))
                 / (F.coalesce("_rt", F.lit(0)) + F.lit(ab))))
        .alias("log_ratio"))


def dsir_log_ratio_slice(docs: DataFrame, target_cond: F.Column,
                         text_col: str = "text", n_buckets: int = 4096,
                         alpha: float = 1.0,
                         salt: str = "dsir") -> DataFrame:
    """``dsir_log_ratio`` for the common case where the target corpus
    is a SLICE of the raw corpus (a boolean condition — lang, source,
    quality bucket): both distributions come out of ONE gram explode
    (count(*) for raw, conditional count for target), saving a full
    corpus scan versus fitting the two frames independently. Identical
    values to the two-frame form (pytest-pinned)."""
    counts = (docs
              .select(F.explode(gram_buckets(F.col(text_col), n_buckets,
                                             salt)).alias("bucket"),
                      target_cond.alias("_is_t"))
              .groupBy("bucket")
              .agg(F.count("*").alias("r_n"),
                   F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
                   .alias("t_n")))
    tot = counts.agg(F.sum("r_n").alias("_rt"), F.sum("t_n").alias("_tt"))
    ab = float(alpha) * n_buckets
    return (counts.crossJoin(F.broadcast(tot))
            .select(
                "bucket",
                (F.log((F.col("t_n") + F.lit(float(alpha)))
                       / (F.coalesce("_tt", F.lit(0)) + F.lit(ab)))
                 - F.log((F.col("r_n") + F.lit(float(alpha)))
                         / (F.coalesce("_rt", F.lit(0)) + F.lit(ab))))
                .alias("log_ratio")))


def dsir_weights(raw_docs: DataFrame, log_ratio: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 4096,
                 salt: str = "dsir") -> DataFrame:
    """(id, logw) log-importance weight per raw document: exploded
    gram buckets ⋈ broadcast ratio table, summed per document.
    ``explode_outer`` + left join keep zero-gram documents with
    logw = 0 (an empty document is distribution-neutral)."""
    return (raw_docs
            .select(F.col(id_col),
                    F.explode_outer(gram_buckets(F.col(text_col),
                                                 n_buckets, salt))
                    .alias("bucket"))
            .join(F.broadcast(log_ratio), "bucket", "left")
            .groupBy(id_col)
            .agg(F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("logw")))


def gumbel_key(id_col: F.Column, logw_col: F.Column,
               salt: str = "dsir") -> F.Column:
    """Deterministic Gumbel-perturbed selection key
    ``logw − ln(−ln u)`` with the hash-derived uniform
    ``u = (md5₆₀(id # salt-g) % 2²⁰ + 0.5) / 2²⁰`` — without-
    replacement sampling ∝ w, replayable on any engine with md5+ln."""
    u = ((_h60(id_col.cast("string"), f"{salt}-g") % _GUMBEL_BUCKETS
          + F.lit(0.5)) / F.lit(float(_GUMBEL_BUCKETS)))
    return logw_col - F.log(-F.log(u))


def dsir_select(raw_docs: DataFrame, target_docs: DataFrame | None,
                k: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 4096, alpha: float = 1.0,
                salt: str = "dsir",
                target_cond: F.Column | None = None) -> DataFrame:
    """Gumbel top-k DSIR selection: the k raw documents sampled
    without replacement ∝ importance weight toward the target corpus.
    Returns the k-row frame (id, logw, gumbel_key) — logw and key at
    the repo-wide 9 dp contract, ordered by (key DESC, id) on the
    ROUNDED key so engines can't disagree at a float-tied boundary.
    Callers materialize the subset with a broadcast semi-join of the
    corpus against these k ids.

    Pass EITHER ``target_docs`` (a separate reference frame — two
    corpus scans: the two fits, then the weight pass) OR
    ``target_cond`` (a boolean column marking the target slice of
    ``raw_docs`` — the in-corpus reference case; both fits share ONE
    explode via ``dsir_log_ratio_slice``, saving a scan)."""
    if k <= 0:
        raise ValueError("k must be positive")
    if (target_docs is None) == (target_cond is None):
        raise ValueError("pass exactly one of target_docs / target_cond")
    if target_cond is not None:
        ratio = dsir_log_ratio_slice(raw_docs, target_cond, text_col,
                                     n_buckets, alpha, salt)
    else:
        ratio = dsir_log_ratio(raw_docs, target_docs, text_col,
                               n_buckets, alpha, salt)
    w = dsir_weights(raw_docs, ratio, text_col, id_col, n_buckets, salt)
    key = F.round(gumbel_key(F.col(id_col), F.col("logw"), salt), 9)
    return (w.select(id_col, F.round("logw", 9).alias("logw"),
                     key.alias("gumbel_key"))
            .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
            .limit(k))
