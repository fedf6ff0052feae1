"""Deterministic, partition-layout-independent sampling and splitting
for training corpora.

``df.sample()`` is per-partition RNG: a repartition, a resume, or a
different executor count changes WHICH rows are sampled — poison for
reproducible training sets. These operators gate on a salted md5 of a
key column instead (the same technique the IVF trainer uses,
``similarity.ivf_centroids``): pure column expressions, JVM-side, no
state, identical output on any layout and replayable in any engine with
md5.

- ``hash_sample``: keep ~frac of rows.
- ``hash_split``: disjoint named splits (train/val/test) by weight —
  every row lands in exactly one split, stable under appends (a new
  row's split never depends on other rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BUCKETS = 1 << 20


def _gate(key_col: str, salt: str) -> F.Column:
    """Uniform bucket in [0, 2^20) from md5(key # salt) — 15 hex chars
    (60 bits) so the conv() stays exact in a signed 64-bit long."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws("#", F.col(key_col).cast("string"),
                          F.lit(salt))), 1, 15), 16, 10).cast("long")
    return h % _BUCKETS


def hash_sample(df: DataFrame, frac: float, key_col: str,
                salt: str = "sample") -> DataFrame:
    """Keep rows whose hash bucket < frac·2^20 (~frac of rows, exact in
    expectation; deterministic per key+salt)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    return df.filter(_gate(key_col, salt) < int(frac * _BUCKETS))


def stratified_hash_sample(df: DataFrame, rates: dict[str, float],
                           strat_col: str, key_col: str,
                           default_rate: float = 0.0,
                           salt: str = "stratified") -> DataFrame:
    """Per-stratum sampling rates — the corpus-mixing primitive (e.g.
    keep 100% of 'head' quality bucket, 50% of 'middle', 5% of 'tail';
    or language rebalancing). Same salted-md5 gate as hash_sample, so
    the decision is deterministic, layout-independent and append-stable
    per (key, stratum); strata not named in ``rates`` keep
    ``default_rate``. Pure projection + filter — no shuffle, no RNG."""
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    thresh = F.lit(int(default_rate * _BUCKETS))
    for name in sorted(rates):
        thresh = F.when(F.col(strat_col) == name,
                        F.lit(int(rates[name] * _BUCKETS))).otherwise(thresh)
    return df.filter(_gate(key_col, salt) < thresh)


def hash_split(df: DataFrame, weights: dict[str, float], key_col: str,
               salt: str = "split",
               split_col: str = "split") -> DataFrame:
    """Label every row with a split name; cumulative weight ranges over
    the hash bucket partition the corpus disjointly. Weights must sum to
    1 (±1e-9). Split names are assigned in sorted-name order so the
    mapping is independent of dict ordering."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    gate = _gate(key_col, salt)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = gate < int(acc * _BUCKETS)
        branch = F.when(cond, F.lit(name))
        expr = branch if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def pack_sequences(docs: DataFrame, budget: int,
                   n_tokens_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   n_shards: int = 1024,
                   salt: str = "pack") -> DataFrame:
    """Deterministic sequence packing: assign every doc to a training
    pack of ≈ ``budget`` tokens (the GPT/T5 example-packing step).

    Greedy boundary packing in a canonical order: docs hash into
    ``n_shards`` shards (balanced, layout-independent), are ordered
    within the shard by (hash, id) — a replayable total order — and a
    running token cumsum assigns pack = floor(exclusive_cumsum /
    budget). A doc longer than ``budget`` lands in its own pack(s)
    downstream slice. One shuffle keyed on the shard; the window sort
    touches |docs|/n_shards rows per task, so the global sort a naive
    packer needs never happens.

    Output: (id_col, n_tokens, shard, pack) — pack ids are unique per
    (shard, pack) pair; consumers concatenate within a pack."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window
    h = _gate(id_col, salt)
    w = (Window.partitionBy("shard").orderBy("h", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (docs
            .select(F.col(id_col),
                    F.col(n_tokens_col).cast("long").alias("n_tokens"),
                    (h % n_shards).cast("int").alias("shard"),
                    h.alias("h"))
            .withColumn("cum_before",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
            .select(id_col, "n_tokens", "shard",
                    # integral div — no float rounding to drift between
                    # engines (DuckDB CAST(double AS BIGINT) rounds,
                    # Spark truncates)
                    F.expr(f"cum_before div {int(budget)}")
                    .alias("pack")))


def chunk_documents(docs: DataFrame, window: int, stride: int | None = None,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_tokens: int = 1) -> DataFrame:
    """Sliding-window chunking of long documents into training examples
    (the context-window split every LM data pipeline runs before
    packing): word windows of ``window`` tokens starting every
    ``stride`` tokens (default = window, i.e. disjoint; stride < window
    overlaps for causal-LM continuity). The final partial window is
    kept when it has ≥ ``min_tokens`` words.

    Output: (id, chunk_idx, start, n_tokens, chunk_text), chunk_idx
    0-based in document order. Zero shuffles — one whole-stage-codegen
    projection (split → sequence(0, n-1, stride) → slice/concat_ws →
    posexplode); the natural upstream of ``pack_sequences``, which
    takes over exact-budget packing across documents."""
    stride = window if stride is None else stride
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if min_tokens < 1:
        raise ValueError("min_tokens must be >= 1")
    from dbpedia_spotlight_spark.operators.textstats import ws_tokens
    words = ws_tokens(F.col(text_col), fold=False)
    base = docs.select(F.col(id_col), words.alias("_w")) \
               .filter(F.size("_w") >= 1)
    n = F.size("_w")
    # starts every `stride`, stopping after the FIRST window that
    # reaches the document end (the HF overflowing-tokens rule) — so
    # with stride < window exactly one chunk, the last, may be partial,
    # instead of a fan of degenerate overlapping tails
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: (s == 0) | (s - stride + window < n))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.least(F.lit(window), n - s).alias("n_tokens"),
            F.concat_ws(" ", F.slice("_w", s + 1, window))
            .alias("chunk_text")))
    return (base
            .select(id_col, F.posexplode(chunks).alias("chunk_idx", "_c"))
            .select(id_col, "chunk_idx", F.col("_c.start").alias("start"),
                    F.col("_c.n_tokens").alias("n_tokens"),
                    F.col("_c.chunk_text").alias("chunk_text"))
            .filter(F.col("n_tokens") >= min_tokens))


def temperature_weights(df: DataFrame, key_col: str,
                        alpha: float = 0.5) -> DataFrame:
    """CCNet/Llama-style temperature mixing weights per domain:
    ``w_d = (n_d/N)^alpha / Σ_e (n_e/N)^alpha`` — alpha < 1 upweights
    low-resource domains, alpha = 1 is natural sampling. Returns
    (key_col, n_docs, weight).

    Scale: one map-side-combinable count agg over the corpus; the
    normalizer is an agg over |domains| rows crossed back in as a
    broadcast one-row frame — the corpus itself is scanned once and
    never reshuffled. (The (n_d/N)^alpha normalization cancels the
    N^alpha factor, so n_d^alpha is used directly — fewer libm ulps.)"""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(key_col).agg(F.count("*").alias("n_docs"))
    pw = counts.withColumn("_p", F.pow(F.col("n_docs"), F.lit(alpha)))
    total = pw.agg(F.sum("_p").alias("_s"),
                   F.sum("n_docs").alias("_n"))
    return (pw.crossJoin(F.broadcast(total))
            .select(key_col, "n_docs",
                    (F.col("_p") / F.col("_s")).alias("weight"),
                    F.col("_n").alias("total_docs")))


def temperature_resample(df: DataFrame, key_col: str, id_col: str,
                         alpha: float = 0.5, target_frac: float = 0.5,
                         salt: str = "mix") -> DataFrame:
    """Deterministic temperature resampling: keep each domain at rate
    ``r_d = min(1, target_frac · N · w_d / n_d)`` via the salted md5
    gate on ``id_col`` — the Llama-style data-mixing downsample as a
    pure column expression: layout-independent, replayable, stable
    under appends.

    The corpus joins the broadcast |domains|-row rate table and is
    gated in the same scan — no corpus shuffle. The per-domain
    threshold is ``floor(round(r_d, 9) · 2^20)``: rounding first makes
    the engines agree on the rate to 9 dp (pow crosses libm), floor
    (NOT a cast) because DuckDB casts round while Spark casts truncate."""
    if not 0.0 <= target_frac <= 1.0:
        raise ValueError("target_frac must be in [0, 1]")
    w = temperature_weights(df, key_col, alpha)
    rates = w.select(
        key_col,
        F.floor(F.round(
            F.least(F.lit(1.0),
                    F.lit(target_frac) * F.col("total_docs")
                    * F.col("weight") / F.col("n_docs")), 9)
            * _BUCKETS).alias("_thresh"))
    return (df.join(F.broadcast(rates), key_col)
            .filter(_gate(id_col, salt) < F.col("_thresh"))
            .drop("_thresh"))


def weighted_priority_sample(df: DataFrame, k: int, weight_col,
                             id_col: str = "doc_id",
                             strata_cols: list[str] | None = None,
                             salt: str = "wps",
                             max_weight: int = 64) -> DataFrame:
    """Weighted k-sample WITHOUT replacement per stratum,
    probability-proportional-to-weight, fully deterministic and
    integer-exact — the corpus-mixing primitive "give me k docs per
    language, long docs proportionally more likely, same answer on
    every layout/engine/rerun".

    Device: instead of Efraimidis-Szymkowiak-Spirakis float keys
    u^(1/w) (whose ln/pow cross libm and can flip a selection by one
    ulp), each item casts w integer-quantized VIRTUAL DRAWS — salted
    md5 hashes of (id, draw#) — and its priority is the MINIMUM draw.
    For the min of w iid uniforms, P(priority_i < priority_j) =
    w_i/(w_i + w_j), exactly the ES tournament probability, so
    ordering by priority ascending IS weighted sampling without
    replacement — but every comparison is between 60-bit integers:
    bit-identical in any engine, any order, forever.

    Scale shape: the explode is bounded by ``max_weight`` (weights are
    clamped to [1, max_weight] — the quantization cap plays the same
    role as every bucket cap in the dedup family), the per-item min is
    map-side combinable BEFORE the shuffle, and the final top-k is one
    window over per-stratum candidates. Returns the sampled rows of
    ``df`` plus (priority, draw_weight, rank)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_weight < 1:
        raise ValueError("max_weight must be >= 1")
    from pyspark.sql import Window

    from dbpedia_spotlight_spark.operators.dedup import md5_long
    strata_cols = strata_cols or []
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.greatest(
        F.least(wcol.cast("long"), F.lit(max_weight)),
        F.lit(1)).alias("_w")
    drawn = (df.withColumn("_w", w)
             .withColumn("_draw", F.explode(F.sequence(F.lit(1),
                                                       F.col("_w")))))
    pri = md5_long(F.concat_ws("#", F.col(id_col).cast("string"),
                               F.lit(salt), F.col("_draw").cast("string")))
    mins = (drawn.withColumn("_pri", pri)
            .groupBy(*strata_cols, id_col, "_w")
            .agg(F.min("_pri").alias("priority")))
    win = Window.partitionBy(*strata_cols).orderBy("priority", id_col)
    picked = (mins.withColumn("rank", F.row_number().over(win))
              .filter(F.col("rank") <= k)
              .select(*strata_cols, id_col, "priority",
                      F.col("_w").alias("draw_weight"), "rank"))
    return df.join(picked.drop(*strata_cols) if strata_cols else picked,
                   id_col, "inner")
