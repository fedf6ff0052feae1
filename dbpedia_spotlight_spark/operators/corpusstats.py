"""Corpus-level distributional diagnostics — the two classical laws a
web-scale pipeline checks before trusting a crawl slice as "natural
language at the expected mix":

- **Zipf fit** (:func:`zipf_fit`): OLS of ln(freq) on ln(rank) over the
  word-frequency table. A healthy web corpus sits near slope −1;
  boilerplate floods, template farms, and synthetic spam bend the
  slope and crater R² — so (slope, r2) is a one-row corpus smell test.
- **Heaps / vocabulary growth** (:func:`vocab_growth`): cumulative
  (tokens seen, distinct words seen) at doc-prefix checkpoints. A
  corpus whose vocabulary stops growing is duplicated; one whose
  vocabulary grows linearly is noise.

Scale shapes: everything reduces to the word-frequency table first
(the BPE collapse — ONE corpus-sized aggregate), so the global rank
sort in ``zipf_fit`` is vocab-sized, not corpus-sized (documented: the
single intentional global sort, on a table ~10^8 rows at full-web
scale). ``vocab_growth`` never ranks at all: per-doc token counts and
per-word first-appearance docs each aggregate map-side, then fold into
10 checkpoint rows.

Cross-engine device: regression sums accumulate round(ln·, 9) values
CAST TO DECIMAL(28,9) — decimal sums are exact in any order (the HLL/
assortativity integer-sum discipline extended to fixed-point), so both
engines divide the identical numerators; the residual risk is a libm
ln() ulp flipping the 9th decimal of one term, the same exposure every
ln-based pair in this repo already carries. ``vocab_growth`` is
all-integer — exact unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .decontam import _norm

_DEC = "decimal(18,9)"      # ln inputs: |value| < 1e9, 9dp fixed-point
_DEC2 = "decimal(38,18)"    # exact 18dp products of two 9dp terms


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the normalized corpus (the BPE collapse)."""
    return (docs.select(F.explode(
        F.split(_norm(F.col(text_col)), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("n")))


def zipf_fit(docs: DataFrame, text_col: str = "text",
             top_n: int | None = None) -> DataFrame:
    """One row (n_ranks, slope, intercept, r2): OLS of y = ln n on
    x = ln rank over the (freq desc, word) ranking, optionally
    truncated to the ``top_n`` head (the published fits use the head —
    the hapax tail is known to bend below the power law)."""
    wf = word_freqs(docs, text_col)
    w = Window.orderBy(F.col("n").desc(), "word")
    ranked = wf.withColumn("rank", F.row_number().over(w))
    if top_n is not None:
        ranked = ranked.filter(F.col("rank") <= top_n)
    x = F.round(F.log(F.col("rank").cast("double")), 9).cast(_DEC)
    y = F.round(F.log(F.col("n").cast("double")), 9).cast(_DEC)
    agg = ranked.agg(
        F.count("*").alias("m"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum((x * y).cast(_DEC2)).alias("sxy"),
        F.sum((x * x).cast(_DEC2)).alias("sxx"),
        F.sum((y * y).cast(_DEC2)).alias("syy"))
    m = F.col("m").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    # zero x-variance (single rank) or zero y-variance (all freqs
    # equal — e.g. a corpus of identical copies) make the fit
    # undefined: NULL, not an ANSI divide-by-zero (the assortativity
    # convention)
    xvar = m * sxx - sx * sx
    yvar = m * syy - sy * sy
    slope = F.when(xvar != 0.0, (m * sxy - sx * sy) / xvar)
    intercept = F.when(xvar != 0.0, (sy - slope * sx) / m)
    r2 = F.when((xvar != 0.0) & (yvar != 0.0),
                (m * sxy - sx * sy) * (m * sxy - sx * sy)
                / (xvar * yvar))
    return agg.select(
        F.col("m").cast("long").alias("n_ranks"),
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 9).alias("intercept"),
        F.round(r2, 9).alias("r2"))


def vocab_growth(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 n_checkpoints: int = 10) -> DataFrame:
    """Heaps-law curve: (checkpoint, cum_tokens, cum_vocab) at
    ``n_checkpoints`` equal doc-id prefixes — checkpoint c covers docs
    with id ≤ (max_id+1)·c/n − 1 (integer arithmetic, no quantile
    estimation). Two map-side aggregates (per-doc token counts,
    per-word first-appearance doc) fold into n rows; nothing global
    ever sorts. All-integer output — cross-engine exact."""
    if n_checkpoints < 1:
        raise ValueError("n_checkpoints must be >= 1")
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("word")) \
        .filter(F.col("word") != "")
    mx = toks.agg((F.max("id") + 1).alias("span"))
    # checkpoint index of a doc: smallest c whose prefix includes it —
    # c = floor(id·n/span) + 1 (ids 0-based, prefixes 1-based); floor,
    # NOT a long cast — DuckDB casts round where Spark casts truncate
    ck = F.floor(F.col("id") * n_checkpoints / F.col("span")) + F.lit(1)
    per_doc = (toks.crossJoin(F.broadcast(mx))
               .select(ck.alias("ck"), "word"))
    tok_counts = per_doc.groupBy("ck").agg(F.count("*").alias("t"))
    first_seen = (per_doc.groupBy("word")
                  .agg(F.min("ck").alias("ck"))
                  .groupBy("ck").agg(F.count("*").alias("v")))
    grid = (docs.sparkSession.range(1, n_checkpoints + 1)
            .withColumnRenamed("id", "ck"))
    w = Window.orderBy("ck").rowsBetween(Window.unboundedPreceding, 0)
    return (grid.join(tok_counts, "ck", "left")
            .join(first_seen, "ck", "left")
            .select("ck",
                    F.coalesce("t", F.lit(0)).alias("t"),
                    F.coalesce("v", F.lit(0)).alias("v"))
            .select(F.col("ck").cast("int").alias("checkpoint"),
                    F.sum("t").over(w).alias("cum_tokens"),
                    F.sum("v").over(w).alias("cum_vocab")))
