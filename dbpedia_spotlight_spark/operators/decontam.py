"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard LLM-training hygiene step (GPT-3 appendix C / PaLM / Llama
report the same recipe): a training document is *contaminated* if it
shares at least one word n-gram (n≈8-13) with any benchmark document;
contaminated docs are dropped (or the overlap reported per benchmark for
audit). Both stages are pure DataFrame algebra — no UDFs anywhere:

1. normalize (1:1 casefold translate + whitespace collapse — the same
   cross-engine-pinned normalization winnowing uses, so the DuckDB
   oracle replays it exactly),
2. distinct word n-grams per side (``F.transform`` over ``sequence`` —
   JVM codegen),
3. ONE broadcast semi/inner join on the gram string: the benchmark side
   is eval-set-sized (thousands of docs), the corpus side never
   shuffles its text — at 100 TB this is a map-side hash probe per
   gram + one map-side-combinable count keyed on doc_id.

``benchmark_overlap`` keeps gram strings (not hashes) as the join key so
the report is exact; for a privacy/bandwidth-constrained variant, wrap
the gram in ``dedup.md5_long`` on BOTH sides — 60-bit collisions are
~n_grams²/2⁶¹, negligible at eval-set scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import CASEFOLD_FROM, CASEFOLD_TO


def _norm(text_col) -> F.Column:
    """Cross-engine-stable normalization: 1:1 casefold translate (the
    winnowing contract — Unicode lower() one-to-many expansions diverge
    between engines) + whitespace collapse + trim."""
    return F.trim(F.regexp_replace(
        F.translate(text_col, CASEFOLD_FROM, CASEFOLD_TO), "\\s+", " "))


def _grams_of(toks, n: int) -> F.Column:
    """Distinct word n-grams from a BOUND token-array column. Callers
    must project the token array first (`F.split(_norm(...))` behind a
    select) — referencing the split+translate tree inside the per-gram
    lambda would re-evaluate it for every gram (HOF lambdas defeat CSE;
    measured 6-8x on the driver corpus)."""
    size = F.size(toks)
    grams = F.when(size >= n, F.transform(
        F.sequence(F.lit(0), size - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(grams)


def word_ngrams(text_col, n: int) -> F.Column:
    """Distinct word n-grams of the normalized text as array<string>;
    docs shorter than n words contribute their whole text as one gram
    (so short benchmark prompts still match verbatim copies).

    Single-Column convenience form: the token array is let-bound via a
    one-element transform so normalize+split runs once per row, not
    once per gram. The two-step projected form (`select` the split,
    then :func:`_grams_of`) is faster still and is what the operators
    below use."""
    return F.element_at(F.transform(
        F.array(F.split(_norm(text_col), " ")),
        lambda toks: _grams_of(toks, n)), 1)


def _with_grams(df: DataFrame, text_col: str, n: int,
                **keep) -> DataFrame:
    """Project the normalized token array ONCE, then derive the distinct
    gram array from the bound column — the fast two-step form.
    ``keep`` maps output-name → source column name to carry through."""
    first = [F.col(src).alias(name) for name, src in keep.items()]
    return (df.select(*first, F.split(_norm(F.col(text_col)), " ")
                      .alias("_toks"))
              .select(*keep, _grams_of(F.col("_toks"), n).alias("grams")))


def benchmark_grams(benchmark: DataFrame, n: int = 8,
                    text_col: str = "text") -> DataFrame:
    """Distinct n-grams over the whole benchmark set — one column
    ``gram``. Eval sets are small; the result is meant to broadcast."""
    return (_with_grams(benchmark, text_col, n)
            .select(F.explode("grams").alias("gram"))
            .distinct())


def benchmark_overlap(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      bench_text_col: str = "text") -> DataFrame:
    """Per-document contamination report: (id, n_grams, n_hit, hit_frac)
    for every training doc sharing ≥1 n-gram with the benchmark.

    Plan shape: corpus scan → gram explode (codegen) → broadcast hash
    probe against the benchmark grams → ONE map-side-combinable count
    keyed on the doc id. Clean docs don't appear (anti-join them via
    :func:`decontaminate`); at web scale almost every doc is clean, so
    the aggregate input is tiny."""
    # explode_OUTER: plain explode's Generate adds an implicit
    # size(grams)>0 filter that Catalyst pushes below the token-array
    # projection, re-inlining the normalize+split tree once PER GRAM
    # (measured 9x on the driver corpus). The gram array is never
    # empty, and the inner join drops any null row anyway.
    g = _with_grams(docs, text_col, n, id=id_col).select(
        "id", F.size("grams").alias("n_grams"),
        F.explode_outer("grams").alias("gram"),
    )
    bg = benchmark_grams(benchmark, n, bench_text_col)
    return (g.join(F.broadcast(bg), "gram")
             .groupBy("id", "n_grams")
             .agg(F.count("*").alias("n_hit"))
             .select("id", "n_grams", "n_hit",
                     (F.col("n_hit") / F.col("n_grams")).alias("hit_frac")))


def overlap_by_benchmark(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                         id_col: str = "doc_id",
                         bench_id_col: str = "bench_id",
                         text_col: str = "text",
                         bench_text_col: str = "text") -> DataFrame:
    """Attribution variant: (doc id, bench_id, n_hit) — which benchmark
    items leaked into which training docs. The benchmark side keeps its
    id through the broadcast, everything else matches
    :func:`benchmark_overlap`. A gram shared by several benchmark items
    counts once per item (the audit wants per-item leak counts)."""
    g = _with_grams(docs, text_col, n, id=id_col) \
        .select("id", F.explode_outer("grams").alias("gram"))
    bg = (_with_grams(benchmark, bench_text_col, n, bench_id=bench_id_col)
          .select("bench_id", F.explode("grams").alias("gram"))
          .distinct())
    return (g.join(F.broadcast(bg), "gram")
             .groupBy("id", "bench_id")
             .agg(F.count("*").alias("n_hit")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  min_hits: int = 1,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """Drop every training doc with ≥ ``min_hits`` benchmark n-gram
    hits (the GPT-3 recipe at min_hits=1). LEFT ANTI join on the doc id
    — the corpus shuffles only its id column against a tiny flagged
    set, all text columns pass through untouched."""
    flagged = (benchmark_overlap(docs, benchmark, n, id_col, text_col,
                                 bench_text_col)
               .filter(F.col("n_hit") >= min_hits)
               .select(F.col("id").alias(id_col)))
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
