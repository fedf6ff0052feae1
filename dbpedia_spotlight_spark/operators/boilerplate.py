"""C4-style boilerplate line filtering for web corpora.

A Common-Crawl page, even after HTML stripping (``functions/extraction``),
still carries navigation bars, cookie banners, copyright footers and
script fallbacks interleaved with body text. The standard published
cure (C4 — Raffel et al. 2020, "Exploring the Limits of Transfer
Learning", §2.2) filters *lines*, not documents:

- drop lines with fewer than ``min_words`` words;
- drop lines containing a blocklisted phrase (javascript fallbacks,
  lorem ipsum, cookie/privacy/terms boilerplate, copyright footers);
- drop lines containing ``{`` (leaked CSS/JS) or ``|`` (nav-bar
  separators — ``Home | About | Contact``; prose never carries a pipe);
- drop lines whose non-alphanumeric character fraction exceeds
  ``max_symbol_frac`` (decoration rules like ``**** ====``);
- optionally (C4 proper) require terminal punctuation — OFF by default
  here because the synthetic corpus carries none.

Everything is pure column expressions over ``split``/``filter``/
``array_join`` higher-order functions: the whole op is a projection —
JVM-side whole-stage codegen, ZERO shuffles, fused into whatever scan
it rides on. At 100 TB that matters: line filtering touches every byte
of the corpus, so it must never be the stage that forces an exchange or
a Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Lowercase substrings that mark a line as boilerplate (C4 §2.2 list,
# trimmed to phrases that are unambiguous as substrings).
DEFAULT_BLOCKLIST = (
    "javascript",
    "lorem ipsum",
    "cookie",
    "privacy policy",
    "terms of use",
    "all rights reserved",
)


def line_is_clean(
    line: Column,
    min_words: int = 5,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    max_symbol_frac: float = 0.3,
    require_terminal_punct: bool = False,
) -> Column:
    """Predicate over ONE line (already newline-free)."""
    t = F.trim(line)
    low = F.lower(t)
    keep = F.size(F.split(t, " +")) >= F.lit(min_words)
    for phrase in blocklist:
        keep = keep & ~low.contains(phrase)
    keep = keep & ~t.contains("{") & ~t.contains("|")
    # symbol fraction: chars outside [A-Za-z0-9 ] over total chars
    n_sym = F.length(t) - F.length(F.regexp_replace(t, "[^A-Za-z0-9 ]", ""))
    keep = keep & (n_sym <= F.length(t) * F.lit(max_symbol_frac))
    if require_terminal_punct:
        keep = keep & t.rlike('[.!?"]$')
    return keep


def clean_boilerplate(
    pages: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words: int = 5,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    max_symbol_frac: float = 0.3,
    require_terminal_punct: bool = False,
) -> DataFrame:
    """Filter boilerplate lines out of ``text_col``.

    Adds ``out_col`` (kept lines re-joined with "\\n"), ``n_lines_kept``
    and ``n_lines_dropped``. Pure projection — zero shuffles; plan shape
    pinned by ``tests/test_operators.py``.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda x: line_is_clean(
            x, min_words=min_words, blocklist=blocklist,
            max_symbol_frac=max_symbol_frac,
            require_terminal_punct=require_terminal_punct,
        ),
    )
    return (
        pages.withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn("n_lines_kept", F.size(kept).cast("long"))
        .withColumn(
            "n_lines_dropped",
            (F.size(lines) - F.size(kept)).cast("long"),
        )
    )


def _line_word_count(line: Column) -> Column:
    """Words in one line; a blank/whitespace-only line counts 0 (Spark
    ``split('', ' +')`` yields ``['']`` — size 1 — so the blank case is
    pinned explicitly to keep blank separators out of the dedup set)."""
    t = F.trim(line)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " +")))


def line_dedup(pages: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               out_col: str = "clean_text",
               min_words: int = 2) -> DataFrame:
    """CROSS-document line deduplication (the C4 'discard any line that
    occurs elsewhere in the dataset' rule, kept-first form): a line
    survives only where it first appears — first = minimum
    (doc id, line index), a deterministic, layout-independent total
    order. Catches syndicated footers / license blocks / navigation
    chrome that per-document rules (``clean_boilerplate``) can't see.

    Scale shape — page TEXTS never enter a shuffle:

    1. posexplode → project ``(md5(line), id, idx)`` — 48-byte rows,
       not lines;
    2. ONE map-side-combinable ``min(struct(id, idx))`` per hash (the
       shuffle carries |distinct lines| partials);
    3. non-winners reduce to a per-doc sorted drop-index list — tiny
       (only docs that lose lines, only integer indices), so the join
       back onto ``pages`` is AQE-broadcastable and the corpus itself
       stays on its scan partitions;
    4. rebuild is a higher-order ``filter`` over the original
       ``split(text)`` by index — pure projection, whole-stage codegen.

    ``min_words``: lines with fewer words bypass dedup entirely (blank
    separators and one-word bullets repeat naturally and should not be
    globally unique; C4 §2.2 similarly gates on ≥3-sentence spans).
    Returns the input columns plus ``out_col`` and ``n_lines_dropped``.
    """
    occ = (pages
           .select(F.col(id_col).alias("_id"),
                   F.posexplode(F.split(F.col(text_col), "\n"))
                   .alias("_idx", "_line"))
           .filter(_line_word_count(F.col("_line")) >= min_words)
           .select("_id", "_idx", F.md5("_line").alias("_h")))
    winners = (occ.groupBy("_h")
               .agg(F.min(F.struct(F.col("_id"), F.col("_idx")))
                    .alias("_w")))
    drops = (occ.join(winners, "_h")
             .filter((F.col("_id") != F.col("_w._id"))
                     | (F.col("_idx") != F.col("_w._idx")))
             .groupBy("_id")
             .agg(F.sort_array(F.collect_list("_idx"))
                  .alias("_drop_idxs")))
    arr = F.split(F.col(text_col), "\n")
    return (pages
            .join(drops.withColumnRenamed("_id", id_col), id_col, "left")
            .withColumn("_di", F.coalesce(F.col("_drop_idxs"),
                                          F.array().cast("array<int>")))
            .withColumn(out_col, F.array_join(
                F.filter(arr, lambda x, i:
                         ~F.array_contains(F.col("_di"), i)), "\n"))
            .withColumn("n_lines_dropped", F.size("_di").cast("long"))
            .drop("_drop_idxs", "_di"))
