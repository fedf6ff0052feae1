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
