"""Exact duplicate-SPAN detection and kept-first removal (substring
dedup at word-k-gram granularity).

The ExactSubstr rule of Lee et al., *Deduplicating Training Data Makes
Language Models Better* (ACL 2022), adapted to the fixed-width
word-k-gram form that distributes: find every k-word span whose exact
(case-folded) text recurs elsewhere in the corpus, report per-document
duplicated-token mass, and optionally strip every non-first occurrence.
Completes the dedup family already in the engine — ``line_dedup``
(line granularity, C4 rule), ``winnowing_fingerprints`` (sampled
fingerprints), MinHash/SimHash (whole-document near-dup) — with the
exact-substring member that catches boilerplate runs crossing line
boundaries and quote-level duplication far below document granularity.

Scale shape (the text itself never enters a shuffle):

1. Each document's gram stream collapses map-side to
   ``(doc, pos, xxhash64(gram))`` — 24-byte rows, built entirely in
   whole-stage codegen (``split`` → ``transform`` + ``slice`` +
   ``concat_ws`` + ``xxhash64`` → ``posexplode``); the gram *strings*
   die inside the projection.
2. ONE map-side-combinable aggregate per hash finds duplicated grams
   (``count(distinct doc)`` or plain ``count`` per ``scope``); the
   shuffle carries |distinct grams| partials, not occurrences.
3. The join back onto the occurrence stream is hash-keyed; AQE
   broadcasts it whenever the duplicated-gram table is small (the
   common case — duplication is sparse), else it is a plain shuffled
   join on the 24-byte rows.
4. ``mask_duplicate_spans`` reduces non-keeper coverage to a per-doc
   integer drop-index list (tiny — only docs that lose words), so the
   join back onto the corpus is AQE-broadcastable and the rebuild is a
   higher-order ``filter`` over the original ``split`` — pure
   projection on the scan partitions.

64-bit gram hashing: at 10^12 grams the expected number of birthday
collisions is ~10^4 — each merges two unrelated grams and can only
*over*-flag, never miss, a duplicate; acceptable for corpus curation.
``carry_gram=True`` keeps the gram text alongside the hash for audit /
exact verification at fixture scale (that is what the DuckDB oracle
pair checks against).

Parity note (pinned by the oracle pairs at sf0.001/0.01): tokenization
is ``lower(trim(text))`` split on ``\\s+``. Java and RE2 disagree on
``\\x0B`` ∈ ``\\s`` and non-ASCII case folding; the test corpus is
pure ASCII with no vertical tabs (probed), so both engines tokenize
identically there. Leading/trailing newlines (``trim`` strips spaces
only) mint one empty word on BOTH engines — same grams, same parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 13  # words per span — the CCNet/Lee-et-al working range


def _words(text_col: Column) -> Column:
    """Case-folded whitespace tokens — the shared repo-wide
    tokenization (``textstats.ws_tokens``; empty text pinned to an
    empty array)."""
    from dbpedia_spotlight_spark.operators.textstats import ws_tokens
    return ws_tokens(text_col, fold=True)


def gram_occurrences(docs: DataFrame, k: int = DEFAULT_K,
                     id_col: str = "doc_id", text_col: str = "text",
                     carry_gram: bool = False) -> DataFrame:
    """Stream of every k-word gram occurrence: ``(id, pos, gram_hash)``
    (+ ``gram`` when ``carry_gram``). ``pos`` is the 0-based word index
    of the span start. Docs shorter than k words emit nothing. All
    whole-stage codegen; no UDF, no shuffle."""
    base = (docs.select(F.col(id_col).alias(id_col),
                        _words(F.col(text_col)).alias("_w"))
            .filter(F.size("_w") >= k))
    gram = F.transform(
        F.sequence(F.lit(0), F.size("_w") - k),
        lambda i: F.concat_ws(" ", F.slice("_w", i + 1, k)))
    occ = base.select(id_col, F.posexplode(gram).alias("pos", "_g"))
    out = occ.select(id_col, "pos", F.xxhash64("_g").alias("gram_hash"),
                     *([F.col("_g").alias("gram")] if carry_gram else []))
    return out


def _dup_hashes(occ: DataFrame, id_col: str, min_dup: int,
                scope: str) -> DataFrame:
    """Duplicated-gram table ``(gram_hash, n_dup)``. ``scope='docs'``
    counts distinct documents (cross-document duplication only — a
    phrase looping within one page is repetition, not syndication);
    ``scope='occurrences'`` counts raw occurrences (the literal
    Lee-et-al rule, which also catches within-document repeats)."""
    if scope == "docs":
        agg = F.count_distinct(F.col(id_col))
    elif scope == "occurrences":
        agg = F.count(F.lit(1))
    else:
        raise ValueError(f"scope must be 'docs' or 'occurrences': {scope}")
    return (occ.groupBy("gram_hash").agg(agg.alias("n_dup"))
            .filter(F.col("n_dup") >= min_dup))


def duplicate_spans(docs: DataFrame, k: int = DEFAULT_K,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_dup: int = 2, scope: str = "docs",
                    carry_gram: bool = False) -> DataFrame:
    """Per-occurrence listing of duplicated k-grams:
    ``(id, pos, gram_hash, n_dup)`` (+ ``gram`` when ``carry_gram``) —
    one row per occurrence of every gram that appears in ≥ ``min_dup``
    distinct docs (``scope='docs'``) or ≥ ``min_dup`` times anywhere
    (``scope='occurrences'``)."""
    occ = gram_occurrences(docs, k, id_col, text_col, carry_gram)
    return occ.join(_dup_hashes(occ, id_col, min_dup, scope), "gram_hash") \
              .select(id_col, "pos", "gram_hash", "n_dup",
                      *(["gram"] if carry_gram else []))


def duplicate_span_stats(docs: DataFrame, k: int = DEFAULT_K,
                         id_col: str = "doc_id", text_col: str = "text",
                         min_dup: int = 2,
                         scope: str = "docs") -> DataFrame:
    """Per-document duplicated-token mass — the curation-gate signal
    (drop or down-weight documents that are mostly duplicated text):
    ``(id, n_words, n_dup_grams, dup_positions)`` for EVERY input doc
    (zeros where nothing duplicates). ``dup_positions`` counts distinct
    word positions covered by ≥1 duplicated gram, i.e. the union of the
    k-wide span intervals — ``dup_positions / n_words`` is the
    duplicated fraction. All integer columns (cross-engine
    hash-stable); compute the ratio downstream.

    The covered-position count is the union length of the per-doc
    fixed-width intervals ``[pos, pos+k)`` — computed by ONE per-doc
    ``aggregate`` fold over the sorted span starts (a doc's own spans,
    bounded by its word count), NOT by exploding k positions per span
    and distinct-shuffling them: both per-doc columns come out of a
    single groupBy, so the gram stream is built once per aggregate
    side instead of four times, and the widest shuffle stays the
    24-byte hash rows. (The DuckDB oracle pair replays the same number
    via the naive explode+distinct form — an independent derivation.)"""
    spans = duplicate_spans(docs, k, id_col, text_col, min_dup, scope)
    per = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.sort_array(F.collect_list("pos")).alias("_ps"))
    union_len = F.aggregate(
        "_ps",
        F.struct(F.lit(0).alias("cov"), F.lit(-1).alias("end")),
        lambda acc, p: F.struct(
            (acc["cov"] + F.greatest(p + k - F.greatest(acc["end"], p),
                                     F.lit(0))).alias("cov"),
            F.greatest(acc["end"], p + k).alias("end")),
        lambda acc: acc["cov"])
    per = per.select(id_col, "n_dup_grams",
                     union_len.alias("dup_positions"))
    nw = docs.select(F.col(id_col).alias(id_col),
                     F.size(_words(F.col(text_col))).alias("n_words"))
    return (nw.join(per, id_col, "left")
            .select(id_col, "n_words",
                    F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
                    F.coalesce(F.col("dup_positions").cast("long"),
                               F.lit(0)).alias("dup_positions")))


def mask_duplicate_spans(docs: DataFrame, k: int = DEFAULT_K,
                         id_col: str = "doc_id", text_col: str = "text",
                         out_col: str = "clean_text",
                         min_dup: int = 2,
                         scope: str = "docs") -> DataFrame:
    """Kept-first span removal: for each duplicated gram the keeper
    occurrence is the minimum ``(doc id, pos)`` — the same
    deterministic, layout-independent total order as ``line_dedup`` —
    and every word position covered ONLY by non-keeper duplicated grams
    is dropped. Positions also covered by a keeper gram survive, so the
    kept copy is never mutilated by an overlapping loser. Returns the
    input columns plus ``out_col`` (surviving words joined by single
    spaces — inner whitespace is normalized, stated contract) and
    ``n_words_dropped``.

    Token-boundary caveat: masking rebuilds from the ORIGINAL-case
    whitespace split (same boundaries as the fold used for matching —
    case folding never creates or destroys whitespace), so offsets
    align by construction."""
    occ = gram_occurrences(docs, k, id_col, text_col)
    spans = occ.join(_dup_hashes(occ, id_col, min_dup, scope), "gram_hash")
    keep = spans.groupBy("gram_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_k"))
    flagged = (spans.join(keep, "gram_hash")
               .withColumn("_is_keep",
                           (F.col(id_col) == F.col(f"_k.{id_col}"))
                           & (F.col("pos") == F.col("_k.pos"))))
    cov = flagged.select(
        id_col,
        F.explode(F.sequence(F.col("pos"),
                             F.col("pos") + k - 1)).alias("_p"),
        "_is_keep")
    drops = (cov.groupBy(id_col, "_p")
             .agg(F.max("_is_keep").alias("_any_keep"))
             .filter(~F.col("_any_keep"))
             .groupBy(id_col)
             .agg(F.sort_array(F.collect_list("_p")).alias("_drop")))
    from dbpedia_spotlight_spark.operators.textstats import ws_tokens
    orig_words = ws_tokens(F.col(text_col), fold=False)
    return (docs
            .join(drops, id_col, "left")
            .withColumn("_di", F.coalesce(F.col("_drop"),
                                          F.array().cast("array<int>")))
            .withColumn(out_col, F.array_join(
                F.filter(orig_words,
                         lambda x, i: ~F.array_contains(F.col("_di"), i)),
                " "))
            .withColumn("n_words_dropped", F.size("_di").cast("long"))
            .drop("_drop", "_di"))
