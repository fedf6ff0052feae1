"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All result-bearing logic is native Spark SQL expressions (codegen'd,
oracle-reproducible in DuckDB); the only UDF is the winnowing
fingerprint (rolling hash), which is order-dependent imperative logic.
"""

from __future__ import annotations

import string

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

# Strict one-to-one casefold shared with the DuckDB oracle via
# `translate(text, CASEFOLD_FROM, CASEFOLD_TO)`: every Basic Latin /
# Latin-1 / Latin Extended A-B upper → lower pair whose lowercase is a
# SINGLE codepoint. Unicode lower() itself is NOT 1:1 (U+0130 İ expands
# to two codepoints in Python but one in SQL engines, desynchronizing
# any cross-engine character stream); restricting to the 1:1 pairs
# keeps accented case-folding (É→é, Ü→ü, Š→š — dedup recall on
# French/German/Czech text) while excluding exactly the expanding
# codepoints that diverge between engines.
def _one_to_one_casefold() -> tuple[str, str]:
    src, dst = [], []
    for cp in range(0x41, 0x250):           # Basic Latin .. Latin Ext-B
        u = chr(cp)
        lo = u.lower()
        if u != lo and len(lo) == 1:
            src.append(u)
            dst.append(lo)
    return "".join(src), "".join(dst)


CASEFOLD_FROM, CASEFOLD_TO = _one_to_one_casefold()
ASCII_LOWER = str.maketrans(CASEFOLD_FROM, CASEFOLD_TO)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "que", "de", "es", "una", "por", "con", "para"),
}


def _tokens(text_col) -> F.Column:
    return F.split(F.lower(text_col), " ")


def ws_tokens(text_col: F.Column, fold: bool = True) -> F.Column:
    """THE repo-wide whitespace tokenization pinned by the DuckDB oracle
    pairs (spandedup / bm25 / chunking): ``trim`` then split on
    ``\\s+``, optionally case-folded, with the empty-text case pinned to
    an EMPTY array (bare ``split('', '\\s+')`` would mint ``['']`` —
    size 1). One definition so the parity caveats (Java vs RE2 ``\\s``,
    trim strips spaces only, leading newlines mint one empty word on
    both engines) live in one place and can't drift per copy."""
    t = F.trim(F.lower(text_col) if fold else text_col)
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit-ratio per language profile + argmax language guess.
    score_L = |tokens ∩ profile_L| / |tokens|."""
    toks = _tokens(F.col(text_col))
    n = F.greatest(F.size(toks), F.lit(1))
    cols = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(
            toks, lambda t: t.isin(*[F.lit(w) for w in words])
        ))
        cols.append((hits / n).alias(f"score_{lang}"))
    out = docs.select("doc_id", *cols)
    # argmax with deterministic tie-break on language name order
    best = None
    for lang in sorted(LANG_PROFILES):
        c = F.col(f"score_{lang}")
        if best is None:
            best = F.struct(c.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(c > best["s"], F.struct(c.alias("s"), F.lit(lang).alias("l"))).otherwise(best)
    return out.withColumn("lang_guess", best["l"])


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    n_chars, n_tokens, mean token length, stopword ratio, digit ratio,
    uppercase ratio. Composite = weighted bounded sum (documented spec,
    not a learned model)."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.length(text)
    stop_hits = F.size(F.filter(
        toks, lambda t: t.isin(*[F.lit(w) for w in LANG_PROFILES["en"]])
    ))
    digits = F.length(F.regexp_replace(text, "[^0-9]", ""))
    uppers = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # spaces removed
    stop_ratio = stop_hits / n_tok
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    upper_ratio = uppers / F.greatest(n_chars, F.lit(1))
    quality = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(upper_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        digit_ratio.alias("digit_ratio"),
        upper_ratio.alias("upper_ratio"),
        quality.alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (word pieces = letter runs, digit runs, or single punctuation)."""
    text = F.col(text_col)
    ws = F.size(F.split(text, " "))
    bpe = F.size(F.regexp_extract_all(
        F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
    ))
    return docs.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def content_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text — the cheap dedup key (oracle-reproducible)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return docs.select("doc_id", F.md5(F.trim(norm)).alias("fingerprint"))


def winnowing_fingerprints(docs: DataFrame, k: int = 5, window: int = 4,
                           text_col: str = "text") -> DataFrame:
    """Winnowing (Schleimer et al.): rolling Karp-Rabin hash over k-grams,
    keep the min hash of each window → robust partial-overlap fingerprint
    set. Imperative/per-position → Arrow-batched pandas UDF.

    Normalization is PINNED to ASCII-only lowercasing (A-Z → a-z via a
    one-to-one translate): Unicode ``str.lower()`` has one-to-many
    casefolds (U+0130 İ → 'i'+U+0307 in Python but one codepoint in SQL
    engines), which desynchronizes the Karp-Rabin char stream between
    the UDF and the DuckDB oracle. A strict 1:1 mapping is engine-
    independent by construction (see tests/test_winnowing_property.py)."""
    B, M = 131, (1 << 61) - 1

    def fp(text: str) -> list[int]:
        s = " ".join(text.translate(ASCII_LOWER).split())
        if len(s) < k:
            return []
        hashes = []
        h = 0
        power = pow(B, k - 1, M)
        for i, ch in enumerate(s):
            h = (h * B + ord(ch)) % M
            if i >= k:
                h = (h - ord(s[i - k]) * power * B) % M
            if i >= k - 1:
                hashes.append(h)
        out = []
        prev = -1
        for w in range(len(hashes) - window + 1):
            m = min(range(w, w + window), key=lambda j: (hashes[j], j))
            if m != prev:
                out.append(hashes[m])
                prev = m
        return out if out else ([min(hashes)] if hashes else [])

    @F.pandas_udf(ArrayType(LongType()))
    def fp_udf(texts: pd.Series) -> pd.Series:
        return texts.map(fp)

    return docs.select("doc_id", fp_udf(F.col(text_col)).alias("fingerprints"))


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   min_tokens: int = 25,
                   min_distinct_ratio: float = 0.4,
                   max_top_token_frac: float = 0.15,
                   max_top_bigram_frac: float = 0.06) -> DataFrame:
    """Gopher/C4-style repetition + lexical-diversity gates (Rae 2021
    §A1.1 / Raffel 2020 C4 heuristics, re-expressed relationally): per
    doc — token count, distinct-token ratio, mean token length, most-
    frequent-token fraction, most-frequent-bigram fraction, and a
    composite ``passes`` gate. The repetition fractions catch boilerplate
    and keyword-stuffed pages that length/stopword features miss.

    Shape: ONE scan — tokens and bigrams explode together as kind-tagged
    grams, then two map-side-combinable groupBy levels + a per-doc pivot;
    only (doc_id, gram) pairs are shuffled, never text, and the corpus is
    read once (a token-branch/bigram-branch/join form reads it three
    times — at 100 TB the scan dominates). Total token chars (for mean
    token length) fall out of Σ len(gram)·count on the token kind, so no
    doc-level re-join is needed. All ratios are single exact double
    divisions (bit-identical across engines, no rounding needed). An
    in-array alternative (transform + filter counts per distinct token)
    would avoid the shuffles but is O(distinct·n) per doc — quadratic
    for long web documents."""
    toks = F.split(F.col(text_col), " ")
    bigrams = F.expr(
        "transform(slice(toks, 1, size(toks) - 1),"
        " (x, i) -> concat(x, ' ', element_at(toks, i + 2)))")
    grams = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(F.concat(
                F.transform(F.col("toks"), lambda t: F.struct(
                    F.lit(0).alias("kind"), t.alias("gram"))),
                F.transform(bigrams, lambda b: F.struct(
                    F.lit(1).alias("kind"), b.alias("gram"))),
            )).alias("g"),
        )
        .select("doc_id", F.col("g.kind").alias("kind"),
                F.col("g.gram").alias("gram"))
    )
    gc = grams.groupBy("doc_id", "kind", "gram").agg(F.count("*").alias("c"))
    st = gc.groupBy("doc_id", "kind").agg(
        F.max("c").alias("top"),
        F.sum("c").alias("n"),
        F.count("*").alias("nd"),
        F.sum(F.length("gram") * F.col("c")).alias("chars"),
    )
    tok_kind = F.when(F.col("kind") == 0, F.col("n"))
    out = (
        st.groupBy("doc_id").agg(
            F.max(tok_kind).alias("n_tokens"),
            F.max(F.when(F.col("kind") == 0, F.col("nd")))
             .alias("n_distinct"),
            F.max(F.when(F.col("kind") == 0, F.col("top"))).alias("top_cnt"),
            F.max(F.when(F.col("kind") == 0, F.col("chars")))
             .alias("char_len"),
            F.max(F.when(F.col("kind") == 1, F.col("top")))
             .alias("top_bg_cnt"),
            F.max(F.when(F.col("kind") == 1, F.col("n"))).alias("n_bigrams"),
        )
        .select(
            "doc_id", "n_tokens", "n_distinct",
            (F.col("n_distinct").cast("double") / F.col("n_tokens"))
            .alias("distinct_ratio"),
            (F.col("char_len").cast("double") / F.col("n_tokens"))
            .alias("mean_token_len"),
            (F.col("top_cnt").cast("double") / F.col("n_tokens"))
            .alias("top_token_frac"),
            F.coalesce(
                F.col("top_bg_cnt").cast("double") / F.col("n_bigrams"),
                F.lit(0.0)).alias("top_bigram_frac"),
        )
    )
    return out.withColumn(
        "passes",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    )


def subsample_frequent(docs: DataFrame, t: float = 1e-4,
                       id_col: str = "doc_id", text_col: str = "text",
                       salt: str = "sub") -> DataFrame:
    """Mikolov frequent-word subsampling (word2vec 2013): token i of
    word w survives with p = min(1, sqrt(t / f(w))) where f is the
    word's corpus frequency — the standard thinning that stops 'the'
    from dominating every skip-gram window before embedding training.

    Deterministic and layout-independent: the per-token coin is the
    salted md5 of (doc, position, word) against a per-word threshold
    floor(round(p, 9)·2^20) (round-then-floor: the temperature_resample
    device — 9dp makes both engines agree on p across the sqrt, floor
    because DuckDB casts round where Spark casts truncate). One
    corpus-sized explode + a broadcast vocab-sized rate join; returns
    the surviving (id, pos, word) stream."""
    from dbpedia_spotlight_spark.operators.decontam import _norm
    from dbpedia_spotlight_spark.operators.dedup import md5_long
    if not 0.0 < t <= 1.0:
        raise ValueError("t must be in (0, 1]")
    toks = (docs.select(F.col(id_col).cast("long").alias("id"),
                        F.posexplode(F.split(_norm(F.col(text_col)), " "))
                        .alias("pos", "word"))
            .filter(F.col("word") != ""))
    freqs = toks.groupBy("word").agg(F.count("*").alias("c"))
    total = freqs.agg(F.sum("c").alias("n"))
    buckets = 1 << 20
    rates = (freqs.crossJoin(F.broadcast(total))
             .select("word",
                     F.floor(F.round(
                         F.least(F.lit(1.0),
                                 F.sqrt(F.lit(t) * F.col("n")
                                        / F.col("c"))), 9)
                         * buckets).alias("_thresh")))
    gate = md5_long(F.concat_ws(
        "#", F.col("id").cast("string"), F.lit(salt),
        F.col("pos").cast("string"), F.col("word"))) % buckets
    return (toks.join(F.broadcast(rates), "word")
            .filter(gate < F.col("_thresh"))
            .select("id", "pos", "word"))
