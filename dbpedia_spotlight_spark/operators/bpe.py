"""Distributed BPE tokenizer training + segmentation — the tokenizer
side of a training-data pipeline (Sennrich et al. 2016; the GPT-2/
sentencepiece preprocessing step), Spark-first.

The standard trick makes this tractable at 100 TB: BPE statistics only
depend on the WORD FREQUENCY TABLE, not the corpus — so the corpus
collapses once (one groupBy to ~|vocab| rows, ~100M at web scale) and
every merge round runs over that small keyed table:

round = ONE pair-explode + map-side-combinable count (weighted by word
frequency) + a deterministic argmax (count desc, then pair lexicographic
— ties can't flap between runs or engines), then ONE Arrow-batched
rewrite of the symbol arrays. The corpus itself is never rescanned.

Training is a driver LOOP (n_merges rounds) like the other iterative
operators here (pagerank, k-core): each round's exchange is keyed on
symbol pairs (vocab-sized), with a lineage cut every few rounds.

Parity: ``tests/test_bpe.py`` pins the Spark-learned merge list against
a from-scratch pure-python BPE on identical word counts, and the
segmenter against a reference encoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from .decontam import _norm

END = "</w>"   # word-terminal symbol: merges can't cross word ends,
               # and a learned token ending in </w> only matches at ends


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the normalized corpus — the ONE corpus-sized
    aggregation in BPE training."""
    return (docs
            .select(F.split(_norm(F.col(text_col)), " ").alias("_toks"))
            .select(F.explode_outer("_toks").alias("word"))
            .filter(F.col("word").isNotNull() & (F.col("word") != ""))
            .groupBy("word").agg(F.count("*").alias("n")))


_SYM_SCHEMA = StructType([
    StructField("syms", ArrayType(StringType())),
    StructField("n", LongType()),
])


def _apply_merge_pdf(a: str, b: str):
    """mapInPandas kernel: merge every adjacent (a, b) into a+b,
    left-to-right (the BPE contract — 'aaa' with rule (a,a) → 'aa','a')."""
    ab = a + b

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                i, res = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        res.append(ab)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"syms": out, "n": pdf["n"]})
    return run


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text",
              min_freq: int = 1,
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` ordered merge rules. Stops early when no pair
    reaches ``min_freq``. Deterministic: argmax tie-break is (count
    desc, a asc, b asc)."""
    wc = word_counts(docs, text_col)
    table = wc.select(
        F.concat(F.transform(F.split("word", ""), lambda c: c),
                 F.array(F.lit(END))).alias("syms"),
        F.col("n"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        # fully-merged words (one symbol) contribute no pairs — and
        # Spark's sequence(0, -1) DESCENDS, so they must be filtered
        # before the pair explode, not papered over with try_element_at
        pairs = table.filter(F.size("syms") >= 2).select(
            F.col("n"),
            F.explode(F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at("syms", i + 1).alias("a"),
                    F.element_at("syms", i + 2).alias("b")),
            )).alias("p"),
        ).groupBy("p.a", "p.b").agg(F.sum("n").alias("c"))
        top = pairs.orderBy(F.col("c").desc(), F.col("a"), F.col("b")) \
            .first()
        if top is None or top["c"] < min_freq:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b))
        table = table.mapInPandas(_apply_merge_pdf(a, b), _SYM_SCHEMA)
        if (r + 1) % checkpoint_every == 0:
            table = table.localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    s = list(word) + [END]
    while len(s) > 1:
        best, best_rank = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        a, b = s[best], s[best + 1]
        # apply THIS rule everywhere left-to-right (training order)
        i, out = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, tokens array<string>, n_tokens) — apply learned merges in
    rank order (lowest rank first, the BPE inference contract). One
    Arrow-batched pass; the merge table broadcasts via task closure
    (vocab-sized). Per-word results are memoized per batch — web text
    repeats words heavily."""
    ranks = {m: i for i, m in enumerate(merges)}
    out_schema = StructType([
        StructField("id", LongType()),
        StructField("tokens", ArrayType(StringType())),
        StructField("n_tokens", LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, lens = [], [], []
            for i, t in zip(pdf["id"], pdf["t"]):
                words = t.split(" ") if t else []
                enc: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    enc.extend(got)
                ids.append(int(i))
                toks.append(enc)
                lens.append(len(enc))
            yield pd.DataFrame({"id": ids, "tokens": toks,
                                "n_tokens": lens})

    return docs.select(
        F.col(id_col).cast("long").alias("id"),
        _norm(F.col(text_col)).alias("t"),
    ).mapInPandas(run, out_schema).withColumnRenamed("id", id_col)
