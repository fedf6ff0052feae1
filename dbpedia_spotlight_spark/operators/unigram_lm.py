"""SentencePiece-style unigram-LM tokenizer — train + segment (Kudo
2018, "Subword Regularization"), the EM-based half of modern tokenizer
pretraining (operators/bpe.py is the merge-based half).

Same tractability device as BPE: every statistic depends only on the
WORD FREQUENCY TABLE, so the corpus collapses once (one groupBy to
~|vocab| rows) and every EM round runs over that small keyed frame —
the corpus is never rescanned. Rounds are a driver loop like the other
iterative operators here:

- **seed**: all substrings (≤ ``max_piece_len``) of the word inventory,
  frequency-weighted, top ``seed_size`` by (count desc, piece) — pure
  relational explode + count, JVM-side.
- **E-step**: Arrow-batched ``mapInPandas`` over the word-frequency
  table with the current piece probabilities broadcast; per word a
  forward-backward pass over the segmentation lattice yields each
  piece's posterior expected count. PROB-space lattice (no log-sum-exp)
  keeps the per-word arithmetic a fixed op sequence.
- **M-step**: one piece-keyed sum + a driver-side renormalize over the
  vocab-sized count table.
- **prune**: shrink the piece set by ``shrink`` per round (keep top
  pieces by expected count, single chars always survive) until
  ``vocab_size`` — the standard reimplementation of Kudo's loss-based
  prune; the expected-count criterion is this module's PINNED
  simplification (no reference to read the exact loss from).

Determinism device (the kgembed discipline): every word's contribution
to a piece's expected count is quantized to the dyadic 2^-30 grid
before summation — same-grid dyadic sums are exact in ANY order, so
training is bit-identical across partition layouts, repartitions, and
the from-scratch python twin in tests/test_unigram_lm.py (exact to the
last bit while total counts stay under ~2^23, far above any test
fixture; at web scale the layout-independence still holds because the
grid sum property is unconditional — only twin-vs-cluster bit equality
needs the magnitude bound).

Ties in the Viterbi segmenter break toward the LONGER piece, then
lexicographically — pinned so two engines/runs can't emit different
token streams for equal-probability paths.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from .bpe import word_counts

_GRID = float(1 << 30)   # dyadic quantization grid (2^-30 resolution)


def _quant(x: float) -> float:
    return math.floor(x * _GRID + 0.5) / _GRID


def unigram_seed(wc: DataFrame, max_piece_len: int = 6,
                 seed_size: int = 2000) -> DataFrame:
    """Seed piece inventory: every substring of length ≤
    ``max_piece_len`` of every word, weighted by word frequency, top
    ``seed_size`` by (weight desc, piece) PLUS every single character
    (segmentability guarantee). One explode + one piece-keyed count —
    the explode fan-out is bounded by word_len·max_piece_len per word
    row, and word rows are vocab-sized, not corpus-sized."""
    n_chars = F.length("word")
    starts = F.sequence(F.lit(1), n_chars)
    pieces = F.flatten(F.transform(
        starts,
        lambda i: F.filter(
            F.transform(
                F.sequence(F.lit(1), F.lit(max_piece_len)),
                lambda ln: F.when(i + ln - 1 <= n_chars,
                                  F.substring(F.col("word"), i, ln)),
            ),
            lambda p: p.isNotNull(),
        ),
    ))
    counted = (wc.select(F.explode(pieces).alias("piece"), "n")
               .groupBy("piece").agg(F.sum("n").alias("weight")))
    singles = counted.filter(F.length("piece") == 1)
    multi = (counted.filter(F.length("piece") > 1)
             .orderBy(F.col("weight").desc(), "piece")
             .limit(seed_size))
    return singles.unionByName(multi)


def _lattice_expectations(word: str, freq: int, probs: dict[str, float],
                          max_len: int) -> dict[str, float]:
    """Forward-backward over the segmentation lattice of one word:
    returns each piece's posterior expected count × freq. Prob-space
    (doubles); the op sequence is a pure function of (word, probs), so
    any two evaluators produce identical bits."""
    n = len(word)
    # alpha[i] = total prob of all segmentations of word[:i]
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for ln in range(1, min(max_len, i) + 1):
            p = probs.get(word[i - ln:i])
            if p is not None and alpha[i - ln] > 0.0:
                s += alpha[i - ln] * p
        alpha[i] = s
    if alpha[n] <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        s = 0.0
        for ln in range(1, min(max_len, n - i) + 1):
            p = probs.get(word[i:i + ln])
            if p is not None and beta[i + ln] > 0.0:
                s += p * beta[i + ln]
        beta[i] = s
    z = alpha[n]
    out: dict[str, float] = {}
    for i in range(n):
        if alpha[i] <= 0.0:
            continue
        for ln in range(1, min(max_len, n - i) + 1):
            piece = word[i:i + ln]
            p = probs.get(piece)
            if p is not None and beta[i + ln] > 0.0:
                c = alpha[i] * p * beta[i + ln] / z * freq
                if c > 0.0:
                    out[piece] = out.get(piece, 0.0) + c
    return out


_EXP_SCHEMA = StructType([
    StructField("piece", StringType()),
    StructField("c", DoubleType()),
])


def _estep_kernel(probs: dict[str, float], max_len: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[str, float] = {}
            for word, n in zip(pdf["word"], pdf["n"]):
                for piece, c in _lattice_expectations(
                        word, int(n), probs, max_len).items():
                    # grid-quantize BEFORE summation: dyadic sums are
                    # exact in any order → layout-independent training
                    acc[piece] = acc.get(piece, 0.0) + _quant(c)
            yield pd.DataFrame({"piece": list(acc), "c": list(acc.values())})
    return run


def train_unigram(docs: DataFrame, vocab_size: int = 400,
                  text_col: str = "text", max_piece_len: int = 6,
                  seed_size: int = 2000, em_rounds: int = 2,
                  shrink: float = 0.75,
                  max_prune_rounds: int = 20) -> dict[str, float]:
    """EM-train the unigram piece inventory down to ``vocab_size``;
    returns {piece: ln p(piece)}. Driver loop: each prune round runs
    ``em_rounds`` E/M passes over the word-frequency table (vocab-
    sized, broadcast piece probs, one piece-keyed aggregate per pass),
    then keeps the top ``shrink``-fraction of multi-char pieces by
    expected count (singles always survive). The collected count table
    is vocab-sized — bounded driver state, like the BPE merge list."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    wc = word_counts(docs, text_col=text_col).localCheckpoint(eager=True)
    seed = unigram_seed(wc, max_piece_len, seed_size).collect()
    total_w = float(sum(r["weight"] for r in seed))
    probs = {r["piece"]: r["weight"] / total_w for r in seed}

    def em_pass(cur: dict[str, float]) -> dict[str, float]:
        rows = (wc.mapInPandas(_estep_kernel(cur, max_piece_len),
                               _EXP_SCHEMA)
                .groupBy("piece").agg(F.sum("c").alias("c"))
                .collect())
        # quantization can floor a piece's entire count to exactly 0 —
        # drop those (a zero-probability piece is just a pruned piece),
        # but floor singles at one grid step (segmentability invariant)
        counts = {r["piece"]: r["c"] for r in rows if r["c"] > 0.0}
        for p in cur:
            if len(p) == 1:
                counts[p] = max(counts.get(p, 0.0), 1.0 / _GRID)
        z = sum(counts.values())
        return {p: c / z for p, c in sorted(counts.items())}

    for _ in range(max_prune_rounds):
        for _ in range(em_rounds):
            probs = em_pass(probs)
        multi = sorted(((p, c) for p, c in probs.items() if len(p) > 1),
                       key=lambda pc: (-pc[1], pc[0]))
        n_singles = sum(1 for p in probs if len(p) == 1)
        if n_singles + len(multi) <= vocab_size:
            break
        keep_n = max(vocab_size - n_singles,
                     int(len(multi) * shrink))
        if keep_n >= len(multi):
            keep_n = max(vocab_size - n_singles, 0)
        kept = {p for p, _ in multi[:keep_n]}
        probs = {p: c for p, c in probs.items()
                 if len(p) == 1 or p in kept}
        z = sum(probs.values())
        probs = {p: c / z for p, c in probs.items()}
        if n_singles + keep_n <= vocab_size:
            probs = em_pass(probs)
            break
    return {p: math.log(c) for p, c in sorted(probs.items())}


def _viterbi(word: str, logp: dict[str, float],
             max_len: int) -> list[str]:
    """Best segmentation; ties prefer the LONGER incoming piece, then
    the lexicographically smaller one (pinned — see module doc)."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln:i]
            lp = logp.get(piece)
            if lp is None or best[i - ln] == NEG:
                continue
            s = best[i - ln] + lp
            b = back[i]
            if (s > best[i]
                    or (s == best[i] and b is not None
                        and (ln > b[0]
                             or (ln == b[0] and piece < b[1])))):
                best[i] = s
                back[i] = (ln, piece)
    if best[n] == NEG:
        # unseen character somewhere: fall back to per-char emission
        # (chars outside the trained inventory pass through verbatim)
        out = []
        i = 0
        while i < n:
            matched = False
            for ln in range(min(max_len, n - i), 0, -1):
                sub = word[i:i + ln]
                if sub in logp:
                    out.append(sub)
                    i += ln
                    matched = True
                    break
            if not matched:
                out.append(word[i])
                i += 1
        return out
    out = []
    i = n
    while i > 0:
        ln, piece = back[i]
        out.append(piece)
        i -= ln
    return out[::-1]


_SEG_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("tokens", ArrayType(StringType())),
])


def segment_unigram(docs: DataFrame, logp: dict[str, float],
                    id_col: str = "doc_id", text_col: str = "text",
                    max_piece_len: int = 6) -> DataFrame:
    """Viterbi-segment every doc with a trained inventory: (id,
    tokens). One Arrow-batched pass, inventory broadcast by closure —
    no shuffle at all (segmentation is embarrassingly parallel)."""
    from .decontam import _norm
    src = docs.select(F.col(id_col).cast("long").alias("id"),
                      F.split(_norm(F.col(text_col)), " ").alias("_w"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = []
            for words in pdf["_w"]:
                seg: list[str] = []
                for w in words:
                    if w:
                        seg.extend(_viterbi(w, logp, max_piece_len))
                toks.append(seg)
            yield pd.DataFrame({"id": pdf["id"], "tokens": toks})
    return (src.mapInPandas(run, _SEG_SCHEMA)
            .withColumnRenamed("id", id_col))
