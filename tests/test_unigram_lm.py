"""Unigram-LM (SentencePiece-style) tokenizer: Spark training vs a
from-scratch python twin, layout-independence of the grid-quantized
EM, and the pinned Viterbi tie-break."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from dbpedia_spotlight_spark.operators import unigram_lm as U


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


CORPUS = ["ababab cdcd ababab", "abc cdcd cdcd", "ababab abc xyz",
          "cdcd xyz xyz ababab"]


# --- from-scratch twin (independent implementation) ---------------------


def _twin_word_counts(rows):
    wc = {}
    for t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _twin_seed(wc, max_len, seed_size):
    weight = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                p = w[i:i + ln]
                weight[p] = weight.get(p, 0) + n
    singles = {p: c for p, c in weight.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in weight.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    return {**singles, **dict(multi)}


def _twin_fb(word, freq, probs, max_len):
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for ln in range(1, min(max_len, i) + 1):
            p = probs.get(word[i - ln:i])
            if p is not None and alpha[i - ln] > 0.0:
                s += alpha[i - ln] * p
        alpha[i] = s
    if alpha[n] <= 0:
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
    out = {}
    for i in range(n):
        if alpha[i] <= 0:
            continue
        for ln in range(1, min(max_len, n - i) + 1):
            piece = word[i:i + ln]
            p = probs.get(piece)
            if p is not None and beta[i + ln] > 0.0:
                c = alpha[i] * p * beta[i + ln] / alpha[n] * freq
                if c > 0:
                    out[piece] = out.get(piece, 0.0) + c
    return out


def _twin_train(rows, vocab_size, max_len=6, seed_size=2000,
                em_rounds=2, shrink=0.75, max_prune_rounds=20):
    grid = float(1 << 30)
    q = lambda x: math.floor(x * grid + 0.5) / grid  # noqa: E731
    wc = _twin_word_counts(rows)
    seed = _twin_seed(wc, max_len, seed_size)
    total = float(sum(seed.values()))
    probs = {p: c / total for p, c in seed.items()}

    def em(cur):
        counts = {}
        for w, n in wc.items():
            for piece, c in _twin_fb(w, n, cur, max_len).items():
                counts[piece] = counts.get(piece, 0.0) + q(c)
        counts = {p: c for p, c in counts.items() if c > 0.0}
        for p in cur:
            if len(p) == 1:
                counts[p] = max(counts.get(p, 0.0), 1.0 / grid)
        z = sum(counts.values())
        return {p: c / z for p, c in sorted(counts.items())}

    for _ in range(max_prune_rounds):
        for _ in range(em_rounds):
            probs = em(probs)
        multi = sorted(((p, c) for p, c in probs.items() if len(p) > 1),
                       key=lambda pc: (-pc[1], pc[0]))
        n_singles = sum(1 for p in probs if len(p) == 1)
        if n_singles + len(multi) <= vocab_size:
            break
        keep_n = max(vocab_size - n_singles, int(len(multi) * shrink))
        if keep_n >= len(multi):
            keep_n = max(vocab_size - n_singles, 0)
        kept = {p for p, _ in multi[:keep_n]}
        probs = {p: c for p, c in probs.items()
                 if len(p) == 1 or p in kept}
        z = sum(probs.values())
        probs = {p: c / z for p, c in probs.items()}
        if n_singles + keep_n <= vocab_size:
            probs = em(probs)
            break
    return {p: math.log(c) for p, c in sorted(probs.items())}


# --- tests --------------------------------------------------------------


def test_seed_matches_twin(spark):
    from dbpedia_spotlight_spark.operators.bpe import word_counts
    wc = word_counts(_docs(spark, CORPUS))
    got = {r.piece: r.weight
           for r in U.unigram_seed(wc, 4, 10).collect()}
    expect = _twin_seed(_twin_word_counts(CORPUS), 4, 10)
    assert got == expect


def test_train_matches_twin(spark):
    got = U.train_unigram(_docs(spark, CORPUS), vocab_size=12,
                          max_piece_len=4, seed_size=30)
    expect = _twin_train(CORPUS, 12, max_len=4, seed_size=30)
    assert set(got) == set(expect)
    for p in got:
        assert got[p] == pytest.approx(expect[p], rel=1e-9), p
    # the repeated units dominate the learned inventory
    assert "ab" in got or "abab" in got or "ababab" in got
    assert "cdcd" in got or "cd" in got


def test_train_is_layout_independent_bitwise(spark):
    d = _docs(spark, CORPUS)
    a = U.train_unigram(d.coalesce(1), vocab_size=12,
                        max_piece_len=4, seed_size=30)
    b = U.train_unigram(d.repartition(7), vocab_size=12,
                        max_piece_len=4, seed_size=30)
    assert a == b  # EXACT equality — the dyadic grid sum device


def test_segment_matches_twin_viterbi(spark):
    logp = U.train_unigram(_docs(spark, CORPUS), vocab_size=12,
                           max_piece_len=4, seed_size=30)
    probes = ["ababab", "abccdcd", "xyzab", "q"]  # 'q' unseen char
    out = {r.doc_id: list(r.tokens)
           for r in U.segment_unigram(
               _docs(spark, probes), logp,
               max_piece_len=4).collect()}
    for i, w in enumerate(probes):
        assert "".join(out[i]) == w  # lossless
    # twin Viterbi (independent impl, same tie-break: longer then lex)
    def twin_vit(word):
        n = len(word)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [None] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for ln in range(1, min(4, i) + 1):
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
            return None
        seq, i = [], n
        while i > 0:
            ln, piece = back[i]
            seq.append(piece)
            i -= ln
        return seq[::-1]

    for i, w in enumerate(probes[:3]):
        assert out[i] == twin_vit(w), w


def test_segment_compresses_and_is_shuffle_free(spark):
    logp = U.train_unigram(_docs(spark, CORPUS), vocab_size=12,
                           max_piece_len=4, seed_size=30)
    seg = U.segment_unigram(_docs(spark, CORPUS), logp, max_piece_len=4)
    rows = seg.collect()
    n_tokens = sum(len(r.tokens) for r in rows)
    n_chars = sum(len(t.replace(" ", "")) for t in CORPUS)
    assert n_tokens < n_chars / 2  # learned pieces actually compress
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_size_validation(spark):
    with pytest.raises(ValueError):
        U.train_unigram(_docs(spark, CORPUS), vocab_size=0)
