"""Distributed BPE training/segmentation vs a from-scratch pure-python
reference on identical word counts — merge lists must match exactly
(deterministic tie-break), segmentations must round-trip."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row, functions as F

from dbpedia_spotlight_spark.operators import bpe


def _py_bpe(word_counts: dict[str, int], n_merges: int,
            min_freq: int = 1) -> list[tuple[str, str]]:
    """Reference trainer: straight Sennrich-2016 over word counts with
    the same (count desc, a asc, b asc) tie-break."""
    table = {tuple(list(w) + [bpe.END]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in table.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_freq:
            break
        merges.append((a, b))
        new = {}
        for syms, n in table.items():
            s, i, out = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        table = new
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low new wide low new",
]


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])


def test_train_bpe_matches_python_reference(spark):
    wc = Counter()
    for t in CORPUS:
        wc.update(t.split(" "))
    want = _py_bpe(dict(wc), n_merges=12)
    got = bpe.train_bpe(_docs(spark), n_merges=12)
    assert got == want
    assert len(got) == 12


def test_train_bpe_early_stop_and_min_freq(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="ab")])
    # 'ab</w>' → merges (a,b) then (ab,</w>) then nothing left
    got = bpe.train_bpe(docs, n_merges=10)
    assert got == [("a", "b"), ("ab", bpe.END)]
    assert bpe.train_bpe(_docs(spark), n_merges=5, min_freq=10**6) == []


def test_segment_roundtrip_and_reference_parity(spark):
    merges = bpe.train_bpe(_docs(spark), n_merges=15)
    out = bpe.bpe_segment(_docs(spark), merges).orderBy("doc_id") \
        .collect()
    ranks = {m: i for i, m in enumerate(merges)}
    for row, text in zip(out, CORPUS):
        # round-trip: concatenated subwords reproduce the text exactly
        joined = "".join(row["tokens"]).replace(bpe.END, " ").rstrip()
        assert joined == text
        assert row["n_tokens"] == len(row["tokens"])
        # parity with the reference encoder per word
        want = []
        for w in text.split(" "):
            want.extend(bpe._encode_word(w, ranks))
        assert list(row["tokens"]) == want


def test_learned_merges_compress_in_domain_text(spark):
    merges = bpe.train_bpe(_docs(spark), n_merges=20)
    seg = bpe.bpe_segment(_docs(spark), merges)
    chars = sum(len(t.replace(" ", "")) + len(t.split(" "))
                for t in CORPUS)  # chars + one END per word
    toks = seg.agg(F.sum("n_tokens")).first()[0]
    assert toks < chars * 0.5  # frequent stems compress hard


def test_word_counts_collapses_corpus(spark):
    wc = {r["word"]: r["n"] for r in
          bpe.word_counts(_docs(spark)).collect()}
    assert wc["low"] == 5 and wc["new"] == 4 and wc["widest"] == 1
