"""Benchmark decontamination + n-gram LM perplexity (round-4 additions
to the training-data suite). Cross-engine value parity lives in
test_rotated_queries; these pin the semantics and the plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from dbpedia_spotlight_spark.operators import decontam, lm


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


CLEAN = "the quick brown fox jumps over the lazy dog near the river bank"
EVAL_Q = "what is the capital city of the ancient kingdom of lydia"


def test_planted_contamination_flagged_and_dropped(spark):
    docs = _docs(spark, [
        CLEAN,
        "intro text " + EVAL_Q + " trailing words here",   # verbatim leak
        "totally unrelated words about spark shuffles and joins going on",
    ])
    bench = spark.createDataFrame([Row(bench_id=0, text=EVAL_Q)])
    rep = decontam.benchmark_overlap(docs, bench, n=8).toPandas()
    assert list(rep["id"]) == [1]
    assert rep["n_hit"].iloc[0] >= 1
    kept = decontam.decontaminate(docs, bench, n=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]
    # text columns pass through untouched
    assert kept.columns == docs.columns


def test_overlap_attribution_per_benchmark(spark):
    docs = _docs(spark, ["aa " + EVAL_Q, CLEAN + " " + CLEAN])
    bench = spark.createDataFrame([
        Row(bench_id=7, text=EVAL_Q),
        Row(bench_id=8, text=CLEAN),
    ])
    rep = decontam.overlap_by_benchmark(docs, bench, n=8).toPandas()
    got = {(r.id, r.bench_id) for r in rep.itertuples()}
    assert got == {(0, 7), (1, 8)}


def test_short_benchmark_prompt_matches_verbatim_copy(spark):
    # prompts shorter than n words fall back to whole-text grams
    prompt = "two plus two"
    docs = _docs(spark, [f"{prompt}", "something else entirely different"])
    bench = spark.createDataFrame([Row(text=prompt)])
    rep = decontam.benchmark_overlap(docs, bench, n=8).toPandas()
    assert list(rep["id"]) == [0]


def test_casefold_and_whitespace_insensitive(spark):
    docs = _docs(spark, ["THE   Quick\tBROWN fox jumps over the lazy dog"])
    bench = spark.createDataFrame(
        [Row(text="the quick brown fox jumps over the lazy dog")])
    assert decontam.benchmark_overlap(docs, bench, n=8).count() == 1


def test_decontam_plan_broadcasts_benchmark(spark):
    docs = _docs(spark, [CLEAN] * 4)
    bench = spark.createDataFrame([Row(text=EVAL_Q)])
    plan = decontam.benchmark_overlap(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------------- lm --

REF = [
    "the cat sat on the mat and the dog sat on the rug",
    "the dog ran to the cat and the cat ran to the mat",
    "a cat and a dog sat on a mat near the door",
]


def test_reference_like_text_scores_lower_perplexity(spark):
    model = lm.train_bigram_lm(_docs(spark, REF))
    probe = _docs(spark, [
        "the cat sat on the mat",                  # in-domain
        "zq xv wk jj qqq zzz plmb vrt nnn ddd",    # OOV gibberish
    ])
    out = (lm.doc_perplexity(probe, model)
           .orderBy("doc_id").toPandas())
    assert out["perplexity"].iloc[0] < out["perplexity"].iloc[1]
    assert (out["n_tokens"] == [6, 10]).all()


def test_perplexity_matches_hand_computation(spark):
    import math
    model = lm.train_bigram_lm(_docs(spark, ["a b a b"]), alpha=0.5)
    # BOS stream [<s>, a, b, a, b] → pairs (<s>,a)(a,b)(b,a)(a,b), so
    # C(w1): <s>:1 a:2 b:1; C(<s>,a)=1 C(a,b)=2 C(b,a)=1; V=2
    V = 2
    al = 0.5

    def p(cbg, cug):
        return (cbg + al) / (cug + al * (V + 1))

    probe = _docs(spark, ["a b c"])
    # bigrams: (<s>,a)(a,b)(b,c) → p(1,1), p(2,2), p(0,1)
    expect_avg = (math.log(p(1, 1)) + math.log(p(2, 2))
                  + math.log(p(0, 1))) / 3
    row = lm.doc_perplexity(probe, model).first()
    assert row["avg_lnp"] == pytest.approx(round(expect_avg, 9), abs=1e-9)
    assert row["perplexity"] == pytest.approx(
        round(math.exp(-round(expect_avg, 9)), 6), abs=1e-6)


def test_buckets_and_thresholds(spark):
    model = lm.train_bigram_lm(_docs(spark, REF))
    probe = _docs(spark, REF + ["zq xv wk jj qqq zzz plmb vrt nnn ddd"])
    scored = lm.doc_perplexity(probe, model)
    lo, hi = lm.ppl_thresholds(scored)
    assert lo <= hi
    b = lm.perplexity_buckets(scored, lo, hi).toPandas()
    assert set(b["bucket"]) <= {"head", "middle", "tail"}
    # gibberish doc must land in the tail
    assert b.sort_values("doc_id")["bucket"].iloc[-1] == "tail"


def test_lm_training_and_scoring_are_udf_free(spark):
    model = lm.train_bigram_lm(_docs(spark, REF))
    plan = lm.doc_perplexity(_docs(spark, REF), model) \
        ._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas",
                   "MapInPandas"):
        assert marker not in plan
    # count tables ride in as broadcasts, corpus side shuffles once
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------ sampling --

def test_stratified_hash_sample_rates_and_stability(spark):
    from dbpedia_spotlight_spark.operators.sampling import (
        stratified_hash_sample,
    )
    df = spark.range(0, 30000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "head")
         .when(F.col("id") % 3 == 1, "middle")
         .otherwise("tail").alias("bucket"))
    out = stratified_hash_sample(
        df, {"head": 1.0, "middle": 0.5, "tail": 0.05}, "bucket", "id")
    counts = {r["bucket"]: r["n"] for r in
              out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert counts["head"] == 10000                     # rate 1.0 exact
    assert abs(counts["middle"] - 5000) < 300
    assert abs(counts["tail"] - 500) < 120
    # layout independence: repartitioned input keeps the same rows
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in stratified_hash_sample(
        df.repartition(13), {"head": 1.0, "middle": 0.5, "tail": 0.05},
        "bucket", "id").collect())
    assert a == b
    # unnamed strata follow default_rate
    none_kept = stratified_hash_sample(df, {"head": 1.0}, "bucket", "id") \
        .filter("bucket != 'head'").count()
    assert none_kept == 0


def test_stratified_rate_validation(spark):
    from dbpedia_spotlight_spark.operators.sampling import (
        stratified_hash_sample,
    )
    df = spark.range(3).withColumn("b", F.lit("x"))
    with pytest.raises(ValueError):
        stratified_hash_sample(df, {"x": 1.5}, "b", "id")


def test_pack_sequences_budget_and_layout_independence(spark):
    from dbpedia_spotlight_spark.operators.sampling import pack_sequences
    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 90 + 10).alias("n_tokens"))   # 10..99 tokens
    out = pack_sequences(docs, budget=1000, n_shards=16)
    # every pack's total stays within budget + one overflow doc
    sizes = out.groupBy("shard", "pack") \
        .agg(F.sum("n_tokens").alias("tot")).toPandas()
    assert (sizes["tot"] <= 1000 + 99).all()
    # non-final packs are well-filled (greedy boundary packing)
    last = out.groupBy("shard").agg(F.max("pack").alias("mp")).toPandas()
    full = sizes.merge(last, on="shard")
    full = full[full["pack"] < full["mp"]]
    assert (full["tot"] >= 1000 - 99).all()
    # layout independence
    a = out.orderBy("doc_id").collect()
    b = pack_sequences(docs.repartition(13), budget=1000, n_shards=16) \
        .orderBy("doc_id").collect()
    assert a == b
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


# --- interpolated Kneser-Ney (round-5 addition) -------------------------


def _py_kn(ref_texts, probe, discount=0.75):
    """From-scratch interpolated-KN twin (same formula, python floats)."""
    import math
    streams = [["<s>"] + t.split() for t in ref_texts]
    pairs = [(s[i], s[i + 1]) for s in streams for i in range(len(s) - 1)]
    c_bg, c_ug = {}, {}
    for w1, w2 in pairs:
        c_bg[(w1, w2)] = c_bg.get((w1, w2), 0) + 1
        c_ug[w1] = c_ug.get(w1, 0) + 1
    fan, cont = {}, {}
    for w1, w2 in c_bg:
        fan[w1] = fan.get(w1, 0) + 1
        cont[w2] = cont.get(w2, 0) + 1
    nbt = len(c_bg)
    vocab = len({w2 for _, w2 in pairs if w2 != "<s>"})
    d = discount

    def pc(w2):
        return (cont.get(w2, 0) + 1) / (nbt + vocab + 1)

    def p(w1, w2):
        if w1 not in c_ug:
            return pc(w2)
        return (max(c_bg.get((w1, w2), 0) - d, 0.0)
                + d * fan[w1] * pc(w2)) / c_ug[w1]

    s = ["<s>"] + probe.split()
    lps = [math.log(p(s[i], s[i + 1])) for i in range(len(s) - 1)]
    return round(sum(lps) / len(lps), 9)


def test_kn_matches_python_twin(spark):
    ref = ["the cat sat on the mat", "the dog sat on the rug",
           "a cat and a dog ran", "san francisco is a city"]
    model = lm.train_kn_bigram_lm(_docs(spark, ref))
    probes = ["the cat ran", "san francisco dog", "zz qq unseen words"]
    got = {r["doc_id"]: r["avg_lnp"]
           for r in lm.kn_doc_perplexity(_docs(spark, probes), model)
           .collect()}
    for i, probe in enumerate(probes):
        assert got[i] == pytest.approx(_py_kn(ref, probe), abs=1e-9), probe


def test_kn_distribution_sums_to_one(spark):
    """Σ_{w2 ∈ V ∪ {OOV}} p(w2|w1) = 1 for every seen context — the
    discounted mass is exactly recycled through the continuation
    distribution (python twin mirrors the operator formula)."""
    ref = ["a b a c b a", "b c b a a"]
    streams = [["<s>"] + t.split() for t in ref]
    pairs = [(s[i], s[i + 1]) for s in streams for i in range(len(s) - 1)]
    c_bg, c_ug, fan, cont = {}, {}, {}, {}
    for w1, w2 in pairs:
        c_bg[(w1, w2)] = c_bg.get((w1, w2), 0) + 1
        c_ug[w1] = c_ug.get(w1, 0) + 1
    for w1, w2 in c_bg:
        fan[w1] = fan.get(w1, 0) + 1
        cont[w2] = cont.get(w2, 0) + 1
    nbt, d = len(c_bg), 0.75
    vocab = sorted({w2 for _, w2 in pairs})
    denom = nbt + len(vocab) + 1

    for w1 in c_ug:
        tot = 0.0
        for w2 in vocab:  # every vocab token
            tot += (max(c_bg.get((w1, w2), 0) - d, 0.0)
                    + d * fan[w1] * (cont.get(w2, 0) + 1) / denom) \
                / c_ug[w1]
        tot += d * fan[w1] * (1 / denom) / c_ug[w1]  # the OOV slot
        assert tot == pytest.approx(1.0, abs=1e-12), w1


def test_kn_prefers_versatile_token_in_unseen_context(spark):
    """The Kneser-Ney signature: 'francisco' is frequent but follows
    ONLY 'san', while 'day' is no more frequent but follows many
    contexts — after an unseen context, continuation probability must
    rank 'day' above 'francisco' (add-α ranks by raw frequency and
    gets this backwards)."""
    ref = ["san francisco shines", "san francisco votes",
           "san francisco sleeps", "san francisco grows",
           "good day comes", "every day counts",
           "one day ends", "market day opens"]
    model = lm.train_kn_bigram_lm(_docs(spark, ref))
    # both probes put the target after a context unseen in training
    probes = ["probe francisco", "probe day"]
    out = {r["doc_id"]: r["avg_lnp"]
           for r in lm.kn_doc_perplexity(_docs(spark, probes), model)
           .collect()}
    assert out[1] > out[0]  # 'day' more probable → larger (less neg) lnp
    add_a = lm.train_bigram_lm(_docs(spark, ref))
    base = {r["doc_id"]: r["avg_lnp"]
            for r in lm.doc_perplexity(_docs(spark, probes), add_a)
            .collect()}
    assert base[1] == pytest.approx(base[0], abs=1e-9)  # add-α is blind


def test_kn_scoring_is_udf_free(spark):
    model = lm.train_kn_bigram_lm(_docs(spark, ["a b c a b"]))
    plan = lm.kn_doc_perplexity(_docs(spark, ["a b"]), model) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_kn_discount_range_validated(spark):
    with pytest.raises(ValueError):
        lm.train_kn_bigram_lm(_docs(spark, ["a b"]), discount=1.0)
    with pytest.raises(ValueError):
        lm.train_kn_bigram_lm(_docs(spark, ["a b"]), discount=0.0)
