"""DSIR importance-resampling data selection (operators/dsir.py).

The cross-engine value contract lives in the registry pair
(queries.q_dsir_select / sql_dsir_select — DuckDB replays hashing,
smoothing, Gumbel keys end-to-end); these tests pin the semantics:
hand-computed weights on a tiny corpus, target-direction monotonicity,
zero-gram neutrality, layout independence, and selection behavior.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _buckets(text: str, n_buckets: int, salt: str = "dsir") -> list[int]:
    toks = text.strip().lower().split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_h60(f"{g}#{salt}") % n_buckets for g in grams]


def _expected_logw(text: str, target_texts: list[str],
                   raw_texts: list[str], n_buckets: int,
                   alpha: float = 1.0) -> float:
    from collections import Counter
    tgt = Counter(b for t in target_texts
                  for b in _buckets(t, n_buckets))
    raw = Counter(b for t in raw_texts for b in _buckets(t, n_buckets))
    tt, rt = sum(tgt.values()), sum(raw.values())
    ab = alpha * n_buckets
    return sum(
        math.log((tgt.get(b, 0) + alpha) / (tt + ab))
        - math.log((raw.get(b, 0) + alpha) / (rt + ab))
        for b in _buckets(text, n_buckets))


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_weights_match_python_reference(spark):
    from dbpedia_spotlight_spark.operators.dsir import (
        dsir_log_ratio, dsir_weights,
    )
    raw_texts = ["alpha beta gamma", "omega psi", "alpha alpha beta",
                 "psi omega omega psi", ""]
    tgt_texts = ["alpha beta", "alpha gamma beta"]
    raw = _frame(spark, raw_texts)
    tgt = _frame(spark, tgt_texts)
    ratio = dsir_log_ratio(raw, tgt, n_buckets=64)
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, ratio, n_buckets=64).collect()}
    assert len(got) == len(raw_texts)
    for i, t in enumerate(raw_texts):
        exp = _expected_logw(t, tgt_texts, raw_texts, 64)
        assert abs(got[i] - exp) < 1e-9, (i, got[i], exp)


def test_empty_doc_is_distribution_neutral(spark):
    from dbpedia_spotlight_spark.operators.dsir import (
        dsir_log_ratio, dsir_weights,
    )
    raw = _frame(spark, ["alpha beta", "", "   "])
    tgt = _frame(spark, ["alpha"])
    ratio = dsir_log_ratio(raw, tgt, n_buckets=32)
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, ratio, n_buckets=32).collect()}
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[0] != 0.0


def test_target_like_docs_outweigh_off_target(spark):
    from dbpedia_spotlight_spark.operators.dsir import (
        dsir_log_ratio, dsir_weights,
    )
    on = [f"spark shuffle join agg row {i % 3}" for i in range(10)]
    off = [f"poem moon river cloud {i % 3}" for i in range(10)]
    raw = _frame(spark, on + off)
    tgt = _frame(spark, ["spark shuffle join agg plan",
                         "shuffle join row agg"])
    ratio = dsir_log_ratio(raw, tgt, n_buckets=256)
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, ratio, n_buckets=256).collect()}
    worst_on = min(got[i] for i in range(10))
    best_off = max(got[i] for i in range(10, 20))
    assert worst_on > best_off


def test_select_is_layout_independent_and_deterministic(spark):
    from dbpedia_spotlight_spark.operators.dsir import dsir_select
    texts = [f"tok{i % 7} tok{i % 3} tok{i % 5} filler{i % 11}"
             for i in range(60)]
    raw = _frame(spark, texts)
    tgt = _frame(spark, ["tok0 tok1 tok2"])
    a = dsir_select(raw, tgt, 15, n_buckets=128).collect()
    b = dsir_select(raw.repartition(7, "text"), tgt, 15,
                    n_buckets=128).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    keys = [r.gumbel_key for r in a]
    assert keys == sorted(keys, reverse=True)


def test_select_k_bounds(spark):
    from dbpedia_spotlight_spark.operators.dsir import dsir_select
    raw = _frame(spark, ["a b", "b c", "c d"])
    tgt = _frame(spark, ["a"])
    assert dsir_select(raw, tgt, 10, n_buckets=16).count() == 3
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, 0, n_buckets=16)


def test_gumbel_selection_prefers_heavy_weights(spark):
    """With a sharply peaked importance distribution the Gumbel noise
    (range ~±4 in log space over 40 draws) cannot overturn a ~35-nat
    log-weight gap: every selected doc at k = n_on must be an
    on-target doc. The raw corpus is dominated by duplicated
    off-target docs, so their grams are raw-frequent / target-absent
    (strongly negative), while the rare on-target docs match the
    target distribution (positive)."""
    from dbpedia_spotlight_spark.operators.dsir import dsir_select
    on = ["spark shuffle join agg plan" for _ in range(5)]
    off = ["poem moon river cloud mist dew" for _ in range(40)]
    raw = _frame(spark, on + off)
    tgt = _frame(spark, ["spark shuffle join agg plan"] * 3)
    sel = {r.doc_id for r in
           dsir_select(raw, tgt, 5, n_buckets=512).collect()}
    assert sel == set(range(5))


def test_slice_form_equals_two_frame_form(spark):
    """dsir_log_ratio_slice (one shared explode) must produce the
    identical ratio table — and dsir_select the identical selection —
    as fitting the slice as a separate frame."""
    from pyspark.sql import functions as F2
    from dbpedia_spotlight_spark.operators.dsir import (
        dsir_log_ratio, dsir_log_ratio_slice, dsir_select,
    )
    texts = [(i, f"tok{i % 7} tok{i % 3} word{i % 5}", i % 4 == 0)
             for i in range(50)]
    docs = spark.createDataFrame(
        texts, "doc_id long, text string, is_ref boolean")
    a = {r.bucket: r.log_ratio for r in
         dsir_log_ratio(docs, docs.filter("is_ref"),
                        n_buckets=128).collect()}
    b = {r.bucket: r.log_ratio for r in
         dsir_log_ratio_slice(docs, F2.col("is_ref"),
                              n_buckets=128).collect()}
    assert a == b
    s1 = [tuple(r) for r in
          dsir_select(docs, docs.filter("is_ref"), 10,
                      n_buckets=128).collect()]
    s2 = [tuple(r) for r in
          dsir_select(docs, None, 10, n_buckets=128,
                      target_cond=F2.col("is_ref")).collect()]
    assert s1 == s2

    with pytest.raises(ValueError):
        dsir_select(docs, docs, 5, target_cond=F2.col("is_ref"))
    with pytest.raises(ValueError):
        dsir_select(docs, None, 5)


def test_duplicated_raw_docs_are_penalized(spark):
    """DSIR's weight is p_target/p_raw — a doc massively duplicated in
    the raw corpus raises its own grams' raw probability and so LOWERS
    its weight relative to a singleton with the same target affinity.
    This is the mechanism that makes DSIR dedup-aware."""
    from dbpedia_spotlight_spark.operators.dsir import (
        dsir_log_ratio, dsir_weights,
    )
    dup = ["alpha beta gamma"] * 30
    single = ["delta epsilon zeta"]
    raw = _frame(spark, dup + single)
    tgt = _frame(spark, ["alpha beta gamma", "delta epsilon zeta"])
    ratio = dsir_log_ratio(raw, tgt, n_buckets=256)
    got = {r.doc_id: r.logw
           for r in dsir_weights(raw, ratio, n_buckets=256).collect()}
    assert got[30] > got[0]
