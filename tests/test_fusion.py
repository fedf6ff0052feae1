"""Truth discovery / knowledge fusion (operators/fusion.py).

Semantic pins beyond the DuckDB-paired registry queries: winner
selection under honest majority, trust separation of unreliable
sources, full-key claim dedup, layout independence, the fused_triples
gate, and the reliable checkpoint_dir mode.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.fusion import (
    fused_triples, source_trust, truth_discovery)


def _claims(spark):
    # items i0/i1: three honest sources say the same value, two noisy
    # sources each say their own wrong value; item i2 is uncontested.
    rows = []
    for item, truth in (("i0", "v0"), ("i1", "v1")):
        for s in ("good_a", "good_b", "good_c"):
            rows.append((s, item, "ex:val", truth))
        for s in ("bad_x", "bad_y"):
            rows.append((s, item, "ex:val", f"wrong_{s}_{item}"))
    rows.append(("good_a", "i2", "ex:val", "v2"))
    return spark.createDataFrame(rows, "source string, subj string, "
                                       "pred string, obj string")


def test_honest_majority_wins(spark):
    out = truth_discovery(_claims(spark)).collect()
    winners = {(r.subj, r.obj) for r in out if r.winner}
    assert winners == {("i0", "v0"), ("i1", "v1"), ("i2", "v2")}
    by_claim = {(r.subj, r.obj): r for r in out}
    # beliefs normalize per item and the truth's belief grows past the
    # uniform-vote share (3/5) as noisy trust decays
    assert by_claim[("i0", "v0")].belief > 0.6
    for item in ("i0", "i1"):
        tot = sum(r.belief for r in out if r.subj == item)
        assert tot == pytest.approx(1.0, abs=1e-8)
    assert by_claim[("i2", "v2")].belief == 1.0
    assert by_claim[("i0", "v0")].n_sources == 3
    assert by_claim[("i0", "wrong_bad_x_i0")].n_sources == 1


def test_trust_separates_sources(spark):
    t = {r.source: r for r in source_trust(_claims(spark)).collect()}
    # good_a's extra UNCONTESTED claim (i2, belief 1.0) lifts its mean
    # belief above the two-claim honest sources; all honest sources sit
    # far above the minority-value assertors
    assert t["good_b"].trust == t["good_c"].trust
    assert t["good_a"].trust > t["good_b"].trust
    for bad in ("bad_x", "bad_y"):
        assert t[bad].trust < 0.1 < t["good_b"].trust
    assert t["good_a"].n_claims == 3  # i0, i1, i2
    assert t["bad_x"].n_claims == 2


def test_replayed_claims_are_deduplicated(spark):
    c = _claims(spark)
    once = truth_discovery(c).collect()
    twice = truth_discovery(c.unionByName(c)).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_layout_independent(spark):
    c = _claims(spark)
    a = truth_discovery(c).collect()
    b = truth_discovery(c.repartition(7, "obj")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fused_triples_gate(spark):
    # only the uncontested item reaches belief 1.0 exactly; the
    # contested truths converge close below it after 5 rounds
    out = fused_triples(_claims(spark), min_belief=0.999999).collect()
    assert {(r.subj, r.pred, r.obj) for r in out} == {("i2", "ex:val", "v2")}
    low = fused_triples(_claims(spark), min_belief=0.5)
    assert low.count() == 3  # every item's winner clears 0.5


def test_checkpoint_dir_mode_matches_local(spark, tmp_path):
    c = _claims(spark)
    a = truth_discovery(c, checkpoint_after=1).collect()
    b = truth_discovery(c, checkpoint_after=1,
                        checkpoint_dir=str(tmp_path / "ck")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_single_iteration_hand_computed(spark):
    # iters=1: published beliefs use the ONCE-updated trust. By hand:
    # round 1 (uniform 0.8 prior) gives belief 0.6/0.2/1.0, so
    # trust(good_a)=mean(.6,.6,1)=11/15, trust(good_b,c)=.6,
    # trust(bad)=.2; final vote(i0,v0)=11/15+1.2, item total +0.4
    out = {(r.subj, r.obj): r.belief
           for r in truth_discovery(_claims(spark), iters=1).collect()}
    v = (11 / 15 + 1.2) / (11 / 15 + 1.6)
    assert out[("i0", "v0")] == pytest.approx(v, abs=1e-8)
    assert out[("i0", "wrong_bad_x_i0")] == pytest.approx(
        0.2 / (11 / 15 + 1.6), abs=1e-8)


def test_iters_validation(spark):
    with pytest.raises(ValueError):
        truth_discovery(_claims(spark), iters=0)
