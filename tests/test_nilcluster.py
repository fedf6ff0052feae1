"""NIL clustering (operators/nilcluster.py): union-find reference on
the fixture graph, window/threshold semantics, the zipfian big-block
lanes, layout independence, and the convergence guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.nilcluster import nil_clusters


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, "mention_id long, surface_form string, context string")


def test_window_and_threshold_semantics(spark):
    """Same surface + same context connects within the window; a
    disjoint context or a different surface never does."""
    ctx_a = "alpha beta gamma delta epsilon"
    ctx_b = "zeta eta theta iota kappa"
    rows = [
        (1, "Acme Corp", ctx_a), (2, "Acme Corp", ctx_a),
        (3, "Acme Corp", ctx_b),            # same key, far context
        (4, "acme  corp", ctx_a),           # casefold+ws-collapse key
        (5, "Other Co", ctx_a),             # other block entirely
    ]
    out = {r.mention_id: r for r in nil_clusters(
        _mentions(spark, rows), window=4, threshold=0.9).collect()}
    assert out[1].cluster == out[2].cluster == out[4].cluster == 1
    assert out[3].cluster == 3              # dissimilar context: alone
    assert out[5].cluster == 5              # own block: alone
    assert out[1].surface_key == "acme corp"
    assert out[1].nil_uri == "nil:acme_corp#1"
    assert not out[1].oversize
    # window=1: rank chain 1→2→3→4, but 3's far context fails the
    # verify on BOTH its adjacent pairs (2,3),(3,4) — sorted-neighborhood
    # at window=1 cannot bridge across a dissimilar in-between record,
    # so 4 stays a singleton (the documented conservatism of the method)
    out1 = {r.mention_id: r.cluster for r in nil_clusters(
        _mentions(spark, rows), window=1, threshold=0.9).collect()}
    assert out1[1] == out1[2] == 1
    assert out1[3] == 3 and out1[4] == 4
    # window=2 re-bridges: pair (rank2, rank4) = ids (2,4) is compared
    # directly, same context → one cluster again
    out2 = {r.mention_id: r.cluster for r in nil_clusters(
        _mentions(spark, rows), window=2, threshold=0.9).collect()}
    assert out2[1] == out2[2] == out2[4] == 1 and out2[3] == 3


def test_union_find_reference(spark):
    """Operator clusters == transitive closure of its own verified
    pairs, checked by an independent python union-find over a mixed
    40-mention fixture (3 blocks, varying context overlap)."""
    words = ["red", "blue", "green", "gold", "iron", "clay",
             "moss", "sand", "mist", "peak"]
    rows = []
    for i in range(40):
        sf = ["Entity A", "Entity B", "Entity C"][i % 3]
        ctx = " ".join(words[(i + j) % 10] for j in range(5))
        rows.append((i + 1, sf, ctx))
    df = _mentions(spark, rows)
    got = {r.mention_id: r.cluster
           for r in nil_clusters(df, window=3, threshold=0.4,
                                 max_iter=40,
                                 require_converged=True).collect()}

    # rebuild the pair graph the operator's contract defines
    from dbpedia_spotlight_spark.operators.decontam import _norm
    from dbpedia_spotlight_spark.operators.embed import text_embeddings
    from dbpedia_spotlight_spark.operators.similarity import _dot
    from pyspark.sql import Window
    vecs = text_embeddings(df.select("mention_id", "context"), dim=32,
                           id_col="mention_id", text_col="context")
    m = (df.select("mention_id", _norm("surface_form").alias("k"))
         .join(vecs, "mention_id")
         .withColumn("r", F.row_number().over(
             Window.partitionBy("k").orderBy("mention_id"))))
    a = m.select("k", F.col("mention_id").alias("a"),
                 F.col("r").alias("ra"), F.col("embedding").alias("va"))
    b = m.select("k", F.col("mention_id").alias("b"),
                 F.col("r").alias("rb"), F.col("embedding").alias("vb"))
    pairs = (a.join(b, "k")
             .filter((F.col("rb") > F.col("ra"))
                     & (F.col("rb") <= F.col("ra") + 3))
             .filter(F.round(_dot("va", "vb"), 9) >= 0.4)
             .select("a", "b").collect())
    parent = {i + 1: i + 1 for i in range(40)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.a), find(p.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in parent}
    # canonical label = min of cluster, identical by construction
    assert got == want
    assert len(set(got.values())) > 1      # non-vacuous: several clusters
    assert any(v != k for k, v in got.items())  # and real merges


def test_big_block_lanes(spark):
    ctx = "one two three four five"
    rows = ([(i, "Mega Name", ctx) for i in range(1, 8)]
            + [(100, "Small Name", ctx), (101, "Small Name", ctx)])
    df = _mentions(spark, rows)
    single = {r.mention_id: r for r in nil_clusters(
        df, max_block=5, big_block="single", threshold=0.9).collect()}
    # the 7-mention block exceeds max_block=5: one coarse cluster
    assert all(single[i].cluster == 1 and single[i].oversize
               for i in range(1, 8))
    assert single[100].cluster == single[101].cluster == 100
    assert not single[100].oversize
    dropped = {r.mention_id: r for r in nil_clusters(
        df, max_block=5, big_block="drop", threshold=0.9).collect()}
    assert all(dropped[i].cluster == i and dropped[i].oversize
               for i in range(1, 8))
    with pytest.raises(ValueError, match="big_block"):
        nil_clusters(df, big_block="bogus")
    with pytest.raises(ValueError, match="window"):
        nil_clusters(df, window=0)


def test_layout_independence(spark):
    rows = [(i, f"Key {i % 5}", f"ctx {'x ' * (i % 7)}end")
            for i in range(1, 31)]
    df = _mentions(spark, rows)
    base = sorted(map(tuple, nil_clusters(df).collect()))
    shuffled = sorted(map(tuple, nil_clusters(
        df.repartition(7, "context")).collect()))
    assert base == shuffled


def test_require_converged_guard(spark):
    """A 12-chain with window=1 and identical contexts needs ~11
    propagation rounds; max_iter=3 must raise, not return partial."""
    rows = [(i, "Chain Name", "same words here") for i in range(1, 13)]
    df = _mentions(spark, rows)
    with pytest.raises(RuntimeError, match="converge"):
        nil_clusters(df, window=1, threshold=0.9, max_iter=3,
                     require_converged=True).collect()
    ok = nil_clusters(df, window=1, threshold=0.9, max_iter=15,
                      require_converged=True).collect()
    assert {r.cluster for r in ok} == {1}
