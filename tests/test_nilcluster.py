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


# ---------------------------------------------------------------------------
# nil_spots (pipeline C3 complement) + promote_nil_entities (KG promotion)

@pytest.fixture(scope="module")
def nil_model_bc(spark):
    """Fixture lexicon augmented with two PAIRLESS surface forms — in
    the spotter's FSA (tokens registered, ann_prob above the gate) but
    with zero pairCounts rows, i.e. the exact shape M-stage min-count
    pruning produces. Everything else is the standard seed-42 lexicon,
    so linkable behavior is unchanged."""
    import pandas as pd
    from dbpedia_spotlight_spark.datagen import make_lexicon
    from dbpedia_spotlight_spark.model import compile_model

    lex = make_lexicon(seed=42)
    sfs = lex.surface_forms
    extra_sf = pd.DataFrame(
        [("nilcorp inc", len(sfs), 90, 100),
         ("mystery widget", len(sfs) + 1, 80, 100)],
        columns=sfs.columns)
    tts = lex.token_types
    extra_tok = pd.DataFrame(
        [(w, tts["token_id"].max() + 1 + i, 40)
         for i, w in enumerate(["nilcorp", "inc", "mystery", "widget"])],
        columns=tts.columns)
    m = compile_model(
        surface_forms=pd.concat([sfs, extra_sf], ignore_index=True),
        entities=lex.entities,
        pair_counts=lex.pair_counts,
        token_counts=lex.token_counts,
        token_types=pd.concat([tts, extra_tok], ignore_index=True),
        stopwords=lex.stopwords["token"].tolist())
    return spark.sparkContext.broadcast(m)


def _nil_pages(spark):
    ctx_a = "fresh gadget line announced by the startup after funding"
    ctx_b = "endangered shorebird spotted nesting on the gravel bank"
    rows = [
        ("u1", f"Alpha0 works at Nilcorp Inc {ctx_a}", "en"),
        ("u2", f"Nilcorp Inc expands {ctx_a}", "en"),
        ("u3", f"the Mystery Widget {ctx_b}", "en"),
        ("u4", "no unlinkables here alpha0", "en"),
        ("u5", f"Nilcorp Inc filings {ctx_a}", "de"),   # lang-filtered out
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


def test_nil_spots_complement(spark, nil_model_bc):
    """nil_spots emits exactly the gated spots whose candidate list is
    empty — never a linkable spot — with offsets/context windows that
    match the text."""
    from dbpedia_spotlight_spark.pipeline import annotate, nil_spots, spot

    pages = _nil_pages(spark)
    out = nil_spots(spark, pages, nil_model_bc, context_chars=20).collect()
    assert {r.surface_form for r in out} == {"nilcorp inc", "mystery widget"}
    assert {r.url for r in out} == {"u1", "u2", "u3"}   # u4 linkable-only, u5 lang
    for r in out:
        text = dict((p[0], p[1]) for p in _nil_pages(spark).collect())[r.url]
        assert text[r.begin:r.end].lower() == r.surface_form
        assert r.context == text[max(0, r.begin - 20):r.end + 20]
    # spot() (P1/P2, pre-candidate) still sees the pairless sfs — they
    # ARE valid spots; it is annotate() (C3) that drops them, and
    # nil_spots is exactly that dropped complement
    spotted = {r.surface_form for r in
               spot(spark, pages, nil_model_bc).collect()}
    assert {"nilcorp inc", "mystery widget"} <= spotted
    linked = {r.surface_form for r in
              annotate(spark, pages, nil_model_bc).collect()}
    assert linked.isdisjoint({"nilcorp inc", "mystery widget"})
    assert "alpha0" in linked


def test_promote_nil_entities_triples(spark, nil_model_bc):
    """Promotion emits link rows shaped like triples.link_triples plus
    one rdf:type + one skos:prefLabel row per emergent node; mentions
    sharing a surface key and context cluster to ONE provisional URI."""
    from dbpedia_spotlight_spark.operators.nilcluster import (
        promote_nil_entities)
    from dbpedia_spotlight_spark.pipeline import nil_spots

    nil = nil_spots(spark, _nil_pages(spark), nil_model_bc,
                    context_chars=40)
    trip = promote_nil_entities(nil, threshold=0.2).collect()
    links = [t for t in trip if t.pred == "itsrdf:taIdentRef"]
    types = [t for t in trip if t.pred == "rdf:type"]
    labels = [t for t in trip if t.pred == "skos:prefLabel"]
    assert len(links) == 3 and len(trip) == len(links) + len(types) + len(labels)
    # u1+u2 mentions share key+context → ONE emergent node; u3 its own
    nilcorp_objs = {t.obj for t in links if t.subj.startswith(("u1", "u2"))}
    assert len(nilcorp_objs) == 1
    (widget_obj,) = {t.obj for t in links if t.subj.startswith("u3")}
    assert widget_obj != next(iter(nilcorp_objs))
    assert widget_obj.startswith("nil:mystery_widget#")
    # node metadata is per-node, not per-mention
    assert {t.subj for t in types} == nilcorp_objs | {widget_obj}
    assert {(t.subj, t.obj) for t in labels} == {
        (next(iter(nilcorp_objs)), "nilcorp inc"),
        (widget_obj, "mystery widget")}
    assert all(t.obj == "spotlight:EmergentEntity" for t in types)
    # subjects carry the link_triples char-offset shape
    assert all("#char=" in t.subj for t in links)
