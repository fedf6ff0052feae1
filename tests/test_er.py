"""Entity resolution (operators/er.py): blocking, the quadratic guard,
both verify rules, and the compose-through to canonicalize_triples."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _kg(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_er_candidates_blocks_on_shared_keys_and_counts(spark):
    from dbpedia_spotlight_spark.operators.er import er_candidates
    kg = _kg(spark, [
        ("E1", "ex:homepage", "https://acme.example/"),
        ("E2", "ex:homepage", "https://acme.example/"),
        ("E1", "ex:vatid", "VAT-7"),
        ("E2", "ex:vatid", "VAT-7"),
        ("E3", "ex:homepage", "https://other.example/"),
        ("E1", "foaf:name", "Acme"),          # non-key pred — ignored
        ("E3", "foaf:name", "Acme"),
    ])
    got = {(r.a, r.b, r.n_shared) for r in er_candidates(
        kg, ["ex:homepage", "ex:vatid"]).collect()}
    assert got == {("E1", "E2", 2)}


def test_er_candidates_drops_overcap_blocks(spark):
    from dbpedia_spotlight_spark.operators.er import er_candidates
    rows = [(f"E{i}", "ex:country", "X") for i in range(6)]
    rows += [("E0", "ex:vatid", "V"), ("E1", "ex:vatid", "V")]
    got = {(r.a, r.b) for r in er_candidates(
        _kg(spark, rows), ["ex:country", "ex:vatid"],
        max_block=4).collect()}
    # the 6-member country block is boilerplate (over cap) — only the
    # 2-member vatid block survives
    assert got == {("E0", "E1")}


def test_er_sameas_verify_rules(spark):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    kg = _kg(spark, [
        # pair 1: one shared key, names 1 edit apart → name rule fires
        ("E1", "ex:homepage", "https://a.example/"),
        ("E1v", "ex:homepage", "https://a.example/"),
        ("E1", "foaf:name", "Acme Corp"),
        ("E1v", "foaf:name", "Acme Corp."),
        # pair 2: one shared key, names far apart → dropped
        ("E2", "ex:homepage", "https://b.example/"),
        ("E2x", "ex:homepage", "https://b.example/"),
        ("E2", "foaf:name", "Globex"),
        ("E2x", "foaf:name", "Initech Holdings"),
        # pair 3: TWO shared keys, no names at all → min_shared rule
        ("E3", "ex:homepage", "https://c.example/"),
        ("E3v", "ex:homepage", "https://c.example/"),
        ("E3", "ex:vatid", "VAT-3"),
        ("E3v", "ex:vatid", "VAT-3"),
    ])
    got = {(r.a, r.b, r.n_shared, r.name_dist) for r in er_sameas(
        kg, ["ex:homepage", "ex:vatid"], max_name_dist=1,
        min_shared=2).collect()}
    assert got == {("E1", "E1v", 1, 1), ("E3", "E3v", 2, None)}


def test_er_sameas_casefolds_and_takes_best_name_pair(spark):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    kg = _kg(spark, [
        ("E1", "ex:k", "K"), ("E2", "ex:k", "K"),
        ("E1", "foaf:name", "ACME"),
        ("E1", "foaf:name", "Totally Different"),
        ("E2", "foaf:name", "acme"),
    ])
    [r] = er_sameas(kg, ["ex:k"], max_name_dist=0, min_shared=2).collect()
    assert (r.a, r.b, r.name_dist) == ("E1", "E2", 0)


def test_er_sameas_feeds_canonicalize(spark):
    """Discovered edges collapse variant URIs in the snapshot — the
    full repair loop: er_sameas → canonicalize_triples."""
    from dbpedia_spotlight_spark.operators.er import er_sameas
    from dbpedia_spotlight_spark.triples import canonicalize_triples
    kg = _kg(spark, [
        ("E1", "ex:homepage", "https://a.example/"),
        ("E1v", "ex:homepage", "https://a.example/"),
        ("E1", "foaf:name", "Acme"),
        ("E1v", "foaf:name", "Acme"),
        ("m1", "itsrdf:taIdentRef", "E1"),
        ("m2", "itsrdf:taIdentRef", "E1v"),
    ])
    edges = er_sameas(kg, ["ex:homepage"], max_name_dist=1, min_shared=2)
    fixed = canonicalize_triples(kg, edges.select("a", "b"))
    objs = {r.obj for r in fixed.filter(
        F.col("pred") == "itsrdf:taIdentRef").collect()}
    assert objs == {"E1"}
    # the two homepage triples collapsed into one
    assert fixed.filter(F.col("pred") == "ex:homepage").count() == 1


def test_er_plan_has_no_cartesian(spark):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    kg = _kg(spark, [("E1", "ex:k", "K"), ("E2", "ex:k", "K"),
                     ("E1", "foaf:name", "a"), ("E2", "foaf:name", "b")])
    plan = (er_sameas(kg, ["ex:k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_er_star_mode_survives_mega_blocks(spark):
    """A block past max_block is dropped in 'all' mode but yields
    linear founder edges in 'star' mode — the verify stage then keeps
    only true matches, so the clone family still resolves."""
    from dbpedia_spotlight_spark.operators.er import (
        er_candidates, er_sameas)
    rows = []
    for i in range(8):                       # one 8-member homepage block
        rows += [(f"E{i}", "ex:homepage", "https://big.example/"),
                 (f"E{i}", "foaf:name",
                  "Acme" if i < 3 else f"Other {i} Inc")]
    kg = _kg(spark, rows)
    assert er_candidates(kg, ["ex:homepage"], max_block=4).count() == 0
    star = {(r.a, r.b) for r in er_candidates(
        kg, ["ex:homepage"], mode="star").collect()}
    assert star == {("E0", f"E{i}") for i in range(1, 8)}
    verified = {(r.a, r.b) for r in er_sameas(
        kg, ["ex:homepage"], max_name_dist=0, min_shared=2,
        mode="star").collect()}
    # only the founder's true clones (same name) survive the verify
    assert verified == {("E0", "E1"), ("E0", "E2")}


def test_er_star_counts_shared_keys_across_blocks(spark):
    from dbpedia_spotlight_spark.operators.er import er_candidates
    kg = _kg(spark, [
        ("E1", "ex:homepage", "H"), ("E2", "ex:homepage", "H"),
        ("E1", "ex:vatid", "V"), ("E2", "ex:vatid", "V"),
    ])
    [r] = er_candidates(kg, ["ex:homepage", "ex:vatid"],
                        mode="star").collect()
    assert (r.a, r.b, r.n_shared) == ("E1", "E2", 2)


# --- incremental maintenance (counting/touched-block IVM) -----------

def _er_all(spark, triples, **kw):
    from dbpedia_spotlight_spark.operators.er import er_sameas
    return {tuple(r) for r in er_sameas(
        _kg(spark, sorted(triples)), ["ex:k1", "ex:k2"],
        **kw).collect()}


def test_maintain_sameas_randomized_batches_match_full_recompute(spark):
    """6 random add/remove batches over a 30-entity KG with a tiny
    max_block (cap flips exercised): maintained state ≡ er_sameas full
    recompute after every batch, and the edge delta ≡ the exact
    structural diff."""
    import random
    from dbpedia_spotlight_spark.operators.er import (
        er_sameas, maintain_sameas)
    rng = random.Random(20260818)
    kw = dict(max_block=4, min_shared=2, max_name_dist=1, max_names=3)
    ents = [f"E{i}" for i in range(30)]
    pool = {
        "ex:k1": [f"h{j}" for j in range(8)],
        "ex:k2": [f"v{j}" for j in range(8)],
        "foaf:name": [f"name{j}" for j in range(6)] + ["namex"],
    }
    cur: set = set()
    for e in ents:
        for p, objs in pool.items():
            for o in rng.sample(objs, rng.randint(0, 2)):
                cur.add((e, p, o))
    kg = _kg(spark, sorted(cur))
    state = er_sameas(kg, ["ex:k1", "ex:k2"], **kw)
    for batch in range(6):
        adds, removes = set(), set()
        for _ in range(rng.randint(3, 10)):
            e = rng.choice(ents)
            p = rng.choice(list(pool))
            o = rng.choice(pool[p])
            if (e, p, o) in cur and rng.random() < 0.5:
                removes.add((e, p, o))
            elif (e, p, o) not in cur:
                adds.add((e, p, o))
        new = (cur - removes) | adds
        delta_rows = [(s, p, o, "removed") for s, p, o in removes] + \
                     [(s, p, o, "added") for s, p, o in adds]
        if not delta_rows:
            continue
        delta = spark.createDataFrame(
            delta_rows, "subj string, pred string, obj string, "
            "change string")
        kg = _kg(spark, sorted(new))
        new_state, edge_delta = maintain_sameas(
            state, kg, delta, ["ex:k1", "ex:k2"], **kw)
        got = {tuple(r) for r in new_state.collect()}
        want = {tuple(r) for r in er_sameas(
            kg, ["ex:k1", "ex:k2"], **kw).collect()}
        assert got == want, f"batch {batch}: state diverged"
        old_pairs = {(r.a, r.b) for r in state.collect()}
        new_pairs = {(a, b) for a, b, *_ in want}
        want_delta = {(a, b, "added") for a, b in new_pairs - old_pairs} \
            | {(a, b, "removed") for a, b in old_pairs - new_pairs}
        assert {tuple(r) for r in edge_delta.collect()} == want_delta, \
            f"batch {batch}: edge delta diverged"
        state = new_state.localCheckpoint(eager=True)
        cur = new


def test_maintain_sameas_name_only_change_reverifies(spark):
    """A name edit (no key change) must re-verify the affected pairs:
    here it flips a min_shared-failing pair from name-verified to
    dropped."""
    from dbpedia_spotlight_spark.operators.er import (
        er_sameas, maintain_sameas)
    base = [
        ("E1", "ex:k1", "h1"), ("E2", "ex:k1", "h1"),
        ("E1", "foaf:name", "acme"), ("E2", "foaf:name", "acme"),
    ]
    kw = dict(min_shared=2, max_name_dist=1)
    kg = _kg(spark, base)
    state = er_sameas(kg, ["ex:k1", "ex:k2"], **kw)
    assert {(r.a, r.b) for r in state.collect()} == {("E1", "E2")}
    new = [t for t in base if t != ("E2", "foaf:name", "acme")] + \
        [("E2", "foaf:name", "completely-different")]
    delta = spark.createDataFrame(
        [("E2", "foaf:name", "acme", "removed"),
         ("E2", "foaf:name", "completely-different", "added")],
        "subj string, pred string, obj string, change string")
    new_state, edge_delta = maintain_sameas(
        state, _kg(spark, new), delta, ["ex:k1", "ex:k2"], **kw)
    assert new_state.count() == 0
    assert {tuple(r) for r in edge_delta.collect()} == {
        ("E1", "E2", "removed")}


def test_sameas_store_follows_kg_delta_log(spark, web_pages, model_bc,
                                           tmp_path):
    """SameasStore.catchup folds the KG maintenance delta log through
    maintain_sameas and lands on exactly the edge set a full er_sameas
    recompute over the final snapshot gives; a second catchup is a
    no-op. (Key pred = the link predicate, name pred = the anchor
    text: mentions of the same entity resolve — semantically a
    coreference clustering, structurally the full ER path over a REAL
    delta log.)"""
    import datetime

    from dbpedia_spotlight_spark.operators.er import er_sameas
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        KGStore, SameasStore, apply_pages_batch)
    from dbpedia_spotlight_spark.triples import PRED_ANCHOR, PRED_IDENT

    kw = dict(name_pred=PRED_ANCHOR, min_shared=1, max_block=6,
              max_name_dist=0)
    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    store = KGStore(spark, str(tmp_path / "kg"))
    apply_pages_batch(spark, spark.createDataFrame(rows, schema),
                      model_bc, store, batch_id=0, cfg=cfg)
    recrawl = [
        (rows[i][0], rows[i][1] + datetime.timedelta(days=1),
         bytes(rows[i + 7][2]), rows[i][3], rows[i][4])
        for i in range(2)
    ]
    apply_pages_batch(spark, spark.createDataFrame(recrawl, schema),
                      model_bc, store, batch_id=1, cfg=cfg)
    assert store.latest_gen() == 1

    estore = SameasStore(spark, str(tmp_path / "sameas"))
    stats = estore.catchup(store, [PRED_IDENT], components=True, **kw)
    assert stats["gens_folded"] == 2 and stats["gen"] == 1
    assert stats["sameas_added"] > 0 and stats["labels_changed"] > 0

    edges_full = er_sameas(
        store.read().select("subj", "pred", "obj"), [PRED_IDENT], **kw)
    expect = {tuple(r) for r in edges_full.collect()}
    got = {tuple(r) for r in estore.read_edges().collect()}
    assert got == expect and got

    # the chained canonical map ≡ batch connected_components over the
    # final edge set (restricted to edge-incident nodes — absence in
    # the store means self-canonical)
    from dbpedia_spotlight_spark.operators.components import (
        connected_components)
    inc = (edges_full.select(F.col("a").alias("id"))
           .unionByName(edges_full.select(F.col("b").alias("id")))
           .distinct())
    want_lab = {(r.id, r.comp) for r in
                connected_components(inc, edges_full).collect()}
    got_lab = {(r.id, r.comp) for r in estore.read_labels().collect()}
    # the store may retain SELF-canonical rows for nodes whose edges
    # vanished in a later generation (absence ≡ self-row by the map's
    # contract); every non-self assignment must match the batch truth
    assert {p for p in got_lab if p[0] != p[1]} ==         {p for p in want_lab if p[0] != p[1]}
    assert want_lab <= got_lab
    assert all(a == b for a, b in got_lab - want_lab)
    assert got_lab

    again = estore.catchup(store, [PRED_IDENT], components=True, **kw)
    assert again["gens_folded"] == 0
    assert {tuple(r) for r in estore.read_edges().collect()} == expect
    assert {(r.id, r.comp)
            for r in estore.read_labels().collect()} == got_lab


def test_sameas_to_components_ivm_composition(spark):
    """The full incremental canonicalization chain: maintain_sameas's
    edge delta drives maintain_components, and the composed state
    equals the batch er_sameas → connected_components recompute after
    every random KG batch."""
    import random

    from dbpedia_spotlight_spark.operators.components import (
        connected_components, maintain_components)
    from dbpedia_spotlight_spark.operators.er import (
        er_sameas, maintain_sameas)
    rng = random.Random(7)
    kw = dict(max_block=4, min_shared=1, max_name_dist=0, max_names=2)
    ents = [f"E{i}" for i in range(24)]
    pool = {"ex:k1": [f"h{j}" for j in range(6)],
            "ex:k2": [f"v{j}" for j in range(6)]}
    cur: set = set()
    for e in ents:
        for p, objs in pool.items():
            for o in rng.sample(objs, rng.randint(0, 2)):
                cur.add((e, p, o))

    def batch_truth(kg_df):
        edges = er_sameas(kg_df, list(pool), **kw)
        nodes = spark.createDataFrame([(e,) for e in ents], "id string")
        return connected_components(nodes, edges)

    kg = _kg(spark, sorted(cur))
    state = er_sameas(kg, list(pool), **kw).localCheckpoint(eager=True)
    nodes = spark.createDataFrame([(e,) for e in ents], "id string")
    labels = connected_components(nodes, state)
    for batch in range(4):
        adds, removes = set(), set()
        for _ in range(rng.randint(3, 8)):
            e, p = rng.choice(ents), rng.choice(list(pool))
            o = rng.choice(pool[p])
            if (e, p, o) in cur and rng.random() < 0.5:
                removes.add((e, p, o))
            elif (e, p, o) not in cur:
                adds.add((e, p, o))
        if not (adds or removes):
            continue
        cur = (cur - removes) | adds
        delta = spark.createDataFrame(
            [(s, p, o, "removed") for s, p, o in removes]
            + [(s, p, o, "added") for s, p, o in adds],
            "subj string, pred string, obj string, change string")
        kg = _kg(spark, sorted(cur))
        state, edge_delta = maintain_sameas(state, kg, delta,
                                            list(pool), **kw)
        state = state.localCheckpoint(eager=True)
        labels, _ = maintain_components(labels, state, edge_delta)
        labels = labels.localCheckpoint(eager=True)
        got = {(r.id, r.comp) for r in labels.collect()}
        want = {(r.id, r.comp) for r in batch_truth(kg).collect()}
        assert got == want, f"batch {batch}"


def test_sameas_store_components_flag_toggles_safely(spark, web_pages,
                                                     model_bc, tmp_path):
    """Round-5 ADVICE: toggling components across catchup runs must not
    crash or silently drop the canonical map. components=False first
    (no labels; read_labels raises a CLEAR error), then =True over the
    labels-less store (BOOTSTRAPS from the current edge set), then
    =False again (sticky: labels keep being maintained — the fold
    deletes the previous generation, so pausing would lose them)."""
    import datetime

    from dbpedia_spotlight_spark.operators.components import (
        connected_components)
    from dbpedia_spotlight_spark.operators.er import er_sameas
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        KGStore, SameasStore, apply_pages_batch)
    from dbpedia_spotlight_spark.triples import PRED_ANCHOR, PRED_IDENT

    kw = dict(name_pred=PRED_ANCHOR, min_shared=1, max_block=6,
              max_name_dist=0)
    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    store = KGStore(spark, str(tmp_path / "kg"))
    estore = SameasStore(spark, str(tmp_path / "sameas"))

    def recrawl(day, n):
        return [(rows[i][0], rows[i][1] + datetime.timedelta(days=day),
                 bytes(rows[(i + 3 * day) % len(rows)][2]),
                 rows[i][3], rows[i][4]) for i in range(n)]

    def batch_labels():
        edges = er_sameas(store.read().select("subj", "pred", "obj"),
                          [PRED_IDENT], **kw)
        inc = (edges.select(F.col("a").alias("id"))
               .unionByName(edges.select(F.col("b").alias("id")))
               .distinct())
        return {(r.id, r.comp)
                for r in connected_components(inc, edges).collect()}

    # gen 0: fold WITHOUT components — no labels frame, clear error
    apply_pages_batch(spark, spark.createDataFrame(rows, schema),
                      model_bc, store, batch_id=0, cfg=cfg)
    s0 = estore.catchup(store, [PRED_IDENT], components=False, **kw)
    assert s0["gens_folded"] == 1 and "labels_changed" not in s0
    with pytest.raises(ValueError, match="no labels frame"):
        estore.read_labels()

    # gen 1: toggle ON over the labels-less store → bootstrap + maintain
    apply_pages_batch(spark, spark.createDataFrame(recrawl(1, 2), schema),
                      model_bc, store, batch_id=1, cfg=cfg)
    s1 = estore.catchup(store, [PRED_IDENT], components=True, **kw)
    assert s1["gens_folded"] == 1 and "labels_changed" in s1
    want = batch_labels()
    got = {(r.id, r.comp) for r in estore.read_labels().collect()}
    assert {p for p in got if p[0] != p[1]} == \
        {p for p in want if p[0] != p[1]}
    assert want <= got and all(a == b for a, b in got - want)

    # gen 2: toggle OFF again — labels must KEEP being maintained
    apply_pages_batch(spark, spark.createDataFrame(recrawl(2, 3), schema),
                      model_bc, store, batch_id=2, cfg=cfg)
    s2 = estore.catchup(store, [PRED_IDENT], components=False, **kw)
    assert s2["gens_folded"] == 1 and "labels_changed" in s2
    want = batch_labels()
    got = {(r.id, r.comp) for r in estore.read_labels().collect()}
    assert {p for p in got if p[0] != p[1]} == \
        {p for p in want if p[0] != p[1]}
    assert want <= got and all(a == b for a, b in got - want)
