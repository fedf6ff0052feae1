"""Crash-injection tests for the pointer-file generation stores.

Round-5 hardening of the weakest-verified surface (streaming/): each
test kills a store INSIDE a specific crash window the pointer-file
discipline claims to cover — between a generation's durable state
write and its pointer flip, or between the flip and the old-generation
delete — then restarts and asserts self-healing: state equals a
never-crashed twin, the change log carries no duplicated rows, and no
generation directory leaks.

The "kill" is an exception injected into ``_write_pointer`` (the exact
instruction boundary a process kill would hit: all parquet for the
generation is durable, the pointer is not) — the only part of a real
SIGKILL this cannot model is a torn parquet write, which the Hadoop
committer already makes atomic per directory.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.streaming.kg_stream import (
    GraphStore, KGStore, SameasStore)
from dbpedia_spotlight_spark.triples import PRED_IDENT


class Boom(RuntimeError):
    """The injected crash."""


def _crash_pointer_on_nth(store, n: int = 1) -> None:
    """Arm the store so its ``n``-th ``_write_pointer`` call raises —
    every generation's state parquet is already durable at that point,
    the pointer flip is not. The real method is restored on detonation,
    so the SAME store object can model the restarted process."""
    orig = store._write_pointer
    calls = {"n": 0}

    def boom(gen, batch_id, token=""):
        calls["n"] += 1
        if calls["n"] >= n:
            store._write_pointer = orig
            raise Boom(f"injected crash before pointer flip to gen {gen}")
        return orig(gen, batch_id, token)

    store._write_pointer = boom


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, PRED_IDENT, o) for s, o in rows],
        "subj string, pred string, obj string")


def _delta(spark, adds, removes):
    rows = ([(s.split("#")[0], s, PRED_IDENT, o, "added")
             for s, o in adds]
            + [(s.split("#")[0], s, PRED_IDENT, o, "removed")
               for s, o in removes])
    return spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, "
              "change string")


def _gen_dirs(root) -> list[str]:
    return sorted(p.name for p in root.iterdir()
                  if p.name.startswith("gen-"))


def test_kg_advance_crash_before_pointer_flip_no_duplicate_log(
        spark, tmp_path):
    """Kill KGStore.advance between the delta_log append and the
    pointer flip. The retried batch must not double-append the change
    rows — a duplicated gen partition would silently double every
    downstream counting-IVM fold and log-reversal read."""
    store = KGStore(spark, str(tmp_path / "kg"), retain_gens=1)
    A, B = ("u1#a", "A"), ("u2#b", "B")
    store.advance(_triples(spark, [A]), _delta(spark, [A], []), 0)

    _crash_pointer_on_nth(store)
    with pytest.raises(Boom):
        store.advance(_triples(spark, [A, B]), _delta(spark, [B], []), 1)

    # torn state: gen-1 snapshot + a gen=1 delta_log partition exist,
    # pointer still names gen 0 — readers are unaffected
    assert store.latest_gen() == 0
    assert {(r.subj, r.obj) for r in store.read().collect()} == {A}

    # restart = retry the same batch (apply_pages_batch recomputes the
    # identical delta against the unflipped snapshot)
    store.advance(_triples(spark, [A, B]), _delta(spark, [B], []), 1)
    assert store.latest_gen() == 1

    log = store.read_log()
    assert log.count() == 2, "orphaned delta partition was re-appended"
    assert log.filter(F.col("gen") == 1).count() == 1
    # log-reversal time travel over the healed log (gen 0's snapshot
    # dir is expired at retain_gens=1, so this READS the log)
    assert {(r.subj, r.obj)
            for r in store.read_asof(0).collect()} == {A}
    assert [(r.subj, r.obj, r.change) for r in
            store.diff(0, 1).collect()] == [("u2#b", "B", "added")]


def test_kg_advance_stale_snapshot_dir_heals_on_next_advance(
        spark, tmp_path):
    """Kill between the pointer flip and the old-generation delete:
    the stale snapshot directory must be swept by the next advance's
    retention pass, not leak forever."""
    store = KGStore(spark, str(tmp_path / "kg"), retain_gens=1)
    A, B, C = ("u1#a", "A"), ("u2#b", "B"), ("u3#c", "C")
    store.advance(_triples(spark, [A]), _delta(spark, [A], []), 0)
    store.advance(_triples(spark, [A, B]), _delta(spark, [B], []), 1)
    assert _gen_dirs(tmp_path / "kg") == ["gen-00001"]

    # residue of a crash after flip-to-1 but before the gen-0 delete
    stale = tmp_path / "kg" / "gen-00000"
    (stale / "triples").mkdir(parents=True)
    (stale / "triples" / "part-junk.parquet").write_bytes(b"torn")

    store.advance(_triples(spark, [A, B, C]), _delta(spark, [C], []), 2)
    assert _gen_dirs(tmp_path / "kg") == ["gen-00002"]
    assert {(r.subj, r.obj) for r in store.read().collect()} == {A, B, C}


def _mk_link_kg(spark, root: str) -> KGStore:
    """Three generations of mention→entity link churn:
    gen 0 {u1→e1, u1→e2} · gen 1 +{u2→e2, u2→e3} · gen 2 −{u1→e2}."""
    store = KGStore(spark, root, retain_gens=3)
    g0 = [("u1#0", "e1"), ("u1#1", "e2")]
    add1 = [("u2#0", "e2"), ("u2#1", "e3")]
    g1 = g0 + add1
    rem2 = [("u1#1", "e2")]
    g2 = [r for r in g1 if r not in rem2]
    store.advance(_triples(spark, g0), _delta(spark, g0, []), 0)
    store.advance(_triples(spark, g1), _delta(spark, add1, []), 1)
    store.advance(_triples(spark, g2), _delta(spark, [], rem2), 2)
    return store


def test_graphstore_catchup_crash_mid_fold_resumes(spark, tmp_path):
    """Kill GraphStore.catchup on its SECOND pointer flip (gen 1's
    incidence/edges parquet durable, pointer still at gen 0). The
    restarted catchup must refold from its pointer and land on the
    never-crashed twin's state, leaving only the live generation."""
    kg = _mk_link_kg(spark, str(tmp_path / "kg"))

    crashed = GraphStore(spark, str(tmp_path / "g1"))
    _crash_pointer_on_nth(crashed, n=2)
    with pytest.raises(Boom):
        crashed.catchup(kg)
    assert crashed.latest_gen() == 0  # gen-1 dir orphaned, unflipped

    stats = crashed.catchup(kg)  # the restarted process
    assert stats["gens_folded"] == 2 and stats["gen"] == 2

    clean = GraphStore(spark, str(tmp_path / "g2"))
    assert clean.catchup(kg)["gens_folded"] == 3

    def edges(s):
        return {(r.uri_a, r.uri_b, r.n_docs)
                for r in s.read_edges().collect()}

    def inc(s):
        return {(r.url, r.uri, r.n_links)
                for r in s.read_incidence().collect()}

    assert edges(crashed) == edges(clean)
    assert inc(crashed) == inc(clean)
    assert edges(crashed)  # non-vacuous: e2–e3 co-mention survives
    assert _gen_dirs(tmp_path / "g1") == ["gen-00002"]


def test_derived_store_stale_gen_dir_swept_on_catchup(spark, tmp_path):
    """Kill a derived-store fold between the pointer flip and the
    previous-generation delete: later folds delete only their OWN
    predecessor, so without a sweep that directory leaks forever."""
    kg = _mk_link_kg(spark, str(tmp_path / "kg"))
    gstore = GraphStore(spark, str(tmp_path / "g"))
    gstore.catchup(kg)
    assert _gen_dirs(tmp_path / "g") == ["gen-00002"]

    # residue of a crash after an early flip but before its delete
    stale = tmp_path / "g" / "gen-00000"
    stale.mkdir()
    (stale / "junk").write_text("torn")

    g3 = [("u1#0", "e1"), ("u2#0", "e2"), ("u2#1", "e3"),
          ("u3#0", "e1")]
    kg.advance(_triples(spark, g3),
               _delta(spark, [("u3#0", "e1")], []), 3)
    stats = gstore.catchup(kg)
    assert stats["gens_folded"] == 1
    assert _gen_dirs(tmp_path / "g") == ["gen-00003"]


def test_sameas_store_catchup_crash_mid_fold_resumes(spark, tmp_path):
    """Same window for SameasStore with components=True: kill on the
    second flip (edges AND labels parquet for gen 1 durable, pointer
    at gen 0); the restart must refold and match the clean twin on
    both the edge set and the canonical map."""
    kw = dict(key_preds=["ex:key"], min_shared=1, max_name_dist=0,
              max_block=8, components=True)
    kg = KGStore(spark, str(tmp_path / "kg"), retain_gens=3)

    def kt(rows):
        return spark.createDataFrame(
            [(s, "ex:key", o) for s, o in rows],
            "subj string, pred string, obj string")

    def kd(adds, removes):
        rows = ([(s, s, "ex:key", o, "added") for s, o in adds]
                + [(s, s, "ex:key", o, "removed") for s, o in removes])
        return spark.createDataFrame(
            rows, "url string, subj string, pred string, obj string, "
                  "change string")

    # gen 0: A,B share x1 → A–B · gen 1: +C,A share x2 → A–C
    # gen 2: −(B,x1) → A–B dissolves; cluster {A,C} remains
    g0 = [("A", "x1"), ("B", "x1")]
    add1 = [("C", "x2"), ("A", "x2")]
    rem2 = [("B", "x1")]
    g1 = g0 + add1
    g2 = [r for r in g1 if r not in rem2]
    kg.advance(kt(g0), kd(g0, []), 0)
    kg.advance(kt(g1), kd(add1, []), 1)
    kg.advance(kt(g2), kd([], rem2), 2)

    crashed = SameasStore(spark, str(tmp_path / "s1"))
    _crash_pointer_on_nth(crashed, n=2)
    with pytest.raises(Boom):
        crashed.catchup(kg, **kw)
    assert crashed.latest_gen() == 0

    stats = crashed.catchup(kg, **kw)
    assert stats["gens_folded"] == 2 and stats["gen"] == 2

    clean = SameasStore(spark, str(tmp_path / "s2"))
    assert clean.catchup(kg, **kw)["gens_folded"] == 3

    def edges(s):
        return {(r.a, r.b) for r in s.read_edges().collect()}

    def nonself_labels(s):
        return {(r.id, r.comp) for r in s.read_labels().collect()
                if r.id != r.comp}

    assert edges(crashed) == edges(clean) == {("A", "C")}
    assert nonself_labels(crashed) == nonself_labels(clean) == {
        ("C", "A")}
    assert _gen_dirs(tmp_path / "s1") == ["gen-00002"]


def test_relationstore_catchup_crash_before_flip_refolds(spark, tmp_path):
    """Kill RelationStore.catchup between its doc_rel write and the
    single pointer flip of the collapsed fold (two KG generations are
    pending — the store writes ONE new generation for both). The torn
    state must be invisible to readers, and the restarted catchup must
    refold the same log tail onto the identical relation table with no
    leaked generation directory."""
    from dbpedia_spotlight_spark.streaming.kg_stream import RelationStore

    t1 = "E1 works with E2 daily"   # E1@[0,2) E2@[14,16)
    t2 = "E3 beside E2 now"         # E3@[0,2) E2@[10,12)
    g0 = [("u1#char=0,2", "E1"), ("u1#char=14,16", "E2")]
    add1 = [("u2#char=0,2", "E3"), ("u2#char=10,12", "E2")]
    kg = KGStore(spark, str(tmp_path / "kg"), retain_gens=2)
    kg.advance(_triples(spark, g0), _delta(spark, g0, []), 0)
    kg.advance(_triples(spark, g0 + add1), _delta(spark, add1, []), 1)
    corpus = spark.createDataFrame(
        [("u1", t1), ("u2", t2)], "url string, text string")

    clean = RelationStore(spark, str(tmp_path / "r_clean"))
    cs = clean.catchup(kg, corpus)
    assert cs["gens_folded"] == 2 and cs["gen"] == 1
    expect = {tuple(r) for r in clean.read_relations().collect()}
    assert expect == {("E1", "works with", "E2", 1, 1),
                      ("E3", "beside", "E2", 1, 1)}

    crashed = RelationStore(spark, str(tmp_path / "r_crash"))
    _crash_pointer_on_nth(crashed)
    with pytest.raises(Boom):
        crashed.catchup(kg, corpus)
    # torn: gen-00001/doc_rel durable, pointer absent — readers see the
    # empty pre-fold state
    assert crashed.latest_gen() is None
    assert crashed.read_relations().count() == 0
    assert _gen_dirs(tmp_path / "r_crash") == ["gen-00001"]

    rs = crashed.catchup(kg, corpus)   # restart: refold the same tail
    assert rs["gens_folded"] == 2 and rs["gen"] == 1
    assert {tuple(r) for r in crashed.read_relations().collect()} == expect
    assert _gen_dirs(tmp_path / "r_crash") == ["gen-00001"]


def test_relationstore_catchup_refuses_incomplete_corpus(spark, tmp_path):
    """A touched url still carrying link mentions in the snapshot but
    absent from the supplied corpus must fail the fold loudly — silent
    treatment-as-deleted would wrongly drop its relation rows. A url
    whose mentions truly vanished from the snapshot needs no text."""
    from dbpedia_spotlight_spark.streaming.kg_stream import RelationStore

    g0 = [("u1#char=0,2", "E1"), ("u1#char=14,16", "E2"),
          ("u2#char=0,2", "E3"), ("u2#char=10,12", "E2")]
    kg = KGStore(spark, str(tmp_path / "kg"), retain_gens=2)
    kg.advance(_triples(spark, g0), _delta(spark, g0, []), 0)

    rstore = RelationStore(spark, str(tmp_path / "r"))
    partial = spark.createDataFrame(
        [("u1", "E1 works with E2 daily")], "url string, text string")
    with pytest.raises(ValueError, match="missing text"):
        rstore.catchup(kg, partial)
    assert rstore.latest_gen() is None  # nothing folded

    # a NULL-text (or blank) row is missing text, not present text —
    # it cannot carry the mentions the snapshot still holds for u2
    nulltext = spark.createDataFrame(
        [("u1", "E1 works with E2 daily"), ("u2", None)],
        "url string, text string")
    with pytest.raises(ValueError, match="missing text"):
        rstore.catchup(kg, nulltext)
    assert rstore.latest_gen() is None

    full = spark.createDataFrame(
        [("u1", "E1 works with E2 daily"), ("u2", "E3 beside E2 now")],
        "url string, text string")
    assert rstore.catchup(kg, full)["gens_folded"] == 1

    # u2's mentions leave the snapshot entirely -> its text is no
    # longer required, and its contributions drop
    rem = [("u2#char=0,2", "E3"), ("u2#char=10,12", "E2")]
    g1 = [t for t in g0 if t not in rem]
    kg.advance(_triples(spark, g1), _delta(spark, [], rem), 1)
    s = rstore.catchup(kg, partial)
    assert s["gens_folded"] == 1 and s["rel_removed"] == 1
    assert {tuple(r) for r in rstore.read_relations().collect()} == {
        ("E1", "works with", "E2", 1, 1)}
