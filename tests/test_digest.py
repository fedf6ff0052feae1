"""Snapshot digests (triples.py::triple_digest / digest_shift) and
their KGStore wiring: order/layout independence, mergeability, the
O(delta) incremental-maintenance law, and verify_snapshot catching an
out-of-band snapshot edit the pointer discipline cannot see."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.triples import (
    apply_delta, digest_shift, triple_delta, triple_digest)

SEP = "\x1f"


def _h(parts) -> int:
    return int(hashlib.md5(SEP.join(parts).encode())
               .hexdigest()[:15], 16)


def _tdf(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


ROWS = [(f"https://h{i % 3}/d{i}#char=0,5", "itsrdf:taIdentRef",
         f"http://dbpedia.org/resource/E{i % 7}") for i in range(40)]


def test_digest_matches_python_and_ignores_layout(spark):
    df = _tdf(spark, ROWS + ROWS[:5])     # dup rows collapse
    want_n = len(set(ROWS))
    want_d = sum(_h(t) for t in set(ROWS))
    for frame in (df, df.repartition(7), df.coalesce(1),
                  df.orderBy(F.desc("obj"))):
        row = triple_digest(frame).first()
        assert (row.n_triples, int(row.digest)) == (want_n, want_d)


def test_digest_mergeable_over_disjoint_parts(spark):
    a, b = ROWS[:17], ROWS[17:]
    ra = triple_digest(_tdf(spark, a)).first()
    rb = triple_digest(_tdf(spark, b)).first()
    rall = triple_digest(_tdf(spark, ROWS)).first()
    assert ra.n_triples + rb.n_triples == rall.n_triples
    assert int(ra.digest) + int(rb.digest) == int(rall.digest)


def test_empty_frame_digest_is_zero(spark):
    row = triple_digest(_tdf(spark, [])).first()
    assert (row.n_triples, int(row.digest)) == (0, 0)


def test_incremental_law_over_real_delta(spark):
    """digest(apply_delta(base, Δ)) == digest(base) + shift(Δ) — the
    O(delta) maintenance law, on the 4-column provenance key."""
    cols = ("url", "subj", "pred", "obj")
    base = _tdf(spark, ROWS)
    # recrawl: host h0 docs drop half their triples, add new ones
    new_rows = [r for r in ROWS if "h0" not in r[0]][:0] + [
        (s, p, o + "_v2") for s, p, o in ROWS if "h0" in s][:8] + [
        (s, p, o) for s, p, o in ROWS if "h0" in s][8:]
    new = _tdf(spark, new_rows)
    delta = triple_delta(base, new)
    applied = apply_delta(base, delta)
    d0 = triple_digest(applied.select(*cols), cols=cols).first()
    b0 = triple_digest(
        base.withColumn("url", F.split("subj", "#")[0])
        .select(*cols), cols=cols).first()
    sh = digest_shift(delta, cols=cols).first()
    assert d0.n_triples == b0.n_triples + sh.n_shift
    assert int(d0.digest) == int(b0.digest) + int(sh.digest_shift)


def _mk(spark, tmp_path):
    from dbpedia_spotlight_spark.streaming.kg_stream import KGStore
    store = KGStore(spark, str(tmp_path / "kg"))

    def triples(*rows):
        return spark.createDataFrame(
            [(s, "p", o) for s, o in rows],
            "subj string, pred string, obj string")

    def delta(*rows):
        return spark.createDataFrame(
            [(s.split("#")[0], s, "p", o, c) for s, o, c in rows],
            "url string, subj string, pred string, obj string, "
            "change string")
    return store, triples, delta


def test_store_digest_incremental_and_verified(spark, tmp_path):
    store, triples, delta = _mk(spark, tmp_path)
    A, B, C = ("u1#a", "A"), ("u2#b", "B"), ("u3#c", "C")
    store.advance(triples(A), delta((*A, "added")), 0)
    assert store.read_digest() == (1, _h(("u1#a", "p", "A")))
    store.advance(triples(A, B), delta((*B, "added")), 1)
    store.advance(triples(B, C),
                  delta((*A, "removed"), (*C, "added")), 2)
    want = _h(("u2#b", "p", "B")) + _h(("u3#c", "p", "C"))
    assert store.read_digest() == (2, want)
    v = store.verify_snapshot()
    assert v["ok"] and v["n_actual"] == 2 \
        and v["digest_actual"] == want


def test_store_verify_catches_out_of_band_edit(spark, tmp_path):
    store, triples, delta = _mk(spark, tmp_path)
    A, B = ("u1#a", "A"), ("u2#b", "B")
    store.advance(triples(A, B),
                  delta((*A, "added"), (*B, "added")), 0)
    assert store.verify_snapshot()["ok"]
    # out-of-band corruption: rewrite the live snapshot minus a triple
    gen = store.latest_gen()
    path = f"{store.root}/gen-{gen:05d}/triples"
    kept = spark.read.parquet(path).filter("obj <> 'B'") \
        .localCheckpoint(eager=True)
    kept.write.mode("overwrite").parquet(path)
    v = store.verify_snapshot()
    assert not v["ok"] and v["n_actual"] == 1


def test_store_digest_legacy_bootstrap(spark, tmp_path):
    """A store whose previous generation predates digests (no _DIGEST
    file) bootstraps with one full recompute instead of failing."""
    store, triples, delta = _mk(spark, tmp_path)
    A, B = ("u1#a", "A"), ("u2#b", "B")
    store.advance(triples(A), delta((*A, "added")), 0)
    # simulate legacy: drop the digest record of the live generation
    gen = store.latest_gen()
    store._fs.delete(
        store._fs_path(f"{store.root}/gen-{gen:05d}/_DIGEST"), False)
    assert store.read_digest() is None
    with pytest.raises(ValueError, match="digest"):
        store.verify_snapshot()
    store.advance(triples(A, B), delta((*B, "added")), 1)
    assert store.verify_snapshot()["ok"]
