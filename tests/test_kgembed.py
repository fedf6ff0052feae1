"""TransE training (operators/kgembed.py): BIT-exact parity with a
from-scratch numpy twin (both sides under the dyadic 2^-30 per-step
quantization contract), loss behavior, layout independence, and the
score_triples read path."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from dbpedia_spotlight_spark.operators.kgembed import (
    init_embeddings, score_triples, train_transe)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_Q = float(1 << 30)


def _quant_np(v: np.ndarray) -> np.ndarray:
    # half away from zero — Spark round() / DuckDB round() semantics
    return np.copysign(np.floor(np.abs(v * _Q) + 0.5), v) / _Q


def _init_np(name: str, dim: int) -> np.ndarray:
    return np.array([
        (_md5_long(f"{name}#{i}") / float(1 << 60) - 0.5)
        * (12.0 / math.sqrt(dim))
        for i in range(dim)])


def _train_np(triples, dim, n_steps, lr, margin):
    """From-scratch full-batch TransE replicating the operator's
    contract: md5 init, per-step md5 tail corruption, analytic
    gradients on active margins, entity renorm, dyadic per-step quant."""
    tri = sorted(set(triples))
    ents = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    rels = sorted({p for _, p, _ in tri})
    E = {e: _quant_np(_init_np(e, dim)) for e in ents}
    R = {r: _quant_np(_init_np(r, dim)) for r in rels}
    for step in range(n_steps):
        ge = {e: np.zeros(dim) for e in ents}
        gr = {r: np.zeros(dim) for r in rels}
        for (s, p, o) in tri:
            ni = _md5_long(f"{s}|{p}|{o}|{step}") % len(ents)
            nname = ents[ni]
            hr = E[s] + R[p]
            dpos, dneg = hr - E[o], hr - E[nname]
            if margin + dpos @ dpos - dneg @ dneg > 0:
                ge[s] += 2.0 * (E[nname] - E[o])
                gr[p] += 2.0 * (E[nname] - E[o])
                ge[o] += -2.0 * dpos
                ge[nname] += 2.0 * dneg
        for e in ents:
            v = E[e] - lr * ge[e]
            n = math.sqrt(float(v @ v))
            if n > 0:
                v = v / n
            E[e] = _quant_np(v)
        for r in rels:
            R[r] = _quant_np(R[r] - lr * gr[r])
    return E, R


_TRIPLES = [
    ("a", "likes", "b"), ("a", "likes", "c"), ("b", "likes", "c"),
    ("c", "knows", "d"), ("d", "knows", "e"), ("e", "knows", "a"),
    ("b", "owns", "x"), ("c", "owns", "x"), ("d", "owns", "y"),
    ("x", "near", "y"), ("y", "near", "x"), ("a", "owns", "y"),
]


def _tri_df(spark, rows=None):
    return spark.createDataFrame(
        rows or _TRIPLES, "subj string, pred string, obj string")


def test_init_matches_twin(spark):
    df = _tri_df(spark)
    out = {r.name: np.array(r.v)
           for r in init_embeddings(
               df.select(df.subj.alias("name")), 8).collect()}
    for name, v in out.items():
        assert np.array_equal(v, _init_np(name, 8)), name
    with pytest.raises(ValueError, match="dim"):
        init_embeddings(_tri_df(spark), 1, "subj")


@pytest.mark.parametrize("n_steps", [0, 1, 4])
def test_train_matches_numpy_twin(spark, n_steps):
    dim, lr, margin = 8, 0.05, 1.0
    got = train_transe(_tri_df(spark), dim=dim, n_steps=n_steps,
                       lr=lr, margin=margin).collect()
    E, R = _train_np(_TRIPLES, dim, n_steps, lr, margin)
    want = {("entity", k): v for k, v in E.items()}
    want.update({("relation", k): v for k, v in R.items()})
    got_map = {(r.kind, r.name): np.array(r.v) for r in got}
    assert set(got_map) == set(want)
    for key in want:
        # BIT-exact: the dyadic quantization contract leaves no
        # summation-order noise on either side
        assert np.array_equal(got_map[key], want[key]), key


def test_training_reduces_margin_loss(spark):
    """Mean margin loss over the training triples (vs the step-0
    corruptions) decreases after training — the optimizer optimizes."""
    def loss(E, R, step=0):
        tri = sorted(set(_TRIPLES))
        ents = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
        tot = 0.0
        for (s, p, o) in tri:
            nname = ents[_md5_long(f"{s}|{p}|{o}|{step}") % len(ents)]
            hr = E[s] + R[p]
            dpos, dneg = hr - E[o], hr - E[nname]
            tot += max(0.0, 1.0 + float(dpos @ dpos) - float(dneg @ dneg))
        return tot / len(tri)
    E0, R0 = _train_np(_TRIPLES, 8, 0, 0.05, 1.0)
    E9, R9 = _train_np(_TRIPLES, 8, 12, 0.05, 1.0)
    assert loss(E9, R9) < loss(E0, R0)


def test_layout_independence(spark):
    df = _tri_df(spark)
    base = sorted((r.kind, r.name, tuple(r.v)) for r in
                  train_transe(df, dim=6, n_steps=3).collect())
    shuf = sorted((r.kind, r.name, tuple(r.v)) for r in
                  train_transe(df.repartition(7, "obj"),
                               dim=6, n_steps=3).collect())
    assert base == shuf


def test_score_triples_read_path(spark):
    df = _tri_df(spark)
    emb = train_transe(df, dim=8, n_steps=8).localCheckpoint(eager=True)
    scored = score_triples(df, emb).collect()
    assert len(scored) == len(set(_TRIPLES))
    # corrupted triples score worse (higher distance) ON AVERAGE than
    # the asserted ones the model trained on
    asserted = {(r.subj, r.pred, r.obj): r.score for r in scored}
    corrupt = [(s, p, "x" if o != "x" else "y")
               for (s, p, o) in _TRIPLES]
    corrupt = [c for c in corrupt if c not in asserted]
    cs = {(r.subj, r.pred, r.obj): r.score
          for r in score_triples(_tri_df(spark, corrupt), emb).collect()}
    assert np.mean(list(cs.values())) > np.mean(list(asserted.values()))
    # unseen parts are unscoreable: inner-join semantics
    alien = _tri_df(spark, [("zz", "likes", "a"), ("a", "likes", "b")])
    assert score_triples(alien, emb).count() == 1
    # entity rows are unit-norm after training
    for r in emb.filter("kind = 'entity'").collect():
        assert abs(float(np.linalg.norm(r.v)) - 1.0) < 1e-8


def test_resume_is_bit_exact(spark):
    """train(4) ≡ train(2) → resume(2 more, offset=2), bit-exactly —
    the KG-lifecycle warm start; a delta entity gets hash init while
    carried-over names keep their trained vectors."""
    df = _tri_df(spark)
    full = {(r.kind, r.name): tuple(r.v) for r in
            train_transe(df, dim=6, n_steps=4, lr=0.05).collect()}
    half = train_transe(df, dim=6, n_steps=2, lr=0.05) \
        .localCheckpoint(eager=True)
    resumed = {(r.kind, r.name): tuple(r.v) for r in
               train_transe(df, dim=6, n_steps=2, lr=0.05,
                            resume_from=half,
                            step_offset=2).collect()}
    assert resumed == full
    # delta with a NEW entity: carried names start from trained state,
    # the new one from hash init (present in output, unit-norm)
    delta = _tri_df(spark, _TRIPLES + [("a", "likes", "newbie")])
    out = train_transe(delta, dim=6, n_steps=1, lr=0.05,
                       resume_from=half, step_offset=2)
    names = {r.name for r in out.filter("kind = 'entity'").collect()}
    assert "newbie" in names
    with pytest.raises(ValueError, match="dim"):
        train_transe(df, dim=8, n_steps=1, resume_from=half).collect()


# ---------------------------------------------------------------------------
# DistMult (train_distmult): bilinear-diagonal twin of the TransE
# battery — same determinism contract, quantized-product gradients
# ---------------------------------------------------------------------------

from dbpedia_spotlight_spark.operators.kgembed import train_distmult


def _train_np_dm(triples, dim, n_steps, lr, margin):
    """From-scratch DistMult replicating the operator: every pairwise/
    triple product re-quantized to the 2^-30 grid (association order
    (h*r)*t), margin - s_pos + s_neg loss, unit-sphere renorm."""
    tri = sorted(set(triples))
    ents = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    rels = sorted({p for _, p, _ in tri})
    E = {e: _quant_np(_init_np(e, dim)) for e in ents}
    R = {r: _quant_np(_init_np(r, dim)) for r in rels}
    for step in range(n_steps):
        ge = {e: np.zeros(dim) for e in ents}
        gr = {r: np.zeros(dim) for r in rels}
        for (s, p, o) in tri:
            ni = _md5_long(f"{s}|{p}|{o}|{step}") % len(ents)
            nname = ents[ni]
            hr = E[s] * R[p]
            spos = float(_quant_np(hr * E[o]).sum())
            sneg = float(_quant_np(hr * E[nname]).sum())
            if margin - spos + sneg > 0:
                ge[s] += (_quant_np(R[p] * E[nname])
                          - _quant_np(R[p] * E[o]))
                gr[p] += (_quant_np(E[s] * E[nname])
                          - _quant_np(E[s] * E[o]))
                ge[o] += -_quant_np(hr)
                ge[nname] += _quant_np(hr)
        for e in ents:
            v = E[e] - lr * ge[e]
            n = math.sqrt(float(v @ v))
            if n > 0:
                v = v / n
            E[e] = _quant_np(v)
        for r in rels:
            R[r] = _quant_np(R[r] - lr * gr[r])
    return E, R


@pytest.mark.parametrize("n_steps", [0, 1, 4])
def test_distmult_matches_numpy_twin(spark, n_steps):
    dim, lr, margin = 8, 0.05, 1.0
    got = train_distmult(_tri_df(spark), dim=dim, n_steps=n_steps,
                         lr=lr, margin=margin).collect()
    E, R = _train_np_dm(_TRIPLES, dim, n_steps, lr, margin)
    want = {("entity", k): v for k, v in E.items()}
    want.update({("relation", k): v for k, v in R.items()})
    got_map = {(r.kind, r.name): np.array(r.v) for r in got}
    assert set(got_map) == set(want)
    for key in want:
        assert np.array_equal(got_map[key], want[key]), key


def test_distmult_reduces_loss_and_diverges_from_transe(spark):
    def loss(E, R, step=0):
        tri = sorted(set(_TRIPLES))
        ents = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
        tot = 0.0
        for (s, p, o) in tri:
            nname = ents[_md5_long(f"{s}|{p}|{o}|{step}") % len(ents)]
            hr = E[s] * R[p]
            spos = float(_quant_np(hr * E[o]).sum())
            sneg = float(_quant_np(hr * E[nname]).sum())
            tot += max(0.0, 1.0 - spos + sneg)
        return tot / len(tri)
    E0, R0 = _train_np_dm(_TRIPLES, 8, 0, 0.05, 1.0)
    E9, R9 = _train_np_dm(_TRIPLES, 8, 12, 0.05, 1.0)
    assert loss(E9, R9) < loss(E0, R0)
    # the two geometries genuinely train different vectors
    te = {r.name: tuple(r.v) for r in
          train_transe(_tri_df(spark), dim=6, n_steps=2)
          .filter("kind = 'entity'").collect()}
    dm = {r.name: tuple(r.v) for r in
          train_distmult(_tri_df(spark), dim=6, n_steps=2)
          .filter("kind = 'entity'").collect()}
    assert te.keys() == dm.keys() and te != dm


def test_distmult_layout_independence(spark):
    df = _tri_df(spark)
    base = sorted((r.kind, r.name, tuple(r.v)) for r in
                  train_distmult(df, dim=6, n_steps=3).collect())
    shuf = sorted((r.kind, r.name, tuple(r.v)) for r in
                  train_distmult(df.repartition(7, "obj"),
                                 dim=6, n_steps=3).collect())
    assert base == shuf


def test_distmult_score_read_path(spark):
    df = _tri_df(spark)
    emb = train_distmult(df, dim=8, n_steps=8) \
        .localCheckpoint(eager=True)
    scored = score_triples(df, emb, model="distmult").collect()
    assert len(scored) == len(set(_TRIPLES))
    # HIGHER is better for DistMult: corrupted triples score lower
    asserted = {(r.subj, r.pred, r.obj): r.score for r in scored}
    corrupt = [(s, p, "x" if o != "x" else "y")
               for (s, p, o) in _TRIPLES]
    corrupt = [c for c in corrupt if c not in asserted]
    cs = [r.score for r in score_triples(
        _tri_df(spark, corrupt), emb, model="distmult").collect()]
    assert np.mean(cs) < np.mean(list(asserted.values()))
    with pytest.raises(ValueError, match="model"):
        score_triples(df, emb, model="rotate")
    with pytest.raises(ValueError, match="model"):
        from dbpedia_spotlight_spark.operators.kgembed import _train
        # 'complex' graduated from unknown to implemented (round-5);
        # 'rotate' stays the representative unknown geometry
        _train(df, "rotate", 4, 1, 0.1, 1.0, None, None, 0)


def test_distmult_resume_is_bit_exact(spark):
    df = _tri_df(spark)
    full = {(r.kind, r.name): tuple(r.v) for r in
            train_distmult(df, dim=6, n_steps=4, lr=0.05).collect()}
    half = train_distmult(df, dim=6, n_steps=2, lr=0.05) \
        .localCheckpoint(eager=True)
    resumed = {(r.kind, r.name): tuple(r.v) for r in
               train_distmult(df, dim=6, n_steps=2, lr=0.05,
                              resume_from=half,
                              step_offset=2).collect()}
    assert resumed == full


# ---------------------------------------------------------------------------
# ComplEx (third geometry): packed [Re | Im] halves, score
# Re(<h, r, conj(t)>) — the same bit-identity contract as the others
# ---------------------------------------------------------------------------


def _train_np_cx(triples, dim, n_steps, lr, margin):
    """From-scratch ComplEx replicating the operator: association
    order q((a*b)*c) per score component, pairwise products
    grid-requantized in the gradients, combination ((t1+t2)+t3)-t4."""
    half = dim // 2
    tri = sorted(set(triples))
    ents = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    rels = sorted({p for _, p, _ in tri})
    E = {e: _quant_np(_init_np(e, dim)) for e in ents}
    R = {r: _quant_np(_init_np(r, dim)) for r in rels}

    def halves(v):
        return v[:half], v[half:]

    for step in range(n_steps):
        ge = {e: np.zeros(dim) for e in ents}
        gr = {r: np.zeros(dim) for r in rels}
        for (s, p, o) in tri:
            ni = _md5_long(f"{s}|{p}|{o}|{step}") % len(ents)
            nname = ents[ni]
            hre, him = halves(E[s])
            rre, rim = halves(R[p])

            def score(t):
                tre, tim = halves(t)
                t1 = float(_quant_np((hre * rre) * tre).sum())
                t2 = float(_quant_np((him * rre) * tim).sum())
                t3 = float(_quant_np((hre * rim) * tim).sum())
                t4 = float(_quant_np((him * rim) * tre).sum())
                return ((t1 + t2) + t3) - t4

            def gh(t):
                tre, tim = halves(t)
                return np.concatenate([
                    _quant_np(rre * tre) + _quant_np(rim * tim),
                    _quant_np(rre * tim) - _quant_np(rim * tre)])

            def gt():
                return np.concatenate([
                    _quant_np(rre * hre) - _quant_np(rim * him),
                    _quant_np(rre * him) + _quant_np(rim * hre)])

            def grad_r(t):
                tre, tim = halves(t)
                return np.concatenate([
                    _quant_np(hre * tre) + _quant_np(him * tim),
                    _quant_np(hre * tim) - _quant_np(him * tre)])

            if margin - score(E[o]) + score(E[nname]) > 0:
                ge[s] += gh(E[nname]) - gh(E[o])
                gr[p] += grad_r(E[nname]) - grad_r(E[o])
                ge[o] += -gt()
                ge[nname] += gt()
        for e in ents:
            v = E[e] - lr * ge[e]
            n = math.sqrt(float(v @ v))
            if n > 0:
                v = v / n
            E[e] = _quant_np(v)
        for r in rels:
            R[r] = _quant_np(R[r] - lr * gr[r])
    return E, R


@pytest.mark.parametrize("n_steps", [0, 1, 4])
def test_complex_matches_numpy_twin(spark, n_steps):
    from dbpedia_spotlight_spark.operators.kgembed import train_complex
    dim, lr, margin = 8, 0.05, 1.0
    got = train_complex(_tri_df(spark), dim=dim, n_steps=n_steps,
                        lr=lr, margin=margin).collect()
    E, R = _train_np_cx(_TRIPLES, dim, n_steps, lr, margin)
    want = {("entity", k): v for k, v in E.items()}
    want.update({("relation", k): v for k, v in R.items()})
    got_map = {(r.kind, r.name): np.array(r.v) for r in got}
    assert set(got_map) == set(want)
    for key in want:
        assert np.array_equal(got_map[key], want[key]), key


def test_complex_rejects_odd_dim(spark):
    from dbpedia_spotlight_spark.operators.kgembed import train_complex
    with pytest.raises(ValueError, match="even"):
        train_complex(_tri_df(spark), dim=7, n_steps=1)


def test_complex_models_antisymmetry(spark):
    """The motivating property (Trouillon et al.): an antisymmetric
    relation — (a,r,b) true, (b,r,a) false — must be scoreable apart.
    DistMult structurally CANNOT (its score is h·r·t, symmetric in
    h,t); ComplEx separates the pair via the imaginary part."""
    from dbpedia_spotlight_spark.operators.kgembed import (
        score_triples, train_complex, train_distmult)
    rows = [("a", "before", "b"), ("b", "before", "c"),
            ("a", "before", "c"), ("c", "after", "a")]
    df = _tri_df(spark, rows)
    probe = _tri_df(spark, [("a", "before", "b"),
                            ("b", "before", "a")])
    emb_cx = train_complex(df, dim=8, n_steps=8, lr=0.1)
    sc = {(r.subj, r.obj): r.score for r in
          score_triples(probe, emb_cx, model="complex").collect()}
    assert sc[("a", "b")] != sc[("b", "a")]
    emb_dm = train_distmult(df, dim=8, n_steps=8, lr=0.1)
    sd = {(r.subj, r.obj): r.score for r in
          score_triples(probe, emb_dm, model="distmult").collect()}
    assert sd[("a", "b")] == sd[("b", "a")]  # structural symmetry


def test_complex_resume_is_bit_exact(spark):
    from dbpedia_spotlight_spark.operators.kgembed import train_complex
    df = _tri_df(spark)
    full = {(r.kind, r.name): r.v for r in
            train_complex(df, dim=8, n_steps=4, lr=0.05).collect()}
    part = train_complex(df, dim=8, n_steps=2, lr=0.05)
    resumed = {(r.kind, r.name): r.v for r in
               train_complex(df, dim=8, n_steps=2, lr=0.05,
                             resume_from=part,
                             step_offset=2).collect()}
    assert full == resumed
