"""Distributed KG embedding training — TransE (Bordes et al., NeurIPS
2013), the translation model behind most KG-completion stacks: score a
triple (h, r, t) by how well E_h + R_r ≈ E_t — and DistMult (Yang et
al., ICLR 2015), the bilinear-diagonal model Σ_i E_h[i]·R_r[i]·E_t[i]
that is the standard strong baseline the translation family is
compared against (the two embed different relational geometries:
TransE favors compositional/antisymmetric relations, DistMult
symmetric ones — a KG-quality stack wants both scorers). The engine
already
EXPORTS TransE-shaped training examples (``operators/export.py``) and
EVALUATES rankings (``operators/ranking.py``); this module closes the
loop with the training itself, fully inside Spark:

- :func:`init_embeddings` — deterministic hash init (the md5-chain
  analogue of TransE's uniform(±6/√d)): no RNG, so the same KG always
  trains to the same embeddings and a from-scratch numpy twin can
  verify every step.
- :func:`train_transe` — full-batch margin-ranking gradient descent
  with deterministically corrupted negatives, zero UDFs: all vector
  math is ``zip_with``/``transform``/``aggregate`` array expressions
  (JVM codegen), gradients flow through ONE posexplode +
  map-side-combinable (uri, pos) sum per step.
- :func:`score_triples` — d(h+r, t) for any triple frame against
  trained embeddings; low-scoring *asserted* triples are the error
  candidates (the KG-refinement error-detection read of TransE), and
  scored *candidate* triples rank for completion.

Scale notes (10^12-doc KG): embedding tables are entity-/relation-
vocabulary-sized, triples are the big frame. Each step is 4 hash joins
keyed on entity/relation (skew = famous-entity degree — bounded by the
gradient being ONE combined row per entity after the map-side
combine), one dim× posexplode of the active-margin triples only, and
one (uri, pos)-keyed aggregate. Steps are fixed-count with
RoundCheckpointer lineage cuts; nothing is ever collected to the
driver. Per-component dyadic 2^-30 quantization after every step
(init included) makes the training BIT-identical across layouts and
engines: same-grid dyadic sums are exact in any order, so there is no
summation-order noise to round away and no rounding-boundary hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import md5_long


def _hash_unit(col, i: int, dim: int) -> F.Column:
    """Deterministic pseudo-uniform in (-6/√d, 6/√d): 60 md5 bits of
    '<name>#<i>' scaled — the hash-seeded analogue of TransE's init."""
    u = md5_long(F.concat(col, F.lit(f"#{i}"))) / F.lit(float(1 << 60))
    return (u - 0.5) * F.lit(12.0 / dim ** 0.5)


def init_embeddings(names: DataFrame, dim: int,
                    name_col: str = "name") -> DataFrame:
    """(name, v array<double>) — deterministic init, one row per
    distinct name. Components are exact single-expression doubles, so
    any reimplementation (numpy twin, SQL) reproduces them bitwise."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    c = F.col(name_col)
    return (names.select(c.alias("name")).distinct()
            .select("name", F.array(
                *[_hash_unit(F.col("name"), i, dim)
                  for i in range(dim)]).alias("v")))


def _vadd(a, b):
    return F.zip_with(a, b, lambda x, y: x + y)


def _vsub(a, b):
    return F.zip_with(a, b, lambda x, y: x - y)


def _sqnorm(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


_QBITS = 30
_Q = float(1 << _QBITS)


def _quant(col) -> F.Column:
    """Quantize to the dyadic grid 2^-30 (≈9.3e-10 resolution — the
    cross-engine exactness contract): multiplying by a power of two is
    exact, round() on bit-identical doubles is deterministic, and —
    the property decimal 9dp rounding lacks — SUMS of same-grid
    dyadics are exact in ANY order (no low bits to lose), so gradient
    aggregation is bit-identical across partitionings and engines, and
    no value ever sits on a rounding boundary by noise."""
    return F.round(col * F.lit(_Q)) / F.lit(_Q)


def _qprod(a, b) -> F.Column:
    """Component-wise product of two embedding columns, each component
    re-quantized to the 2^-30 grid. Products of grid values land on
    the 2^-60 grid — finer than a float64 mantissa near 1.0, so raw
    product SUMS would be order-sensitive; quantizing each per-triple
    component first restores the exact-dyadic-sum property the whole
    bit-identity contract rests on. The rounding itself is
    deterministic (IEEE round on bit-identical inputs), so twins
    replicate it verbatim."""
    return F.zip_with(a, b, lambda x, y: _quant(x * y))


def _qprod3(a, b, c) -> F.Column:
    """Quantized triple product q((a∘b)∘c) — the DistMult score terms.
    Association order (a*b)*c is part of the contract (each raw
    multiply rounds deterministically; twins must keep the order)."""
    return F.transform(
        F.zip_with(F.zip_with(a, b, lambda x, y: x * y), c,
                   lambda x, y: x * y), _quant)


def _train(triples: DataFrame, model: str, dim: int, n_steps: int,
           lr: float, margin: float,
           checkpoint_dir: str | None,
           resume_from: DataFrame | None,
           step_offset: int) -> DataFrame:
    """('entity'|'relation', name, v) — embeddings after ``n_steps``
    full-batch margin-SGD updates over the distinct (subj, pred, obj)
    triples. ``model='transe'`` scores by −‖E_h+R_r−E_t‖² (translation
    geometry), ``model='distmult'`` by Σ_i q(E_h[i]·R_r[i]·E_t[i])
    (bilinear-diagonal geometry, Yang et al. ICLR 2015 — the q(·)
    per-component grid quantization is this engine's determinism
    variant, see :func:`_qprod`), ``model='complex'`` by
    Re(<E_h, R_r, conj(E_t)>) (complex-bilinear geometry, Trouillon
    et al. ICML 2016 — antisymmetry-capable; vectors are packed
    [Re | Im] halves); loss, corruption scheme, renorm,
    checkpointing and the per-step dyadic quantization are shared.

    Per step, for each triple and its corrupted twin (tail replaced by
    the md5-picked entity ``hash(s|p|o|step) % n_entities`` — resampled
    every step, replicable anywhere):

        L = max(0, margin + ‖E_h+R_r−E_t‖² − ‖E_h+R_r−E_t'‖²)

    and when the margin is active the analytic gradients
    (∂E_h = ∂R_r = 2(E_t'−E_t), ∂E_t = −2(E_h+R_r−E_t),
    ∂E_t' = +2(E_h+R_r−E_t')) are summed per name and applied with
    ``lr``; entity embeddings are re-projected to the unit sphere (the
    TransE constraint) and every component — init included — is
    quantized to the dyadic 2^-30 grid (see :func:`_quant`): because
    same-grid dyadic sums are EXACT in any order, every step is
    bit-identical across layouts, engines, and reimplementations —
    stronger than a decimal-rounding contract, which leaves
    boundary-straddle hazards.

    Self-corruptions (the hash picks the true tail) contribute zero
    gradient by construction (d_pos == d_neg ⇒ inactive margin unless
    margin > 0 ⇒ active but t and t' gradients cancel exactly) — no
    special-casing needed, and the twin agrees.

    Warm start: pass a previous ``train_transe`` output as
    ``resume_from`` and the step count already consumed as
    ``step_offset`` — corruption indices continue from there, so
    ``train(n)`` ≡ ``train(k)`` then ``resume(n-k, offset=k)``
    BIT-exactly (full-batch GD has no hidden state). This is the KG
    lifecycle hook: retrain a few steps after a triple delta instead
    of from scratch. Names absent from ``resume_from`` (new entities
    or relations in the delta) get hash init; names present keep their
    trained vectors (dim must match — enforced).
    """
    if model not in ("transe", "distmult", "complex"):
        raise ValueError(f"unknown model: {model}"
                         " ('transe' | 'distmult' | 'complex')")
    if model == "complex" and dim % 2:
        raise ValueError("complex needs an even dim "
                         "(first half Re, second half Im)")
    if n_steps < 0:
        raise ValueError("n_steps must be >= 0")
    spark = triples.sparkSession
    tri = (triples.select("subj", "pred", "obj")
           .dropDuplicates(["subj", "pred", "obj"])
           .localCheckpoint(eager=True))
    ents = (tri.select(F.col("subj").alias("name"))
            .unionByName(tri.select(F.col("obj").alias("name")))
            .distinct())
    # dense, deterministic entity indexing for negative corruption:
    # sorted order — entity-vocabulary-sized, one window pass
    from pyspark.sql import Window
    idx = (ents.withColumn(
        "_i", F.row_number().over(Window.orderBy("name")) - 1)
        .localCheckpoint(eager=True))
    n_ent = idx.count()
    def _quantized(emb):
        return emb.select("name", F.transform("v", _quant).alias("v"))

    e_emb = _quantized(init_embeddings(idx, dim, "name"))
    r_emb = _quantized(init_embeddings(
        tri.select(F.col("pred").alias("name")), dim, "name")) \
        .withColumnRenamed("name", "pred")
    if resume_from is not None:
        bad = resume_from.filter(F.size("v") != dim).limit(1).count()
        if bad:
            raise ValueError(f"resume_from embeddings are not dim={dim}")
        prev_e = (resume_from.filter(F.col("kind") == "entity")
                  .select("name", F.col("v").alias("_pv")))
        prev_r = (resume_from.filter(F.col("kind") == "relation")
                  .select(F.col("name").alias("pred"),
                          F.col("v").alias("_pv")))
        e_emb = (e_emb.join(prev_e, "name", "left")
                 .select("name", F.coalesce("_pv", "v").alias("v")))
        r_emb = (r_emb.join(prev_r, "pred", "left")
                 .select("pred", F.coalesce("_pv", "v").alias("v")))

    from .iterate import RoundCheckpointer
    e_ckpt = RoundCheckpointer(spark, checkpoint_dir, "transe-ent")
    r_ckpt = RoundCheckpointer(spark, checkpoint_dir, "transe-rel")
    e_emb = e_ckpt.cut(e_emb)
    r_emb = r_ckpt.cut(r_emb)

    rnd = F.transform  # alias for brevity below
    for step in range(step_offset, step_offset + n_steps):
        neg_i = (md5_long(F.concat_ws("|", "subj", "pred", "obj",
                                      F.lit(str(step))))
                 % n_ent).cast("int")
        batch = (tri.withColumn("_ni", neg_i)
                 .join(idx.select(F.col("name").alias("_nname"),
                                  F.col("_i").alias("_ni")), "_ni")
                 .join(e_emb.select(F.col("name").alias("subj"),
                                    F.col("v").alias("hv")), "subj")
                 .join(e_emb.select(F.col("name").alias("obj"),
                                    F.col("v").alias("tv")), "obj")
                 .join(e_emb.select(F.col("name").alias("_nname"),
                                    F.col("v").alias("nv")), "_nname")
                 .join(F.broadcast(r_emb.select("pred",
                                   F.col("v").alias("rv"))), "pred"))
        if model == "transe":
            hr = _vadd(F.col("hv"), F.col("rv"))
            dpos = _vsub(hr, F.col("tv"))
            dneg = _vsub(hr, F.col("nv"))
            active = (F.lit(margin) + _sqnorm(dpos) - _sqnorm(dneg)) > 0
            # grid-exact without extra quantization: differences of
            # grid values scaled by 2.0
            g_h = F.zip_with("nv", "tv", lambda a, b: 2.0 * (a - b))
            g_r = g_h
            g_t = rnd(dpos, lambda x: -2.0 * x)
            g_n = rnd(dneg, lambda x: 2.0 * x)
        elif model == "distmult":
            # maximize s = Σ q(h·r·t) for true triples
            spos = F.aggregate(
                _qprod3(F.col("hv"), F.col("rv"), F.col("tv")),
                F.lit(0.0), lambda acc, x: acc + x)
            sneg = F.aggregate(
                _qprod3(F.col("hv"), F.col("rv"), F.col("nv")),
                F.lit(0.0), lambda acc, x: acc + x)
            active = (F.lit(margin) - spos + sneg) > 0
            # ∂L: each pairwise product re-quantized (see _qprod), so
            # per-name sums stay exact dyadics; self-corruptions
            # (nv == tv) cancel exactly like the TransE case
            g_h = _vsub(_qprod(F.col("rv"), F.col("nv")),
                        _qprod(F.col("rv"), F.col("tv")))
            g_r = _vsub(_qprod(F.col("hv"), F.col("nv")),
                        _qprod(F.col("hv"), F.col("tv")))
            g_t = rnd(_qprod(F.col("hv"), F.col("rv")), lambda x: -x)
            g_n = _qprod(F.col("hv"), F.col("rv"))
        else:  # complex: s = Re(<h, r, conj(t)>), Trouillon et al. 2016
            half = dim // 2
            re_ = lambda c: F.slice(c, 1, half)          # noqa: E731
            im_ = lambda c: F.slice(c, half + 1, half)   # noqa: E731
            h_re, h_im = re_(F.col("hv")), im_(F.col("hv"))
            r_re, r_im = re_(F.col("rv")), im_(F.col("rv"))

            def _cx_score(tv):
                t_re, t_im = re_(tv), im_(tv)
                s = lambda arr: F.aggregate(        # noqa: E731
                    arr, F.lit(0.0), lambda acc, x: acc + x)
                # four grid-exact sums, combined ((t1+t2)+t3)-t4 —
                # all on the 2^-30 grid, so the combination is exact
                return (s(_qprod3(h_re, r_re, t_re))
                        + s(_qprod3(h_im, r_re, t_im))
                        + s(_qprod3(h_re, r_im, t_im))
                        - s(_qprod3(h_im, r_im, t_re)))

            def _cx_gh(tv):    # ∂s/∂h = (r_re∘t_re + r_im∘t_im,
                t_re, t_im = re_(tv), im_(tv)  # r_re∘t_im − r_im∘t_re)
                return F.concat(
                    _vadd(_qprod(r_re, t_re), _qprod(r_im, t_im)),
                    _vsub(_qprod(r_re, t_im), _qprod(r_im, t_re)))

            def _cx_gt(hv_re, hv_im):  # ∂s/∂t (conjugated slot)
                return F.concat(
                    _vsub(_qprod(r_re, hv_re), _qprod(r_im, hv_im)),
                    _vadd(_qprod(r_re, hv_im), _qprod(r_im, hv_re)))

            def _cx_gr(tv):    # ∂s/∂r
                t_re, t_im = re_(tv), im_(tv)
                return F.concat(
                    _vadd(_qprod(h_re, t_re), _qprod(h_im, t_im)),
                    _vsub(_qprod(h_re, t_im), _qprod(h_im, t_re)))

            spos = _cx_score(F.col("tv"))
            sneg = _cx_score(F.col("nv"))
            active = (F.lit(margin) - spos + sneg) > 0
            g_h = _vsub(_cx_gh(F.col("nv")), _cx_gh(F.col("tv")))
            g_r = _vsub(_cx_gr(F.col("nv")), _cx_gr(F.col("tv")))
            g_t = rnd(_cx_gt(h_re, h_im), lambda x: -x)
            g_n = _cx_gt(h_re, h_im)
        act = batch.filter(active).select(
            "subj", "pred", "obj", "_nname",
            g_h.alias("_gh"), g_r.alias("_gr"),
            g_t.alias("_gt"), g_n.alias("_gn"))
        ent_grads = (
            act.select(F.col("subj").alias("name"),
                       F.col("_gh").alias("g"))
            .unionByName(act.select(F.col("obj").alias("name"),
                                    F.col("_gt").alias("g")))
            .unionByName(act.select(F.col("_nname").alias("name"),
                                    F.col("_gn").alias("g"))))
        rel_grads = act.select("pred", F.col("_gr").alias("g"))

        def _summed(grads, key):
            return (grads
                    .select(key, F.posexplode("g").alias("pos", "gi"))
                    .groupBy(key, "pos").agg(F.sum("gi").alias("gi"))
                    .groupBy(key)
                    .agg(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "gi"))),
                        lambda s: s["gi"]).alias("grad")))

        def _apply(emb, gsum, key, renorm):
            stepped = (emb.join(gsum, key, "left")
                       .select(key, F.when(
                           F.col("grad").isNull(), F.col("v")).otherwise(
                           F.zip_with("v", "grad",
                                      lambda a, b: a - F.lit(lr) * b))
                           .alias("v")))
            if renorm:
                nrm = F.sqrt(_sqnorm(F.col("v")))
                stepped = stepped.select(key, F.when(
                    nrm > 0, rnd("v", lambda x: x / nrm))
                    .otherwise(F.col("v")).alias("v"))
            return stepped.select(
                key, rnd("v", _quant).alias("v"))

        e_emb = e_ckpt.cut(_apply(e_emb, _summed(ent_grads, "name"),
                                  "name", renorm=True))
        r_emb = r_ckpt.cut(_apply(r_emb, _summed(rel_grads, "pred"),
                                  "pred", renorm=False))
    return (e_emb.select(F.lit("entity").alias("kind"), "name", "v")
            .unionByName(r_emb.select(F.lit("relation").alias("kind"),
                                      F.col("pred").alias("name"), "v")))


def train_transe(triples: DataFrame, dim: int = 16, n_steps: int = 10,
                 lr: float = 0.1, margin: float = 1.0,
                 checkpoint_dir: str | None = None,
                 resume_from: DataFrame | None = None,
                 step_offset: int = 0) -> DataFrame:
    """TransE training (see :func:`_train` for the full contract)."""
    return _train(triples, "transe", dim, n_steps, lr, margin,
                  checkpoint_dir, resume_from, step_offset)


def train_distmult(triples: DataFrame, dim: int = 16,
                   n_steps: int = 10, lr: float = 0.1,
                   margin: float = 1.0,
                   checkpoint_dir: str | None = None,
                   resume_from: DataFrame | None = None,
                   step_offset: int = 0) -> DataFrame:
    """DistMult training — the bilinear-diagonal twin of
    :func:`train_transe` (symmetric-relation bias, the standard
    strong baseline for KG completion). Same corruption scheme,
    margin loss, unit-sphere entity projection and per-step dyadic
    quantization; score and gradients use grid-quantized component
    products (:func:`_qprod`) so training stays BIT-identical across
    layouts, engines and the numpy twin. Warm start / resume has the
    same train(n) ≡ train(k)+resume(n−k) exactness."""
    return _train(triples, "distmult", dim, n_steps, lr, margin,
                  checkpoint_dir, resume_from, step_offset)


def train_complex(triples: DataFrame, dim: int = 16,
                  n_steps: int = 10, lr: float = 0.1,
                  margin: float = 1.0,
                  checkpoint_dir: str | None = None,
                  resume_from: DataFrame | None = None,
                  step_offset: int = 0) -> DataFrame:
    """ComplEx training (Trouillon et al. ICML 2016) — the
    complex-bilinear third geometry: v is a 2·(dim/2) real vector
    (first half Re, second half Im) and the score is
    Re(<E_h, R_r, conj(E_t)>), which — unlike DistMult — can model
    ANTISYMMETRIC relations (swapping h and t flips the r_im term's
    sign). Shares the corruption scheme, margin loss, unit-sphere
    entity projection, per-step dyadic quantization and the
    train(n) ≡ train(k)+resume(n−k) warm-start exactness of
    :func:`_train`; every pairwise/triple product is grid-requantized
    (:func:`_qprod`/:func:`_qprod3`) so training stays BIT-identical
    across layouts, engines and the numpy twin."""
    return _train(triples, "complex", dim, n_steps, lr, margin,
                  checkpoint_dir, resume_from, step_offset)


def score_triples(triples: DataFrame, embeddings: DataFrame,
                  round_digits: int = 9,
                  model: str = "transe") -> DataFrame:
    """(subj, pred, obj, score) — ``model='transe'``: distance
    ‖E_h+R_r−E_t‖² (LOWER is more plausible); ``model='distmult'``:
    the bilinear score Σ q(E_h·R_r·E_t) (HIGHER is more plausible —
    same quantized-product form training used, so scoring is
    engine-exact too). Every input triple whose three parts all have
    embeddings (inner joins: unseen parts are unscoreable by
    definition). Read path of the trained model: rank candidate facts
    for completion, or flag implausible *asserted* facts as error
    candidates."""
    if model not in ("transe", "distmult", "complex"):
        raise ValueError(f"unknown model: {model}"
                         " ('transe' | 'distmult' | 'complex')")
    e = embeddings.filter(F.col("kind") == "entity").select("name", "v")
    r = embeddings.filter(F.col("kind") == "relation") \
        .select("name", "v")
    j = (triples.select("subj", "pred", "obj")
         .join(e.select(F.col("name").alias("subj"),
                        F.col("v").alias("hv")), "subj")
         .join(e.select(F.col("name").alias("obj"),
                        F.col("v").alias("tv")), "obj")
         .join(F.broadcast(r.select(F.col("name").alias("pred"),
                                    F.col("v").alias("rv"))), "pred"))
    if model == "transe":
        d = _sqnorm(_vsub(_vadd(F.col("hv"), F.col("rv")),
                          F.col("tv")))
    elif model == "distmult":
        d = F.aggregate(
            _qprod3(F.col("hv"), F.col("rv"), F.col("tv")),
            F.lit(0.0), lambda acc, x: acc + x)
    else:  # complex — same 4-term grid-exact sum training used
        # slice bounds come from size(col) so the caller needn't pass
        # dim; arrays must be even-length (the train_complex contract)
        sl = lambda c, a: F.expr(                      # noqa: E731
            f"slice({c}, {a} * (size({c}) div 2) + 1,"
            f" size({c}) div 2)")
        h_re, h_im = sl("hv", 0), sl("hv", 1)
        r_re, r_im = sl("rv", 0), sl("rv", 1)
        t_re, t_im = sl("tv", 0), sl("tv", 1)
        s = lambda arr: F.aggregate(                   # noqa: E731
            arr, F.lit(0.0), lambda acc, x: acc + x)
        d = (s(_qprod3(h_re, r_re, t_re))
             + s(_qprod3(h_im, r_re, t_im))
             + s(_qprod3(h_re, r_im, t_im))
             - s(_qprod3(h_im, r_im, t_re)))
    return j.select("subj", "pred", "obj",
                    F.round(d, round_digits).alias("score"))
