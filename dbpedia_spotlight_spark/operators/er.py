"""Entity resolution over a materialized KG: discover owl:sameAs edges.

``canonicalize_triples`` (triples.py) repairs a snapshot GIVEN sameAs
evidence; this module PRODUCES that evidence from the KG's own
attribute assertions — the classic two-stage ER shape (blocking →
pairwise verify), every stage bounded so no all-pairs plan can appear:

1. **Blocking** (``er_candidates``): two entities are candidates iff
   they share a (pred, obj) assertion on one of the caller's quasi-key
   predicates (homepage, registered id, normalized name key, …). One
   groupBy on the (pred, obj) block + in-block pair expansion — the
   same shuffle shape as the LSH bucket expansion in
   ``operators/dedup.py::minhash_candidate_pairs`` — and ``max_block``
   drops pathological blocks: an obj shared by half the corpus is not
   a key, it is boilerplate (the standard quadratic guard).
2. **Verify** (``er_sameas``): a candidate pair survives iff it shares
   ≥ ``min_shared`` distinct key assertions (two independent quasi-keys
   agreeing is strong evidence on its own), OR its best name pair —
   min Levenshtein across the two entities' casefolded name sets — is
   within ``max_name_dist``. Levenshtein runs JVM-side
   (``F.levenshtein``, whole-stage codegen); the name fan-out is
   bounded by ``max_names`` names per entity (slice-after-sort, so the
   kept subset is deterministic and layout-independent).

Output ``(a, b, n_shared, name_dist)`` with ``a < b`` — feeds straight
into ``connected_components`` / ``canonicalize_triples``.

Scale shape (10^9-entity KG): the keyed slice is |entities| × |key
preds| rows, blocks shuffle once on (pred, obj), pair expansion is
C(block, 2) ≤ C(max_block, 2) per block, and the verify join fans out
≤ max_names² name comparisons per CANDIDATE pair (never per entity
pair). Nothing collects; no stage is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def er_candidates(kg: DataFrame, key_preds: list[str],
                  max_block: int = 64, mode: str = "all") -> DataFrame:
    """Candidate (a, b, n_shared) pairs — a < b — of distinct subjects
    sharing ≥1 quasi-key (pred, obj) assertion.

    ``mode="all"`` (default): every in-block pair, C(block, 2), over
    blocks that pass the ``max_block`` cap (over-cap blocks are dropped
    whole: their key carries no identifying signal). ``mode="star"``:
    (block-min, member) founder edges only — block−1 pairs, LINEAR even
    for a mega-block, no cap (the same tradeoff as the LSH star mode in
    operators/dedup.py: star edges span the same connected components,
    and the downstream verify keeps an edge only when the founder truly
    matches, so a boilerplate key falls apart instead of welding
    clusters — use it when ER output feeds connected_components)."""
    if mode not in ("all", "star"):
        raise ValueError(f"unknown mode: {mode} ('all' | 'star')")
    keyed = (kg.filter(F.col("pred").isin(*key_preds))
             .select("subj", "pred", "obj").dropDuplicates())
    if mode == "star":
        from pyspark.sql import Window
        w = Window.partitionBy("pred", "obj")
        edges = (
            keyed.withColumn("founder", F.min("subj").over(w))
            .filter(F.col("subj") != F.col("founder"))
            .select(F.col("founder").alias("a"),
                    F.col("subj").alias("b"))
            .dropDuplicates()
        )
        # n_shared = TRUE shared-key count for the emitted pair (a
        # per-founder-block count would undercount when another block
        # containing the same pair has a smaller founder, silently
        # failing the min_shared verify). Two joins bounded by
        # |edges| × keys-per-entity — still linear.
        k1 = keyed.select(F.col("subj").alias("a"), "pred", "obj")
        k2 = keyed.select(F.col("subj").alias("b"), "pred", "obj")
        return (edges.join(k1, "a").join(k2, ["b", "pred", "obj"])
                .groupBy("a", "b").agg(F.count("*").alias("n_shared")))
    blocks = (
        keyed.groupBy("pred", "obj")
        .agg(F.sort_array(F.collect_set("subj")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_block))
    )
    n = F.size("ids")
    pairs = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, n - i - 1),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    return (
        blocks.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n_shared"))
    )


def _names(kg: DataFrame, name_pred: str, max_names: int) -> DataFrame:
    """(subj, names) — up to ``max_names`` distinct casefolded names
    per entity, smallest-first so the kept subset is deterministic."""
    return (
        kg.filter(F.col("pred") == name_pred)
        .select("subj", F.lower(F.col("obj")).alias("name"))
        .groupBy("subj")
        .agg(F.slice(F.sort_array(F.collect_set("name")), 1,
                     max_names).alias("names"))
    )


def er_sameas(kg: DataFrame, key_preds: list[str],
              name_pred: str = "foaf:name", max_name_dist: int = 2,
              min_shared: int = 2, max_block: int = 64,
              max_names: int = 4, mode: str = "all") -> DataFrame:
    """sameAs edges (a, b, n_shared, name_dist) with a < b: blocked
    candidates verified by shared-key count or best-name Levenshtein.

    ``name_dist`` is NULL when either side carries no name — such pairs
    survive only on the ``min_shared`` rule, and the NULL is kept in
    the output so downstream can audit which rule fired. ``mode="star"``
    emits verified founder edges instead of all pairs (see
    ``er_candidates``) — the clustering form."""
    cand = er_candidates(kg, key_preds, max_block, mode)
    names = _names(kg, name_pred, max_names)
    j = (
        cand
        .join(names.select(F.col("subj").alias("a"),
                           F.col("names").alias("names_a")), "a", "left")
        .join(names.select(F.col("subj").alias("b"),
                           F.col("names").alias("names_b")), "b", "left")
    )
    # min Levenshtein across the (≤ max_names²) name cross product,
    # evaluated inside one higher-order expression — no explode, no
    # extra shuffle; aggregate(..) folds the running minimum.
    best = F.aggregate(
        F.flatten(F.transform(
            F.coalesce("names_a", F.array()),
            lambda x: F.transform(F.coalesce("names_b", F.array()),
                                  lambda y: F.levenshtein(x, y)),
        )),
        F.lit(None).cast("int"),
        lambda acc, d: F.least(F.coalesce(acc, d), d),
    )
    return (
        j.withColumn("name_dist", best)
        .filter((F.col("n_shared") >= min_shared)
                | (F.col("name_dist") <= max_name_dist))
        .select("a", "b", "n_shared", "name_dist")
    )


def maintain_sameas(state: DataFrame, kg: DataFrame, delta: DataFrame,
                    key_preds: list[str], name_pred: str = "foaf:name",
                    max_name_dist: int = 2, min_shared: int = 2,
                    max_block: int = 64, max_names: int = 4,
                    ) -> tuple[DataFrame, DataFrame]:
    """Incremental maintenance of the sameAs edge store over the KG
    delta-log CDC feed — the ER member of the IVM family
    (``ontology.maintain_entailment``, ``graph.maintain_comention``,
    ``shapes.validate_shapes_delta``): a recrawl batch must not re-run
    entity resolution over a 10^9-entity KG.

    ``state`` is a previous ``er_sameas(mode='all')`` output (a, b,
    n_shared, name_dist); ``kg`` is the POST-delta snapshot; ``delta``
    carries (subj, pred, obj, change) rows — ``KGStore.read_log`` rows
    pass through unchanged (extra columns ignored; per-url removals of
    a still-otherwise-asserted triple only OVER-approximate the
    affected set, which is safe — a recomputed-but-unchanged pair is
    replaced by an identical row).

    Exactness argument (pytest-pinned against full recompute):

    - A pair can change only via a key/name row of one endpoint, so
      changed pairs have an endpoint in the affected-subject set A.
    - TOUCHED blocks = (pred, obj) keys of A's CURRENT key rows ∪ the
      (pred, obj) of the delta's key rows themselves (the second term
      catches removals: the block an entity just LEFT must be
      revisited — its pairs may vanish, or an over-``max_block`` block
      may drop under the cap and start emitting).
    - E = members of touched blocks ∪ A. Every changed pair has both
      endpoints in E (the A endpoint forces each shared/formerly-shared
      block to be touched, pulling the other endpoint in).
    - The recompute slice is the FULL membership of every block any
      E-member currently belongs to, plus those members' name rows —
      full membership makes the ``max_block`` cap decision and the
      shared-key counts of every recomputed pair exact, not
      slice-relative.
    - Pairs with both endpoints in E are replaced by the recompute
      (restricted to such pairs — a slice pair between two non-E
      members may be missing its out-of-slice shared blocks and is
      discarded); everything else is kept as-is.

    Cost ∝ touched blocks + the key/name rows of their members' blocks
    — never a KG rescan. ``mode='star'`` states are NOT maintainable
    this way (removing a block's founder rewires edges between
    unaffected members); use the 'all' mode for IVM, or re-run the
    star batch.

    Returns ``(new_state, edge_delta)`` — edge_delta is the added /
    removed (a, b, change) structural diff for downstream
    canonicalization."""
    preds = list(key_preds) + [name_pred]
    affected = (delta.filter(F.col("pred").isin(preds))
                .select("subj").distinct())
    keyed = (kg.filter(F.col("pred").isin(*key_preds))
             .select("subj", "pred", "obj").dropDuplicates())
    touched = (keyed.join(affected, "subj", "left_semi")
               .select("pred", "obj")
               .unionByName(delta.filter(F.col("pred")
                                         .isin(*key_preds))
                            .select("pred", "obj"))
               .distinct())
    ents = (keyed.join(touched, ["pred", "obj"], "left_semi")
            .select("subj").unionByName(affected).distinct()
            .localCheckpoint(eager=True))
    blocks_of_e = (keyed.join(ents, "subj", "left_semi")
                   .select("pred", "obj").distinct())
    members = (keyed.join(blocks_of_e, ["pred", "obj"], "left_semi")
               .select("subj").unionByName(ents).distinct()
               .localCheckpoint(eager=True))
    sliced = (kg.filter(F.col("pred").isin(preds))
              .join(members, "subj", "left_semi"))
    e_a = ents.withColumnRenamed("subj", "a")
    e_b = ents.withColumnRenamed("subj", "b")
    recomputed = (er_sameas(sliced, key_preds, name_pred=name_pred,
                            max_name_dist=max_name_dist,
                            min_shared=min_shared, max_block=max_block,
                            max_names=max_names)
                  .join(e_a, "a", "left_semi")
                  .join(e_b, "b", "left_semi")
                  .localCheckpoint(eager=True))
    replaced = (state.join(e_a, "a", "left_semi")
                .join(e_b, "b", "left_semi"))
    kept = state.join(replaced.select("a", "b"), ["a", "b"], "left_anti")
    new_state = kept.unionByName(recomputed)
    added = (recomputed.select("a", "b")
             .join(state.select("a", "b"), ["a", "b"], "left_anti")
             .withColumn("change", F.lit("added")))
    removed = (replaced.select("a", "b")
               .join(recomputed.select("a", "b"), ["a", "b"],
                     "left_anti")
               .withColumn("change", F.lit("removed")))
    return new_state, added.unionByName(removed)
