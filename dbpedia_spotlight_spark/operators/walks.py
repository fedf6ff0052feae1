"""DeepWalk-style random-walk corpus over the entity graph.

Perozzi et al. 2014: short random walks over the graph are "sentences"
whose skip-gram pairs train node embeddings — the classical
graph-embedding corpus generator, complementing the TransE-style
triple sampling in ``operators/export.py``. This engine's walks are
DETERMINISTIC: the neighbor chosen at step t of walk w is
``md5(walk_id:t)`` mod degree, so a re-run (or a resumed job, or the
DuckDB oracle) reproduces the identical corpus — the same
layout-independence rule every sampling operator in this repo follows
(``sampling.hash_split``, ``export.kg_embed_examples``).

Scale design:
- adjacency is ONE sorted-neighbor-list aggregate, checkpointed and
  reused by every step (at real scale: bucket it by uri once and all
  step joins co-locate);
- each step is one equi-join keyed on the current node — entity-sized
  keys, never corpus-sized; the walk frame stays |V|·n_walks rows with
  an array column that grows by one per step;
- the hash choice is JVM md5/conv column algebra — zero Python, zero
  RNG state, so tasks can retry/re-run without divergence;
- skip-gram extraction is a per-walk self-join bounded by walk_len —
  the walk_id keys are uniform by construction (no skew possible).

:func:`node2vec_walks` extends the same contract to the p/q-biased
second-order walk (Grover & Leskovec 2016): the bias weights are
EXACT INTEGERS (1/p, 1, 1/q scaled by their lcm denominator), the
choice is ``md5(...) mod Σweights`` resolved by cumulative-weight
scan — all integer arithmetic, so the DuckDB oracle replays it with a
window cumsum and the corpus is layout-independent like everything
else here. The membership test against the previous node's neighbor
set costs NO extra join: the neighbor list fetched for the current
node at step t IS the previous-node list at step t+1, so it rides
along in the walk state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BUCKET_BITS = 60  # 15 hex chars parse exactly into a signed BIGINT


def _h60(col: F.Column) -> F.Column:
    """The repo's cross-engine 60-bit md5 integer (non-negative)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def undirected(edges: DataFrame) -> DataFrame:
    """Both directions of a canonical (uri_a < uri_b) edge table."""
    e = edges.select("uri_a", "uri_b").distinct()
    return e.unionByName(e.select(F.col("uri_b").alias("uri_a"),
                                  F.col("uri_a").alias("uri_b")))


def adjacency(edges: DataFrame) -> DataFrame:
    """(uri, nbrs) with the neighbor list SORTED — the index↔neighbor
    mapping both engines agree on (binary string order)."""
    return (undirected(edges)
            .groupBy(F.col("uri_a").alias("uri"))
            .agg(F.sort_array(F.collect_list("uri_b")).alias("nbrs")))


def random_walks(edges: DataFrame, n_walks: int = 2, walk_len: int = 5,
                 seed: str = "walk") -> DataFrame:
    """(walk_id, step, uri) — ``n_walks`` deterministic uniform random
    walks of ``walk_len`` nodes from every vertex. walk_id =
    ``uri#k``; step 0 is the start vertex; the step-t transition picks
    sorted-neighbor index ``md5(seed:walk_id:t) % degree``. Every
    vertex of the undirected graph has ≥1 neighbor, so walks never
    die early."""
    adj = adjacency(edges).localCheckpoint(eager=True)
    starts = (adj.select("uri")
              .withColumn("k", F.explode(F.array(
                  *[F.lit(i) for i in range(n_walks)])))
              .select(F.concat_ws("#", "uri", "k").alias("walk_id"),
                      F.col("uri").alias("cur"),
                      F.array("uri").alias("path")))
    walks = starts
    for t in range(1, walk_len):
        idx = F.pmod(
            _h60(F.concat_ws(":", F.lit(seed), "walk_id", F.lit(str(t)))),
            F.size("nbrs"))
        walks = (walks.join(adj, walks["cur"] == adj["uri"])
                 .select("walk_id",
                         F.element_at("nbrs", (idx + 1).cast("int"))
                         .alias("cur"),
                         F.concat("path", F.array(
                             F.element_at("nbrs", (idx + 1).cast("int"))))
                         .alias("path")))
    return walks.select(
        "walk_id", F.posexplode("path").alias("step", "uri"))


def _pq_weights(p: float, q: float) -> tuple[int, int, int]:
    """(w_return, w_inside, w_outside) — node2vec's 1/p, 1, 1/q as
    exact integers scaled by the lcm of their denominators, so the
    weighted choice is pure integer arithmetic (the cross-engine /
    layout-independence requirement). p and q must be rational with a
    denominator ≤ 10^6 after conversion (any sane hyperparameter)."""
    from fractions import Fraction
    from math import lcm
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    wr = 1 / Fraction(str(p)).limit_denominator(10 ** 6)
    wo = 1 / Fraction(str(q)).limit_denominator(10 ** 6)
    scale = lcm(wr.denominator, wo.denominator)
    return (int(wr * scale), int(scale), int(wo * scale))


def node2vec_walks(edges: DataFrame, p: float = 1.0, q: float = 1.0,
                   n_walks: int = 2, walk_len: int = 5,
                   seed: str = "n2v") -> DataFrame:
    """(walk_id, step, uri) — second-order p/q-biased walks
    (node2vec, Grover & Leskovec 2016) under the SAME deterministic
    contract as :func:`random_walks`. Step 1 is uniform (no previous
    node, per the paper); at step t>1, candidate x in the sorted
    neighbor list of cur gets integer weight w_return (x == prev),
    w_inside (x adjacent to prev) or w_outside, and the pick is
    ``md5(seed:walk_id:t) mod Σw`` resolved by a single-pass
    cumulative fold. p == q == 1 degenerates to the DeepWalk walk but
    with the weighted selector (same distribution, different hash
    stream — walks are not expected to coincide with random_walks).

    Scale: ONE adjacency join per step (the previous node's neighbor
    list rides along from the prior step — see module docstring);
    weights/cumsum are JVM higher-order expressions over the neighbor
    array, linear in degree."""
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    wr, wi, wo = _pq_weights(p, q)
    adj = adjacency(edges).localCheckpoint(eager=True)
    walks = (adj.select("uri")
             .withColumn("k", F.explode(F.array(
                 *[F.lit(i) for i in range(n_walks)])))
             .select(F.concat_ws("#", "uri", "k").alias("walk_id"),
                     F.col("uri").alias("cur"),
                     F.array("uri").alias("path")))
    for t in range(1, walk_len):
        j = walks.join(adj, walks["cur"] == adj["uri"]).drop("uri")
        h = _h60(F.concat_ws(":", F.lit(seed), "walk_id",
                             F.lit(str(t))))
        if t == 1:
            j = j.withColumn("_i", F.pmod(h, F.size("nbrs")).cast("int"))
        else:
            # _w/_r/_i land as NAMED columns on purpose: a
            # higher-order aggregate nested inside another lambda (r
            # inside the selection fold) mis-binds its
            # NamedLambdaVariables when the combined expression is
            # inlined twice in one projection — attribute references
            # sidestep the collision entirely
            w_arr = F.transform(
                F.col("nbrs"),
                lambda x: F.when(x == F.col("prev"),
                                 F.lit(wr).cast("long"))
                .when(F.array_contains(F.col("pnbrs"), x),
                      F.lit(wi).cast("long"))
                .otherwise(F.lit(wo).cast("long")))
            j = j.withColumn("_w", w_arr)
            total = F.aggregate(F.col("_w"), F.lit(0).cast("long"),
                                lambda acc, x: acc + x)
            j = j.withColumn("_r", F.pmod(h, total))
            j = j.withColumn("_i", F.aggregate(
                F.col("_w"),
                F.struct(F.lit(0).cast("long").alias("cum"),
                         F.lit(-1).alias("idx"),
                         F.lit(0).alias("pos")),
                lambda acc, x: F.struct(
                    (acc["cum"] + x).alias("cum"),
                    F.when(acc["idx"] >= 0, acc["idx"])
                    .when(F.col("_r") < acc["cum"] + x, acc["pos"])
                    .otherwise(F.lit(-1)).alias("idx"),
                    (acc["pos"] + 1).alias("pos")),
                lambda acc: acc["idx"]))
        nxt = F.element_at("nbrs", (F.col("_i") + 1).cast("int"))
        walks = j.withColumn("_nxt", nxt).select(
            "walk_id",
            F.col("cur").alias("prev"),
            F.col("nbrs").alias("pnbrs"),
            F.col("_nxt").alias("cur"),
            F.concat("path", F.array("_nxt")).alias("path"))
    return walks.select(
        "walk_id", F.posexplode("path").alias("step", "uri"))


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n) skip-gram co-occurrence counts from the
    walk corpus: every ordered pair of distinct positions within
    ``window`` of each other in one walk. One self-join keyed by
    walk_id (uniform keys by construction) + one count aggregate."""
    a = walks.select("walk_id", F.col("step").alias("i"),
                     F.col("uri").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("j"),
                     F.col("uri").alias("context"))
    return (a.join(b, "walk_id")
            .filter((F.col("i") != F.col("j"))
                    & (F.abs(F.col("i") - F.col("j")) <= window))
            .groupBy("center", "context")
            .agg(F.count("*").alias("n")))
