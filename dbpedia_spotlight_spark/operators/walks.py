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

Not node2vec: the p/q-biased transition needs membership tests of each
candidate against the PREVIOUS node's neighbor set (a second
adjacency join per step plus a set probe); DeepWalk's uniform choice
is what the deterministic-replay contract can mirror relationally, so
p/q bias is out of scope (documented, not planned).
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
