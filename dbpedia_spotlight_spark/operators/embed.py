"""Model-free text embeddings via the hashing trick — the bridge from
raw text to the ANN / embedding-near-dup stack when no encoder model is
available (feature hashing: Weinberger et al. 2009; the SemDeDup recipe
needs *some* vector per doc, and a hashed TF vector is the standard
cheap one).

Each document becomes an L2-normalized ``dim``-dimensional float array:
token → md5-bucket (signed, ±1 by one hash bit — the collision-bias
fix from the paper), per-bucket counts, dense array materialized with
``map_from_entries`` + one ``transform`` over the index range. Fully
relational — no UDFs — and deterministic/layout-independent, so the
same doc always hashes to the same vector and the DuckDB oracle can
replay it bit-for-bit (L2 norm under the 9dp round contract).

Plan shape: explode tokens → ONE map-side-combinable (id, bucket) count
→ ONE (id)-keyed map_from_entries aggregate. Cost ∝ tokens; the output
is |docs| × dim floats. Compose with ``similarity.hyperplane_lsh_*`` or
``dedup.embedding_near_dup`` for semantic-ish dedup at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decontam import _norm
from .dedup import md5_long


def text_embeddings(docs: DataFrame, dim: int = 64,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, embedding array<double>) — signed hashed-TF vectors,
    L2-normalized (a doc whose signed counts all cancel yields the zero
    vector). Values are rounded to 9dp AFTER normalization.

    Cross-engine exactness by construction: bucket values are sums of
    ±1 (integer-valued doubles, exact in any order), so ‖v‖² is an
    exact integer and sqrt/division/round are single deterministic
    float ops — no summation-order hazard for the DuckDB oracle."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = (docs
            .select(F.col(id_col).alias("id"),
                    F.split(_norm(F.col(text_col)), " ").alias("_toks"))
            .select("id", F.explode_outer("_toks").alias("tok"))
            .filter(F.col("tok").isNotNull()))
    h = md5_long(F.col("tok"))
    counts = (toks
              .select("id", (h % dim).cast("int").alias("bucket"),
                      # sign bit decorrelates collisions: bucket sums
                      # become unbiased estimates of the inner product
                      F.when((F.shiftright(h, 20) % 2) == 0, F.lit(1.0))
                       .otherwise(F.lit(-1.0)).alias("sgn"))
              .groupBy("id", "bucket")
              .agg(F.sum("sgn").alias("c")))
    vec = (counts
           .groupBy("id")
           .agg(F.map_from_entries(
               F.collect_list(F.struct("bucket", "c"))).alias("m"))
           .select(
               "id",
               F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                           lambda i: F.coalesce(
                               F.element_at("m", i.cast("int")),
                               F.lit(0.0))).alias("raw")))
    # null-text docs produce no tokens and would vanish from the
    # aggregate — re-attach them with the zero vector (the DuckDB
    # mirror's grid join gives the same rows)
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    zeros = F.array(*[F.lit(0.0)] * dim)
    vec = ids.join(vec, "id", "left") \
             .select("id", F.coalesce(F.col("raw"), zeros).alias("raw"))
    nrm = F.sqrt(F.aggregate("raw", F.lit(0.0),
                             lambda acc, x: acc + x * x))
    return vec.select(
        F.col("id").alias(id_col),
        F.when(nrm > 0,
               F.transform("raw", lambda x: F.round(x / nrm, 9)))
         .otherwise(F.col("raw")).alias("embedding"))
