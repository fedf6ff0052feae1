"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Queries are a small set → broadcast; one pass over the corpus side, then
  a per-query window top-k. At 10^12 rows this is a scan + tiny shuffle
  (k rows per query per partition after partial top-k via AQE).
- ``hyperplane_lsh_topk``: the scale path — sign-bit bucketing on D fixed
  pseudo-random hyperplanes; candidates share a bucket (multi-probe via
  Hamming-adjacent buckets optional). Recall measured against brute force
  in tests.

Vector math is native Spark (zip_with/aggregate) — JVM codegen, no Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, z: acc + z)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, z: acc + z))


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each query id (excluding self-match).
    Output: (query_id, vec_id, cosine, rank)."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", id_col,
            (_dot(F.col("qv"), F.col("v"))
             / (_norm(F.col("qv")) * _norm(F.col("v")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure function of
    (dim, n_planes, seed) — no RNG state, reproducible everywhere)."""
    planes = []
    x = 0x243F6A8885A308D3 ^ (seed * 0x9E3779B97F4A7C15 % (1 << 64))
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            row.append(((x >> 11) / float(1 << 53)) * 2.0 - 1.0)
        n = math.sqrt(sum(v * v for v in row)) or 1.0
        planes.append([v / n for v in row])
    return planes


def lsh_bucket(embeddings: DataFrame, n_planes: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-bit bucket id per vector: bit p = [v · h_p >= 0].

    One Arrow-batched pandas-UDF matmul for all plane projections — the
    UDF discovers `dim` from its first batch, so there is NO driver-side
    probe job (the old ``select(vec_col).first()`` launched a full scan
    stage just to learn the vector width), and the dense
    (batch × dim) @ (dim × planes) product beats n_planes codegen'd
    fold-expressions on both plan-compile time and SIMD throughput
    (same rationale as ``hyperplane_lsh_pairs``)."""
    from pyspark.sql.types import IntegerType

    if not 1 <= n_planes <= 31:
        raise ValueError("n_planes must be in [1, 31] (int32 bucket key)")

    plane_cache: dict[int, "np.ndarray"] = {}

    def planes_for(dim: int) -> "np.ndarray":
        P = plane_cache.get(dim)
        if P is None:
            P = np.asarray(_hyperplanes(dim, n_planes))   # (planes, dim)
            plane_cache[dim] = P
        return P

    pows = np.asarray([1 << p for p in range(n_planes)], dtype=np.int64)

    @F.pandas_udf(IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (X @ planes_for(X.shape[1]).T) >= 0        # (B, planes)
        return pd.Series((bits * pows).sum(axis=1).astype("int32"))

    return embeddings.select(F.col(id_col), F.col(vec_col),
                             bucket_udf(F.col(vec_col)).alias("bucket"))


def hyperplane_lsh_pairs(embeddings: DataFrame, threshold: float = 0.95,
                         n_tables: int = 6, n_planes: int = 8,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate *pairs* (a < b, cosine >= threshold) via multi-table
    sign-bit LSH — the scale path that replaces the O(n²) crossJoin.

    ``n_tables`` independent hyperplane tables of ``n_planes`` sign bits
    each; vectors sharing a bucket in ANY table become candidates (one
    explode + one groupBy + in-bucket pair expansion — the same
    single-pass, bucket-capped pattern as ``minhash_candidate_pairs``),
    then candidates are verified with the exact cosine. Identical vectors
    collide in every table (recall 1.0 for true duplicates); recall for
    near-pairs rises with n_tables and is measured against brute force in
    pytest.

    The n_tables·n_planes sign projections are ONE Arrow-batched pandas
    UDF doing a dense (batch × dim) @ (dim × tables·planes) matmul —
    48 codegen'd fold-expressions over literal arrays would bloat the
    plan (seconds of fixed Catalyst/janino cost) and lose SIMD; the
    matmul also discovers `dim` per batch, so no driver-side probe job.
    The binary/vector column is never shuffled before bucketing."""
    from pyspark.sql.types import ArrayType, IntegerType

    if not 1 <= n_planes <= 31:
        raise ValueError("n_planes must be in [1, 31] — sign bits pack "
                         "into an int32 bucket key (bit 31 is the sign)")

    plane_cache: dict[int, "np.ndarray"] = {}

    def planes_for(dim: int) -> "np.ndarray":
        P = plane_cache.get(dim)
        if P is None:
            P = np.asarray([
                row
                for t in range(n_tables)
                for row in _hyperplanes(dim, n_planes, seed=t)
            ])                                     # (tables*planes, dim)
            plane_cache[dim] = P
        return P

    pows = np.asarray([1 << p for p in range(n_planes)], dtype=np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (X @ planes_for(X.shape[1]).T) >= 0   # (B, tables*planes)
        packed = (bits.reshape(len(X), n_tables, n_planes) * pows).sum(
            axis=2).astype("int32")                  # (B, tables)
        return pd.Series(list(packed))

    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    tabbed = e.select(
        "id", F.posexplode(buckets_udf(F.col("v"))).alias("table", "bucket")
    )
    buckets = (
        tabbed.groupBy("table", "bucket")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    n = F.size("ids")
    expanded = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, n - i - 1),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    cand = (
        buckets.select(F.explode(expanded).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )
    ea = e.select(F.col("id").alias("a"), F.col("v").alias("va"))
    eb = e.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda p, q: p * q),
        F.lit(0.0), lambda acc, z: acc + z,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda p: p * p), F.lit(0.0), lambda acc, z: acc + z))
    return (
        cand.join(ea, "a").join(eb, "b")
        .select("a", "b",
                (dot / (nrm(F.col("va")) * nrm(F.col("vb")))).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_centroids(embeddings: DataFrame, n_clusters: int = 16,
                  n_iter: int = 5, sample: int = 2048,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> "np.ndarray":
    """IVF coarse quantizer: k-means centroids trained driver-side on a
    seeded UNIFORM sample (numpy Lloyd iterations — the sample is small;
    the expensive part, assignment of the full corpus, stays distributed).
    Returns (n_clusters, dim) float64.

    Sampling is hash-Bernoulli on the id: keep rows with
    md5(id || salt) mod 2^20 < frac·2^20 — uniform like a seeded
    ``df.sample`` but ALSO independent of partition layout (Spark's
    sample RNG is per-partition, so a repartitioned input would train a
    different quantizer), hence stable across resumes and reproducible
    outside Spark. A bare orderBy(id).limit() would train on the lowest
    ids (ingestion order, not the data distribution); here the id sort
    only canonicalizes the order of the tiny (≤ sample·1.2-row) gated
    set driver-side, so the trainer is a pure function of the sample SET
    — DuckDB replays the md5 gate + sort + Lloyd iterations verbatim
    (``sql_ann_ivf``)."""
    X = ivf_training_sample(embeddings, sample, id_col, vec_col)
    # deterministic init: evenly strided sample rows (integer arithmetic
    # — np.linspace().astype(int) truncates float intermediates, which a
    # SQL mirror cannot reproduce bit-for-bit near integer boundaries)
    idx = [i * (len(X) - 1) // max(n_clusters - 1, 1)
           for i in range(n_clusters)]
    C = X[idx].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C


def ivf_training_sample(embeddings: DataFrame, sample: int = 2048,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> "np.ndarray":
    """The trainer's exact driver-side sample matrix (exposed so parity
    tests can replay Lloyd iterations and pin argmin margins)."""
    n = embeddings.count()
    if n <= sample:
        src = embeddings
    else:
        # 1.2x headroom so the Bernoulli sample almost surely yields
        # >= `sample` rows; the id-ordered limit trims the excess
        # deterministically (a plain limit takes whichever partitions
        # answer first)
        frac = min(1.0, (sample * 1.2) / n)
        gate = int(frac * (1 << 20))
        h = F.conv(F.substring(
            F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                              F.lit("ivf13"))), 1, 15), 16, 10).cast("long")
        src = embeddings.filter((h % (1 << 20)) < gate)
    rows = (src.orderBy(id_col).limit(sample)
            .select(vec_col).toPandas()[vec_col].tolist())
    return np.asarray([list(map(float, v)) for v in rows])


def ivf_assign(embeddings: DataFrame, centroids, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid — one vectorized
    pandas-UDF pass over Arrow batches (numpy matmul per batch)."""
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    Cn = (C ** 2).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        d = Cn[None, :] - 2.0 * (X @ C.T)   # ||c||² − 2x·c (+||x||² const)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return embeddings.withColumn("cluster", assign_udf(F.col(vec_col)))


def ivf_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             n_clusters: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_digits: int | None = None) -> DataFrame:
    """IVF ANN top-k: score only vectors in the query's n_probe nearest
    clusters. The cluster assignment is one scan; the probe join is a
    broadcast of (query × probe) rows. Same output shape as cosine_topk;
    recall vs brute force is asserted in tests. ``round_digits`` rounds
    the cosine BEFORE ranking (oracle form — cross-engine libm noise
    cannot flip ranks)."""
    C = ivf_centroids(embeddings, n_clusters, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(embeddings, C, id_col, vec_col)

    q_rows = (
        assigned.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col).toPandas()
    )
    probes = []
    Cn = (C ** 2).sum(axis=1)
    for _, r in q_rows.iterrows():
        x = np.asarray(list(map(float, r[vec_col])))
        d = Cn - 2.0 * (C @ x)
        # stable sort: exact distance ties (duplicate centroids from
        # empty clusters / duplicated init rows) break by cluster index,
        # matching the SQL mirror's ORDER BY d, c (default quicksort
        # gives no tie order guarantee)
        for c in np.argsort(d, kind="stable")[:n_probe]:
            probes.append((int(r[id_col]), int(c)))
    probe_df = embeddings.sparkSession.createDataFrame(
        probes, "query_id long, cluster int"
    )
    qv = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("qv"))
    )
    cand = (
        assigned.join(F.broadcast(probe_df), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .join(F.broadcast(qv), "query_id")
    )
    cos = (_dot(F.col("qv"), F.col(vec_col).cast("array<double>"))
           / (_norm(F.col("qv"))
              * _norm(F.col(vec_col).cast("array<double>"))))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = cand.select(
        "query_id", id_col, cos.alias("cosine"),
    ).dropDuplicates(["query_id", id_col])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def hyperplane_lsh_topk(embeddings: DataFrame, query_ids: list[int],
                        k: int = 5, n_planes: int = 6,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        round_digits: int | None = None) -> DataFrame:
    """ANN top-k: score only candidates in the query's bucket (plus
    Hamming-1 probes to lift recall). Same output shape as cosine_topk.
    ``round_digits`` rounds the cosine BEFORE ranking (like ann_topk's
    oracle form) so cross-engine float noise can't flip ranks."""
    b = lsh_bucket(embeddings, n_planes, id_col, vec_col)
    q = b.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    # multi-probe: query bucket + all Hamming-1 neighbors
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
    )
    q = q.withColumn("probe", F.explode(probes)).drop("qbucket")
    cand = b.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe")) & (F.col(id_col) != F.col("query_id")),
    )
    cos = (_dot(F.col("qv").cast("array<double>"),
                F.col(vec_col).cast("array<double>"))
           / (_norm(F.col("qv").cast("array<double>"))
              * _norm(F.col(vec_col).cast("array<double>"))))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = cand.select(
        "query_id", id_col, cos.alias("cosine"),
    ).dropDuplicates(["query_id", id_col])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
