"""Deduplication operators for web-scale corpora.

Scale design (100 TB, 10^12 docs):

- exact: one shuffle on a 128-bit content hash; map-side partial agg
  makes the shuffle ≈ |unique| not |rows|.
- MinHash+LSH: signatures are computed scan-side (native expressions, no
  Python); banding turns near-dup search from O(n²) into a self-join on
  (band, band_hash) whose bucket sizes are bounded; skewed buckets (boiler-
  plate pages) can be salted or capped with a bucket-size filter.
- SimHash: 16/32-bit signature via per-token hash bit voting — one explode
  + one groupBy; near-dups = signatures at small Hamming distance.
- n-gram Jaccard: exact verify step for LSH candidates (or small corpora).
- embedding cosine: brute pairs for verify; hyperplane-LSH for scale.

Every hash is derived from md5 so the DuckDB oracle can reproduce results
exactly (no Spark-private hash functions in result-bearing columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# deterministic affine hash family over a Mersenne prime — coefficients are
# fixed odd constants so Spark and the DuckDB oracle agree exactly
MERSENNE61 = (1 << 61) - 1


def hash_family(n: int) -> list[tuple[int, int]]:
    """Deterministic odd 31-bit (a, b) pairs. Coefficients are kept
    within 31 bits so (a·h + b) with a 32-bit shingle hash fits in a
    63-bit signed long — the whole MinHash stays in native long codegen
    (BigDecimal math is ~20× slower in whole-stage codegen)."""
    rnd = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    mask31 = (1 << 31) - 1
    for i in range(n):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (b * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        rnd.append(((a & mask31) | 1, b & mask31))
    return rnd


def md5_long(col) -> F.Column:
    """First 60 bits of md5 as a non-negative bigint — reproducible in
    DuckDB as ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _tokens(text_col) -> F.Column:
    return F.split(F.lower(text_col), " ")


def shingles(text_col, k: int = 3) -> F.Column:
    """Word k-shingles as an array<string> — native expressions only
    (transform over sequence), no UDF in the scan.

    The token array is let-bound through a one-element transform so
    lower+split evaluates once per ROW: referencing the split tree
    directly inside the per-shingle lambda re-evaluates it per shingle
    (HOF lambdas defeat CSE — measured 2x end-to-end on jaccard_pairs)."""
    def build(toks):
        n = F.size(toks)
        return F.when(n >= k, F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.element_at(
        F.transform(F.array(_tokens(text_col)), build), 1)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup: content-hash groupBy. Returns one row per duplicate
    *group* (n_docs >= 2) with the keeper (min id) — the standard
    keep-first policy."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") >= 2)
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, k: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash signature per doc: sig[j] = min over shingles s of
    (a_j * H(s) + b_j) mod M61, H = md5-prefix bigint.

    Computed entirely with native expressions (explode-free: aggregate over
    the shingle array), so the scan stays in whole-stage codegen. The
    shingle hash H is a 32-bit md5 prefix and (a, b) are 31-bit, keeping
    a·H + b < 2^63 — pure long arithmetic, no decimal."""
    fam = hash_family(n_hashes)
    sh = shingles(F.col(text_col), k)
    h = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"))
    # materialize the hashed-shingle array ONCE behind a projection
    # boundary: referencing `h` directly inside all n_hashes transform
    # lambdas would re-evaluate the md5+shingle tree per hash function
    # (no CSE across lambda scopes) — n_hashes× the scan cost
    hashed = docs.select(F.col(id_col), h.alias("h"))
    sig = F.array(*[
        F.array_min(F.transform(
            F.col("h"), lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE61)
        )).cast("long").alias(f"h{j}")
        for j, (a, b) in enumerate(fam)
    ])
    return hashed.select(F.col(id_col), sig.alias("signature"))


def lsh_bands(signatures: DataFrame, bands: int = 4,
              id_col: str = "doc_id") -> DataFrame:
    """Split each signature into `bands` equal bands; band key = md5 of the
    joined band values. Docs sharing any (band, band_hash) are candidates."""
    n = bands
    return (
        signatures.select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n - 1)),
                    lambda b: F.md5(F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * (F.size("signature") / n).cast("int") + 1,
                                (F.size("signature") / n).cast("int"),
                            ),
                            lambda v: v.cast("string"),
                        ),
                    )),
                )
            ).alias("band", "band_hash"),
        )
    )


def minhash_candidate_pairs(docs: DataFrame, n_hashes: int = 16,
                            bands: int = 4, k: int = 3,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            max_bucket: int = 1000,
                            mode: str = "all") -> DataFrame:
    """LSH candidate pairs (a < b).

    One groupBy on (band, band_hash) + in-bucket pair expansion — a
    self-join would execute the whole signature pipeline once per side
    (two full scans) and shuffle both; this shuffles doc-ids once and
    expands pairs with a higher-order expression. ``max_bucket`` caps
    pathological buckets (boilerplate pages share a band at scale);
    capped buckets are dropped, the standard LSH production guard.

    ``mode``:
    - ``"all"``: every in-bucket pair — C(bucket, 2). The similarity-
      ANALYSIS form (and the oracle-checked one): downstream sees every
      candidate pair. ``max_bucket`` applies (over-cap buckets dropped —
      the standard quadratic guard).
    - ``"star"``: (min_member, other) only — bucket−1 pairs, LINEAR in
      corpus size even for huge clone families, implemented as a window
      min over the bucket (NO per-bucket array materialization and NO
      ``max_bucket`` cap: a 10M-re-crawl boilerplate family still dedups
      instead of being silently dropped by the guard). For CLUSTERING
      consumers (verify → connected components) this is the right shape:
      star edges span the same components as the all-pairs candidate
      graph, and the downstream exact verify keeps a star edge only when
      the founder truly matches the member — a false-positive bucket
      falls apart instead of welding clusters. Recall tradeoff: if the
      founder (bucket min id) is itself a false positive, true pairs
      among the other members are severed for that bucket — other bands
      give more chances; use mode="all" when recall beats cost.
    """
    if mode not in ("all", "star"):
        raise ValueError(f"unknown mode: {mode} ('all' | 'star')")
    b = lsh_bands(minhash_signatures(docs, n_hashes, k, id_col, text_col),
                  bands, id_col)
    if mode == "star":
        from pyspark.sql import Window
        w = Window.partitionBy("band", "band_hash")
        return (
            b.withColumn("founder", F.min(id_col).over(w))
            .filter(F.col(id_col) != F.col("founder"))
            .select(F.col("founder").alias("a"), F.col(id_col).alias("b"))
            .distinct()
        )
    buckets = (
        b.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
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
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text",
                        candidates: DataFrame | None = None,
                        max_bucket: int | None = 1000) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs.

    J(A,B) = |A∩B| / (|A|+|B|-|A∩B|) over *distinct* shingle sets.

    With ``candidates`` (a, b) — e.g. MinHash-LSH output — the EXACT
    verify path runs: candidates ⋈ shingles(a) ⋈ shingles(b) on the
    shingle key, grouped per pair. Cost ∝ |candidates|·|shingles/doc|,
    NEVER an all-pairs or bucket-expansion stage, and the result is
    exact regardless of shingle frequency — this is the production
    composition at corpus scale (``max_bucket`` is ignored: capping the
    verify would silently undercount intersections for boilerplate-heavy
    true duplicates). Edge contract, aligned with the no-candidates
    path: candidate pairs with ZERO shared shingles are never emitted
    (even at threshold<=0 — they share no bucket, so the exact path
    would not see them either), and a candidate whose doc has an empty
    shingle set (text shorter than k) cannot appear in any output pair.

    Without candidates, all pairs sharing ≥1 shingle are evaluated via
    single-pass bucket expansion. ``max_bucket`` caps the expansion (one
    corpus-common shingle otherwise creates C(n,2) pairs); the SAFE
    capped mode is the default (1000), and ``max_bucket=None`` is the
    exact mode (the all-pairs-oracle form — test scale only).

    The join key is a 60-bit md5 prefix of the shingle, not the string:
    long hash-join keys shuffle ~8 bytes/row instead of the shingle text
    and compare in one instruction (collision probability ~2⁻⁶⁰ per pair
    — semantics-preserving in practice; the DuckDB oracle joins on the
    raw string and the driver's value-hash would expose any collision).

    No-candidates path: ONE scan, ZERO joins for the pair math — the
    per-doc distinct-shingle count rides along as struct(id, n) through
    the bucket expansion, so |A|/|B| are already on every pair row
    (plan test pins scan count)."""
    sh_arr = F.array_distinct(shingles(F.col(text_col), k))
    base = (
        docs.select(F.col(id_col).alias("id"), sh_arr.alias("sh"))
        .select("id", F.size("sh").alias("n"), F.explode("sh").alias("s_str"))
        .select("id", "n", md5_long(F.col("s_str")).alias("s"))
    )
    if candidates is not None:
        # side-tagged pair explode: each candidate pair contributes its
        # two doc ids, ONE join against the shingle frame (a shingle
        # self-join would scan + shuffle the corpus once per side), then
        # a two-level aggregate — a shingle is in the intersection iff
        # both sides produced it for the pair
        pair_sides = (
            candidates.select("a", "b").distinct()
            .select("a", "b", F.explode(F.array(
                F.struct(F.lit(0).alias("side"), F.col("a").alias("id")),
                F.struct(F.lit(1).alias("side"), F.col("b").alias("id")),
            )).alias("m"))
            .select("a", "b", F.col("m.side").alias("side"),
                    F.col("m.id").alias("id"))
        )
        per = (
            pair_sides.join(base, "id")
            .groupBy("a", "b", "s")
            .agg(
                F.max(F.when(F.col("side") == 0, F.col("n"))).alias("na_s"),
                F.max(F.when(F.col("side") == 1, F.col("n"))).alias("nb_s"),
            )
        )
        agg = per.groupBy("a", "b").agg(
            F.max("na_s").alias("na"),
            F.max("nb_s").alias("nb"),
            F.sum(F.when(F.col("na_s").isNotNull()
                         & F.col("nb_s").isNotNull(), 1)
                   .otherwise(0)).alias("inter"),
        )
        return (
            # inter > 0 keeps the edge contract above (and makes the
            # NULL-na/nb empty-doc rows unreachable, not just dropped)
            agg.filter(F.col("inter") > 0)
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )
    # single-pass intersection counting: group (id, n) per shingle and
    # expand in-bucket pairs (a self-join would execute the shingle scan
    # once per side and shuffle both). array_distinct: two shingles of one
    # doc can collide into the same 60-bit key, which would duplicate the
    # id in its bucket and emit a degenerate (a,a) pair
    buckets = (
        base.groupBy("s")
        .agg(F.array_distinct(F.sort_array(
            F.collect_list(F.struct("id", "n")))).alias("members"))
        .filter(F.size("members") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket)
    bn = F.size("members")
    bpairs = F.flatten(F.transform(
        F.col("members"),
        lambda x, i: F.transform(
            F.slice(F.col("members"), i + 2, bn - i - 1),
            lambda y: F.struct(x["id"].alias("a"), y["id"].alias("b"),
                               x["n"].alias("na"), y["n"].alias("nb")),
        ),
    ))
    inter = (
        buckets.select(F.explode(bpairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                 F.col("p.na").alias("na"), F.col("p.nb").alias("nb"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("a", "b", "jaccard")


def _sig_bit(i: int) -> F.Column:
    """Literal for bit i of a packed int64 signature (bit 63 = sign bit:
    summing disjoint bit literals equals bitwise OR in two's complement)."""
    return F.lit(-(1 << 63)) if i == 63 else F.lit(1 << i)


def simhash(docs: DataFrame, bits: int = 16, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """SimHash signature: per-token md5 bits vote ±1 per position; the
    sign vector packs into an int64. One explode + one groupBy (map-side
    combinable); near-dup = small Hamming distance between signatures.

    ``bits`` up to 64: bits 0..59 come from md5 hex chars 1-15, bits
    60..63 from chars 16-30 (both mirrored exactly in DuckDB as
    ('0x'||substr(md5(t),off,15))::BIGINT)."""
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in [1, 64]")
    tok = docs.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    if bits > 60:
        tok = tok.withColumn(
            "h2", F.conv(F.substring(F.md5(F.col("tok")), 16, 15), 16, 10)
                   .cast("long"))

    def vote_src(i: int) -> F.Column:
        return F.shiftright(F.col("h"), i) if i < 60 \
            else F.shiftright(F.col("h2"), i - 60)

    votes = tok.groupBy(id_col).agg(*[
        F.sum(
            F.when(vote_src(i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ])
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, _sig_bit(i)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_pairs(docs: DataFrame, bits: int = 64, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       max_bucket: int = 1000,
                       mode: str = "all") -> DataFrame:
    """Near-dup pairs (a < b, hamming <= max_hamming) by SimHash Hamming
    distance, exact-recall blocking: the signature is split into
    ``max_hamming + 1`` equal blocks — by pigeonhole a pair within
    distance d agrees exactly on >= 1 block, so blocked candidate
    generation has recall 1.0 and the output EQUALS the brute-force
    all-pairs answer (the DuckDB oracle computes exactly that).

    Scale shape: one explode to (block_idx, block_val) + one groupBy +
    in-bucket pair expansion (same single-pass pattern as MinHash-LSH);
    64-bit signatures with 4 x 16-bit block keys keep buckets ~n/2^16
    per block under a ``max_bucket`` quadratic guard.

    ``mode="star"`` (clustering consumers): (block-bucket min, member)
    founder edges via a window min — LINEAR in corpus size, no bucket
    array, no ``max_bucket`` cap (families larger than the guard still
    dedup), same hamming filter on the surviving edges. Pigeonhole
    recall applies per EDGE, not per component: two docs within
    max_hamming that never co-bucket with a within-distance founder can
    end up in different clusters — components-level recall is traded
    for linearity exactly as in ``minhash_candidate_pairs(mode="star")``.
    """
    if mode not in ("all", "star"):
        raise ValueError(f"unknown mode: {mode} ('all' | 'star')")
    blocks = max_hamming + 1
    if bits % blocks:
        raise ValueError(f"bits={bits} must divide into {blocks} blocks")
    width = bits // blocks
    if width < 8:
        raise ValueError("block width < 8 bits — buckets would be quadratic")
    s = simhash(docs, bits, id_col, text_col)

    def block_val(k: int) -> F.Column:
        if width >= 64:
            return F.col("simhash")
        return F.shiftright("simhash", k * width) \
                .bitwiseAND(F.lit((1 << width) - 1))

    blocked = s.select(
        F.col(id_col).alias("id"), "simhash",
        F.posexplode(F.array(*[block_val(k) for k in range(blocks)]))
         .alias("block", "block_val"),
    )
    if mode == "star":
        from pyspark.sql import Window
        w = Window.partitionBy("block", "block_val")
        founder = F.min(F.struct("id", "simhash")).over(w)
        return (
            blocked.withColumn("f", founder)
            .filter(F.col("id") != F.col("f.id"))
            .select(
                F.col("f.id").alias("a"), F.col("id").alias("b"),
                F.bit_count(F.col("f.simhash").bitwiseXOR(F.col("simhash")))
                 .alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )
    buckets = (
        blocked.groupBy("block", "block_val")
        .agg(F.sort_array(F.collect_list(F.struct("id", "simhash")))
              .alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    n = F.size("members")
    pairs = F.flatten(F.transform(
        F.col("members"),
        lambda x, i: F.transform(
            F.slice(F.col("members"), i + 2, n - i - 1),
            lambda y: F.struct(
                x["id"].alias("a"), y["id"].alias("b"),
                x["simhash"].alias("sa"), y["simhash"].alias("sb"),
            ),
        ),
    ))
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a").alias("a"), F.col("p.b").alias("b"),
            F.bit_count(F.col("p.sa").bitwiseXOR(F.col("p.sb")))
             .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       method: str = "lsh",
                       n_tables: int = 6, n_planes: int = 8,
                       max_bucket: int = 1000) -> DataFrame:
    """Embedding-cosine near-duplicates (a < b, cosine >= threshold).

    ``method='lsh'`` (default, the scale path): multi-table sign-bit LSH
    candidate generation + exact cosine verify
    (``similarity.hyperplane_lsh_pairs``) — no quadratic stage; identical
    vectors are always recalled. ``method='brute'``: O(n²) crossJoin —
    the recall reference for tests and tiny corpora ONLY."""
    if method == "lsh":
        from dbpedia_spotlight_spark.operators.similarity import (
            hyperplane_lsh_pairs,
        )
        return hyperplane_lsh_pairs(
            embeddings, threshold=threshold, n_tables=n_tables,
            n_planes=n_planes, id_col=id_col, vec_col=vec_col,
            max_bucket=max_bucket,
        )
    if method != "brute":
        raise ValueError(f"unknown method: {method}")
    dot = F.aggregate(
        F.zip_with(F.col("x.v"), F.col("y.v"), lambda p, q: p * q),
        F.lit(0.0), lambda acc, z: acc + z,
    )
    norm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(f"{side}.v"), lambda p: p * p),
        F.lit(0.0), lambda acc, z: acc + z,
    ))
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return (
        e.alias("x").crossJoin(e.alias("y"))
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"), F.col("y.id").alias("b"),
            (dot / (norm("x") * norm("y"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
