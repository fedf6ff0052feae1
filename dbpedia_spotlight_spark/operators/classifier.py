"""Model-based quality classification (the CCNet / DCLM pattern: a
small linear classifier over cheap per-document features decides what
enters the training corpus, replacing hand-tuned threshold stacks).

Distributed logistic regression by full-batch gradient descent where
**each GD step is ONE map-side-combinable DataFrame aggregate**: the
executors reduce per-row gradient contributions feature-wise (a
``d+1``-double partial per task), the driver holds only the weight
vector, and the feature frame is computed once and cached. No MLlib,
no UDFs — the per-row score ``sigmoid(w·x + b)`` is a plain literal
expression rebuilt per iteration, so the whole step runs in
whole-stage codegen.

Scale shape: cost = ``iters`` passes over a (id, d-double) projection
— at 100 TB you fit on a deterministic ``hash_sample`` slice (a linear
probe saturates long before 10^12 rows) and ``score_logreg`` the full
corpus in a single zero-shuffle pass. Everything is layout-independent
except double-addition order inside the gradient reduce; the engine
contract is the repo-wide 9 dp rounding applied by consumers (same
contract as pagerank/PPR — see ``queries.sql_quality_logreg``'s
unrolled-CTE replay).

Determinism: no RNG anywhere — weights start at zero, standardization
uses the explicit ``E[x²]−E[x]²`` population form (identical formula
replayed by the oracle), and labels/features are pure column
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-12  # zero-variance guard, mirrored verbatim in the SQL oracle


def standardize_stats(df: DataFrame,
                      feature_cols: list[str]) -> dict[str, tuple[float,
                                                                  float]]:
    """Per-feature (mean, std) in ONE aggregate; population variance via
    the explicit E[x²]−E[x]² form so the SQL oracle can replay the exact
    same arithmetic (builtin stddev implementations differ)."""
    aggs = []
    for c in feature_cols:
        # cast BEFORE squaring: an IntegerType feature (e.g. a length)
        # would overflow 32-bit silently at x >= 46341 in Spark's
        # non-ANSI int multiply, corrupting the variance
        x = F.col(c).cast("double")
        aggs.append(F.avg(x).alias(f"m_{c}"))
        aggs.append(F.avg(x * x).alias(f"s_{c}"))
    row = df.agg(*aggs).first()
    out = {}
    for c in feature_cols:
        m = float(row[f"m_{c}"])
        var = float(row[f"s_{c}"]) - m * m
        out[c] = (m, max(var, _EPS) ** 0.5)
    return out


def _z(feature_cols: list[str], stats: dict, weights: list[float],
       bias: float) -> Column:
    """The linear score w·x_std + b as one literal expression (weights
    are plain Python floats — each iteration compiles a fresh
    whole-stage-codegen projection, no UDF, no broadcast needed)."""
    z = F.lit(float(bias))
    for c, w in zip(feature_cols, weights):
        m, s = stats[c]
        z = z + F.lit(float(w)) * ((F.col(c) - F.lit(m)) / F.lit(s))
    return z


def fit_logreg(df: DataFrame, feature_cols: list[str], label_col: str,
               iters: int = 20, lr: float = 0.5,
               l2: float = 0.0) -> dict:
    """Full-batch GD, zero-initialized. Returns
    ``{"weights": [...], "bias": b, "stats": {col: (mean, std)}}``.
    One cached projection of (features, label); per iteration ONE
    aggregate computing avg(x_j·(p−y)) per feature plus the bias term —
    the executors never see the weight vector except as literals."""
    feats = df.select(*feature_cols,
                      F.col(label_col).cast("double").alias("_y")).cache()
    try:
        stats = standardize_stats(feats, feature_cols)
        w = [0.0] * len(feature_cols)
        b = 0.0
        for _ in range(iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(feature_cols, stats,
                                                     w, b)))
            resid = p - F.col("_y")
            aggs = [F.avg(resid).alias("g_b")]
            for c in feature_cols:
                m, s = stats[c]
                x = (F.col(c) - F.lit(m)) / F.lit(s)
                aggs.append(F.avg(x * resid).alias(f"g_{c}"))
            g = feats.agg(*aggs).first()
            b -= lr * float(g["g_b"])
            w = [wj - lr * (float(g[f"g_{c}"]) + l2 * wj)
                 for wj, c in zip(w, feature_cols)]
    finally:
        feats.unpersist()
    return {"weights": w, "bias": b, "stats": stats}


def score_logreg(df: DataFrame, model: dict, feature_cols: list[str],
                 out_col: str = "p") -> DataFrame:
    """Adds ``sigmoid(w·x_std + b)`` — a single zero-shuffle projection
    over the full corpus (the cheap pass that runs at 10^12 rows)."""
    z = _z(feature_cols, model["stats"], model["weights"], model["bias"])
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


QUALITY_FEATURES = ["n_chars", "n_tokens", "mean_token_len",
                    "stopword_ratio", "digit_ratio", "upper_ratio"]


def quality_classifier(docs: DataFrame, label: Column,
                       iters: int = 20, lr: float = 0.5,
                       keep_threshold: float = 0.5) -> DataFrame:
    """The composed CCNet-style gate: cheap per-doc features
    (``textstats.quality_scores``) → logistic fit against a weak-
    supervision ``label`` column expression (CCNet uses "looks like
    Wikipedia"; any deterministic proxy works — the expression may
    reference the quality_scores feature columns and the input's
    non-text metadata columns; the raw text column is NOT joined back,
    so text-derived labels must be precomputed onto ``docs`` first) →
    per-doc probability + keep flag. Returns (doc_id, p, keep)."""
    from dbpedia_spotlight_spark.operators.textstats import quality_scores
    qs = quality_scores(docs)
    # feature columns win on name collisions (e.g. the input table may
    # carry its own n_chars); the docs side contributes only doc_id +
    # its unshadowed metadata columns for the label expression
    side = docs.select("doc_id", *[c for c in docs.columns
                                   if c not in ("doc_id", "text")
                                   and c not in qs.columns])
    feats = qs.join(side, "doc_id").withColumn("_lbl", label)
    model = fit_logreg(feats, QUALITY_FEATURES, "_lbl",
                       iters=iters, lr=lr)
    return (score_logreg(feats, model, QUALITY_FEATURES)
            .select("doc_id", "p",
                    (F.col("p") >= keep_threshold).alias("keep")))
