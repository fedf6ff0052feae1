"""Distributed logistic regression (operators/classifier.py) against a
from-scratch numpy twin running the identical arithmetic
(standardize → zero-init full-batch GD), plus learnability and
determinism pins. The DuckDB pairing lives in queries.py
(`quality_logreg` registry entry, unrolled MATERIALIZED CTEs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators import classifier as C


def _numpy_fit(X: np.ndarray, y: np.ndarray, iters: int, lr: float,
               l2: float = 0.0):
    m = X.mean(axis=0)
    var = (X * X).mean(axis=0) - m * m
    s = np.sqrt(np.maximum(var, 1e-12))
    Z = (X - m) / s
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = Z.T @ (p - y) / len(y)
        b -= lr * float((p - y).mean())
        w -= lr * (g + l2 * w)
    return w, b, m, s


@pytest.fixture(scope="module")
def frame(spark):
    rows = []
    for i in range(200):
        # deterministic pseudo-features with real structure: f0 drives
        # the label, f1 is correlated noise, f2 is pure hash noise
        f0 = (i * 37 % 100) / 100.0
        f1 = f0 * 0.5 + ((i * 17) % 10) / 20.0
        f2 = ((i * 101) % 13) / 13.0
        rows.append((i, f0, f1, f2, 1.0 if f0 > 0.5 else 0.0))
    return spark.createDataFrame(rows, ["id", "f0", "f1", "f2", "y"])


def test_fit_matches_numpy_twin(frame):
    model = C.fit_logreg(frame, ["f0", "f1", "f2"], "y",
                         iters=30, lr=0.5)
    pdf = frame.toPandas().sort_values("id")
    X = pdf[["f0", "f1", "f2"]].to_numpy()
    y = pdf["y"].to_numpy()
    w, b, m, s = _numpy_fit(X, y, iters=30, lr=0.5)
    assert np.allclose(model["weights"], w, atol=1e-9)
    assert abs(model["bias"] - b) < 1e-9
    for j, c in enumerate(["f0", "f1", "f2"]):
        assert abs(model["stats"][c][0] - m[j]) < 1e-12
        assert abs(model["stats"][c][1] - s[j]) < 1e-12


def test_fit_l2_matches_numpy_twin(frame):
    model = C.fit_logreg(frame, ["f0", "f1", "f2"], "y",
                         iters=15, lr=0.3, l2=0.1)
    pdf = frame.toPandas().sort_values("id")
    w, b, _, _ = _numpy_fit(pdf[["f0", "f1", "f2"]].to_numpy(),
                            pdf["y"].to_numpy(), 15, 0.3, l2=0.1)
    assert np.allclose(model["weights"], w, atol=1e-9)
    assert abs(model["bias"] - b) < 1e-9


def test_score_learns_separable_rule(frame):
    """With enough steps the learned score reproduces the generating
    threshold rule on a separable feature."""
    model = C.fit_logreg(frame, ["f0", "f1", "f2"], "y",
                         iters=300, lr=1.0)
    scored = C.score_logreg(frame, model, ["f0", "f1", "f2"])
    rows = scored.select("y", "p").collect()
    acc = sum((r.p >= 0.5) == (r.y == 1.0) for r in rows) / len(rows)
    assert acc >= 0.95
    # the driving feature dominates the learned weights
    w = dict(zip(["f0", "f1", "f2"], model["weights"]))
    assert w["f0"] > abs(w["f2"]) * 3


def test_fit_deterministic(frame):
    a = C.fit_logreg(frame, ["f0", "f1", "f2"], "y", iters=10, lr=0.5)
    b = C.fit_logreg(frame, ["f0", "f1", "f2"], "y", iters=10, lr=0.5)
    assert a["weights"] == b["weights"] and a["bias"] == b["bias"]


def test_zero_variance_feature_guarded(spark):
    df = spark.createDataFrame(
        [(i, 1.0, (i % 2) * 1.0, float(i % 2)) for i in range(40)],
        ["id", "const", "f", "y"])
    model = C.fit_logreg(df, ["const", "f"], "y", iters=20, lr=0.5)
    assert all(np.isfinite(model["weights"])) and np.isfinite(model["bias"])
    # the constant feature standardizes to 0 everywhere → weight stays 0
    assert model["weights"][0] == 0.0


def test_integer_feature_no_overflow(spark):
    """An IntegerType feature large enough that x*x overflows 32-bit
    (>= 46341) must standardize correctly — the E[x^2] aggregate casts
    to double BEFORE squaring."""
    rows = [(i, 50_000 + i * 1000, float(i % 2)) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "big", "y"]) \
        .withColumn("big", F.col("big").cast("int"))
    model = C.fit_logreg(df, ["big"], "y", iters=5, lr=0.5)
    pdf = df.toPandas().sort_values("id")
    w, b, m, s = _numpy_fit(pdf[["big"]].to_numpy(dtype=float),
                            pdf["y"].to_numpy(), 5, 0.5)
    assert abs(model["stats"]["big"][0] - m[0]) < 1e-9
    assert abs(model["stats"]["big"][1] - s[0]) / s[0] < 1e-12
    assert np.allclose(model["weights"], w, atol=1e-9)


def test_quality_classifier_composition(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = C.quality_classifier(docs, (F.col("quality") >= 0.6),
                               iters=20, lr=0.5)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r.p <= 1.0 for r in rows)
    assert all(r.keep == (r.p >= 0.5) for r in rows)
