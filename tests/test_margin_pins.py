"""Cross-engine float-parity safety margins (ADVICE r3, similarity).

The Spark side computes sign-bit LSH projections and Lloyd/IVF
assignments as numpy matmuls; the DuckDB oracle folds element-wise,
left-to-right. The two summation orders differ by ~1e-16 relative, so a
sign bit (or an argmin pick) can only disagree when the projection (or
the best-vs-second centroid distance gap) is inside that noise band.
The oracle parity therefore rests on an EMPIRICAL property of the
driver's fixed embedding tables: every such margin is far above noise.
These tests pin that property directly — if a future corpus change
erodes it, the failure happens here with a clear message instead of as
an inscrutable value-hash mismatch in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from dbpedia_spotlight_spark.operators.similarity import (
    _hyperplanes, ivf_training_sample,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
# noise is ~1e-13 absolute on unit-ish vectors; 1e-9 leaves 4 decades
SAFETY_BOUND = 1e-9


def _emb_matrix(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    return np.asarray([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"]])


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lsh_sign_projection_margins(sf_dir):
    """Every |v·h| over every registry LSH config clears the bound:
    ann_lsh (1 table × 6 planes, seed 0) and near_dup_embeddings /
    ann buckets (6 tables × 8 planes, seeds 0..5; superset covers
    lsh_bucket's default 8-plane table too)."""
    X = _emb_matrix(sf_dir)
    dim = X.shape[1]
    P = np.vstack(
        [np.asarray(_hyperplanes(dim, 6))]
        + [np.asarray(_hyperplanes(dim, 8, seed=t)) for t in range(6)]
    )
    margin = np.abs(X @ P.T).min()
    assert margin > SAFETY_BOUND, (
        f"min |projection| {margin:.3e} at {sf_dir} is inside the "
        f"cross-engine noise guard band — a sign bit could flip between "
        f"the numpy matmul and the DuckDB fold")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ivf_lloyd_and_assignment_margins(spark, sf_dir):
    """Replay the exact trainer (same sample, same init, 5 iterations,
    n_clusters=16 — the q_ann_ivf registry config) and pin, at every
    Lloyd iteration AND for the final full-corpus assignment, the gap
    between best and second-best centroid distance. Bitwise-identical
    centroid pairs (duplicated init rows / empty clusters) tie at gap 0
    in BOTH engines and break by cluster index identically, so they are
    excluded."""
    n_clusters, n_iter = 16, 5
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    X = ivf_training_sample(emb)

    def min_live_gap(V: np.ndarray, C: np.ndarray) -> float:
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        near2 = np.argsort(d, axis=1, kind="stable")[:, :2]
        ds = np.take_along_axis(d, near2, axis=1)
        dup = np.all(C[near2[:, 0]] == C[near2[:, 1]], axis=1)
        gaps = (ds[:, 1] - ds[:, 0])[~dup]
        return float(gaps.min()) if gaps.size else np.inf

    idx = [i * (len(X) - 1) // max(n_clusters - 1, 1)
           for i in range(n_clusters)]
    C = X[idx].copy()
    for it in range(n_iter):
        gap = min_live_gap(X, C)
        assert gap > SAFETY_BOUND, (
            f"Lloyd iter {it} at {sf_dir}: argmin gap {gap:.3e} inside "
            f"the noise guard band")
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)

    full = _emb_matrix(sf_dir)
    gap = min_live_gap(full, C)
    assert gap > SAFETY_BOUND, (
        f"full-corpus IVF assignment at {sf_dir}: argmin gap {gap:.3e} "
        f"inside the noise guard band")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_softmax_score_rounding_margins(spark, sf_dir):
    """The annotate contract rounds similarity/pct2 to 9dp before the
    oracle hash; cross-engine (and numpy-vs-math.exp path) noise is
    ~1e-15, so a value sitting within ~1e-15 of a 0.5e-9 rounding
    midpoint could round differently between engines. Pin that no score
    on the driver corpora sits closer than 1e-6 grid cells (1e-15 in
    score units) to a rounding midpoint — same loud-failure contract as
    the LSH/IVF margin pins."""
    import numpy as np
    from dbpedia_spotlight_spark import queries as Q
    from dbpedia_spotlight_spark.pipeline import PipelineConfig, annotate

    ann = annotate(
        spark, Q._web_pages_from_docs(spark, sf_dir),
        Q._static_model_bc(spark),
        PipelineConfig(disambiguator="generative", confidence=0.0,
                       support=0),
    ).select("similarity_score", "percentage_of_second_rank").toPandas()
    vals = np.concatenate([
        ann["similarity_score"].to_numpy(np.float64),
        ann["percentage_of_second_rank"].to_numpy(np.float64),
    ])
    frac = np.abs(np.mod(vals * 1e9, 1.0) - 0.5)   # distance to midpoint
    margin = float(frac.min())
    assert margin > 1e-6, (
        f"a score at {sf_dir} sits {margin:.2e} grid cells from a 9dp "
        f"rounding midpoint — inside cross-engine exp/sum noise")
