"""Distributed connected components over near-duplicate pair graphs —
the dedup-RESOLUTION stage of a training-data pipeline: candidate pairs
(MinHash-LSH / SimHash / embedding-LSH) only say "a ~ b"; dropping
duplicates needs the transitive closure (clusters) and one canonical
keeper per cluster.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round a node takes the minimum label among itself
and its neighbors. Labels are monotonically non-increasing, so the
fixpoint (= min id of the connected component) is reached after
``diameter`` rounds. For web-dedup graphs the clusters are shallow
(near-dup clusters of re-crawls/mirrors — diameter a handful), so the
round count is small and each round is ONE join + ONE map-side-combinable
min-aggregate — no quadratic stage, no driver-side graph.

Scale notes (100 TB / 10^12 docs):
- State per round = (id, label) pairs — 16 bytes/doc, partitioned by id.
- ``localCheckpoint(eager=True)`` per round truncates lineage (same
  iterative-DataFrame fix as ``graph.pagerank``). PySpark has no public
  API to unpersist a localCheckpoint, so up to ``max_iter`` label-frame
  generations (16 bytes/doc each) sit in executor storage until the
  session drops them — bounded and fine for shallow dedup graphs. Deep
  chains / long iterations: pass ``checkpoint_dir`` to switch to the
  reliable-checkpoint mode (``operators/iterate.py``) — parquet
  generation per round with the previous generation deleted once the
  new one is durable, so storage stays flat at ~2 generations and the
  cut survives executor loss.
- Early-stop costs one count-like action per round on the checkpointed
  frame; label sums are NOT used (monotone long sums can overflow at
  10^12 ids) — convergence is detected with an explicit changed-flag
  aggregate.
- For adversarial deep chains, switch to large-star/small-star
  (O(log n) rounds); min-label is preferred here because each round is
  cheaper and dedup graphs are shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         id_col: str = "id", max_iter: int = 20,
                         early_stop: bool = True,
                         require_converged: bool = False,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """(id, component) for every node; component = min node id reachable
    through ``pairs`` (columns a, b — undirected). Isolated nodes keep
    their own id. Deterministic and partition-layout independent: every
    step is a min over a set.

    With ``early_stop`` the loop exits once a round changes no label;
    because post-convergence rounds are no-ops, a fixed-``max_iter``
    replay (the DuckDB oracle form) produces identical output whenever
    the graph converges within ``max_iter``. ``max_iter`` is a runaway
    bound, not a tuning knob — min labels travel one hop per round, so
    it must exceed the component diameter; ``require_converged=True``
    raises instead of silently returning partial components when the
    bound is hit mid-propagation. ``checkpoint_dir`` switches the
    per-round lineage cut to reliable-checkpoint mode (flat storage for
    deep iteration counts — see operators/iterate.py).
    """
    if require_converged and not early_stop:
        raise ValueError(
            "require_converged needs early_stop=True — convergence is "
            "detected from the per-round changed-label count, which the "
            "fixed-iteration mode never computes")
    ckpt = RoundCheckpointer(nodes.sparkSession, checkpoint_dir, "cc-labels")
    edge_ckpt = RoundCheckpointer(nodes.sparkSession, checkpoint_dir,
                                  "cc-edges")
    edges = edge_ckpt.cut(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        # materialize ONCE: edges are re-joined every round, and `pairs`
        # is typically the whole MinHash/SimHash pipeline — without this
        # each round would re-execute that upstream from the scan
    )
    labels = nodes.select(F.col(id_col).alias("id"),
                          F.col(id_col).alias("comp"))
    for _ in range(max_iter):
        nb = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src").agg(F.min("comp").alias("nb_comp"))
        )
        stepped = (
            labels.join(nb, labels.id == nb.src, "left")
            .select(
                "id",
                F.least(F.col("comp"),
                        F.coalesce("nb_comp", F.col("comp"))).alias("comp"),
                (F.coalesce("nb_comp", F.col("comp"))
                 < F.col("comp")).alias("changed"),
            )
        )
        stepped = ckpt.cut(stepped)
        new_labels = stepped.select("id", "comp")
        if early_stop:
            n_changed = stepped.agg(
                F.sum(F.col("changed").cast("long")).alias("n")
            ).first()["n"]
            labels = new_labels
            if not n_changed:
                break
        else:
            labels = new_labels
    else:
        if early_stop and require_converged:
            raise RuntimeError(
                f"connected_components did not converge within "
                f"max_iter={max_iter} rounds — component diameter exceeds "
                "the bound; raise max_iter (or switch to a "
                "large-star/small-star variant for deep chains)")
    return labels


def dedup_keep(nodes: DataFrame, pairs: DataFrame, id_col: str = "id",
               max_iter: int = 20,
               checkpoint_dir: str | None = None) -> DataFrame:
    """(id, component, keep): canonical-keeper resolution — keep the
    minimum id of each duplicate cluster, drop the rest. The downstream
    corpus filter is ``WHERE keep``."""
    labels = connected_components(nodes, pairs, id_col, max_iter,
                                  checkpoint_dir=checkpoint_dir)
    return labels.withColumn("keep", F.col("id") == F.col("comp"))


def maintain_components(labels: DataFrame, pairs: DataFrame,
                        pair_delta: DataFrame, max_iter: int = 20,
                        checkpoint_dir: str | None = None,
                        ) -> tuple[DataFrame, DataFrame]:
    """Incremental connected-components maintenance — the resolution
    member of the IVM family, composing with ``er.maintain_sameas``'s
    edge delta so the canonical-entity map follows each crawl batch
    without a graph-scale relabeling.

    ``labels`` is a previous ``connected_components`` output (id,
    comp); ``pairs`` is the POST-delta undirected edge set (a, b);
    ``pair_delta`` carries the edge changes (a, b, change ∈
    added/removed — extra columns ignored).

    Exactness (pytest-pinned against full recompute): only components
    containing a delta endpoint can change — an added edge merges the
    two (touched) endpoint components, a removed edge can only split
    the (touched) component it lived in. The RECOMPUTE ZONE is the
    full membership of every touched component plus brand-new delta
    endpoints; no post-delta edge crosses the zone boundary (a
    pre-existing edge lies inside one old component — all-in or
    all-out; an added edge has both endpoints touched), so re-running
    min-label propagation on the zone's induced subgraph reproduces
    exactly the global answer for zone nodes, and every other label is
    provably unchanged. Cost ∝ affected-component size, never |graph|.

    Returns ``(new_labels, label_delta)`` — label_delta is the (id,
    comp, old_comp) rows whose assignment changed (old_comp NULL for
    nodes first seen in this delta)."""
    touched = (pair_delta.select(F.col("a").alias("id"))
               .unionByName(pair_delta.select(F.col("b").alias("id")))
               .distinct())
    comps = (labels.join(touched, "id", "left_semi")
             .select("comp").distinct())
    zone = (labels.join(comps, "comp", "left_semi").select("id")
            .unionByName(touched).distinct()
            .localCheckpoint(eager=True))
    zone_pairs = pairs.join(zone.withColumnRenamed("id", "a"),
                            "a", "left_semi")
    new_zone = connected_components(zone, zone_pairs, max_iter=max_iter,
                                    checkpoint_dir=checkpoint_dir)
    kept = labels.join(zone, "id", "left_anti")
    new_labels = kept.unionByName(new_zone)
    delta = (new_zone
             .join(labels.select("id", F.col("comp").alias("old_comp")),
                   "id", "left")
             .filter(~F.col("comp").eqNullSafe(F.col("old_comp")))
             .select("id", "comp", "old_comp"))
    return new_labels, delta
