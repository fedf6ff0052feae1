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


def strongly_connected_components(nodes: DataFrame, edges: DataFrame,
                                  id_col: str = "id",
                                  max_phases: int = 30,
                                  max_iter: int = 30,
                                  checkpoint_dir: str | None = None,
                                  ) -> DataFrame:
    """(id, scc) over a DIRECTED edge table (src, dst) — scc = the MAX
    member id of each strongly connected component (deterministic,
    layout-independent). The directed twin of
    :func:`connected_components`, for the directed graphs this engine
    materializes: redirect chains (K1 breaks 2-cycles ad hoc; SCC finds
    every cycle family), host link graphs (crawl spider traps = large
    SCCs), and owl:TransitiveProperty closures (an SCC collapses to an
    equivalence class before the closure, bounding prp-trp self-loop
    blowup).

    Algorithm — the distributed coloring method (Orzan 2004; Slota et
    al. 2014), phases over the remaining active subgraph:

    1. TRIM: a node with no in-edge or no out-edge is a singleton SCC
       — resolved immediately (repeatedly, to the phase's fixpoint:
       chains and DAG tails drain in diameter-many cheap rounds).
    2. COLOR: propagate ``color(v) = max(v, colors of in-neighbors)``
       to fixpoint — color(v) = the max id that reaches v. Roots are
       nodes with ``color(v) == v``; a root is provably the max member
       of its SCC (any larger same-SCC member would recolor it).
    3. BACKWARD REACH: within one color class, mark nodes that reach
       their root along same-color edges (mark propagation on reversed
       edges) — marked nodes ARE the root's SCC (they reach the root;
       the root reaches them because it colored them). Assign and
       remove; at least the global max id's SCC resolves every phase,
       so the loop terminates in ≤ #SCC phases (far fewer with trim).

    Every step is a join + map-side-combinable aggregate keyed on node
    ids; per-phase state is (id, color/mark) pairs cut by the same
    RoundCheckpointer discipline as connected_components (pass
    ``checkpoint_dir`` for the reliable flat-storage mode). Raises if
    an inner fixpoint fails to converge within ``max_iter`` (a partial
    coloring would be silently wrong, unlike cc's partial labels).

    The phase loop is inherently data-dependent, so this operator is
    pytest-verified against a Tarjan reference (no SQL oracle — the
    same verification class as BPE training / checkpoint-resume)."""
    # one RoundCheckpointer per ROLLING state: each keeps only its
    # latest generation (reliable mode deletes the predecessor), so a
    # frame may be re-cut only when nothing still reads its old
    # generation — resolved nodes therefore accumulate in a single
    # rolling `done` frame, never a list of past generations
    spark = nodes.sparkSession
    ck = {n: RoundCheckpointer(spark, checkpoint_dir, f"scc-{n}")
          for n in ("act", "e", "col", "ce", "mark", "done")}
    active = ck["act"].cut(
        nodes.select(F.col(id_col).alias("id")).distinct())
    e = ck["e"].cut(edges.select("src", "dst")
                    .filter(F.col("src") != F.col("dst")).distinct())
    done = ck["done"].cut(
        nodes.select(F.col(id_col).alias("id"),
                     F.col(id_col).alias("scc")).limit(0))

    def _restrict(edges_df: DataFrame, act: DataFrame) -> DataFrame:
        return (edges_df
                .join(act.withColumnRenamed("id", "src"),
                      "src", "left_semi")
                .join(act.withColumnRenamed("id", "dst"),
                      "dst", "left_semi"))

    for _ in range(max_phases):
        if active.isEmpty():
            break
        # 1. trim to fixpoint
        while True:
            srcs = e.select(F.col("src").alias("id")).distinct()
            dsts = e.select(F.col("dst").alias("id")).distinct()
            keep = active.join(srcs, "id", "left_semi") \
                         .join(dsts, "id", "left_semi")
            trimmed = active.join(keep, "id", "left_anti")
            if trimmed.isEmpty():
                break
            done = ck["done"].cut(done.unionByName(
                trimmed.select("id", F.col("id").alias("scc"))))
            active = ck["act"].cut(keep)
            e = ck["e"].cut(_restrict(e, active))
        if active.isEmpty():
            break
        # 2. forward max-coloring to fixpoint
        colors = ck["col"].cut(
            active.select("id", F.col("id").alias("color")))
        for _i in range(max_iter):
            nb = (e.join(colors, e.src == colors.id)
                  .groupBy(F.col("dst").alias("id"))
                  .agg(F.max("color").alias("nb_color")))
            stepped = (colors.join(nb, "id", "left")
                       .select("id",
                               F.greatest(
                                   F.col("color"),
                                   F.coalesce("nb_color", F.col("color")))
                               .alias("color"),
                               (F.coalesce("nb_color", F.col("color"))
                                > F.col("color")).alias("changed")))
            stepped = ck["col"].cut(stepped)
            n_changed = stepped.agg(
                F.sum(F.col("changed").cast("long")).alias("n")
            ).first()["n"]
            colors = stepped.select("id", "color")
            if not n_changed:
                break
        else:
            raise RuntimeError(
                f"scc coloring did not converge within max_iter="
                f"{max_iter} rounds — raise max_iter (graph diameter "
                "exceeds the bound)")
        # 3. backward same-color reach from each root
        marked = ck["mark"].cut(
            colors.filter(F.col("id") == F.col("color")).select("id"))
        ce = ck["ce"].cut(
            e.join(colors.select(F.col("id").alias("src"),
                                 F.col("color").alias("c_src")), "src")
            .join(colors.select(F.col("id").alias("dst"),
                                F.col("color").alias("c_dst")), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst"))
        for _i in range(max_iter):
            new = (ce.join(marked.withColumnRenamed("id", "dst"),
                           "dst", "left_semi")
                   .select(F.col("src").alias("id")).distinct()
                   .join(marked, "id", "left_anti"))
            if new.isEmpty():
                break
            marked = ck["mark"].cut(marked.unionByName(new))
        else:
            raise RuntimeError(
                f"scc backward reach did not converge within max_iter="
                f"{max_iter} rounds — raise max_iter")
        resolved = colors.join(marked, "id", "left_semi") \
            .select("id", F.col("color").alias("scc"))
        done = ck["done"].cut(done.unionByName(resolved))
        active = ck["act"].cut(active.join(resolved, "id", "left_anti"))
        e = ck["e"].cut(_restrict(e, active))
    else:
        if not active.isEmpty():
            raise RuntimeError(
                f"scc did not resolve every node within max_phases="
                f"{max_phases} — raise max_phases (many interlocking "
                "SCC families)")
    return done


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
