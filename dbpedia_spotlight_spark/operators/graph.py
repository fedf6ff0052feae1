"""Knowledge-graph materialization beyond raw triples (north_rule:
"triple extraction, entity linking, canonicalization, graph
materialize").

From the annotation stream this builds the entity graph:

- ``entity_nodes``: one row per entity with mention/document frequencies
  (the node table of the KG).
- ``cooccurrence_edges``: undirected edges weighted by the number of
  documents in which two entities co-occur — groupBy + in-document pair
  expansion (same single-pass pattern as MinHash bucket pairs: a
  self-join would recompute the annotation pipeline per side).
- ``pagerank``: entity salience over the co-occurrence graph — iterative
  broadcast-join power iteration (deterministic, fixed iteration count).

Scale notes: edges are bounded by Σ_doc C(entities_per_doc, 2); the
``max_entities_per_doc`` cap bounds the quadratic term exactly like the
LSH bucket cap. PageRank iterations shuffle on uri — key cardinality =
|entities| ≪ corpus rows; at Wikipedia scale (~6M entities) each
iteration is a small aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def entity_nodes(links: DataFrame, doc_col: str = "doc_id",
                 uri_col: str = "uri") -> DataFrame:
    """(uri, n_mentions, n_docs) — KG node table."""
    return links.groupBy(uri_col).agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct(doc_col).alias("n_docs"),
    )


def entity_salience(links: DataFrame, doc_col: str = "doc_id",
                    uri_col: str = "uri", begin_col: str = "begin",
                    end_col: str = "end") -> DataFrame:
    """Per-document entity salience: which entities is this page
    ABOUT, vs merely mentioning? The deterministic heuristic core of
    the Dunietz & Gillick 2014 feature set — mention frequency and
    lead position, the two signals their ablation keeps:

        mention_share = n_mentions(d,e) / n_mentions(d,·)
        lead_score    = 1 − first_begin / L        (L = max end in d)
        salience      = mention_share · (1 + lead_score)

    so an entity mentioned often AND first scores up to 2× its share.
    A KG pipeline uses the rank to weight emitted triples (an 'about'
    entity's facts outrank a passing mention's) and to pick page-level
    primary topics.

    Plan: one (doc, uri) aggregate, one doc-keyed aggregate joined
    back (both map-side combinable — a mega-doc sends one row per map
    task per key), one per-doc rank window whose partitions are
    document-sized (bounded by mentions/doc, never corpus-skewed).
    Scores round(9) — the cross-engine ulp contract. Ties break by
    uri so output is layout-independent."""
    per = links.groupBy(doc_col, uri_col).agg(
        F.count("*").alias("n_mentions"),
        F.min(begin_col).alias("first_begin"))
    doc = links.groupBy(doc_col).agg(
        F.count("*").alias("doc_mentions"),
        F.max(end_col).alias("doc_len"))
    share = F.col("n_mentions") / F.col("doc_mentions")
    lead = 1.0 - F.col("first_begin") / F.col("doc_len")
    sal = F.round(share * (1.0 + lead), 9)
    w = Window.partitionBy(doc_col).orderBy(
        F.desc("salience"), F.col(uri_col))
    return (per.join(doc, doc_col)
            .select(doc_col, uri_col, "n_mentions", "first_begin",
                    F.round(share, 9).alias("mention_share"),
                    sal.alias("salience"))
            .withColumn("rank", F.row_number().over(w)))


def cooccurrence_edges(links: DataFrame, doc_col: str = "doc_id",
                       uri_col: str = "uri",
                       max_entities_per_doc: int = 1000) -> DataFrame:
    """(uri_a, uri_b, n_docs) with uri_a < uri_b — undirected co-mention
    edges. One groupBy per doc + pair expansion; docs exceeding
    ``max_entities_per_doc`` distinct entities are dropped (quadratic
    guard, like the LSH bucket cap)."""
    per_doc = (
        links.select(doc_col, uri_col).distinct()
        .groupBy(doc_col)
        .agg(F.sort_array(F.collect_list(uri_col)).alias("uris"))
        .filter((F.size("uris") >= 2)
                & (F.size("uris") <= max_entities_per_doc))
    )
    n = F.size("uris")
    pairs = F.flatten(F.transform(
        F.col("uris"),
        lambda x, i: F.transform(
            F.slice(F.col("uris"), i + 2, n - i - 1),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    return (
        per_doc.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("uri_a"), F.col("p.b").alias("uri_b"))
        .agg(F.count("*").alias("n_docs"))
    )


def pmi_edges(links: DataFrame, doc_col: str = "doc_id",
              uri_col: str = "uri",
              max_entities_per_doc: int = 1000) -> DataFrame:
    """Association-weighted co-mention edges: (uri_a, uri_b, n_ab, n_a,
    n_b, pmi, npmi) where n_ab = documents mentioning both, n_x =
    documents mentioning x, over N = documents with ≥1 linked entity.

        pmi  = ln( n_ab · N / (n_a · n_b) )
        npmi = pmi / −ln(n_ab / N)     (1.0 when n_ab = N)

    Raw co-mention counts rank hub entities first on frequency alone;
    PMI is the standard correction (positive = co-occur more than
    independence predicts), and NPMI bounds it to [−1, 1] so a single
    threshold works across corpus sizes — the edge-significance score a
    KG consumer filters on before clustering or embedding.

    Plan: the pair expansion reuses ``cooccurrence_edges`` (one groupBy
    per doc, quadratic guard); marginals are one countDistinct keyed on
    uri; N rides in as a BROADCAST one-row join (no driver action, no
    global window). The two marginal joins key on uri — entity-sized,
    map-side prunable — so nothing here keys on url/host and corpus
    skew never reaches an exchange. Scores are rounded to 9 decimals
    (the cross-engine ulp contract used by every double-valued oracle)."""
    links_d = links.select(doc_col, uri_col).distinct()
    edges = cooccurrence_edges(links, doc_col, uri_col,
                               max_entities_per_doc)
    marg = links_d.groupBy(uri_col).agg(
        F.countDistinct(doc_col).alias("n"))
    total = links_d.agg(F.countDistinct(doc_col).alias("N"))
    out = (
        edges.withColumnRenamed("n_docs", "n_ab")
        .join(marg.select(F.col(uri_col).alias("uri_a"),
                          F.col("n").alias("n_a")), "uri_a")
        .join(marg.select(F.col(uri_col).alias("uri_b"),
                          F.col("n").alias("n_b")), "uri_b")
        .join(F.broadcast(total))
    )
    pmi = F.log(F.col("n_ab") * F.col("N")
                / (F.col("n_a") * F.col("n_b")))
    npmi = F.when(F.col("n_ab") == F.col("N"), F.lit(1.0)) \
        .otherwise(pmi / -F.log(F.col("n_ab") / F.col("N")))
    return out.select(
        "uri_a", "uri_b", "n_ab", "n_a", "n_b",
        F.round(pmi, 9).alias("pmi"),
        F.round(npmi, 9).alias("npmi"),
    )


def maintain_comention(incidence: DataFrame, edge_counts: DataFrame,
                       delta: DataFrame,
                       max_entities_per_doc: int = 1000
                       ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Counting-IVM maintenance of the co-mention graph over the KG
    delta-log CDC feed (``KGStore.read_log`` rows: url, subj, pred,
    obj, change) — the graph-side twin of
    ``ontology.maintain_entailed_types``. Two counting states:

    - ``incidence``: (url, uri, n_links) — live mention→entity link
      count per page (init: empty frame of that schema);
    - ``edge_counts``: (uri_a, uri_b, n_docs) with uri_a < uri_b —
      the co-mention edge table, kept ≡ ``cooccurrence_edges`` over
      the live incidence (pytest-pinned against full recompute).

    One fold: link rows signed-summed per (url, uri); pages whose
    ENTITY SET actually changed (an incidence count crossed zero —
    not mere mention-count churn) are the only pages whose pair
    contributions are recomputed, old set −1 / new set +1, merged into
    the edge counts. Returns (new_incidence, new_edge_counts,
    edge_delta) where edge_delta is the added/removed EDGES (n_docs
    crossing zero) for a downstream graph-structure change log.

    Cost ∝ delta + touched-pages × entities/page² — never a corpus
    rescan, never keyed on host (the pair keys spread a mega-host's
    pages over the entity-pair space). The same quadratic guard as the
    batch operator applies per page. Callers persist both states per
    generation exactly like EntailStore does its two frames."""
    from dbpedia_spotlight_spark.operators.ontology import _merge_counts
    from dbpedia_spotlight_spark.triples import PRED_IDENT
    sign = (F.when(F.col("change") == "added", F.lit(1))
            .otherwise(F.lit(-1)))
    d = (delta.filter(F.col("pred") == PRED_IDENT)
         .groupBy("url", F.col("obj").alias("uri"))
         .agg(F.sum(sign).cast("long").alias("dw")))
    new_inc, inc_crossing = _merge_counts(incidence, d,
                                          ["url", "uri"], "n_links")
    touched = inc_crossing.select("url").distinct()
    old_pairs = cooccurrence_edges(
        incidence.join(touched, "url", "left_semi"),
        "url", "uri", max_entities_per_doc)
    new_pairs = cooccurrence_edges(
        new_inc.join(touched, "url", "left_semi"),
        "url", "uri", max_entities_per_doc)
    d_edges = (
        new_pairs.select("uri_a", "uri_b", F.col("n_docs").alias("dw"))
        .unionByName(old_pairs.select(
            "uri_a", "uri_b", (-F.col("n_docs")).alias("dw")))
        .groupBy("uri_a", "uri_b")
        .agg(F.sum("dw").cast("long").alias("dw"))
        .filter(F.col("dw") != 0)
    )
    new_edges, edge_delta = _merge_counts(edge_counts, d_edges,
                                          ["uri_a", "uri_b"], "n_docs")
    return new_inc, new_edges, edge_delta


def pagerank(edges: DataFrame, damping: float = 0.85,
             n_iter: int = 10, driver_threshold: int = 100_000,
             checkpoint_dir: str | None = None,
             weight_col: str = "n_docs",
             size_hint: int | None = None) -> DataFrame:
    """PageRank over the undirected co-occurrence graph (each edge
    contributes both directions), deterministic fixed-iteration power
    method. Returns (uri, rank) with Σ rank = 1 (dangling mass
    redistributed uniformly).

    Graphs with < ``driver_threshold`` edges solve driver-side in numpy
    (10 distributed shuffle rounds cost seconds of fixed overhead that
    dwarf a small graph's math — same broadcast-the-small-side logic as
    dimension joins); larger graphs run the distributed join loop.
    ``checkpoint_dir`` switches the per-iteration lineage cut to
    reliable-checkpoint mode (flat storage for large n_iter — see
    operators/iterate.py). ``weight_col`` selects the edge weight —
    raw co-mention counts by default, or an association score such as
    ``pmi_edges``' npmi (weights must be positive: filter npmi > 0
    first, since a negative weight has no random-walk reading).
    ``size_hint`` — a caller-known edge count (exact or lower bound at
    the threshold) — skips the dispatch probe, saving one scheduler
    round-trip per call on hot paths that already counted the edges."""
    n_edges = (size_hint if size_hint is not None
               else edges.limit(driver_threshold).count())
    if n_edges < driver_threshold:
        return _pagerank_driver(edges, damping, n_iter, weight_col)
    # directed edge list both ways (undirected graph: each edge feeds
    # the walk in both directions)
    fwd = edges.select(F.col("uri_a").alias("src"),
                       F.col("uri_b").alias("dst"),
                       F.col(weight_col).alias("w"))
    rev = edges.select(F.col("uri_b").alias("src"),
                       F.col("uri_a").alias("dst"),
                       F.col(weight_col).alias("w"))
    directed = fwd.unionByName(rev)
    out_w = directed.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = (
        directed.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .cache()
    )
    nodes = directed.select(F.col("src").alias("uri")).distinct().cache()
    n_nodes = nodes.count()
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(edges.sparkSession, checkpoint_dir, "pr-ranks")
    ranks = nodes.select("uri", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            norm.join(ranks, norm.src == ranks.uri)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("mass"))
        )
        ranks = ckpt.cut(
            nodes.join(contrib, nodes.uri == contrib.dst, "left")
            .select(
                "uri",
                (F.lit((1.0 - damping) / n_nodes)
                 + F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                .alias("rank"),
            )
            # cut lineage every iteration: without this the logical plan (and
            # Catalyst re-analysis cost) grows with the iteration count —
            # the standard iterative-DataFrame fix
        )
    return ranks


def _pagerank_driver(edges: DataFrame, damping: float, n_iter: int,
                     weight_col: str = "n_docs") -> DataFrame:
    """numpy power iteration for small graphs — identical math to the
    distributed loop (tests pin both against a python oracle)."""
    import numpy as np

    rows = edges.select("uri_a", "uri_b", weight_col).collect()
    nodes = sorted({u for r in rows for u in (r.uri_a, r.uri_b)})
    if not nodes:
        return edges.sparkSession.createDataFrame([], "uri string, rank double")
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    src, dst, w = [], [], []
    for r in rows:
        a, b, ww = idx[r.uri_a], idx[r.uri_b], float(r[weight_col])
        src += [a, b]
        dst += [b, a]
        w += [ww, ww]
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    p = w / out_w[src]
    rank = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        mass = np.zeros(n)
        np.add.at(mass, dst, p * rank[src])
        rank = base + damping * mass
    return edges.sparkSession.createDataFrame(
        [(u, float(rank[idx[u]])) for u in nodes], "uri string, rank double"
    )


def personalized_pagerank(edges: DataFrame, seeds, damping: float = 0.85,
                          n_iter: int = 10, weight_col: str = "n_docs",
                          checkpoint_dir: str | None = None) -> DataFrame:
    """Personalized PageRank: the random walk teleports to the SEED set
    (uniformly) instead of to every node — the 'entities related to X'
    KG query, ranking by walk proximity to the seeds rather than global
    salience. ``seeds`` is a list of uris or a (uri) DataFrame; seeds
    absent from the graph are ignored, an empty effective seed set
    raises. Returns (uri, rank) with Σ rank = 1.

    Same iteration shape as ``pagerank`` (undirected weighted
    expansion, one uri-keyed join + map-side-combinable agg per round,
    lineage cut per round); the teleport vector rides as a column on
    the broadcast-joined node frame, so personalization adds zero extra
    shuffles. Every node in an edge list has degree ≥ 1, so there is
    no dangling mass to redistribute."""
    spark = edges.sparkSession
    seed_df = (seeds.select("uri") if isinstance(seeds, DataFrame)
               else spark.createDataFrame([(s,) for s in seeds],
                                          "uri string")).distinct()
    directed = (
        edges.select(F.col("uri_a").alias("src"),
                     F.col("uri_b").alias("dst"),
                     F.col(weight_col).cast("double").alias("w"))
        .unionByName(edges.select(F.col("uri_b").alias("src"),
                                  F.col("uri_a").alias("dst"),
                                  F.col(weight_col).cast("double")
                                  .alias("w")))
    )
    out_w = directed.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = (directed.join(out_w, "src")
            .select("src", "dst",
                    (F.col("w") / F.col("out_w")).alias("p")).cache())
    nodes = directed.select(F.col("src").alias("uri")).distinct()
    n_seeds = nodes.join(F.broadcast(seed_df), "uri", "left_semi").count()
    if n_seeds == 0:
        raise ValueError("no seed occurs in the graph")
    nodes_t = nodes.join(
        F.broadcast(seed_df.withColumn("t", F.lit(1.0 / n_seeds))),
        "uri", "left").fillna({"t": 0.0}).cache()
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(spark, checkpoint_dir, "ppr-ranks")
    ranks = nodes_t.select("uri", F.col("t").alias("rank"))
    for _ in range(n_iter):
        contrib = (
            norm.join(ranks, norm.src == ranks.uri)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("mass"))
        )
        ranks = ckpt.cut(
            nodes_t.join(contrib, nodes_t.uri == contrib.dst, "left")
            .select(
                "uri",
                ((1.0 - damping) * F.col("t")
                 + damping * F.coalesce("mass", F.lit(0.0))).alias("rank"))
        )
    return ranks


def label_propagation(edges: DataFrame, n_iter: int = 10,
                      weight_col: str = "n_docs",
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Deterministic synchronous label-propagation communities over the
    undirected weighted graph: labels start as each node's own uri;
    every round each node adopts the label with the greatest total
    incident edge weight among its neighbours, ties broken by the
    lexicographically smallest label — both rules deterministic, so
    the result is layout-independent (plain LPA's random tie-breaks are
    not). Fixed ``n_iter`` rounds (synchronous LPA can oscillate on
    bipartite structures; a fixed budget keeps the operator bounded and
    reproducible — the GraphX semantics). Returns (uri, label); nodes
    sharing a label form a community.

    Per round: one edge×label join keyed on uri (|E| rows) + two
    map-side-combinable aggregations keyed on (node, label) then node —
    argmax via min(struct(-weight, label)), no window sort. Lineage is
    cut per round (RoundCheckpointer: localCheckpoint default, reliable
    checkpoint_dir like pagerank/components). Key cardinality is
    entity-sized, never url/host-sized."""
    directed = (
        edges.select(F.col("uri_a").alias("src"),
                     F.col("uri_b").alias("dst"),
                     F.col(weight_col).cast("double").alias("w"))
        .unionByName(edges.select(F.col("uri_b").alias("src"),
                                  F.col("uri_a").alias("dst"),
                                  F.col(weight_col).cast("double")
                                  .alias("w")))
    ).cache()
    nodes = directed.select(F.col("src").alias("uri")).distinct().cache()
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(edges.sparkSession, checkpoint_dir,
                             "lpa-labels")
    labels = nodes.select("uri", F.col("uri").alias("label"))
    for _ in range(n_iter):
        cand = (
            directed.join(labels.withColumnRenamed("uri", "src"), "src")
            .groupBy("dst", "label").agg(F.sum("w").alias("cw"))
        )
        best = (
            cand.groupBy("dst")
            .agg(F.min(F.struct((-F.col("cw")).alias("nw"),
                                F.col("label").alias("label"))).alias("b"))
            .select(F.col("dst").alias("uri"), F.col("b.label").alias("label"))
        )
        labels = ckpt.cut(best)
    return labels


def k_core(edges: DataFrame, k: int, max_rounds: int = 50,
           checkpoint_dir: str | None = None) -> DataFrame:
    """The k-core of the undirected graph: the maximal subgraph in
    which every node has degree ≥ k, found by iterated peeling (drop
    all nodes with degree < k, recompute, repeat until stable — the
    standard dense-subgraph / spam-farm detector over link graphs).
    Returns the surviving (uri_a, uri_b, …) edge rows; ``entity_nodes``
    of the result gives core membership.

    Each round is one degree aggregation (map-side combinable, keyed on
    uri) + two semi-joins filtering the edge list; the edge frame only
    shrinks, and the loop stops at the first round that peels nothing
    (or at ``max_rounds``, the runaway guard — peeling needs at most
    |V| rounds, real graphs far fewer). Lineage is cut per round like
    every iterative operator here."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(edges.sparkSession, checkpoint_dir, "kcore")
    cur = ckpt.cut(edges.filter(F.col("uri_a") != F.col("uri_b")))
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("uri_a").alias("uri"))
            .unionByName(cur.select(F.col("uri_b").alias("uri")))
            .groupBy("uri").agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("uri")
        n_drop = deg.count() - keep.count()
        if n_drop == 0:
            break
        cur = ckpt.cut(
            cur.join(keep.withColumnRenamed("uri", "uri_a"), "uri_a",
                     "left_semi")
            .join(keep.withColumnRenamed("uri", "uri_b"), "uri_b",
                  "left_semi"))
    return cur


def degree_stats(edges: DataFrame, weight_col: str = "n_docs") -> DataFrame:
    """(uri, degree, weighted_degree) over the undirected co-mention
    edge table (uri_a < uri_b canonical). One union + one groupBy on
    uri — key cardinality |V|, map-side combinable."""
    both = edges.select(
        F.col("uri_a").alias("uri"), F.col(weight_col).alias("w"),
    ).unionByName(edges.select(
        F.col("uri_b").alias("uri"), F.col(weight_col).alias("w")))
    return both.groupBy("uri").agg(
        F.count("*").alias("degree"),
        F.sum("w").alias("weighted_degree"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts (uri, n_triangles) over
    the undirected edge table — vertices in no triangle are omitted.

    Degree-ordered enumeration (the MapReduce-era standard for skewed
    graphs): each edge is oriented from its lower-(degree, uri) endpoint
    to the higher one, making the oriented graph a DAG in which every
    triangle appears as exactly one wedge src→mid→dst closed by
    src→dst. Orientation bounds per-vertex out-degree by O(sqrt(|E|))
    on any graph, so the wedge join never explodes on a celebrity
    entity the way id-ordering can — a mega-hub of degree d contributes
    wedges only through its (few) higher-degree neighbors, not C(d, 2)
    pairs. Two shuffles (wedge join on mid, closing semi-join on
    src+dst), both plain equi-joins Catalyst can AQE-split on residual
    skew. The rank is materialized as a zero-padded '%012d|%s' string
    so lexicographic compare equals (degree, uri) tuple compare in both
    Spark and any SQL mirror."""
    e = edges.select("uri_a", "uri_b").distinct()
    deg = degree_stats(e.withColumn("n_docs", F.lit(1))) \
        .select("uri", F.format_string("%012d|%s", "degree", "uri")
                .alias("rank"))
    ranked = (
        e.join(deg.withColumnRenamed("uri", "uri_a")
               .withColumnRenamed("rank", "rank_a"), "uri_a")
        .join(deg.withColumnRenamed("uri", "uri_b")
              .withColumnRenamed("rank", "rank_b"), "uri_b"))
    oriented = ranked.select(
        F.when(F.col("rank_a") < F.col("rank_b"), F.col("uri_a"))
        .otherwise(F.col("uri_b")).alias("src"),
        F.when(F.col("rank_a") < F.col("rank_b"), F.col("uri_b"))
        .otherwise(F.col("uri_a")).alias("dst"),
    )
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closer = oriented.select(F.col("src").alias("a"),
                             F.col("dst").alias("c"))
    tris = wedges.join(closer, ["a", "c"], "left_semi")
    verts = tris.select(F.col("a").alias("uri")) \
        .unionByName(tris.select(F.col("b").alias("uri"))) \
        .unionByName(tris.select(F.col("c").alias("uri")))
    return verts.groupBy("uri").agg(F.count("*").alias("n_triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: 2·tri(v) / (deg(v)·
    (deg(v)−1)) over the undirected co-mention graph; degree-1 vertices
    get 0.0. One broadcast-scale join of the triangle counts onto the
    degree table."""
    deg = degree_stats(edges.select(
        "uri_a", "uri_b").withColumn("n_docs", F.lit(1)))
    tri = triangle_counts(edges)
    d = F.col("degree").cast("double")
    return (deg.join(tri, "uri", "left")
            .select("uri", "degree",
                    F.coalesce("n_triangles", F.lit(0))
                    .alias("n_triangles"),
                    F.when(F.col("degree") >= 2,
                           2.0 * F.coalesce("n_triangles", F.lit(0))
                           / (d * (d - 1.0)))
                    .otherwise(F.lit(0.0)).alias("clustering")))


def link_prediction(edges: DataFrame, top_k: int | None = None,
                    max_degree: int = 1000) -> DataFrame:
    """KG completion: score NON-adjacent entity pairs that share ≥1
    neighbor in the undirected co-mention graph (uri_a < uri_b
    canonical) with the three classical structural predictors —

        common_neighbors(a,b) = |Γ(a) ∩ Γ(b)|
        jaccard(a,b)          = |Γ∩| / |Γ(a) ∪ Γ(b)|
        adamic_adar(a,b)      = Σ_{c ∈ Γ∩} 1 / ln(deg(c))

    (Liben-Nowell & Kleinberg 2003) — the standard "which edge is the
    graph missing" ranking a KG-construction pipeline runs after
    materialization to propose candidate facts for review.

    Scale: pairs are generated per WEDGE CENTER (each shared neighbor c
    emits the pairs of its neighbor list, carrying 1/ln(deg(c))), so
    cost is Σ_c C(deg(c), 2) — quadratic only in per-vertex degree,
    never corpus size. Centers above ``max_degree`` are excluded with
    the same rationale as every bucket cap in the dedup family, and
    with less loss than most: a mega-hub's Adamic-Adar contribution is
    already ≈0 by construction (1/ln d), and the pairs it would
    certify as "related" are exactly the coincidental ones the measure
    discounts. Endpoint degrees (for Jaccard) stay EXACT full degrees.
    One groupBy per center + one pair aggregate + one left_anti against
    the existing edges; every join keys on uri (entity-sized).
    ``top_k`` keeps the k best predictions per uri_a by adamic_adar
    (window over entity-keyed partitions). Scores round(9) — the
    cross-engine ulp contract. Input edge order is canonicalized
    defensively (least/greatest) so the existing-edge anti-join is
    correct for any orientation the caller supplies."""
    e = edges.select(
        F.least("uri_a", "uri_b").alias("uri_a"),
        F.greatest("uri_a", "uri_b").alias("uri_b")).distinct()
    und = e.unionByName(e.select(F.col("uri_b").alias("uri_a"),
                                 F.col("uri_a").alias("uri_b")))
    # ONE adjacency aggregate serves both the wedge centers and the
    # exact endpoint degrees (degree = neighbor-list size) — one fewer
    # intrinsic shuffle than a separate count aggregate, and the three
    # references collapse to a single execution via ReusedExchange
    adj = (und.groupBy(F.col("uri_a").alias("c"))
           .agg(F.sort_array(F.collect_list("uri_b")).alias("nbrs")))
    deg = adj.select(F.col("c").alias("uri"),
                     F.size("nbrs").alias("degree"))
    centers = adj.filter(
        (F.size("nbrs") >= 2) & (F.size("nbrs") <= max_degree))
    n = F.size("nbrs")
    pairs = F.flatten(F.transform(
        F.col("nbrs"),
        lambda x, i: F.transform(
            F.slice(F.col("nbrs"), i + 2, n - i - 1),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    wedge_w = 1.0 / F.log(n.cast("double"))
    scored = (
        centers.select(F.explode(pairs).alias("p"), wedge_w.alias("w"))
        .groupBy(F.col("p.a").alias("uri_a"), F.col("p.b").alias("uri_b"))
        .agg(F.count("*").alias("common_neighbors"),
             F.sum("w").alias("aa_raw"))
        .join(e, ["uri_a", "uri_b"], "left_anti")
        .join(deg.select(F.col("uri").alias("uri_a"),
                         F.col("degree").alias("deg_a")), "uri_a")
        .join(deg.select(F.col("uri").alias("uri_b"),
                         F.col("degree").alias("deg_b")), "uri_b")
    )
    cn = F.col("common_neighbors").cast("double")
    out = scored.select(
        "uri_a", "uri_b", "common_neighbors",
        F.round(cn / (F.col("deg_a") + F.col("deg_b") - cn), 9)
        .alias("jaccard"),
        F.round("aa_raw", 9).alias("adamic_adar"),
    )
    if top_k is not None:
        w = Window.partitionBy("uri_a").orderBy(
            F.desc("adamic_adar"), F.desc("common_neighbors"), "uri_b")
        out = (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= top_k).drop("rk"))
    return out


def hits(edges: DataFrame, n_iter: int = 10,
         driver_threshold: int = 100_000,
         checkpoint_dir: str | None = None,
         weight_col: str = "n_docs",
         size_hint: int | None = None) -> DataFrame:
    """Kleinberg HITS over the DIRECTED host link graph
    (``anchors.host_link_edges``: uri_a links-to uri_b). Returns
    (uri, hub, authority); deterministic fixed-iteration synchronous
    power method, L2-normalized after each half-step:
    a(v) = Σ_{u→v} w·h(u), h(u) = Σ_{u→v} w·a(v).

    Same scale dispatch as ``pagerank``: below ``driver_threshold``
    edges the whole graph solves driver-side in numpy (10 shuffle
    rounds of fixed overhead dwarf a small graph's math); above it, a
    distributed join loop whose per-iteration shuffles key on host —
    cardinality |hosts| ≪ |anchors|. The L2 norm is a one-row aggregate
    crossed back in (broadcast), never a driver action inside the loop.
    Hub and authority are joined into ONE frame before the
    per-iteration lineage cut — a RoundCheckpointer generation may be
    deleted once the next lands, so two frames must never be cut
    through it separately (the surviving frame would read a deleted
    generation). ``size_hint`` as in ``pagerank`` — a caller-known edge
    count skips the dispatch probe's scheduler round-trip."""
    n_edges = (size_hint if size_hint is not None
               else edges.limit(driver_threshold).count())
    if n_edges < driver_threshold:
        return _hits_driver(edges, n_iter, weight_col)
    e = edges.select(F.col("uri_a").alias("src"),
                     F.col("uri_b").alias("dst"),
                     F.col(weight_col).cast("double").alias("w")).cache()
    nodes = (e.select(F.col("src").alias("uri"))
             .unionByName(e.select(F.col("dst").alias("uri")))
             .distinct().cache())
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(edges.sparkSession, checkpoint_dir, "hits")
    scores = nodes.select("uri", F.lit(1.0).alias("hub"),
                          F.lit(0.0).alias("authority"))

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        nrm = raw.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))
                      .alias("_nrm"))
        return raw.crossJoin(F.broadcast(nrm)).select(
            "uri",
            F.when(F.col("_nrm") > 0.0, F.col(col) / F.col("_nrm"))
            .otherwise(F.lit(0.0)).alias(col))

    for _ in range(n_iter):
        a_raw = (e.join(scores.select("uri", "hub"),
                        e.src == F.col("uri"))
                 .groupBy("dst")
                 .agg(F.sum(F.col("w") * F.col("hub")).alias("s")))
        a_raw = nodes.join(a_raw, nodes.uri == a_raw.dst, "left").select(
            "uri", F.coalesce("s", F.lit(0.0)).alias("authority"))
        auth = _normalize(a_raw, "authority")
        h_raw = (e.join(auth, e.dst == auth.uri)
                 .groupBy("src")
                 .agg(F.sum(F.col("w") * F.col("authority")).alias("s")))
        h_raw = nodes.join(h_raw, nodes.uri == h_raw.src, "left").select(
            "uri", F.coalesce("s", F.lit(0.0)).alias("hub"))
        hub = _normalize(h_raw, "hub")
        scores = ckpt.cut(hub.join(auth, "uri")
                          .select("uri", "hub", "authority"))
    return scores


def _hits_driver(edges: DataFrame, n_iter: int,
                 weight_col: str) -> DataFrame:
    """Small-graph HITS: one bounded collect, numpy index-add loop —
    float semantics mirror the distributed form (IEEE mul/add/sqrt/div;
    summation order differs by ~1e-16, absorbed by the contract's
    round(9))."""
    import numpy as np
    import pandas as pd
    pdf = edges.select("uri_a", "uri_b", weight_col).toPandas()
    hosts = sorted(set(pdf["uri_a"]) | set(pdf["uri_b"]))
    idx = {u: i for i, u in enumerate(hosts)}
    src = pdf["uri_a"].map(idx).to_numpy()
    dst = pdf["uri_b"].map(idx).to_numpy()
    w = pdf[weight_col].to_numpy(dtype="float64")
    n = len(hosts)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        np.add.at(a, dst, w * h[src])
        nrm = float(np.sqrt((a * a).sum()))
        a = a / nrm if nrm > 0.0 else a
        h = np.zeros(n)
        np.add.at(h, src, w * a[dst])
        nrm = float(np.sqrt((h * h).sum()))
        h = h / nrm if nrm > 0.0 else h
    out = pd.DataFrame({"uri": hosts, "hub": h, "authority": a})
    return edges.sparkSession.createDataFrame(out)


def shortest_paths(edges: DataFrame, sources: list[str],
                   max_hops: int = 6, directed: bool = False,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """(uri, source, dist) — minimum hop distance from each landmark in
    ``sources`` to every node reachable within ``max_hops`` (the
    GraphFrames ``shortestPaths`` landmark semantics; sources appear at
    dist 0). Unweighted BFS: with unit edge weights, breadth order IS
    distance order, so the first round that reaches a (node, source)
    pair fixes its distance — no relaxation needed.

    Semi-naive expansion: the frontier holds only pairs discovered in
    the previous round; each round is ONE frontier×edges join keyed on
    uri + a min-combine + ONE anti-join against the known set, so total
    work is Σ|frontier|·avg_degree, never rounds×|V|·|S|. State is
    |reached| × |sources| rows — landmark counts are user-chosen and
    small (the GraphFrames contract), so state stays a constant factor
    over the node table. Lineage is cut per round (RoundCheckpointer —
    localCheckpoint default, reliable ``checkpoint_dir`` like
    pagerank/components). Rounds = min(max_hops, graph diameter), a
    property of the graph, not its size.
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    spark = edges.sparkSession
    out_edges = edges.select(F.col("uri_a").alias("src"),
                             F.col("uri_b").alias("dst"))
    if not directed:
        out_edges = out_edges.unionByName(
            edges.select(F.col("uri_b").alias("src"),
                         F.col("uri_a").alias("dst")))
    out_edges = out_edges.distinct().cache()

    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    # one checkpointer per ROLLING state (the components.py
    # discipline): in dir mode each cut deletes its own previous
    # generation, so known and frontier must not share one
    known_ckpt = RoundCheckpointer(spark, checkpoint_dir, "bfs-known")
    front_ckpt = RoundCheckpointer(spark, checkpoint_dir, "bfs-front")

    src_df = spark.createDataFrame(
        [(s,) for s in sorted(set(sources))], "source string")
    known = src_df.select(F.col("source").alias("uri"), "source",
                          F.lit(0).alias("dist"))
    frontier = known
    for hop in range(1, max_hops + 1):
        reached = (frontier
                   .join(out_edges,
                         frontier["uri"] == out_edges["src"])
                   .select(F.col("dst").alias("uri"), "source",
                           F.lit(hop).alias("dist"))
                   .dropDuplicates(["uri", "source"]))
        fresh = reached.join(known, ["uri", "source"], "left_anti")
        fresh = front_ckpt.cut(fresh)
        if fresh.isEmpty():
            break
        known = known_ckpt.cut(known.unionByName(fresh))
        frontier = fresh
    return known


def harmonic_centrality(edges: DataFrame, sources: list[str],
                        max_hops: int = 6, directed: bool = False,
                        checkpoint_dir: str | None = None) -> DataFrame:
    """(uri, n_reached, harmonic) — landmark-sampled harmonic
    centrality: C(v) = Σ_{s ∈ sources, d(v,s) > 0} 1/d(v,s), the
    Eppstein–Wang estimator shape with the harmonic variant of
    Boldi–Vigna (robust to disconnection: unreachable landmarks
    contribute 0 instead of poisoning the mean like classic closeness).
    Nodes unreachable from EVERY landmark don't appear (their estimate
    is 0 and the node table is the caller's to left-join).

    Cross-engine determinism: Σ 1/d over doubles is order-sensitive at
    the ulp, so the sum is computed EXACTLY — each term is L/d with
    L = lcm(1..max_hops) (d divides L, so L/d is an exact integer),
    summed as BIGINT, and ``harmonic`` is the ONE final double division
    num/L. Any engine, any layout, any aggregation order produces the
    same bits.

    Scale: one multi-source BFS (see ``shortest_paths`` — semi-naive,
    rounds = diameter) + one node-keyed aggregation. Landmark count is
    the user's accuracy/cost dial; state is |reached| × |sources|.
    """
    import math
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    L = math.lcm(*range(1, max_hops + 1))
    sp = shortest_paths(edges, sources, max_hops=max_hops,
                        directed=directed, checkpoint_dir=checkpoint_dir)
    num = F.sum((F.lit(L) / F.col("dist")).cast("long"))
    return (sp.filter(F.col("dist") > 0)
            .groupBy("uri")
            .agg(F.count("*").cast("int").alias("n_reached"),
                 num.alias("h_num"))
            .select("uri", "n_reached",
                    (F.col("h_num") / F.lit(float(L)))
                    .alias("harmonic")))


def ball_registers(edges: DataFrame, max_hops: int = 4,
                   p: int = 8, directed: bool = False,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """HyperBall register tables (Boldi–Vigna 2013): for every node v
    and radius t ∈ [0, max_hops], the HyperLogLog registers of the
    ball B(v, t) = {u : d(v, u) <= t}. Returns (uri, t, bucket, rho).

    The whole algorithm is the sketches.py merge law applied per hop:
    registers(B(v, t)) = max over {registers(B(v, t-1))} ∪
    {registers(B(w, t-1)) : (v, w) ∈ E} — HLL registers of a set are
    the item-wise max, so merging neighbor registers IS the ball
    union, exactly (no approximation enters until the final
    estimator). Each hop is therefore ONE edge-keyed join + ONE
    (uri, bucket) max-combine — map-side combinable, idempotent under
    re-delivered partitions, and the per-node state is <= 2^p register
    rows regardless of graph size (the entire point of HyperBall:
    neighborhood functions of billion-node graphs in O(|V|·2^p)
    memory). Registers are MONOTONE (rows only appear, rho only
    grows), so convergence is detected by the (count, sum(rho))
    checksum pair going flat — saturated graphs stop early and later
    radii reuse the converged frame. Lineage is cut per hop
    (RoundCheckpointer, reliable-dir mode like pagerank/components).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    from dbpedia_spotlight_spark.operators.sketches import hll_sketch
    spark = edges.sparkSession
    out_edges = edges.select(F.col("uri_a").alias("src"),
                             F.col("uri_b").alias("dst"))
    if not directed:
        out_edges = out_edges.unionByName(
            edges.select(F.col("uri_b").alias("src"),
                         F.col("uri_a").alias("dst")))
    out_edges = out_edges.distinct().cache()
    nodes = (out_edges.select(F.col("src").alias("uri"))
             .unionByName(out_edges.select(F.col("dst").alias("uri")))
             .distinct())
    # t=0 ball is {v}: the single-item sketch of the node's own uri
    reg = hll_sketch(nodes.withColumn("item", F.col("uri")),
                     ["uri"], "item", p=p)

    from dbpedia_spotlight_spark.operators.iterate import (
        RoundCheckpointer)
    ckpt = RoundCheckpointer(spark, checkpoint_dir, "hyperball")
    reg = ckpt.cut(reg)
    frames = [reg.withColumn("t", F.lit(0))]
    check = reg.agg(F.count("*"), F.sum("rho")).first()
    for t in range(1, max_hops + 1):
        neigh = (out_edges.join(reg, out_edges["dst"] == reg["uri"])
                 .select(F.col("src").alias("uri"), "bucket", "rho"))
        reg = (reg.unionByName(neigh)
               .groupBy("uri", "bucket")
               .agg(F.max("rho").alias("rho")))
        reg = ckpt.cut(reg)
        frames.append(reg.withColumn("t", F.lit(t)))
        nxt = reg.agg(F.count("*"), F.sum("rho")).first()
        if nxt == check:          # monotone ⇒ flat checksum = converged:
            # remaining radii are byte-identical; emit them from the
            # converged frame without further joins
            frames += [reg.withColumn("t", F.lit(r))
                       for r in range(t + 1, max_hops + 1)]
            break
        check = nxt
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("uri", "t", "bucket", "rho")


def ball_sizes(edges: DataFrame, max_hops: int = 4, p: int = 8,
               directed: bool = False,
               checkpoint_dir: str | None = None) -> DataFrame:
    """(uri, t, est) — estimated |B(v, t)| per node and radius, the
    per-node read of :func:`ball_registers` through the sketches.py
    integer-exact estimator (DECIMAL(38,0) register sum, ONE double
    division, 4dp round — the cross-engine float contract, so a DuckDB
    replay value-hashes identically)."""
    from dbpedia_spotlight_spark.operators.sketches import hll_count
    regs = ball_registers(edges, max_hops=max_hops, p=p,
                          directed=directed,
                          checkpoint_dir=checkpoint_dir)
    return hll_count(regs, ["uri", "t"], p=p)


def neighborhood_function(edges: DataFrame, max_hops: int = 4,
                          p: int = 8, directed: bool = False,
                          checkpoint_dir: str | None = None
                          ) -> DataFrame:
    """(t, nf) — the graph's neighborhood function N(t) = Σ_v |B(v,t)|
    (estimated): the number of node pairs within distance t, the curve
    HyperBall exists to compute. Distance distribution, average
    distance, and effective diameter are all reads of this <=
    (max_hops+1)-row frame."""
    bs = ball_sizes(edges, max_hops=max_hops, p=p, directed=directed,
                    checkpoint_dir=checkpoint_dir)
    # est is 4dp-rounded, so summing as DECIMAL(38,4) is EXACT in any
    # aggregation order (a double sum would drift at the ulp across
    # layouts); one final cast back to double
    return (bs.groupBy("t")
            .agg(F.sum(F.col("est").cast("decimal(38,4)"))
                 .cast("double").alias("nf"))
            .orderBy("t"))


def effective_diameter(edges: DataFrame, alpha: float = 0.9,
                       max_hops: int = 8, p: int = 8,
                       directed: bool = False,
                       checkpoint_dir: str | None = None) -> float:
    """Smallest t whose neighborhood function reaches ``alpha`` of its
    max_hops plateau, with the standard linear interpolation between
    the bracketing radii (Palmer et al. / HyperBall convention). One
    bounded collect of <= max_hops+1 rows."""
    rows = sorted(neighborhood_function(
        edges, max_hops=max_hops, p=p, directed=directed,
        checkpoint_dir=checkpoint_dir).collect())
    target = alpha * rows[-1][1]
    prev_t, prev_nf = rows[0]
    if prev_nf >= target:
        return float(prev_t)
    for t, nf in rows[1:]:
        if nf >= target:
            return prev_t + (target - prev_nf) / (nf - prev_nf)
        prev_t, prev_nf = t, nf
    return float(rows[-1][0])


_DYAD = 1 << 30  # the repo-standard dyadic grid (operators/kgembed.py)


def betweenness_centrality(edges: DataFrame, sources: list[str],
                           max_hops: int = 6, directed: bool = False,
                           checkpoint_dir: str | None = None
                           ) -> DataFrame:
    """(uri, betweenness) — Brandes betweenness from the given source
    set (Brandes 2001; with a landmark sample this is the
    Brandes–Pich 2007 estimator, with sources = all nodes it is exact;
    undirected totals are halved per the standard convention).

    Level-synchronous formulation, both passes bounded by the hop
    budget: the FORWARD pass is the shortest_paths semi-naive BFS
    carrying the path-count σ (an exact BIGINT — at hop h a fresh
    node's σ is the sum of its hop-(h-1) neighbors' σ, one
    frontier×edges join + one sum-combine per hop); the BACKWARD pass
    walks levels deepest-first, at each level joining the level-(d+1)
    dependency frame δ back across the predecessor edges:
    δ(v) += Σ_w σ(v)/σ(w) · (1 + δ(w)).

    Cross-engine / layout determinism: every per-edge backward term is
    quantized to the dyadic 2^-30 grid (the kgembed device) BEFORE
    summation — same-grid dyadic sums are exact in ANY aggregation
    order, so the result is bit-identical across partitionings and
    across a relational (DuckDB) replay of the same arithmetic.

    Scale: rounds = min(diameter, max_hops) in each direction; state
    is |reached|×|sources| rows (landmark counts are the user's
    accuracy dial); per-level backward joins touch only that level's
    predecessor edges. Lineage cut per round (RoundCheckpointer).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    out_edges = edges.select(F.col("uri_a").alias("src"),
                             F.col("uri_b").alias("dst"))
    if not directed:
        out_edges = out_edges.unionByName(
            edges.select(F.col("uri_b").alias("src"),
                         F.col("uri_a").alias("dst")))
    out_edges = out_edges.distinct().cache()

    from dbpedia_spotlight_spark.operators.iterate import (
        RoundCheckpointer)
    known_ckpt = RoundCheckpointer(spark, checkpoint_dir, "btw-known")
    front_ckpt = RoundCheckpointer(spark, checkpoint_dir, "btw-front")
    delta_ckpt = RoundCheckpointer(spark, checkpoint_dir, "btw-delta")

    src_df = spark.createDataFrame(
        [(s,) for s in sorted(set(sources))], "source string")
    known = src_df.select(F.col("source").alias("uri"), "source",
                          F.lit(0).alias("dist"),
                          F.lit(1).cast("long").alias("sigma"))
    frontier = known
    deepest = 0
    for hop in range(1, max_hops + 1):
        reached = (frontier
                   .join(out_edges,
                         frontier["uri"] == out_edges["src"])
                   .groupBy(F.col("dst").alias("uri"), "source")
                   .agg(F.sum("sigma").alias("sigma"))
                   .withColumn("dist", F.lit(hop)))
        fresh = (reached.join(known.select("uri", "source"),
                              ["uri", "source"], "left_anti")
                 .select("uri", "source", "dist", "sigma"))
        fresh = front_ckpt.cut(fresh)
        if fresh.isEmpty():
            break
        deepest = hop
        known = known_ckpt.cut(known.unionByName(fresh))
        frontier = fresh

    known = known.cache()
    # backward: δ at the deepest level is 0; walk levels up, each step
    # one predecessor-edge join (pred pair = edge (v,w) with
    # dist(w) = dist(v)+1 under the same source)
    q = lambda c: (F.floor(c * F.lit(float(_DYAD)))  # noqa: E731
                   / F.lit(float(_DYAD)))
    acc = None   # (uri, source, betw) accumulated dependency rows
    delta = None  # δ frame for the CURRENT level d+1
    for d in range(deepest - 1, -1, -1):
        upper = known.filter(F.col("dist") == d + 1) \
            .select(F.col("uri").alias("w"), "source",
                    F.col("sigma").alias("sigma_w"))
        if delta is not None:
            upper = upper.join(
                delta.select(F.col("uri").alias("w"), "source",
                             F.col("delta").alias("d_w")),
                ["w", "source"], "left") \
                .withColumn("d_w", F.coalesce("d_w", F.lit(0.0)))
        else:
            upper = upper.withColumn("d_w", F.lit(0.0))
        lower = known.filter(F.col("dist") == d) \
            .select(F.col("uri").alias("v"), "source",
                    F.col("sigma").alias("sigma_v"))
        contrib = (lower
                   .join(out_edges, lower["v"] == out_edges["src"])
                   .join(upper, (F.col("dst") == upper["w"])
                         & (lower["source"] == upper["source"]))
                   .select(lower["v"], lower["source"],
                           q((F.col("sigma_v").cast("double")
                              / F.col("sigma_w"))
                             * (F.lit(1.0) + F.col("d_w")))
                           .alias("term")))
        delta = (contrib.groupBy(F.col("v").alias("uri"), "source")
                 .agg(F.sum("term").alias("delta")))
        delta = delta_ckpt.cut(delta)
        # Brandes accumulates delta_s(v) for v != s — per (source)
        # pair, NOT v-not-any-source: a landmark t still collects
        # dependency from the other sources' passes
        lvl = delta.filter(F.col("uri") != F.col("source"))
        acc = lvl if acc is None else acc.unionByName(lvl)
    if acc is None:
        return spark.createDataFrame([], "uri string, betweenness double")
    scale = 2.0 if not directed else 1.0
    return (acc.groupBy("uri")
            .agg((F.sum("delta") / F.lit(scale)).alias("betweenness")))


def edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support (uri_a, uri_b, support) over the
    undirected canonical (uri_a < uri_b) edge table — the edge-level
    twin of :func:`triangle_counts`, and the inner aggregate of truss
    decomposition. Edges in no triangle are omitted (join back with
    ``coalesce(support, 0)`` for totals).

    Same degree-ordered wedge enumeration as ``triangle_counts`` (each
    triangle materializes exactly once, per-vertex out-degree bounded
    by O(sqrt(|E|)) under the orientation), but the closing join is an
    INNER join so each found triangle can be charged back to its three
    canonical edges — one generate + one groupBy on the edge key, both
    map-side combinable."""
    e = edges.select("uri_a", "uri_b").distinct()
    deg = degree_stats(e.withColumn("n_docs", F.lit(1))) \
        .select("uri", F.format_string("%012d|%s", "degree", "uri")
                .alias("rank"))
    ranked = (
        e.join(deg.withColumnRenamed("uri", "uri_a")
               .withColumnRenamed("rank", "rank_a"), "uri_a")
        .join(deg.withColumnRenamed("uri", "uri_b")
              .withColumnRenamed("rank", "rank_b"), "uri_b"))
    oriented = ranked.select(
        F.when(F.col("rank_a") < F.col("rank_b"), F.col("uri_a"))
        .otherwise(F.col("uri_b")).alias("src"),
        F.when(F.col("rank_a") < F.col("rank_b"), F.col("uri_b"))
        .otherwise(F.col("uri_a")).alias("dst"),
    )
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closer = oriented.select(F.col("src").alias("a"),
                             F.col("dst").alias("c"))
    tris = wedges.join(closer, ["a", "c"])  # inner: keep the rows
    sides = (
        tris.select(F.least("a", "b").alias("uri_a"),
                    F.greatest("a", "b").alias("uri_b"))
        .unionByName(tris.select(F.least("b", "c").alias("uri_a"),
                                 F.greatest("b", "c").alias("uri_b")))
        .unionByName(tris.select(F.least("a", "c").alias("uri_a"),
                                 F.greatest("a", "c").alias("uri_b"))))
    return sides.groupBy("uri_a", "uri_b") \
        .agg(F.count("*").cast("int").alias("support"))


def k_truss(edges: DataFrame, k: int, max_rounds: int = 50,
            checkpoint_dir: str | None = None) -> DataFrame:
    """The k-truss of the undirected graph: the maximal subgraph in
    which every edge participates in ≥ k−2 triangles (Cohen 2008) —
    the edge-level strengthening of :func:`k_core` (every k-truss is
    inside the (k−1)-core) and the standard "cohesive relation
    backbone" extractor a KG pipeline runs to separate systematically
    co-asserted entity pairs from incidental co-mentions.

    Iterated peeling: recompute :func:`edge_support`, drop edges below
    k−2, repeat until stable. Each round is the support enumeration
    (two equi-join shuffles, skew-bounded by the degree orientation)
    plus one semi-join filter; the edge frame only shrinks and lineage
    is cut per round. Peeling needs at most |E| rounds; real graphs
    converge in a handful. Returns the surviving canonical edge rows
    with their final ``support``; ``k < 3`` returns the input with
    support attached (every edge trivially satisfies support ≥ 0 —
    same convention as the k-core guard)."""
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(edges.sparkSession, checkpoint_dir, "ktruss")
    cur = ckpt.cut(edges.select("uri_a", "uri_b").distinct()
                   .filter(F.col("uri_a") != F.col("uri_b")))
    if k < 3:
        sup = edge_support(cur)
        return (cur.join(sup, ["uri_a", "uri_b"], "left")
                .select("uri_a", "uri_b",
                        F.coalesce("support", F.lit(0)).cast("int")
                        .alias("support")))
    prev = cur.count()
    for _ in range(max_rounds):
        # cut BEFORE counting: the checkpoint materializes the wedge
        # enumeration once, so the count and the next round both read
        # the stored frame instead of re-running the triangle joins
        sup = ckpt.cut(edge_support(cur).filter(F.col("support")
                                                >= k - 2))
        n_keep = sup.count()
        if n_keep == prev:
            return sup
        cur = sup.select("uri_a", "uri_b")
        prev = n_keep
        if n_keep == 0:
            break
    return (cur.join(edge_support(cur), ["uri_a", "uri_b"], "left")
            .select("uri_a", "uri_b",
                    F.coalesce("support", F.lit(0)).cast("int")
                    .alias("support")))


def coreness(edges: DataFrame, max_rounds: int = 50,
             checkpoint_dir: str | None = None) -> DataFrame:
    """Full core-number decomposition (uri, core) of the undirected
    graph — every vertex's largest k such that it survives in the
    k-core — via the distributed H-operator iteration (Lü, Zhou,
    Zhang & Stanley 2016): start from c₀(v) = deg(v) and repeatedly
    set c(v) to the H-index of its neighbors' current values; the
    fixpoint is exactly the coreness vector. Monotone non-increasing
    per vertex, so the loop stops at the first unchanged round.

    Skew-shape: the per-vertex H-index is computed from the *histogram*
    of neighbor values, not the neighbor list — counts per (uri, value)
    first (map-side combinable, collapses a celebrity entity's millions
    of neighbors into ≤ max-core distinct rows), then a running total
    over values descending and H = max(min(cum, value)). The window
    partition is bounded by the value range (≤ max degree after round
    0, ≤ max core after round 1), never by degree, so no single key
    can dominate a partition the way a neighbor-list sort would."""
    from dbpedia_spotlight_spark.operators.iterate import RoundCheckpointer
    ckpt = RoundCheckpointer(edges.sparkSession, checkpoint_dir, "coreness")
    e = edges.select("uri_a", "uri_b").distinct() \
        .filter(F.col("uri_a") != F.col("uri_b"))
    directed = e.select(F.col("uri_a").alias("uri"),
                        F.col("uri_b").alias("nbr")) \
        .unionByName(e.select(F.col("uri_b").alias("uri"),
                              F.col("uri_a").alias("nbr")))
    directed = ckpt.cut(directed)
    cur = ckpt.cut(directed.groupBy("uri")
                   .agg(F.count("*").cast("int").alias("core")))
    w = Window.partitionBy("uri").orderBy(F.col("core").desc())
    for _ in range(max_rounds):
        nv = directed.join(
            cur.select(F.col("uri").alias("nbr"), "core"), "nbr")
        hist = nv.groupBy("uri", "core").agg(F.count("*").alias("n"))
        nxt = (hist.withColumn("cum", F.sum("n").over(w))
               .groupBy("uri")
               .agg(F.max(F.least(F.col("cum"), F.col("core").cast("long")))
                    .cast("int").alias("core")))
        nxt = ckpt.cut(nxt)
        changed = (nxt.join(cur.withColumnRenamed("core", "prev"), "uri")
                   .filter(F.col("core") != F.col("prev")).count())
        cur = nxt
        if changed == 0:
            break
    return cur


def community_modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity contributions per community over the
    undirected simple graph: Q_c = e_c/m − (d_c/2m)², where e_c =
    intra-community edges, d_c = summed member degrees, m = |E|
    (Newman & Girvan 2004) — the standard quality score a pipeline
    attaches to :func:`label_propagation` output before trusting its
    communities for entity grouping. Σ Q_c over the result is the
    graph's modularity.

    ``labels`` is (uri, label). Cost: two broadcast-scale joins of the
    label table onto the edge list + two |V|-keyed aggregates — the
    label table is node-sized, never corpus-sized. All inputs are
    exact integers; per-community Q is two double divisions and one
    multiply, rounded to the repo's 9dp contract."""
    e = edges.select("uri_a", "uri_b").distinct() \
        .filter(F.col("uri_a") != F.col("uri_b"))
    m = e.count()
    la = labels.select(F.col("uri").alias("uri_a"),
                       F.col("label").alias("label_a"))
    lb = labels.select(F.col("uri").alias("uri_b"),
                       F.col("label").alias("label_b"))
    tagged = e.join(F.broadcast(la), "uri_a").join(F.broadcast(lb), "uri_b")
    internal = (tagged.filter(F.col("label_a") == F.col("label_b"))
                .groupBy(F.col("label_a").alias("label"))
                .agg(F.count("*").alias("n_internal")))
    deg = degree_stats(e.withColumn("n_docs", F.lit(1)))
    degs = (deg.join(F.broadcast(labels), "uri")
            .groupBy("label")
            .agg(F.sum("degree").alias("total_degree")))
    dd = F.col("total_degree").cast("double")
    md = float(m)
    return (degs.join(internal, "label", "left")
            .select("label",
                    F.coalesce("n_internal", F.lit(0)).cast("long")
                    .alias("n_internal"),
                    F.col("total_degree").cast("long")
                    .alias("total_degree"),
                    F.round(
                        F.coalesce("n_internal", F.lit(0)).cast("double")
                        / F.lit(md)
                        - (dd / F.lit(2.0 * md)) * (dd / F.lit(2.0 * md)),
                        9).alias("q_contrib")))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree-assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over every directed realization of
    the undirected edge set — one row (n_pairs, assortativity).
    Positive ⇒ hubs link to hubs (social-network shape), negative ⇒
    hubs link to leaves (web/KG star shape); the KG-health metric that
    says whether the co-mention graph grew celebrity-star structure.

    Exactness device: degrees are integers, so all five correlation
    sums (Σx, Σxy, Σx², and n) accumulate in DECIMAL(38,0) (HUGEINT in
    the DuckDB oracle) — exact at any scale and aggregation order; the
    final r is formed from THREE double casts and one division,
    rounded 9dp. Symmetry makes Σx = Σy and Σx² = Σy², so the
    denominator needs no sqrt — it IS the x-variance term."""
    e = edges.select("uri_a", "uri_b").distinct() \
        .filter(F.col("uri_a") != F.col("uri_b"))
    deg = degree_stats(e.withColumn("n_docs", F.lit(1))) \
        .select("uri", "degree")
    both = (e.join(deg.withColumnRenamed("uri", "uri_a")
                   .withColumnRenamed("degree", "deg_a"), "uri_a")
            .join(deg.withColumnRenamed("uri", "uri_b")
                  .withColumnRenamed("degree", "deg_b"), "uri_b"))
    pairs = both.select(F.col("deg_a").alias("x"),
                        F.col("deg_b").alias("y")) \
        .unionByName(both.select(F.col("deg_b").alias("x"),
                                 F.col("deg_a").alias("y")))
    d38 = "decimal(38,0)"
    agg = pairs.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    # zero degree variance (regular graph) ⇒ r is undefined; return
    # NULL rather than tripping ANSI division-by-zero
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.when(den != 0,
               F.round(num.cast("double") / den.cast("double"), 9))
        .alias("assortativity"))


def wl_colors(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """1-dimensional Weisfeiler-Leman color refinement over the
    undirected graph — (uri, color) after ``rounds`` refinements, plus
    the structural-role signature use: vertices sharing a color are
    1-WL-equivalent (same degree, same multiset of neighbor roles,
    recursively), the classic template/boilerplate-subgraph detector
    and entity role-discovery primitive over a KG.

    Skew-shape: the neighbor-multiset hash is an order-independent SUM
    of neighbor color hashes mod 2^60 — map-side combinable, so a
    celebrity node's million-neighbor multiset collapses before the
    shuffle instead of materializing a sorted list (the textbook
    sorted-concatenation form is O(degree log degree) per node per
    round AND un-combinable). Each round is one join + one aggregate,
    both keyed on uri; color₀ = md5(degree). Deterministic and
    engine-replayable (md5 + integer arithmetic only)."""
    from dbpedia_spotlight_spark.operators.dedup import md5_long
    e = edges.select("uri_a", "uri_b").distinct() \
        .filter(F.col("uri_a") != F.col("uri_b"))
    directed = e.select(F.col("uri_a").alias("uri"),
                        F.col("uri_b").alias("nbr")) \
        .unionByName(e.select(F.col("uri_b").alias("uri"),
                              F.col("uri_a").alias("nbr"))) \
        .localCheckpoint(eager=True)
    mod = F.lit(1 << 60).cast("decimal(38,0)")
    cur = (directed.groupBy("uri").agg(F.count("*").alias("deg"))
           .select("uri", md5_long(F.col("deg").cast("string"))
                   .alias("color")))
    for _ in range(rounds):
        nb = directed.join(
            cur.select(F.col("uri").alias("nbr"), "color"), "nbr")
        ms = (nb.groupBy("uri")
              .agg((F.sum(F.col("color").cast("decimal(38,0)")) % mod)
                   .cast("long").alias("msum")))
        cur = (cur.join(ms, "uri")
               .select("uri",
                       md5_long(F.concat_ws(
                           "#", F.col("color").cast("string"),
                           F.col("msum").cast("string")))
                       .alias("color"))
               .localCheckpoint(eager=True))
    return cur


def wl_signature(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Whole-graph 1-WL signature: the color histogram after
    refinement, one row per color class (color, n). Two graphs with
    different signatures are certifiably non-isomorphic; equal
    signatures mean 1-WL cannot tell them apart. One extra |V|-keyed
    count over :func:`wl_colors`."""
    return (wl_colors(edges, rounds)
            .groupBy("color").agg(F.count("*").alias("n")))


def seeded_label_propagation(edges: DataFrame, seeds: DataFrame,
                             n_iter: int = 4,
                             weight_col: str = "n_docs") -> DataFrame:
    """Semi-supervised label propagation with CLAMPED seeds (Zhu &
    Ghahramani 2002) — the KG type-propagation primitive: a handful of
    curated (uri, label) seeds diffuse over the weighted co-mention
    graph, seeds re-clamp to probability 1 each round, and every
    reachable node ends with a label distribution. Distinct from
    :func:`label_propagation` (community detection, hard labels, no
    clamping). Returns (uri, label, p, rank) — full distribution with
    a deterministic argmax rank (p desc, label asc).

    Cross-engine device: after each round's normalize, probabilities
    re-quantize to the dyadic 2^-30 grid — products with integer edge
    weights then land on the same grid and their sums are exact in any
    order (the kgembed discipline), so an unrolled SQL replay is
    value-identical. State is (reachable nodes × |labels|) rows; each
    round is one edge join + two node-keyed aggregates."""
    from pyspark.sql import Window
    q = lambda c: F.floor(c * F.lit(float(1 << 30))  # noqa: E731
                          + F.lit(0.5)) / F.lit(float(1 << 30))
    # weights stay double (a fractional-similarity weight column —
    # pmi/npmi — must not truncate to 0); each w·p product re-quantizes
    # to the grid BEFORE summation (the kgembed product discipline), so
    # sums remain exact in any order for integer AND fractional weights
    # (for integer w the product is already on the grid — quant is the
    # identity, keeping the unrolled oracle unchanged)
    e = edges.filter(F.col("uri_a") != F.col("uri_b")).select(
        "uri_a", "uri_b", F.col(weight_col).cast("double").alias("w"))
    und = e.select(F.col("uri_a").alias("src"),
                   F.col("uri_b").alias("dst"), "w") \
        .unionByName(e.select(F.col("uri_b").alias("src"),
                              F.col("uri_a").alias("dst"), "w")) \
        .localCheckpoint(eager=True)
    sd = seeds.select("uri", "label",
                      F.lit(1.0).alias("p")).localCheckpoint(eager=True)
    state = sd
    for _ in range(n_iter):
        contrib = (und.join(state.withColumnRenamed("uri", "src"), "src")
                   .groupBy(F.col("dst").alias("uri"), "label")
                   .agg(F.sum(q(F.col("w") * F.col("p"))).alias("s")))
        tot = contrib.groupBy("uri").agg(F.sum("s").alias("t"))
        diffused = (contrib.join(tot, "uri")
                    .select("uri", "label",
                            q(F.col("s") / F.col("t")).alias("p")))
        state = (diffused.join(sd.select("uri"), "uri", "left_anti")
                 .unionByName(sd)
                 .localCheckpoint(eager=True))
    w_rank = Window.partitionBy("uri").orderBy(F.col("p").desc(), "label")
    return state.withColumn(
        "rank", F.row_number().over(w_rank).cast("int"))
