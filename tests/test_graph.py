"""KG graph materialization: nodes, co-occurrence edges, PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def links(spark):
    # doc 1: A,B,C ; doc 2: A,B ; doc 3: A (B mentioned twice in doc 1)
    rows = [(1, "A"), (1, "B"), (1, "B"), (1, "C"),
            (2, "A"), (2, "B"), (3, "A")]
    return spark.createDataFrame(rows, "doc_id long, uri string")


def test_entity_nodes(spark, links):
    from dbpedia_spotlight_spark.operators.graph import entity_nodes
    got = {(r.uri, r.n_mentions, r.n_docs)
           for r in entity_nodes(links).collect()}
    assert got == {("A", 3, 3), ("B", 3, 2), ("C", 1, 1)}


def test_cooccurrence_edges(spark, links):
    from dbpedia_spotlight_spark.operators.graph import cooccurrence_edges
    got = {(r.uri_a, r.uri_b, r.n_docs)
           for r in cooccurrence_edges(links).collect()}
    assert got == {("A", "B", 2), ("A", "C", 1), ("B", "C", 1)}


def test_cooccurrence_cap_drops_megadoc(spark, links):
    from dbpedia_spotlight_spark.operators.graph import cooccurrence_edges
    got = cooccurrence_edges(links, max_entities_per_doc=2).collect()
    # doc 1 has 3 distinct entities → dropped; only doc 2's (A,B) remains
    assert {(r.uri_a, r.uri_b, r.n_docs) for r in got} == {("A", "B", 1)}


def test_pagerank_symmetric_pair(spark):
    from dbpedia_spotlight_spark.operators.graph import pagerank
    edges = spark.createDataFrame([("A", "B", 3)],
                                  "uri_a string, uri_b string, n_docs long")
    r = {row.uri: row.rank for row in pagerank(edges).collect()}
    assert abs(r["A"] - 0.5) < 1e-9 and abs(r["B"] - 0.5) < 1e-9


def test_pagerank_star_center_dominates_and_sums_to_one(spark):
    from dbpedia_spotlight_spark.operators.graph import pagerank
    edges = spark.createDataFrame(
        [("HUB", x, 1) for x in ("L1", "L2", "L3", "L4")],
        "uri_a string, uri_b string, n_docs long")
    rows = pagerank(edges, n_iter=15).collect()
    r = {row.uri: row.rank for row in rows}
    assert abs(sum(r.values()) - 1.0) < 1e-6
    assert all(r["HUB"] > r[f"L{i}"] for i in range(1, 5))
    # leaves are symmetric
    leaves = [r[f"L{i}"] for i in range(1, 5)]
    assert max(leaves) - min(leaves) < 1e-9


@pytest.mark.parametrize("threshold", [100_000, 0])
def test_pagerank_matches_power_iteration_oracle(spark, threshold):
    """Small weighted graph vs a plain-python power iteration — both the
    driver-side fast path (threshold high) and the distributed join loop
    (threshold 0) must match it."""
    from dbpedia_spotlight_spark.operators.graph import pagerank
    E = [("A", "B", 2), ("B", "C", 1), ("A", "C", 5), ("C", "D", 1)]
    edges = spark.createDataFrame(E, "uri_a string, uri_b string, n_docs long")
    got = {r.uri: r.rank for r in
           pagerank(edges, n_iter=12, driver_threshold=threshold).collect()}

    nodes = sorted({u for a, b, _ in E for u in (a, b)})
    out = {u: 0.0 for u in nodes}
    adj = []
    for a, b, w in E:
        adj += [(a, b, float(w)), (b, a, float(w))]
    for s, _, w in adj:
        out[s] += w
    d, n = 0.85, len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(12):
        nxt = {u: (1 - d) / n for u in nodes}
        for s, t, w in adj:
            nxt[t] += d * rank[s] * (w / out[s])
        rank = nxt
    for u in nodes:
        assert abs(got[u] - rank[u]) < 1e-9, (u, got[u], rank[u])


def test_pagerank_and_hits_size_hint_skips_probe(spark):
    """A caller-supplied size_hint drives the driver/distributed dispatch
    without the limit(N).count() probe, and both dispatch choices agree
    on the same graph (hint below threshold -> driver numpy path; hint
    at threshold -> distributed loop)."""
    from dbpedia_spotlight_spark.operators.graph import hits, pagerank
    E = [("A", "B", 2), ("B", "C", 1), ("A", "C", 5)]
    edges = spark.createDataFrame(E, "uri_a string, uri_b string, n_docs long")
    drv = {r.uri: r.rank for r in
           pagerank(edges, n_iter=8, size_hint=len(E)).collect()}
    dist = {r.uri: r.rank for r in
            pagerank(edges, n_iter=8, driver_threshold=3,
                     size_hint=3).collect()}
    assert set(drv) == set(dist)
    for u in drv:
        assert abs(drv[u] - dist[u]) < 1e-9
    h_drv = {r.uri: (r.hub, r.authority) for r in
             hits(edges, n_iter=8, size_hint=len(E)).collect()}
    h_dist = {r.uri: (r.hub, r.authority) for r in
              hits(edges, n_iter=8, driver_threshold=3,
                   size_hint=3).collect()}
    assert set(h_drv) == set(h_dist)
    for u in h_drv:
        assert abs(h_drv[u][0] - h_dist[u][0]) < 1e-9
        assert abs(h_drv[u][1] - h_dist[u][1]) < 1e-9


def test_kg_stats_report(spark):
    from dbpedia_spotlight_spark.triples import kg_stats
    t = spark.createDataFrame(
        [("s1", "p", "o1"), ("s1", "p", "o2"), ("s1", "p", "o2"),
         ("s2", "p", "o1"), ("s1", "q", "o1")],
        "subj string, pred string, obj string")
    got = {r.pred: r.asDict() for r in kg_stats(t).collect()}
    assert got["p"] == {"pred": "p", "n_triples": 3, "n_subjects": 2,
                        "n_objects": 2, "max_out_degree": 2,
                        "avg_out_degree": 1.5}
    assert got["q"]["n_triples"] == 1 and got["q"]["avg_out_degree"] == 1.0


def test_match_triples_and_entity_neighbors(spark):
    """KG read path on a planted snapshot: pattern lookups push equality
    filters; BFS hops are min shares-a-page distance with seeds at 0."""
    from dbpedia_spotlight_spark.triples import (
        PRED_IDENT, entity_neighbors, match_triples,
    )
    u = lambda i: f"https://h.example/p{i}"  # noqa: E731
    rows = [
        # p1 links A,B ; p2 links B,C ; p3 links C,D ; p4 links E (island)
        (f"{u(1)}#char=0,1", PRED_IDENT, "dbr:A"),
        (f"{u(1)}#char=2,3", PRED_IDENT, "dbr:B"),
        (f"{u(2)}#char=0,1", PRED_IDENT, "dbr:B"),
        (f"{u(2)}#char=2,3", PRED_IDENT, "dbr:C"),
        (f"{u(3)}#char=0,1", PRED_IDENT, "dbr:C"),
        (f"{u(3)}#char=2,3", PRED_IDENT, "dbr:D"),
        (f"{u(4)}#char=0,1", PRED_IDENT, "dbr:E"),
        # anchor triples must be ignored by the incidence walk
        (f"{u(1)}#char=0,1", "nif:anchorOf", "a"),
    ]
    kg = spark.createDataFrame(rows, "subj string, pred string, obj string")

    got = {(r.subj, r.obj) for r in
           match_triples(kg, pred=PRED_IDENT, obj="dbr:B").collect()}
    assert got == {(f"{u(1)}#char=2,3", "dbr:B"), (f"{u(2)}#char=0,1",
                                                   "dbr:B")}

    hops = {r.uri: r.hop for r in
            entity_neighbors(kg, ["dbr:A"], hops=2).collect()}
    # A=0; B co-paged with A=1; C co-paged with B=2; D needs 3; E island
    assert hops == {"dbr:A": 0, "dbr:B": 1, "dbr:C": 2}

    hops3 = {r.uri: r.hop for r in
             entity_neighbors(kg, ["dbr:A"], hops=3).collect()}
    assert hops3["dbr:D"] == 3 and "dbr:E" not in hops3


def _edge_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "uri_a string, uri_b string, n_docs int")


def test_degree_stats_counts_both_endpoints(spark):
    from dbpedia_spotlight_spark.operators.graph import degree_stats
    # path a-b-c: b has degree 2, endpoints 1; weighted uses n_docs
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 5)],
        "uri_a string, uri_b string, n_docs int")
    got = {r.uri: (r.degree, r.weighted_degree)
           for r in degree_stats(edges).collect()}
    assert got == {"a": (1, 3), "b": (2, 8), "c": (1, 5)}


def test_triangle_counts_known_graphs(spark):
    from dbpedia_spotlight_spark.operators.graph import triangle_counts
    # K4: every vertex participates in C(3,2)=3 triangles
    k4 = [("a", "b"), ("a", "c"), ("a", "d"),
          ("b", "c"), ("b", "d"), ("c", "d")]
    got = {r.uri: r.n_triangles
           for r in triangle_counts(_edge_df(spark, k4)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # 4-cycle without chords: no triangles at all
    square = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert triangle_counts(_edge_df(spark, square)).count() == 0
    # star: hub with many spokes but no spoke-spoke edges
    star = [("hub", f"s{i}") for i in range(6)]
    assert triangle_counts(_edge_df(spark, star)).count() == 0
    # one triangle hanging off a path: only the triangle's 3 vertices
    tri_tail = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = {r.uri: r.n_triangles
           for r in triangle_counts(_edge_df(spark, tri_tail)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_match_bruteforce_on_random_graph(spark):
    import itertools
    import random
    from dbpedia_spotlight_spark.operators.graph import triangle_counts
    rng = random.Random(7)
    verts = [f"v{i}" for i in range(18)]
    edges = sorted({tuple(sorted(p))
                    for p in itertools.combinations(verts, 2)
                    if rng.random() < 0.3})
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    expect: dict[str, int] = {}
    for a, b, c in itertools.combinations(verts, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    got = {r.uri: r.n_triangles
           for r in triangle_counts(_edge_df(spark, edges)).collect()}
    assert got == expect


def test_clustering_coefficients(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        clustering_coefficients)
    # triangle a-b-c plus pendant d on c: a,b fully clustered; c has
    # deg 3 with 1 triangle -> 2*1/(3*2) = 1/3; d deg 1 -> 0.0
    edges = _edge_df(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                             ("c", "d")])
    got = {r.uri: (r.degree, r.n_triangles, round(r.clustering, 9))
           for r in clustering_coefficients(edges).collect()}
    assert got == {"a": (2, 1, 1.0), "b": (2, 1, 1.0),
                   "c": (3, 1, round(1 / 3, 9)), "d": (1, 0, 0.0)}


def _directed(spark, triples):
    return spark.createDataFrame(
        triples, "uri_a string, uri_b string, n_docs int")


def test_hits_bipartite_hubs_and_authorities(spark):
    from dbpedia_spotlight_spark.operators.graph import hits
    # 2 pure hubs each linking the same 3 pure authorities: symmetric,
    # so hubs share one hub score, authorities one authority score;
    # pure hubs have authority 0 and vice versa. L2 norms: hubs
    # 1/sqrt(2) each, authorities 1/sqrt(3) each.
    edges = _directed(spark, [
        ("h1", f"a{i}", 1) for i in range(3)] + [
        ("h2", f"a{i}", 1) for i in range(3)])
    got = {r.uri: (round(r.hub, 9), round(r.authority, 9))
           for r in hits(edges).collect()}
    import math
    hub_s = round(1 / math.sqrt(2), 9)
    auth_s = round(1 / math.sqrt(3), 9)
    assert got == {"h1": (hub_s, 0.0), "h2": (hub_s, 0.0),
                   "a0": (0.0, auth_s), "a1": (0.0, auth_s),
                   "a2": (0.0, auth_s)}


def test_hits_distributed_matches_driver(spark):
    import random
    from dbpedia_spotlight_spark.operators.graph import hits
    rng = random.Random(3)
    hosts = [f"host{i}.example" for i in range(12)]
    edges = sorted({(rng.choice(hosts), rng.choice(hosts))
                    for _ in range(40)})
    edges = [(a, b, rng.randint(1, 4)) for a, b in edges if a != b]
    df = _directed(spark, edges)
    drv = {r.uri: (round(r.hub, 9), round(r.authority, 9))
           for r in hits(df).collect()}
    dist = {r.uri: (round(r.hub, 9), round(r.authority, 9))
            for r in hits(df, driver_threshold=0).collect()}
    assert drv == dist


def test_hits_distributed_checkpoint_dir_mode(spark, tmp_path):
    from dbpedia_spotlight_spark.operators.graph import hits
    edges = _directed(spark, [("a", "b", 1), ("b", "c", 2),
                              ("c", "a", 1), ("a", "c", 3)])
    drv = {r.uri: (round(r.hub, 9), round(r.authority, 9))
           for r in hits(edges).collect()}
    dist = {r.uri: (round(r.hub, 9), round(r.authority, 9))
            for r in hits(edges, driver_threshold=0,
                          checkpoint_dir=str(tmp_path)).collect()}
    assert drv == dist


@pytest.mark.parametrize("threshold", [100_000, 0])
def test_pagerank_weight_col_npmi(spark, threshold):
    """weight_col generalization: PageRank over fractional npmi weights
    (positive-filtered) matches the python oracle on both paths, and
    differs from the count-weighted ranking (the weights matter)."""
    from dbpedia_spotlight_spark.operators.graph import pagerank
    E = [("A", "B", 0.9), ("B", "C", 0.1), ("A", "C", 0.5)]
    edges = spark.createDataFrame(
        E, "uri_a string, uri_b string, npmi double")
    got = {r.uri: r.rank for r in
           pagerank(edges, n_iter=12, driver_threshold=threshold,
                    weight_col="npmi").collect()}

    nodes = sorted({u for a, b, _ in E for u in (a, b)})
    out = {u: 0.0 for u in nodes}
    adj = []
    for a, b, w in E:
        adj += [(a, b, w), (b, a, w)]
    for s, _, w in adj:
        out[s] += w
    d, n = 0.85, len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(12):
        nxt = {u: (1 - d) / n for u in nodes}
        for s, t, w in adj:
            nxt[t] += d * rank[s] * (w / out[s])
        rank = nxt
    for u in nodes:
        assert abs(got[u] - rank[u]) < 1e-9, (u, got[u], rank[u])
    # npmi weighting must reorder vs uniform weights: C hangs off the
    # weak edges, so it ranks strictly below A here
    assert got["A"] > got["C"]


def test_graph_store_follows_kg_delta_log(spark, web_pages, model_bc,
                                          tmp_path):
    """GraphStore.catchup folds the KG maintenance delta log through
    maintain_comention and lands on exactly the co-mention graph a
    full recompute over the final snapshot gives; a second catchup is
    a no-op. (The --graph CLI wiring is driven in
    test_plans_scale.py::test_run_kg_maintain_entail_catchup.)"""
    import datetime

    from dbpedia_spotlight_spark.operators.graph import cooccurrence_edges
    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        GraphStore, KGStore, apply_pages_batch)
    from dbpedia_spotlight_spark.triples import PRED_IDENT

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").collect()
    schema = web_pages.select(*cols).schema
    store = KGStore(spark, str(tmp_path / "kg"))
    apply_pages_batch(spark, spark.createDataFrame(rows, schema),
                      model_bc, store, batch_id=0, cfg=cfg)
    # recrawl replaces 2 urls' content → link sets genuinely move
    recrawl = [
        (rows[i][0], rows[i][1] + datetime.timedelta(days=1),
         bytes(rows[i + 7][2]), rows[i][3], rows[i][4])
        for i in range(2)
    ]
    apply_pages_batch(spark, spark.createDataFrame(recrawl, schema),
                      model_bc, store, batch_id=1, cfg=cfg)
    assert store.latest_gen() == 1

    gstore = GraphStore(spark, str(tmp_path / "graph"))
    stats = gstore.catchup(store)
    assert stats["gens_folded"] == 2 and stats["gen"] == 1
    assert stats["edges_added"] > 0

    links = (store.read().filter(F.col("pred") == PRED_IDENT)
             .select(F.substring_index("subj", "#char=", 1).alias("url"),
                     F.col("obj").alias("uri")).distinct())
    expect = {(r.uri_a, r.uri_b, r.n_docs) for r in
              cooccurrence_edges(links, "url", "uri").collect()}
    got = {(r.uri_a, r.uri_b, r.n_docs)
           for r in gstore.read_edges().collect()}
    assert got == expect and got

    # caught up: a re-run folds nothing and changes nothing
    assert gstore.catchup(store)["gens_folded"] == 0
    assert {(r.uri_a, r.uri_b, r.n_docs)
            for r in gstore.read_edges().collect()} == expect


def test_pmi_edges_plan_shape(spark):
    """Scale claims, pinned: the one-row N total rides in as a
    broadcast (BroadcastNestedLoopJoin over exactly one row — never a
    CartesianProduct), and the marginal joins are hash joins on uri."""
    from dbpedia_spotlight_spark.operators.graph import pmi_edges
    links = spark.createDataFrame(
        [(i % 7, f"e{i % 5}") for i in range(40)],
        "doc_id int, uri string")
    plan = pmi_edges(links)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total only
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_label_propagation_two_cliques_with_bridge(spark):
    from dbpedia_spotlight_spark.operators.graph import label_propagation
    import itertools
    left = [f"a{i}" for i in range(4)]
    right = [f"b{i}" for i in range(4)]
    pairs = (list(itertools.combinations(left, 2))
             + list(itertools.combinations(right, 2))
             + [("a0", "b0")])  # weak bridge
    edges = _edge_df(spark, pairs)
    got = {r.uri: r.label
           for r in label_propagation(edges, n_iter=8).collect()}
    assert {got[u] for u in left} == {"a0"}
    assert {got[u] for u in right} == {"b0"}


def test_label_propagation_matches_python_oracle(spark):
    """Exact update rule (max total incident weight, min-label ties,
    synchronous rounds) replayed in python on a random weighted graph."""
    import random
    from dbpedia_spotlight_spark.operators.graph import label_propagation
    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(14)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(30)})
    E = [(a, b, rng.randint(1, 5)) for a, b in pairs]
    edges = spark.createDataFrame(
        E, "uri_a string, uri_b string, n_docs int")
    n_iter = 6
    got = {r.uri: r.label
           for r in label_propagation(edges, n_iter=n_iter).collect()}

    adj = {}
    for a, b, w in E:
        adj.setdefault(a, []).append((b, float(w)))
        adj.setdefault(b, []).append((a, float(w)))
    labels = {u: u for u in adj}
    for _ in range(n_iter):
        nxt = {}
        for u, nbrs in adj.items():
            acc = {}
            for v, w in nbrs:
                acc[labels[v]] = acc.get(labels[v], 0.0) + w
            nxt[u] = min(acc, key=lambda l: (-acc[l], l))
        labels = nxt
    assert got == labels


def test_k_core_peels_to_fixpoint(spark):
    from dbpedia_spotlight_spark.operators.graph import k_core
    import itertools
    # K4 clique + a tail a0-t0-t1: 3-core = exactly the clique (the
    # tail peels in two rounds — t1 first, then t0, then a0 keeps deg 3)
    clique = list(itertools.combinations([f"a{i}" for i in range(4)], 2))
    edges = _edge_df(spark, clique + [("a0", "t0"), ("t0", "t1")])
    core = k_core(edges, k=3)
    got = {(r.uri_a, r.uri_b) for r in core.collect()}
    assert got == set(clique)
    # k above the max degree empties the graph
    assert k_core(edges, k=5).count() == 0
    # k=1 only drops nothing here (no isolated self-loops)
    assert k_core(edges, k=1).count() == edges.count()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must"):
        k_core(edges, k=0)


def test_k_core_matches_python_oracle_on_random_graph(spark):
    import random
    from dbpedia_spotlight_spark.operators.graph import k_core
    rng = random.Random(5)
    nodes = [f"n{i:02d}" for i in range(16)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(40)})
    edges = _edge_df(spark, pairs)
    for k in (2, 3, 4):
        got = {(r.uri_a, r.uri_b) for r in k_core(edges, k=k).collect()}
        cur = set(pairs)
        while True:
            deg = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {u for u, d in deg.items() if d >= k}
            nxt = {(a, b) for a, b in cur if a in keep and b in keep}
            if nxt == cur:
                break
            cur = nxt
        assert got == cur, f"k={k}"


def test_derived_store_catchup_refuses_truncated_log(spark, web_pages,
                                                     model_bc, tmp_path):
    """expire_delta_log past a derived store's pointer must make
    catchup raise, never silently fold the surviving tail into a wrong
    state."""
    import datetime

    from dbpedia_spotlight_spark.pipeline import PipelineConfig
    from dbpedia_spotlight_spark.streaming.kg_stream import (
        GraphStore, KGStore, apply_pages_batch)

    cfg = PipelineConfig(disambiguator="generative")
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows = web_pages.select(*cols).orderBy("url").limit(6).collect()
    schema = web_pages.select(*cols).schema
    store = KGStore(spark, str(tmp_path / "kg"))
    apply_pages_batch(spark, spark.createDataFrame(rows, schema),
                      model_bc, store, batch_id=0, cfg=cfg)
    recrawl = [(rows[0][0], rows[0][1] + datetime.timedelta(days=1),
                bytes(rows[3][2]), rows[0][3], rows[0][4])]
    apply_pages_batch(spark, spark.createDataFrame(recrawl, schema),
                      model_bc, store, batch_id=1, cfg=cfg)
    assert store.expire_delta_log(keep_last=1) == 1  # gen-0 log gone

    gstore = GraphStore(spark, str(tmp_path / "graph"))  # fresh: needs gen 0
    with pytest.raises(ValueError, match="no longer reaches generation 0"):
        gstore.catchup(store)


def test_personalized_pagerank_concentrates_near_seed(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        pagerank, personalized_pagerank)
    # path a-b-c-d-e seeded at 'a': rank decays with distance from the
    # seed, unlike global pagerank (where interior nodes dominate)
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = _edge_df(spark, path)
    ppr = {r.uri: r.rank
           for r in personalized_pagerank(edges, ["a"], n_iter=20)
           .collect()}
    assert abs(sum(ppr.values()) - 1.0) < 1e-6
    # proximity to the seed: each node outranks its mirror across the
    # path (the seed's degree-1 endpoint feeds b, so a vs b ordering is
    # not monotonic — but seed-side always beats far-side)
    assert ppr["a"] > ppr["e"] and ppr["b"] > ppr["d"]
    assert ppr["b"] > ppr["c"] > ppr["d"] > ppr["e"]
    gpr = {r.uri: r.rank
           for r in pagerank(edges, n_iter=20,
                             driver_threshold=0).collect()}
    # global PR on the symmetric path has no such asymmetry
    assert abs(gpr["a"] - gpr["e"]) < 1e-9 and abs(gpr["b"] - gpr["d"]) < 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(edges, ["zzz"])


def test_personalized_pagerank_matches_python_oracle(spark):
    import random
    from dbpedia_spotlight_spark.operators.graph import (
        personalized_pagerank)
    rng = random.Random(3)
    nodes = [f"n{i:02d}" for i in range(10)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(18)})
    E = [(a, b, rng.randint(1, 4)) for a, b in pairs]
    edges = spark.createDataFrame(
        E, "uri_a string, uri_b string, n_docs int")
    seeds = ["n00", "n03"]
    n_iter, d = 12, 0.85
    got = {r.uri: r.rank
           for r in personalized_pagerank(edges, seeds,
                                          n_iter=n_iter).collect()}

    adj, out = {}, {}
    for a, b, w in E:
        adj.setdefault(a, []).append((b, float(w)))
        adj.setdefault(b, []).append((a, float(w)))
        out[a] = out.get(a, 0.0) + w
        out[b] = out.get(b, 0.0) + w
    present = [s for s in seeds if s in adj]
    t = {u: (1.0 / len(present) if u in present else 0.0) for u in adj}
    rank = dict(t)
    for _ in range(n_iter):
        nxt = {u: (1 - d) * t[u] for u in adj}
        for s, nbrs in adj.items():
            for v, w in nbrs:
                nxt[v] += d * rank[s] * (w / out[s])
        rank = nxt
    for u in adj:
        assert abs(got[u] - rank[u]) < 1e-9, (u, got[u], rank[u])


def test_link_prediction_known_graph(spark):
    from dbpedia_spotlight_spark.operators.graph import link_prediction
    # path a-b-c: (a,c) share neighbor b (deg 2) and nothing else
    got = link_prediction(_edge_df(spark, [("a", "b"), ("b", "c")])) \
        .collect()
    assert len(got) == 1
    r = got[0]
    assert (r.uri_a, r.uri_b, r.common_neighbors) == ("a", "c", 1)
    assert r.jaccard == 1.0  # Γ(a)=Γ(c)={b}
    import math
    assert r.adamic_adar == round(1.0 / math.log(2), 9)
    # K3 is complete: nothing to predict
    k3 = [("a", "b"), ("b", "c"), ("a", "c")]
    assert link_prediction(_edge_df(spark, k3)).count() == 0


def test_link_prediction_vs_python_reference(spark):
    """Random 40-vertex graph: all three scores match a brute-force
    set-algebra reference exactly (round 9)."""
    from dbpedia_spotlight_spark.operators.graph import link_prediction
    import itertools
    import math
    import random
    rng = random.Random(4242)
    verts = [f"v{i}" for i in range(40)]
    pairs = [p for p in itertools.combinations(verts, 2)
             if rng.random() < 0.12]
    adj = {v: set() for v in verts}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    for a, b in itertools.combinations(sorted(verts), 2):
        if b in adj[a]:
            continue
        common = adj[a] & adj[b]
        if not common:
            continue
        cn = len(common)
        expect[(a, b)] = (
            cn,
            round(cn / (len(adj[a]) + len(adj[b]) - cn), 9),
            round(sum(1.0 / math.log(len(adj[c])) for c in common), 9),
        )
    got = {(r.uri_a, r.uri_b): (r.common_neighbors, r.jaccard,
                                r.adamic_adar)
           for r in link_prediction(_edge_df(spark, pairs)).collect()}
    assert got == expect


def test_link_prediction_top_k_and_degree_cap(spark):
    from dbpedia_spotlight_spark.operators.graph import link_prediction
    # hub h connects s0..s5: with max_degree=3 the hub cannot be a
    # wedge center, so no spoke pair is predicted THROUGH it; adding a
    # small center x shared by s0,s1 keeps that pair alive with exact
    # full degrees (s0/s1 degree 2 = hub + x)
    edges = [("h", f"s{i}") for i in range(6)] + [("s0", "x"), ("s1", "x")]
    got = link_prediction(_edge_df(spark, edges), max_degree=3).collect()
    keys = {(r.uri_a, r.uri_b) for r in got}
    assert ("s0", "s1") in keys
    assert all(a == "s0" and b == "s1" for a, b in keys
               if a.startswith("s") and b.startswith("s"))
    row = [r for r in got if (r.uri_a, r.uri_b) == ("s0", "s1")][0]
    assert row.common_neighbors == 1  # only x; hub excluded as center
    assert row.jaccard == round(1 / 3, 9)  # degrees stay exact (2+2-1)
    # top_k: keep the single best prediction per uri_a
    full = link_prediction(_edge_df(spark, edges))
    k1 = link_prediction(_edge_df(spark, edges), top_k=1)
    a_counts = {}
    for r in k1.collect():
        a_counts[r.uri_a] = a_counts.get(r.uri_a, 0) + 1
    assert all(v == 1 for v in a_counts.values())
    assert k1.count() <= full.count()


def test_entity_salience_reference(spark):
    from dbpedia_spotlight_spark.operators.graph import entity_salience
    # doc 1: e1 mentioned twice (first at 0), e2 once late
    # doc 2: single mention
    links = spark.createDataFrame(
        [(1, "e1", 0, 5), (1, "e1", 50, 55), (1, "e2", 90, 100),
         (2, "e3", 10, 40)],
        "doc_id int, uri string, begin int, end int")
    got = {(r.doc_id, r.uri): r for r in entity_salience(links).collect()}
    r11 = got[(1, "e1")]
    assert (r11.n_mentions, r11.first_begin) == (2, 0)
    assert r11.mention_share == round(2 / 3, 9)
    assert r11.salience == round(2 / 3 * (1 + (1 - 0 / 100)), 9)
    assert r11.rank == 1
    r12 = got[(1, "e2")]
    assert r12.salience == round(1 / 3 * (1 + (1 - 90 / 100)), 9)
    assert r12.rank == 2
    # a lone mention is maximally salient for its doc
    assert got[(2, "e3")].salience == round(1 * (1 + (1 - 10 / 40)), 9)
    assert got[(2, "e3")].rank == 1


# ---------------------------------------------------------------------------
# shortest_paths (multi-source BFS landmarks)

def _bfs_reference(edges, sources, max_hops, directed):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    out = {}
    for s in set(sources):
        dist = {s: 0}
        frontier = [s]
        for hop in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            if not nxt:
                break
            frontier = nxt
        for u, d in dist.items():
            out[(u, s)] = d
    return out


def test_shortest_paths_reference(spark):
    from dbpedia_spotlight_spark.operators.graph import shortest_paths
    import random
    rng = random.Random(3)
    edges = sorted({(f"v{rng.randint(0, 24)}", f"v{rng.randint(0, 24)}")
                    for _ in range(50)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "uri_a string, uri_b string")
    for directed in (False, True):
        for max_hops in (0, 2, 8):
            got = {(r.uri, r.source): r.dist
                   for r in shortest_paths(df, ["v0", "v7"],
                                           max_hops=max_hops,
                                           directed=directed).collect()}
            want = _bfs_reference(edges, ["v0", "v7"], max_hops, directed)
            assert got == want, (directed, max_hops)


def test_shortest_paths_semantics(spark):
    from dbpedia_spotlight_spark.operators.graph import shortest_paths
    import pytest as _pt
    # chain a-b-c-d: landmark at a, undirected
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "uri_a string, uri_b string")
    got = {(r.uri, r.source): r.dist
           for r in shortest_paths(df, ["a", "d"]).collect()}
    assert got[("a", "a")] == 0 and got[("d", "a")] == 3
    assert got[("a", "d")] == 3 and got[("b", "d")] == 2
    # max_hops truncates; early-exit on exhausted frontier is exact
    got1 = {(r.uri, r.source): r.dist
            for r in shortest_paths(df, ["a"], max_hops=1).collect()}
    assert got1 == {("a", "a"): 0, ("b", "a"): 1}
    # directed chain never reaches backwards
    gotd = {(r.uri, r.source): r.dist
            for r in shortest_paths(df, ["d"], directed=True).collect()}
    assert gotd == {("d", "d"): 0}
    with _pt.raises(ValueError, match="sources"):
        shortest_paths(df, [])
    with _pt.raises(ValueError, match="max_hops"):
        shortest_paths(df, ["a"], max_hops=-1)


def test_shortest_paths_checkpoint_dir(spark, tmp_path):
    """Reliable-checkpoint mode agrees with local mode and leaves at
    most the final generations on disk (flat storage discipline)."""
    from dbpedia_spotlight_spark.operators.graph import shortest_paths
    df = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(12)],
        "uri_a string, uri_b string")
    base = sorted(map(tuple, shortest_paths(df, ["n0"]).collect()))
    ck = sorted(map(tuple, shortest_paths(
        df, ["n0"], checkpoint_dir=str(tmp_path)).collect()))
    assert base == ck
    gens = [p.name for p in tmp_path.iterdir()]
    assert len(gens) <= 2, gens


# harmonic_centrality (landmark-sampled, exact-integer sum device)

def test_harmonic_centrality_reference(spark):
    from dbpedia_spotlight_spark.operators.graph import harmonic_centrality
    import math
    import random
    rng = random.Random(11)
    edges = sorted({(f"v{rng.randint(0, 19)}", f"v{rng.randint(0, 19)}")
                    for _ in range(40)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "uri_a string, uri_b string")
    sources, max_hops = ["v0", "v3", "v7"], 5
    want_d = _bfs_reference(edges, sources, max_hops, False)
    L = math.lcm(*range(1, max_hops + 1))
    num, cnt = {}, {}
    for (u, _s), d in want_d.items():
        if d > 0:
            num[u] = num.get(u, 0) + L // d
            cnt[u] = cnt.get(u, 0) + 1
    got = {r.uri: (r.n_reached, r.harmonic)
           for r in harmonic_centrality(df, sources,
                                        max_hops=max_hops).collect()}
    assert got == {u: (cnt[u], num[u] / L) for u in num}


def test_harmonic_centrality_semantics(spark):
    from dbpedia_spotlight_spark.operators.graph import harmonic_centrality
    import pytest as _pt
    # chain a-b-c-d from landmarks {a, d}: b sees dists 1 and 2
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "uri_a string, uri_b string")
    got = {r.uri: (r.n_reached, r.harmonic)
           for r in harmonic_centrality(df, ["a", "d"]).collect()}
    assert got["b"] == (2, 1.0 + 0.5)
    assert got["a"] == (1, 1.0 / 3.0)  # only d reaches a (dist 3)
    # landmark self-distances (0) contribute nothing; unreachable
    # nodes are absent, not zero rows
    df2 = spark.createDataFrame([("a", "b"), ("x", "y")],
                                "uri_a string, uri_b string")
    got2 = {r.uri for r in harmonic_centrality(df2, ["a"]).collect()}
    assert got2 == {"b"}
    with _pt.raises(ValueError, match="max_hops"):
        harmonic_centrality(df, ["a"], max_hops=0)


def _py_edge_support(edges):
    import itertools
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sup = {}
    for a, b in edges:
        sup[(a, b)] = len(adj[a] & adj[b])
    return sup


def _py_k_truss(edges, k):
    cur = {tuple(sorted(e)) for e in edges}
    while True:
        sup = _py_edge_support(cur)
        keep = {e for e in cur if sup[e] >= k - 2}
        if keep == cur:
            return {e: sup[e] for e in cur}
        cur = keep


def _py_coreness(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = dict(deg)
    # textbook peeling (Batagelj–Zaversnik): repeatedly remove the
    # minimum-degree vertex, its core number is the running max of the
    # minimum degree seen so far
    out = {}
    cur = 0
    live = dict(deg)
    nbrs = {v: set(ns) for v, ns in adj.items()}
    while live:
        v = min(live, key=lambda x: (live[x], x))
        cur = max(cur, live[v])
        out[v] = cur
        for u in nbrs[v]:
            if u in live:
                live[u] -= 1
                nbrs[u].discard(v)
        del live[v]
    return out


def test_edge_support_known_graphs(spark):
    from dbpedia_spotlight_spark.operators.graph import edge_support
    k4 = [("a", "b"), ("a", "c"), ("a", "d"),
          ("b", "c"), ("b", "d"), ("c", "d")]
    got = {(r.uri_a, r.uri_b): r.support
           for r in edge_support(_edge_df(spark, k4)).collect()}
    assert got == {e: 2 for e in k4}  # each K4 edge closes 2 triangles
    tri_tail = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = {(r.uri_a, r.uri_b): r.support
           for r in edge_support(_edge_df(spark, tri_tail)).collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}


def test_k_truss_peels_to_fixpoint(spark):
    from dbpedia_spotlight_spark.operators.graph import k_truss
    # K4 with a pendant triangle chain: 4-truss = the K4 alone
    edges = [("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d"),
             ("d", "e"), ("d", "f"), ("e", "f"),  # triangle d-e-f
             ("f", "g")]                           # pendant edge
    got = {(r.uri_a, r.uri_b): r.support
           for r in k_truss(_edge_df(spark, edges), 4).collect()}
    assert got == _py_k_truss(edges, 4)
    assert set(got) == {("a", "b"), ("a", "c"), ("a", "d"),
                        ("b", "c"), ("b", "d"), ("c", "d")}
    # 3-truss keeps both triangles, drops the pendant edge
    got3 = {(r.uri_a, r.uri_b): r.support
            for r in k_truss(_edge_df(spark, edges), 3).collect()}
    assert got3 == _py_k_truss(edges, 3)
    # k<3: trivial truss returns every edge with its support attached
    got2 = {(r.uri_a, r.uri_b): r.support
            for r in k_truss(_edge_df(spark, edges), 2).collect()}
    assert set(got2) == set(edges)
    assert got2[("f", "g")] == 0
    # 5-truss of this graph is empty
    assert k_truss(_edge_df(spark, edges), 5).count() == 0


def test_k_truss_matches_bruteforce_on_random_graph(spark):
    import itertools
    import random
    from dbpedia_spotlight_spark.operators.graph import k_truss
    rng = random.Random(13)
    verts = [f"v{i}" for i in range(16)]
    edges = sorted({tuple(sorted(p))
                    for p in itertools.combinations(verts, 2)
                    if rng.random() < 0.35})
    for k in (3, 4, 5):
        got = {(r.uri_a, r.uri_b): r.support
               for r in k_truss(_edge_df(spark, edges), k).collect()}
        assert got == _py_k_truss(edges, k), f"k={k}"


def test_coreness_known_graphs(spark):
    from dbpedia_spotlight_spark.operators.graph import coreness
    # K4 + pendant path: K4 nodes core 3, path nodes core 1
    edges = [("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "c"), ("b", "d"), ("c", "d"),
             ("d", "e"), ("e", "f")]
    got = {r.uri: r.core for r in coreness(_edge_df(spark, edges)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 1, "f": 1}
    # cycle: everyone core 2
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    got = {r.uri: r.core for r in coreness(_edge_df(spark, cyc)).collect()}
    assert got == {v: 2 for v in "abcd"}


def test_coreness_matches_peeling_on_random_graph(spark):
    import itertools
    import random
    from dbpedia_spotlight_spark.operators.graph import coreness, k_core
    rng = random.Random(29)
    verts = [f"v{i}" for i in range(20)]
    edges = sorted({tuple(sorted(p))
                    for p in itertools.combinations(verts, 2)
                    if rng.random() < 0.25})
    got = {r.uri: r.core for r in coreness(_edge_df(spark, edges)).collect()}
    assert got == _py_coreness(edges)
    # consistency with the k-core filter: vertices of the k-core are
    # exactly those with coreness >= k
    for k in (2, 3):
        kc = k_core(_edge_df(spark, edges), k)
        in_core = {r.uri_a for r in kc.collect()} \
            | {r.uri_b for r in kc.collect()}
        assert in_core == {v for v, c in got.items() if c >= k}


def test_modularity_two_cliques_bridge(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        community_modularity)
    # two triangles joined by one bridge edge; labels = the two sides
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("c", "x")]
    labels = spark.createDataFrame(
        [(u, "L" if u in "abc" else "R") for u in "abcxyz"],
        "uri string, label string")
    out = {r.label: r for r in
           community_modularity(_edge_df(spark, edges), labels).collect()}
    m = 7
    for side in ("L", "R"):
        assert out[side].n_internal == 3
        assert out[side].total_degree == 7  # 2+2+3 per side
        assert out[side].q_contrib == pytest.approx(
            3 / m - (7 / (2 * m)) ** 2, abs=1e-9)
    # whole-graph-in-one-community ⇒ Q = 0 exactly
    one = spark.createDataFrame([(u, "all") for u in "abcxyz"],
                                "uri string, label string")
    total = community_modularity(_edge_df(spark, edges), one) \
        .agg(F.sum("q_contrib")).first()[0]
    assert total == pytest.approx(0.0, abs=1e-9)


def test_assortativity_star_is_minus_one(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        degree_assortativity)
    star = [("hub", f"s{i}") for i in range(5)]
    row = degree_assortativity(_edge_df(spark, star)).first()
    assert row.n_pairs == 10
    assert row.assortativity == pytest.approx(-1.0, abs=1e-9)


def test_assortativity_matches_numpy_pearson(spark):
    import itertools
    import random

    import numpy as np
    from dbpedia_spotlight_spark.operators.graph import (
        degree_assortativity)
    rng = random.Random(5)
    verts = [f"v{i}" for i in range(15)]
    edges = sorted({tuple(sorted(p))
                    for p in itertools.combinations(verts, 2)
                    if rng.random() < 0.3})
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
    ys = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
    expect = np.corrcoef(xs, ys)[0, 1]
    row = degree_assortativity(_edge_df(spark, edges)).first()
    assert row.assortativity == pytest.approx(expect, abs=1e-9)


def test_assortativity_regular_graph_is_null(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        degree_assortativity)
    # 4-cycle: every degree 2 → zero variance → r undefined → NULL
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    row = degree_assortativity(_edge_df(spark, cyc)).first()
    assert row.n_pairs == 8
    assert row.assortativity is None


def test_wl_colors_orbit_partition(spark):
    from dbpedia_spotlight_spark.operators.graph import wl_colors
    # path a-b-c-d: ends form one class, middles another
    p4 = [("a", "b"), ("b", "c"), ("c", "d")]
    got = {r.uri: r.color for r in wl_colors(_edge_df(spark, p4)).collect()}
    assert got["a"] == got["d"]
    assert got["b"] == got["c"]
    assert got["a"] != got["b"]
    # star: hub separates from spokes
    star = [("hub", f"s{i}") for i in range(4)]
    got = {r.uri: r.color
           for r in wl_colors(_edge_df(spark, star)).collect()}
    assert len({got[f"s{i}"] for i in range(4)}) == 1
    assert got["hub"] != got["s0"]


def test_wl_signature_isomorphic_graphs_agree(spark):
    from dbpedia_spotlight_spark.operators.graph import wl_signature
    # two disjoint isomorphic copies inside ONE graph: every color
    # class has even size
    g = [("a1", "b1"), ("b1", "c1"), ("a1", "c1"), ("c1", "d1"),
         ("a2", "b2"), ("b2", "c2"), ("a2", "c2"), ("c2", "d2")]
    sizes = [r.n for r in wl_signature(_edge_df(spark, g)).collect()]
    assert all(n % 2 == 0 for n in sizes)
    # and a relabeled copy of a graph yields the identical signature
    g1 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    g2 = [("p", "q"), ("q", "r"), ("r", "s"), ("s", "p"), ("p", "r")]
    s1 = sorted((r.color, r.n)
                for r in wl_signature(_edge_df(spark, g1)).collect())
    s2 = sorted((r.color, r.n)
                for r in wl_signature(_edge_df(spark, g2)).collect())
    assert s1 == s2


def test_wl_distinguishes_path_from_star(spark):
    from dbpedia_spotlight_spark.operators.graph import wl_signature
    p4 = [("a", "b"), ("b", "c"), ("c", "d")]
    star = [("a", "b"), ("a", "c"), ("a", "d")]
    s1 = sorted((r.color, r.n)
                for r in wl_signature(_edge_df(spark, p4)).collect())
    s2 = sorted((r.color, r.n)
                for r in wl_signature(_edge_df(spark, star)).collect())
    assert s1 != s2


def test_seeded_lpa_clamps_and_diffuses(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        seeded_label_propagation)
    # barbell: L-clique and R-clique joined by a path; seeds at the
    # extremes — each side adopts its near seed, seeds stay clamped
    edges = [("l1", "l2"), ("l1", "l3"), ("l2", "l3"),
             ("r1", "r2"), ("r1", "r3"), ("r2", "r3"),
             ("l3", "m"), ("m", "r3")]
    e = spark.createDataFrame(
        [(a, b, 1) for a, b in edges],
        "uri_a string, uri_b string, n_docs long")
    seeds = spark.createDataFrame([("l1", "L"), ("r1", "R")],
                                  "uri string, label string")
    out = seeded_label_propagation(e, seeds, n_iter=6)
    top = {r.uri: r.label for r in out.filter("rank = 1").collect()}
    assert top["l1"] == "L" and top["r1"] == "R"      # clamped
    assert top["l2"] == top["l3"] == "L"
    assert top["r2"] == top["r3"] == "R"
    p = {(r.uri, r.label): r.p for r in out.collect()}
    assert p[("l1", "L")] == 1.0
    # the bridge node sees both labels
    assert ("m", "L") in p and ("m", "R") in p


def test_seeded_lpa_layout_independent(spark):
    import itertools
    import random
    from dbpedia_spotlight_spark.operators.graph import (
        seeded_label_propagation)
    rng = random.Random(11)
    verts = [f"v{i}" for i in range(14)]
    edges = sorted({tuple(sorted(pq))
                    for pq in itertools.combinations(verts, 2)
                    if rng.random() < 0.3})
    e = spark.createDataFrame(
        [(a, b, rng.randrange(1, 5)) for a, b in edges],
        "uri_a string, uri_b string, n_docs long")
    rng2 = random.Random(2)
    seeds = spark.createDataFrame(
        [(v, "A" if rng2.random() < 0.5 else "B")
         for v in verts[:4]], "uri string, label string")
    one = seeded_label_propagation(e.coalesce(1), seeds, n_iter=4)
    many = seeded_label_propagation(e.repartition(9), seeds, n_iter=4)
    assert sorted(map(tuple, one.collect())) \
        == sorted(map(tuple, many.collect()))  # EXACT — grid device


def test_seeded_lpa_accepts_fractional_weights(spark):
    """Review-finding regression: similarity weights in (0,1) must not
    truncate to zero (the old long cast made every contribution 0/0)."""
    from dbpedia_spotlight_spark.operators.graph import (
        seeded_label_propagation)
    e = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.2), ("c", "d", 0.8)],
        "uri_a string, uri_b string, n_docs double")
    seeds = spark.createDataFrame([("a", "L"), ("d", "R")],
                                  "uri string, label string")
    out = seeded_label_propagation(e, seeds, n_iter=5)
    top = {r.uri: r.label for r in out.filter("rank = 1").collect()}
    assert top["b"] == "L" and top["c"] == "R"  # strong ties win
    # layout-independent with fractional weights too (grid products)
    a = sorted(map(tuple, seeded_label_propagation(
        e.coalesce(1), seeds, n_iter=5).collect()))
    b = sorted(map(tuple, seeded_label_propagation(
        e.repartition(5), seeds, n_iter=5).collect()))
    assert a == b
