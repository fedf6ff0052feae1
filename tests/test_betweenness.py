"""Brandes betweenness (operators/graph.py::betweenness_centrality):
exact classic values on reference graphs, bit-identical agreement
with a from-scratch python Brandes twin running the SAME dyadic
2^-30 quantization, hop truncation, and landmark sampling."""

from __future__ import annotations

import math

import pytest

Q30 = 1 << 30


def _q(x: float) -> float:
    return math.floor(x * Q30) / Q30


def _brandes(edge_list, sources, directed=False, max_hops=6):
    adj: dict[str, set[str]] = {}
    nodes: set[str] = set()
    for a, b in edge_list:
        nodes |= {a, b}
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    betw: dict[str, float] = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        frontier = [s]
        h = 0
        while frontier and h < max_hops:
            h += 1
            nxt: dict[str, int] = {}
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[u]
            for w, sg in nxt.items():
                dist[w] = h
                sigma[w] = sg
            frontier = sorted(nxt)
            if frontier:
                levels.append(frontier)
        delta = {v: 0.0 for v in dist}
        for d in range(len(levels) - 2, -1, -1):
            for v in levels[d]:
                tot = 0.0
                for w in adj.get(v, ()):
                    if dist.get(w) == d + 1:
                        tot += _q(sigma[v] / sigma[w]
                                  * (1.0 + delta[w]))
                delta[v] = tot
        for v, dl in delta.items():
            if v != s and dl != 0.0:
                betw[v] = betw.get(v, 0.0) + dl
    scale = 2.0 if not directed else 1.0
    return {v: b / scale for v, b in betw.items()}


def _run(spark, edge_list, sources, **kw):
    from dbpedia_spotlight_spark.operators.graph import (
        betweenness_centrality)
    edges = spark.createDataFrame(edge_list,
                                  "uri_a string, uri_b string")
    return {r.uri: r.betweenness for r in
            betweenness_centrality(edges, sources, **kw).collect()}


def test_path_graph_exact(spark):
    # 5-node path, all-sources = exact betweenness: B/D carry 3 pairs,
    # C carries 4 (the classic closed form (i)(n-1-i))
    edges = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E")]
    got = _run(spark, edges, list("ABCDE"))
    assert got == {"B": 3.0, "C": 4.0, "D": 3.0}


def test_diamond_split_paths(spark):
    # 4-cycle: every opposite pair has two shortest paths, each
    # midpoint carries half — all four nodes sit on exactly one
    # split pair
    edges = [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")]
    got = _run(spark, edges, list("ABCD"))
    assert got == {"A": 0.5, "B": 0.5, "C": 0.5, "D": 0.5}


def test_directed_chain(spark):
    edges = [("A", "B"), ("B", "C")]
    got = _run(spark, edges, list("ABC"), directed=True)
    assert got == {"B": 1.0}


def test_matches_python_twin_bitwise(spark):
    # irregular graph with asymmetric sigmas + a pendant + a cycle
    edges = [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"),
             ("D", "E"), ("E", "F"), ("B", "C"), ("F", "G"),
             ("C", "E"), ("G", "H")]
    for sources in (list("ABCDEFGH"), ["A", "H"], ["D"]):
        got = _run(spark, edges, sources)
        want = _brandes(edges, sources)
        assert got == want, sources     # bit-identical, not approx


def test_hop_truncation_matches_twin(spark):
    edges = [(c, chr(ord(c) + 1)) for c in "ABCDEFG"]
    got = _run(spark, edges, list("ABCDEFGH"), max_hops=2)
    want = _brandes(edges, list("ABCDEFGH"), max_hops=2)
    assert got == want


def test_landmark_source_collects_other_passes(spark):
    # a source node must still accumulate dependency from OTHER
    # sources' passes (the per-pair exclusion rule)
    edges = [("A", "B"), ("B", "C")]
    got = _run(spark, edges, ["A", "C"])
    # pass from A: delta_A(B)=1 ; pass from C: delta_C(B)=1 ; /2
    assert got == {"B": 1.0}
