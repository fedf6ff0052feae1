"""Strongly connected components (operators/components.py::
strongly_connected_components): Tarjan-reference equivalence on random
digraphs, known-shape cases, the max-member label contract, and the
reliable-checkpoint mode.
"""

from __future__ import annotations

import random

import pytest

from dbpedia_spotlight_spark.operators.components import (
    strongly_connected_components,
)


def _tarjan(vertices, edges):
    """Iterative Tarjan — returns {vertex: frozenset(scc members)}."""
    adj = {v: [] for v in vertices}
    for a, b in edges:
        if a != b:
            adj[a].append(b)
    index, low, on_stack = {}, {}, set()
    stack, result, counter = [], {}, [0]
    for root in vertices:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                fs = frozenset(comp)
                for w in comp:
                    result[w] = fs
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return result


def _run(spark, vertices, edges, **kw):
    nodes = spark.createDataFrame([(v,) for v in vertices], "id string")
    e = spark.createDataFrame(list(edges) or [("x", "x")],
                              "src string, dst string")
    if not edges:
        e = e.limit(0)
    return {r.id: r.scc for r in
            strongly_connected_components(nodes, e, **kw).collect()}


def test_scc_known_shapes(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "f"), ("f", "g"), ("g", "f")]
    got = _run(spark, list("abcdefgh"), edges)
    assert got == {"a": "c", "b": "c", "c": "c", "d": "d", "e": "e",
                   "f": "g", "g": "g", "h": "h"}


def test_scc_single_big_cycle_and_no_edges(spark):
    n = 12
    verts = [f"v{i:02d}" for i in range(n)]
    ring = [(verts[i], verts[(i + 1) % n]) for i in range(n)]
    got = _run(spark, verts, ring)
    assert set(got.values()) == {"v11"}  # max member labels the ring
    got2 = _run(spark, ["a", "b"], [])
    assert got2 == {"a": "a", "b": "b"}


@pytest.mark.parametrize("seed,p", [(1, 0.04), (2, 0.08), (3, 0.15)])
def test_scc_matches_tarjan_on_random_digraphs(spark, seed, p):
    rng = random.Random(seed)
    verts = [f"n{i:02d}" for i in range(30)]
    edges = [(a, b) for a in verts for b in verts
             if a != b and rng.random() < p]
    got = _run(spark, verts, edges)
    ref = _tarjan(verts, edges)
    assert set(got) == set(verts)
    # same partition AND the max-member label contract
    for v in verts:
        assert got[v] == max(ref[v]), (v, got[v], sorted(ref[v]))


def test_scc_reliable_checkpoint_mode(spark, tmp_path):
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c")]
    got = _run(spark, list("abcd"), edges,
               checkpoint_dir=str(tmp_path / "scc"))
    assert got == {"a": "b", "b": "b", "c": "d", "d": "d"}
