"""DeepWalk corpus generator (operators/walks.py): md5-deterministic
transition replay against a pure-python reference, walk validity
(every hop is a real edge), and skip-gram pair extraction.
"""

from __future__ import annotations

import hashlib
import itertools
import random

from dbpedia_spotlight_spark.operators.walks import (
    adjacency, random_walks, skipgram_pairs,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(pairs, n_walks, walk_len, seed="walk"):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    out = []
    for v in sorted(adj):
        for k in range(n_walks):
            wid, cur, path = f"{v}#{k}", v, [v]
            for t in range(1, walk_len):
                ns = adj[cur]
                cur = ns[_h60(f"{seed}:{wid}:{t}") % len(ns)]
                path.append(cur)
            out += [(wid, i, u) for i, u in enumerate(path)]
    return sorted(out)


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "uri_a string, uri_b string")


def test_walks_match_python_reference(spark):
    rng = random.Random(99)
    verts = [f"v{i}" for i in range(25)]
    pairs = [p for p in itertools.combinations(verts, 2)
             if rng.random() < 0.15]
    got = sorted(map(tuple, random_walks(
        _edges(spark, pairs), n_walks=2, walk_len=5).collect()))
    assert got == _py_walks(pairs, n_walks=2, walk_len=5)


def test_walks_follow_real_edges_and_are_deterministic(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    e = _edges(spark, pairs)
    w = random_walks(e, n_walks=3, walk_len=6)
    rows = sorted(map(tuple, w.collect()))
    assert rows == sorted(map(tuple, random_walks(
        e, n_walks=3, walk_len=6).collect()))
    und = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    byw = {}
    for wid, step, uri in rows:
        byw.setdefault(wid, {})[step] = uri
    assert len(byw) == 4 * 3
    for wid, path in byw.items():
        assert len(path) == 6
        assert path[0] == wid.split("#")[0]
        for i in range(5):
            assert (path[i], path[i + 1]) in und
    # a different seed yields a different corpus
    alt = sorted(map(tuple, random_walks(
        e, n_walks=3, walk_len=6, seed="other").collect()))
    assert alt != rows


def test_skipgram_pairs_counts(spark):
    # one hand-built walk a b c d, window 2
    walks = spark.createDataFrame(
        [("w", 0, "a"), ("w", 1, "b"), ("w", 2, "c"), ("w", 3, "d")],
        "walk_id string, step int, uri string")
    got = {(r.center, r.context): r.n
           for r in skipgram_pairs(walks, window=2).collect()}
    expect = {}
    seq = ["a", "b", "c", "d"]
    for i, j in itertools.permutations(range(4), 2):
        if abs(i - j) <= 2:
            k = (seq[i], seq[j])
            expect[k] = expect.get(k, 0) + 1
    assert got == expect
