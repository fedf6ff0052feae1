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


# ---------------------------------------------------------------------------
# node2vec (p/q-biased second-order walks)
# ---------------------------------------------------------------------------

from dbpedia_spotlight_spark.operators.walks import (  # noqa: E402
    _pq_weights, node2vec_walks)


def _py_n2v(pairs, p, q, n_walks, walk_len, seed="n2v"):
    wr, wi, wo = _pq_weights(p, q)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    nset = {v: set(ns) for v, ns in adj.items()}
    out = []
    for v in sorted(adj):
        for k in range(n_walks):
            wid, prev, cur, path = f"{v}#{k}", None, v, [v]
            for t in range(1, walk_len):
                ns = adj[cur]
                h = _h60(f"{seed}:{wid}:{t}")
                if prev is None:
                    nxt = ns[h % len(ns)]
                else:
                    ws = [wr if x == prev
                          else wi if x in nset[prev] else wo
                          for x in ns]
                    r = h % sum(ws)
                    cum = 0
                    for x, w in zip(ns, ws):
                        cum += w
                        if r < cum:
                            nxt = x
                            break
                prev, cur = cur, nxt
                path.append(cur)
            out += [(wid, i, u) for i, u in enumerate(path)]
    return sorted(out)


def test_pq_weights_exact_integers():
    assert _pq_weights(1.0, 1.0) == (1, 1, 1)
    assert _pq_weights(2.0, 0.5) == (1, 2, 4)
    assert _pq_weights(0.25, 4.0) == (16, 4, 1)
    import pytest as _pt
    with _pt.raises(ValueError, match="p and q"):
        _pq_weights(0.0, 1.0)


def test_node2vec_matches_python_reference(spark):
    rng = random.Random(7)
    verts = [f"v{i}" for i in range(20)]
    pairs = [p for p in itertools.combinations(verts, 2)
             if rng.random() < 0.2]
    for p, q in ((1.0, 1.0), (2.0, 0.5), (0.25, 4.0)):
        got = sorted(map(tuple, node2vec_walks(
            _edges(spark, pairs), p=p, q=q,
            n_walks=2, walk_len=5).collect()))
        assert got == _py_n2v(pairs, p, q, 2, 5), (p, q)


def test_node2vec_bias_direction(spark):
    """Strong return bias (tiny p) walks oscillate; strong outward
    bias (tiny q) on a path graph keeps moving — the bias does what
    the paper says, beyond just matching the twin."""
    chain = [(f"n{i}", f"n{i+1}") for i in range(30)]
    back = node2vec_walks(_edges(spark, chain), p=0.01, q=100.0,
                          n_walks=1, walk_len=5).collect()
    out = node2vec_walks(_edges(spark, chain), p=100.0, q=0.01,
                         n_walks=1, walk_len=5).collect()

    def revisit_rate(rows):
        byw = {}
        for r in rows:
            byw.setdefault(r.walk_id, []).append((r.step, r.uri))
        rev = tot = 0
        for steps in byw.values():
            us = [u for _, u in sorted(steps)]
            rev += sum(1 for i in range(2, len(us))
                       if us[i] == us[i - 2])
            tot += len(us) - 2
        return rev / tot
    assert revisit_rate(back) > 0.9
    assert revisit_rate(out) < 0.1
    # layout independence
    e = _edges(spark, chain).repartition(5, "uri_b")
    again = node2vec_walks(e, p=0.01, q=100.0,
                           n_walks=1, walk_len=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, back))
