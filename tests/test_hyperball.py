"""HyperBall neighborhood function (operators/graph.py): register
tables per (node, radius) must equal the HLL registers of the EXACT
ball membership (max over items IS set union — no approximation until
the estimator), and the estimates must match a from-scratch python
twin of the sketches.py integer-exact estimator bit-for-bit at 4dp."""

from __future__ import annotations

import hashlib
import math

import pytest

HASH_BITS = 60


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _register(s: str, p: int) -> tuple[int, int]:
    w_bits = HASH_BITS - p
    h = _h60(s)
    bucket = h >> w_bits
    w = h & ((1 << w_bits) - 1)
    rho = w_bits + 1 if w == 0 else w_bits + 1 - w.bit_length()
    return bucket, rho


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _estimate(items: set[str], p: int) -> float:
    m = 1 << p
    regs: dict[int, int] = {}
    for it in items:
        b, r = _register(it, p)
        regs[b] = max(regs.get(b, 0), r)
    s_int = sum(1 << (HASH_BITS - r) for r in regs.values()) \
        + (m - len(regs)) * (1 << HASH_BITS)
    e_raw = _alpha(m) * m * m * float(1 << HASH_BITS) / s_int
    zeros = m - len(regs)
    if e_raw <= 2.5 * m and zeros > 0:
        return round(m * math.log(m / zeros), 4)
    return round(e_raw, 4)


def _balls(edges: list[tuple[str, str]], max_hops: int,
           directed: bool) -> dict[tuple[str, int], set[str]]:
    adj: dict[str, set[str]] = {}
    nodes: set[str] = set()
    for a, b in edges:
        nodes |= {a, b}
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    out = {}
    for v in nodes:
        ball = {v}
        for t in range(max_hops + 1):
            out[(v, t)] = set(ball)
            ball = ball | {w for u in ball for w in adj.get(u, ())}
    return out


EDGES = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("B", "F"),
         ("F", "G"), ("X", "Y")]  # path+branch, disconnected pair


@pytest.mark.parametrize("directed", [False, True])
def test_registers_equal_exact_ball_registers(spark, directed):
    from dbpedia_spotlight_spark.operators.graph import ball_registers
    p = 8
    edges = spark.createDataFrame(EDGES, "uri_a string, uri_b string")
    got = {(r.uri, r.t, r.bucket, r.rho)
           for r in ball_registers(edges, max_hops=3, p=p,
                                   directed=directed).collect()}
    want = set()
    for (v, t), members in _balls(EDGES, 3, directed).items():
        regs: dict[int, int] = {}
        for u in members:
            b, r = _register(u, p)
            regs[b] = max(regs.get(b, 0), r)
        want |= {(v, t, b, r) for b, r in regs.items()}
    assert got == want


def test_ball_sizes_match_python_estimator(spark):
    from dbpedia_spotlight_spark.operators.graph import ball_sizes
    p = 8
    edges = spark.createDataFrame(EDGES, "uri_a string, uri_b string")
    got = {(r.uri, r.t): r.est
           for r in ball_sizes(edges, max_hops=3, p=p).collect()}
    want = {(v, t): _estimate(members, p)
            for (v, t), members in _balls(EDGES, 3, False).items()}
    assert got == want


def test_convergence_emits_all_radii(spark):
    # triangle: balls saturate at t=1; radii beyond must replicate the
    # converged registers instead of running dead joins
    from dbpedia_spotlight_spark.operators.graph import ball_sizes
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("A", "C")],
        "uri_a string, uri_b string")
    rows = ball_sizes(edges, max_hops=5, p=8).collect()
    assert {r.t for r in rows} == set(range(6))
    by_node_t = {(r.uri, r.t): r.est for r in rows}
    for v in "ABC":
        for t in range(2, 6):
            assert by_node_t[(v, t)] == by_node_t[(v, 1)]


def test_neighborhood_function_monotone_and_exact_sum(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        ball_sizes, neighborhood_function)
    edges = spark.createDataFrame(EDGES, "uri_a string, uri_b string")
    nf = {r.t: r.nf for r in
          neighborhood_function(edges, max_hops=3, p=8).collect()}
    assert list(nf) == sorted(nf) and all(
        nf[t] <= nf[t + 1] + 1e-9 for t in range(3))
    # nf(t) is the DECIMAL-exact sum of the 4dp ball estimates
    bs = ball_sizes(edges, max_hops=3, p=8).collect()
    for t in range(4):
        want = round(sum(r.est for r in bs if r.t == t), 4)
        assert abs(nf[t] - want) < 1e-9


def test_effective_diameter_path_graph(spark):
    from dbpedia_spotlight_spark.operators.graph import (
        effective_diameter)
    # 6-node path: diameter 5; interpolated 90% effective diameter
    # must land strictly inside (0, 5]
    edges = spark.createDataFrame(
        [(c, chr(ord(c) + 1)) for c in "ABCDE"],
        "uri_a string, uri_b string")
    d = effective_diameter(edges, alpha=0.9, max_hops=5, p=8)
    assert 0.0 < d <= 5.0
    d_full = effective_diameter(edges, alpha=1.0, max_hops=5, p=8)
    assert d < d_full <= 5.0
