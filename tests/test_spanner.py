"""Baswana-Sen spanner: the (2k-1)-stretch invariant + determinism.

Reference parity: GreedyMultiplicativeSpanner (PGS_Meshing.java:267-285)
guarantees stretch 2k-1; so does Baswana-Sen. Sufficient check (standard):
for EVERY original edge (u,v), dist_spanner(u,v) <= 2k-1 — path stretch for
arbitrary pairs follows by summing per-edge detours."""

from collections import deque

from pgs_spark.operators.spanner import baswana_sen_spanner
from tests.conftest import edges_df
from tests.oracles import random_graph


def _bfs_dist_le(adj, src, dst, limit):
    """True iff dist(src, dst) <= limit in the adjacency dict."""
    if src == dst:
        return True
    seen = {src}
    frontier = deque([(src, 0)])
    while frontier:
        v, d = frontier.popleft()
        if d == limit:
            continue
        for w in adj.get(v, ()):
            if w == dst:
                return True
            if w not in seen:
                seen.add(w)
                frontier.append((w, d + 1))
    return False


def _check_stretch(pairs, spanner_pairs, k):
    adj = {}
    for a, b in spanner_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in pairs:
        assert _bfs_dist_le(adj, a, b, 2 * k - 1), f"edge ({a},{b}) stretched > {2*k-1}"


def test_spanner_stretch_k2(spark):
    for s in (0, 1, 2):
        pairs = random_graph(70, 0.12, seed=400 + s)
        res = baswana_sen_spanner(spark, edges_df(spark, pairs), k=2, seed=7)
        got = [(r["src"], r["dst"]) for r in res.edges.collect()]
        assert set(got) <= {(min(a, b), max(a, b)) for a, b in pairs}
        _check_stretch(pairs, got, k=2)


def test_spanner_stretch_k3_and_sparser(spark):
    pairs = random_graph(90, 0.25, seed=11)  # dense: spanner should drop edges
    e = edges_df(spark, pairs)
    r2 = baswana_sen_spanner(spark, e, k=2, seed=7)
    r3 = baswana_sen_spanner(spark, e, k=3, seed=7)
    g2 = [(r["src"], r["dst"]) for r in r2.edges.collect()]
    g3 = [(r["src"], r["dst"]) for r in r3.edges.collect()]
    _check_stretch(pairs, g2, k=2)
    _check_stretch(pairs, g3, k=3)
    m = len({(min(a, b), max(a, b)) for a, b in pairs})
    assert len(g2) < m  # actually sparsifies a dense graph
    assert len(g3) <= len(g2) * 1.2  # k=3 is at least in the same ballpark


def test_spanner_deterministic(spark):
    pairs = random_graph(50, 0.1, seed=5)
    e = edges_df(spark, pairs)
    a = {(r["src"], r["dst"]) for r in baswana_sen_spanner(spark, e, k=2, seed=7).edges.collect()}
    b = {(r["src"], r["dst"]) for r in baswana_sen_spanner(spark, e, k=2, seed=7).edges.collect()}
    c = {(r["src"], r["dst"]) for r in baswana_sen_spanner(spark, e, k=2, seed=8).edges.collect()}
    assert a == b
    assert a != c  # seed matters
