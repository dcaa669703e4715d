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


# ---------------------------------------------------------------------------
# weighted Baswana-Sen + preservePerimeter
# ---------------------------------------------------------------------------

import heapq
import random

from pgs_spark.operators.spanner import baswana_sen_spanner_weighted


def _wedges_df(spark, wpairs):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in wpairs],
        "src long, dst long, weight long",
    )


def _rand_weighted(n, p, seed, wmax=9):
    rng = random.Random(seed)
    return [
        (a, b, rng.randint(1, wmax))
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]


def _dijkstra(adj, src, dst, cap):
    """Shortest weighted distance src->dst, or None if > cap."""
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, v = heapq.heappop(pq)
        if v == dst:
            return d
        if d > dist.get(v, float("inf")) or d > cap:
            continue
        for u, w in adj.get(v, ()):
            nd = d + w
            if nd <= cap and nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist.get(dst)


def _check_weighted_stretch(wpairs, spanner_rows, k):
    adj = {}
    for r in spanner_rows:
        a, b, w = r["src"], r["dst"], r["weight"]
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    for a, b, w in wpairs:
        cap = (2 * k - 1) * w
        d = _dijkstra(adj, a, b, cap)
        assert d is not None and d <= cap, f"edge ({a},{b},w={w}) stretched > {cap}"


def test_spanner_weighted_stretch_k2_k3(spark):
    for s in (0, 1):
        wpairs = _rand_weighted(60, 0.15, seed=810 + s)
        e = _wedges_df(spark, wpairs)
        for k in (2, 3):
            res = baswana_sen_spanner_weighted(spark, e, k=k, seed=7)
            rows = res.edges.collect()
            lut = {(min(a, b), max(a, b)): w for a, b, w in wpairs}
            # output edges are real edges with their real weights
            for r in rows:
                assert lut[(r["src"], r["dst"])] == r["weight"]
            _check_weighted_stretch(wpairs, rows, k=k)


def test_spanner_weighted_sparsifies_dense(spark):
    wpairs = _rand_weighted(80, 0.3, seed=99)
    res = baswana_sen_spanner_weighted(spark, _wedges_df(spark, wpairs), k=2, seed=7)
    assert res.edges.count() < len(wpairs)


def test_spanner_weighted_unit_weights_match_unweighted(spark):
    """With all weights 1 the closer-clusters rule is empty and the weighted
    program reduces to the unweighted one (same tie-breaks) — documented
    specialization, asserted."""
    pairs = random_graph(70, 0.12, seed=404)
    uw = baswana_sen_spanner(spark, edges_df(spark, pairs), k=2, seed=7)
    ww = baswana_sen_spanner_weighted(
        spark, _wedges_df(spark, [(a, b, 1) for a, b in pairs]), k=2, seed=7
    )
    assert {(r["src"], r["dst"]) for r in uw.edges.collect()} == {
        (r["src"], r["dst"]) for r in ww.edges.collect()
    }


def test_spanner_preserve_perimeter(spark):
    """preservePerimeter (PGS_Meshing.java:276-283): constraint edges are
    unconditionally retained; result is still a spanner."""
    wpairs = _rand_weighted(50, 0.2, seed=55)
    e = _wedges_df(spark, wpairs)
    # designate every 5th edge as perimeter/constraint
    must = [(a, b) for i, (a, b, _) in enumerate(wpairs) if i % 5 == 0]
    must_df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in must], "src long, dst long"
    )
    res = baswana_sen_spanner_weighted(spark, e, k=2, seed=7, preserve_edges=must_df)
    got = {(r["src"], r["dst"]) for r in res.edges.collect()}
    assert {(min(a, b), max(a, b)) for a, b in must} <= got
    _check_weighted_stretch(wpairs, res.edges.collect(), k=2)
    # unweighted twin honors the flag too
    res_u = baswana_sen_spanner(
        spark,
        spark.createDataFrame(
            [(int(a), int(b)) for a, b, _ in wpairs], "src long, dst long"
        ),
        k=2,
        seed=7,
        preserve_edges=must_df,
    )
    got_u = {(r["src"], r["dst"]) for r in res_u.edges.collect()}
    assert {(min(a, b), max(a, b)) for a, b in must} <= got_u
