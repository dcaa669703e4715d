"""Handshake maximal matching: disjointness + maximality + determinism."""

from pgs_spark.operators.matching import greedy_matching
from tests.conftest import PATH5, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def _pairs(res):
    return [(r["a"], r["b"]) for r in res.pairs.collect()]


def test_matching_disjoint_and_maximal(spark):
    for s in (0, 1):
        pairs = random_graph(60, 0.08, seed=500 + s)
        res = greedy_matching(spark, edges_df(spark, pairs))
        assert res.converged
        got = _pairs(res)
        edge_set = {(min(a, b), max(a, b)) for a, b in pairs}
        # every matched pair is a real edge
        assert set(got) <= edge_set
        # vertex-disjoint
        used = [v for p in got for v in p]
        assert len(used) == len(set(used))
        # maximal: no remaining edge has both endpoints unmatched
        unmatched = {v for a, b in pairs for v in (a, b)} - set(used)
        assert not any(a in unmatched and b in unmatched for a, b in edge_set)


def test_matching_increasing_path_fast(spark):
    """The adversarial case for min-id proposals: an id-increasing path
    needs O(n) min-id rounds; hash priorities finish in O(log n)."""
    n = 64
    path = [(i, i + 1) for i in range(n)]
    res = greedy_matching(spark, edges_df(spark, path))
    assert res.converged
    assert res.rounds <= 14  # lg(64) ~ 6 expected; generous determinstic cap
    got = _pairs(res)
    used = [v for p in got for v in p]
    assert len(used) == len(set(used))


def test_matching_deterministic(spark):
    e = edges_df(spark, TWO_CLIQUES + PATH5)
    a = set(_pairs(greedy_matching(spark, e)))
    b = set(_pairs(greedy_matching(spark, e)))
    assert a == b
