"""Luby MIS: independence invariant, maximality at convergence, determinism,
and O(log n) round count on the adversarial id-ordered path."""

from pgs_spark.operators.independent import luby_mis
from tests.conftest import PATH5, STAR10, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def _ids(res):
    return {r["id"] for r in res.members.collect()}


def test_mis_independent_and_maximal(spark):
    for s in (0, 1):
        pairs = random_graph(60, 0.08, seed=700 + s)
        res = luby_mis(spark, edges_df(spark, pairs))
        assert res.converged
        got = _ids(res)
        edge_set = {(min(a, b), max(a, b)) for a, b in pairs}
        # independence: no edge inside the MIS
        assert not any(a in got and b in got for a, b in edge_set)
        # maximality: every non-member has a member neighbor
        verts = {v for e in pairs for v in e}
        nbrs = {v: set() for v in verts}
        for a, b in pairs:
            nbrs[a].add(b)
            nbrs[b].add(a)
        assert all(got & nbrs[v] for v in verts - got)


def test_mis_known_graphs(spark):
    # star: either the hub alone or all leaves — both independent+maximal
    res = luby_mis(spark, edges_df(spark, STAR10))
    got = _ids(res)
    assert got == {0} or got == set(range(1, 11))
    # two disjoint cliques: exactly one member per clique
    res = luby_mis(spark, edges_df(spark, TWO_CLIQUES))
    got = _ids(res)
    assert len(got & set(range(4))) == 1
    assert len(got & set(range(10, 13))) == 1


def test_mis_deterministic(spark):
    e = edges_df(spark, PATH5)
    a = sorted((r["id"], r["mis_round"]) for r in luby_mis(spark, e).members.collect())
    b = sorted((r["id"], r["mis_round"]) for r in luby_mis(spark, e).members.collect())
    assert a == b


def test_mis_path_logarithmic_rounds(spark):
    """Adversarial id-increasing path: priority = id would admit only the
    single global minimum's ripple; per-round re-hashing keeps expected
    rounds O(log n)."""
    n = 128
    res = luby_mis(spark, edges_df(spark, [(i, i + 1) for i in range(n)]))
    assert res.converged
    assert res.rounds <= 14
