"""k-truss: known-answer graphs + a pure-Python peel as differential oracle."""

import pytest

from pgs_spark.operators.truss import ktruss
from tests.conftest import PATH5, TRIANGLE_PLUS_TAIL, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def _edges(res):
    return {(r["src"], r["dst"]) for r in res.edges.collect()}


def ref_ktruss(pairs, k):
    """Sequential peel: drop edges with < k-2 triangles until stable."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {
            (a, b)
            for a, b in edges
            if len(adj[a] & adj[b]) >= k - 2
        }
        if keep == edges:
            return edges
        edges = keep


def test_triangle_plus_tail(spark):
    res = ktruss(spark, edges_df(spark, TRIANGLE_PLUS_TAIL), k=3)
    assert _edges(res) == {(0, 1), (0, 2), (1, 2)}
    assert res.converged


def test_path_has_no_3truss(spark):
    res = ktruss(spark, edges_df(spark, PATH5), k=3)
    assert _edges(res) == set()


def test_k2_is_whole_graph(spark):
    res = ktruss(spark, edges_df(spark, PATH5), k=2)
    assert _edges(res) == {(0, 1), (1, 2), (2, 3), (3, 4)}


def test_cliques_survive_4truss_bridge_dies(spark):
    # K4 ∪ K4 plus a bridge: every K4 edge sits in 2 triangles (= 4-2),
    # the bridge in none
    pairs = TWO_CLIQUES + [(3, 10)]
    res = ktruss(spark, edges_df(spark, pairs), k=4)
    assert _edges(res) == ref_ktruss(TWO_CLIQUES, 4)
    assert (3, 10) not in _edges(res)


@pytest.mark.parametrize("k", [3, 4])
def test_random_vs_sequential_peel(spark, k):
    pairs = random_graph(60, 0.12, seed=44 + k)
    res = ktruss(spark, edges_df(spark, pairs), k=k)
    assert _edges(res) == ref_ktruss(pairs, k)
    assert res.converged


def test_fixed_rounds_prefix_of_convergent_run(spark):
    """fixed_rounds=1 equals one sequential peel round (the gate program)."""
    pairs = random_graph(50, 0.12, seed=91)
    got = _edges(ktruss(spark, edges_df(spark, pairs), k=3, fixed_rounds=1))
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {(a, b) for a, b in edges if len(adj[a] & adj[b]) >= 1}
    assert got == want


@pytest.mark.parametrize("k", [3, 5])
def test_incremental_equals_full_recount(spark, k):
    """The round-6 optimization: incrementally maintained support must
    reproduce the full re-enumeration path edge-for-edge and
    round-for-round (forcing small inc_frac so incremental rounds engage)."""
    import os

    pairs = random_graph(70, 0.15, seed=7 + k)
    df = edges_df(spark, pairs)
    old = os.environ.get("PGS_TRUSS_INC_FRAC")
    os.environ["PGS_TRUSS_INC_FRAC"] = "1.0"  # every round after 1 incremental
    try:
        inc = ktruss(spark, df, k=k)
    finally:
        if old is None:
            os.environ.pop("PGS_TRUSS_INC_FRAC", None)
        else:
            os.environ["PGS_TRUSS_INC_FRAC"] = old
    full = ktruss(spark, df, k=k, full_recount=True)
    assert _edges(inc) == _edges(full)
    assert inc.rounds == full.rounds
    assert inc.converged == full.converged
    assert [h["edges"] for h in inc.history] == [h["edges"] for h in full.history]
