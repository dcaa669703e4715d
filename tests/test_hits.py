"""HITS: known-answer digraphs + a numpy replica of the exact half-step
program (same normalization points, same iteration count)."""

import numpy as np
import pytest

from pgs_spark.operators.hits import hits
from tests.conftest import edges_df


def ref_hits(pairs, iterations):
    """Replays hits() exactly: auth gather → L2 norm → hub gather → L2."""
    edges = sorted({(a, b) for a, b in pairs})
    verts = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in edges:
        A[idx[a], idx[b]] = 1.0
    h = np.ones(n)
    for _ in range(iterations):
        a = A.T @ h
        a = a / np.sqrt((a * a).sum())
        h = A @ a
        h = h / np.sqrt((h * h).sum())
    return {v: (h[idx[v]], a[idx[v]]) for v in verts}


def _got(df):
    return {r["id"]: (r["hub_r"], r["auth_r"]) for r in df.collect()}


def test_star_out_hub(spark):
    # 0 → {1,2,3,4}: 0 is the only hub, leaves are equal authorities
    got = _got(hits(spark, edges_df(spark, [(0, i) for i in range(1, 5)]), 3))
    assert got[0][0] == pytest.approx(1.0)
    assert got[0][1] == 0.0
    for i in range(1, 5):
        assert got[i][0] == 0.0
        assert got[i][1] == pytest.approx(0.5)


def test_bipartite_weights_concentrate(spark):
    # two customers both buy from supplier 10; one also buys from 11:
    # supplier 10 outranks 11, customer 0 outranks 1
    pairs = [(0, 10), (1, 10), (0, 11)]
    got = _got(hits(spark, edges_df(spark, pairs), 5))
    assert got[10][1] > got[11][1]
    assert got[0][0] > got[1][0]


@pytest.mark.parametrize("seed,iters", [(1, 3), (2, 5)])
def test_random_digraph_matches_numpy(spark, seed, iters):
    import random

    rng = random.Random(seed)
    pairs = [(a, b) for a in range(20) for b in range(20) if a != b and rng.random() < 0.12]
    ref = ref_hits(pairs, iters)
    got = _got(hits(spark, edges_df(spark, pairs), iters))
    assert set(got) == set(ref)
    for v, (h, a) in ref.items():
        assert got[v][0] == pytest.approx(round(h, 6), abs=2e-6)
        assert got[v][1] == pytest.approx(round(a, 6), abs=2e-6)
