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


# ---------------------------------------------------------------------------
# local-max (Preis) weighted matching — the reference's MAXIMIZE objective
# ---------------------------------------------------------------------------

import random

from pgs_spark.operators.matching import LOCAL_CP_ROUNDS, local_max_matching


def _wedges_df(spark, wpairs):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in wpairs],
        "src long, dst long, weight long",
    )


def _max_weight_matching_exact(n, wpairs):
    """Exact maximum-weight matching by bitmask DP (n <= ~16)."""
    w = {}
    for a, b, wt in wpairs:
        w[(min(a, b), max(a, b))] = max(w.get((min(a, b), max(a, b)), 0), wt)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def best(mask):
        # lowest unused vertex either stays single or pairs with a neighbor
        i = next((v for v in range(n) if not mask & (1 << v)), None)
        if i is None:
            return 0
        res = best(mask | (1 << i))
        for j in range(i + 1, n):
            if not mask & (1 << j) and (i, j) in w:
                res = max(res, w[(i, j)] + best(mask | (1 << i) | (1 << j)))
        return res

    return best(0)


def _rand_weighted(n, p, seed, wmax=10):
    rng = random.Random(seed)
    return [
        (a, b, rng.randint(1, wmax))
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    ]


def test_local_max_half_approx(spark):
    """Preis guarantee: converged local-max matching weight >= OPT/2."""
    for s in (0, 1, 2):
        wpairs = _rand_weighted(14, 0.35, seed=700 + s)
        if not wpairs:
            continue
        res = local_max_matching(spark, _wedges_df(spark, wpairs))
        assert res.converged
        got = res.pairs.collect()
        total = sum(r["weight"] for r in got)
        opt = _max_weight_matching_exact(14, wpairs)
        assert 2 * total >= opt, f"seed {s}: {total} < half of {opt}"
        # vertex-disjoint + edges real + weights correct
        used = [v for r in got for v in (r["a"], r["b"])]
        assert len(used) == len(set(used))
        lut = {(min(a, b), max(a, b)): w for a, b, w in wpairs}
        for r in got:
            assert lut[(r["a"], r["b"])] == r["weight"]


def test_local_max_maximal_and_deterministic(spark):
    wpairs = _rand_weighted(40, 0.1, seed=31)
    e = _wedges_df(spark, wpairs)
    r1 = local_max_matching(spark, e)
    r2 = local_max_matching(spark, e)
    assert r1.converged
    p1 = {(r["a"], r["b"]) for r in r1.pairs.collect()}
    p2 = {(r["a"], r["b"]) for r in r2.pairs.collect()}
    assert p1 == p2
    used = {v for p in p1 for v in p}
    unmatched = {v for a, b, _ in wpairs for v in (a, b)} - used
    assert not any(a in unmatched and b in unmatched for a, b, _ in wpairs)


def test_local_max_adversarial_path_snapshot_state(spark):
    """Increasing-weight path: every vertex proposes 'up', so exactly one
    pair matches per round — n/2 sequential rounds, well past the
    localCheckpoint chain cliff (LOCAL_CP_ROUNDS). Verifies the parquet
    round-state path yields the correct alternating matching AND that 25+
    round loops complete (the measured geometric blowup would time this
    out)."""
    n = 50  # edges (i, i+1, w=i+1) -> ~25 rounds
    wpairs = [(i, i + 1, i + 1) for i in range(n)]
    res = local_max_matching(spark, _wedges_df(spark, wpairs), max_rounds=40)
    assert res.converged
    assert res.rounds > LOCAL_CP_ROUNDS  # the snapshot path actually engaged
    got = sorted((r["a"], r["b"]) for r in res.pairs.collect())
    # greedy-by-weight from the top: (49,50), (47,48), ... every other edge
    expect = sorted((n - 1 - 2 * k, n - 2 * k) for k in range((n + 1) // 2))
    assert got == expect
