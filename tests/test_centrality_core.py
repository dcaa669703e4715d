"""Coreness (iterated h-index), resource-allocation link prediction, and
stress centrality — NetworkX-verified on seeded fixtures."""

import math

import networkx as nx

from pgs_spark.operators.centrality import stress_from_seeds
from pgs_spark.operators.community import resource_allocation_links
from pgs_spark.operators.merge import coreness_hindex
from tests.conftest import TRIANGLE_PLUS_TAIL, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def test_coreness_converges_to_core_number(spark):
    """Lü et al. 2016: iterating the neighbor h-index from degree converges
    to the core number. Enough rounds => exact match with nx.core_number."""
    for s in (0, 1):
        pairs = random_graph(40, 0.12, seed=900 + s)
        g = nx.Graph(pairs)
        got = {
            r["id"]: r["coreness"]
            for r in coreness_hindex(spark, edges_df(spark, pairs), rounds=12).collect()
        }
        assert got == nx.core_number(g)


def test_coreness_known_graph(spark):
    # 4-clique ∪ 3-clique: core numbers 3 and 2
    got = {
        r["id"]: r["coreness"]
        for r in coreness_hindex(spark, edges_df(spark, TWO_CLIQUES), rounds=8).collect()
    }
    assert all(got[v] == 3 for v in range(4))
    assert all(got[v] == 2 for v in range(10, 13))
    # triangle+tail: triangle corners core 2, tail vertex core 1
    got = {
        r["id"]: r["coreness"]
        for r in coreness_hindex(
            spark, edges_df(spark, TRIANGLE_PLUS_TAIL), rounds=8
        ).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2, 3: 1}


def test_coreness_monotone_rounds(spark):
    """The h-index iteration is monotone non-increasing per vertex."""
    pairs = random_graph(40, 0.15, seed=902)
    prev = None
    for rounds in (1, 2, 4, 8):
        cur = {
            r["id"]: r["coreness"]
            for r in coreness_hindex(spark, edges_df(spark, pairs), rounds=rounds).collect()
        }
        if prev is not None:
            assert all(cur[v] <= prev[v] for v in cur)
        prev = cur


def test_ra_links_matches_bruteforce(spark):
    pairs = random_graph(35, 0.15, seed=910)
    g = nx.Graph(pairs)
    got = {
        (r["src"], r["dst"]): (r["common_neighbors"], r["ra_micro"])
        for r in resource_allocation_links(
            spark, edges_df(spark, pairs), min_common=2
        ).collect()
    }
    want = {}
    for a in g:
        for b in g:
            if a >= b or g.has_edge(a, b):
                continue
            cn = sorted(set(g[a]) & set(g[b]))
            if len(cn) < 2:
                continue
            micro = sum(int(_round_half_up(1_000_000.0 / g.degree(z))) for z in cn)
            want[(a, b)] = (len(cn), micro)
    assert got == want


def _round_half_up(x: float) -> int:
    return math.floor(x + 0.5)


def test_stress_matches_bruteforce(spark):
    """stress(v) = #shortest seed->target paths through interior v, targets
    within max_depth — brute-forced with nx.all_shortest_paths."""
    pairs = random_graph(30, 0.15, seed=920)
    g = nx.Graph(pairs)
    seed_mod, depth = 5, 3
    seeds = [v for v in g if v % seed_mod == 0]
    want = {}
    for s in seeds:
        dist = nx.single_source_shortest_path_length(g, s, cutoff=depth)
        for t, d in dist.items():
            if t == s:
                continue
            for path in nx.all_shortest_paths(g, s, t):
                for v in path[1:-1]:
                    want[v] = want.get(v, 0) + 1
    want = {v: c for v, c in want.items() if c > 0}
    got = {
        r["id"]: r["stress"]
        for r in stress_from_seeds(
            spark, edges_df(spark, pairs), seed_mod=seed_mod, max_depth=depth
        ).collect()
    }
    assert got == want


def test_stress_path_graph(spark):
    """Path 0-1-2-3-4, seed {0}: paths from 0 to {1,2,3} within depth 3 pass
    through 1 (x2: targets 2,3) and 2 (x1: target 3)."""
    got = {
        r["id"]: r["stress"]
        for r in stress_from_seeds(
            spark,
            edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]),
            seeds=[0],
            max_depth=3,
        ).collect()
    }
    assert got == {1: 2, 2: 1}
