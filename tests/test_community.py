"""Modularity + common-neighbor link prediction vs networkx ground truth.

Same discipline as test_matching/test_spanner: seeded random graphs checked
against the networkx implementation of the published definition, plus the
FIXTURES.md known-answer graphs."""

import math
import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from pgs_spark.operators.community import (
    common_neighbor_links,
    modularity_by_community,
)
from tests.conftest import CYCLE4, TWO_CLIQUES, edges_df


def _labels_df(spark, mapping):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in mapping.items()], "id long, label long"
    )


def _nx_graph(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return g


def test_modularity_two_cliques_matches_networkx(spark):
    g = _nx_graph(TWO_CLIQUES)
    labels = {v: (0 if v < 10 else 1) for v in g.nodes}
    got = modularity_by_community(
        spark, edges_df(spark, TWO_CLIQUES), _labels_df(spark, labels)
    ).toPandas()
    total = got["modularity_r"].sum()
    want = nx.algorithms.community.modularity(
        g, [{v for v in g if labels[v] == 0}, {v for v in g if labels[v] == 1}]
    )
    assert math.isclose(total, want, abs_tol=2e-6)
    # perfect split of two cliques: every edge internal
    assert int(got["n_internal"].sum()) == len(TWO_CLIQUES)


def test_modularity_random_graph_matches_networkx(spark):
    rng = random.Random(42)
    pairs = {
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(30), rng.randrange(30)) for _ in range(120))
        if a != b
    }
    g = _nx_graph(pairs)
    labels = {v: v % 4 for v in g.nodes}
    comms = [{v for v in g if labels[v] == c} for c in range(4)]
    got = modularity_by_community(
        spark, edges_df(spark, sorted(pairs)), _labels_df(spark, labels)
    ).toPandas()
    want = nx.algorithms.community.modularity(g, [c for c in comms if c])
    assert math.isclose(got["modularity_r"].sum(), want, abs_tol=1e-5)
    # degree sums partition 2m exactly
    assert int(got["degree_sum"].sum()) == 2 * len(pairs)


def test_modularity_singleton_partition_is_negative(spark):
    # all-singletons: n_internal = 0 everywhere, Q = -Σ (d_i/2m)^2 < 0
    labels = {v: v for v in range(4)}
    got = modularity_by_community(
        spark, edges_df(spark, CYCLE4), _labels_df(spark, labels)
    ).toPandas()
    assert (got["n_internal"] == 0).all()
    assert got["modularity_r"].sum() < 0


def test_link_predict_matches_networkx_jaccard(spark):
    rng = random.Random(7)
    pairs = {
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(25), rng.randrange(25)) for _ in range(90))
        if a != b
    }
    g = _nx_graph(pairs)
    got = common_neighbor_links(
        spark, edges_df(spark, sorted(pairs)), min_common=1
    ).toPandas()
    want_rows = {}
    for u, v, j in nx.jaccard_coefficient(g):
        cn = len(list(nx.common_neighbors(g, u, v)))
        if cn >= 1 and not g.has_edge(u, v):
            want_rows[(min(u, v), max(u, v))] = (cn, j)
    got_rows = {
        (int(r.src), int(r.dst)): (int(r.common_neighbors), float(r.jaccard_r))
        for r in got.itertuples()
    }
    assert set(got_rows) == set(want_rows)
    for k, (cn, j) in want_rows.items():
        assert got_rows[k][0] == cn
        assert math.isclose(got_rows[k][1], j, abs_tol=2e-6)


def test_link_predict_excludes_existing_edges_and_respects_threshold(spark):
    got = common_neighbor_links(
        spark, edges_df(spark, TWO_CLIQUES), min_common=2
    ).toPandas()
    # two disjoint cliques: every non-adjacent pair is cross-clique with 0
    # common neighbors -> nothing predicted
    assert len(got) == 0


def test_link_predict_hub_cap_drops_hub_mediated_pairs(spark):
    star = [(0, i) for i in range(1, 6)]
    exact = common_neighbor_links(spark, edges_df(spark, star), min_common=1)
    capped = common_neighbor_links(
        spark, edges_df(spark, star), min_common=1, max_center_degree=3
    )
    # all leaf pairs are mediated by the hub (degree 5) only
    assert exact.count() == 10
    assert capped.count() == 0


def test_clustering_coefficient_matches_networkx(spark):
    from pgs_spark.operators.community import clustering_coefficient

    rng = random.Random(13)
    pairs = {
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(20), rng.randrange(20)) for _ in range(70))
        if a != b
    }
    g = _nx_graph(pairs)
    got = {
        int(r.id): r
        for r in clustering_coefficient(spark, edges_df(spark, sorted(pairs))).collect()
    }
    want = nx.clustering(g)
    for v, c in want.items():
        assert math.isclose(got[v].cc_r, c, abs_tol=2e-6), (v, got[v].cc_r, c)
        assert got[v].degree == g.degree[v]


def test_clustering_triangle_plus_tail(spark):
    from pgs_spark.operators.community import clustering_coefficient
    from tests.conftest import TRIANGLE_PLUS_TAIL

    got = {
        int(r.id): r
        for r in clustering_coefficient(
            spark, edges_df(spark, TRIANGLE_PLUS_TAIL)
        ).collect()
    }
    assert got[0].cc_r == 1.0  # in triangle, degree 2
    assert got[3].cc_r == 0.0  # tail leaf
    assert math.isclose(got[2].cc_r, 1 / 3, abs_tol=1e-6)  # degree 3, 1 triangle


def test_assortativity_matches_networkx(spark):
    from pgs_spark.operators.community import degree_assortativity

    rng = random.Random(99)
    pairs = {
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(24), rng.randrange(24)) for _ in range(80))
        if a != b
    }
    g = _nx_graph(pairs)
    got = degree_assortativity(spark, edges_df(spark, sorted(pairs))).collect()[0]
    want = nx.degree_assortativity_coefficient(g)
    assert math.isclose(got.assortativity_r, want, abs_tol=2e-6)
    assert got.n_darts == 2 * len(pairs)


def test_assortativity_regular_graph_is_degenerate_zero(spark):
    from pgs_spark.operators.community import degree_assortativity

    # cycle: all degrees equal -> zero variance -> defined as 0 here
    got = degree_assortativity(spark, edges_df(spark, CYCLE4)).collect()[0]
    assert got.assortativity_r == 0.0


def test_reciprocity_known_answer(spark):
    from pgs_spark.operators.community import reciprocity

    e = edges_df(
        spark, [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (5, 5), (1, 2)]
    )  # self-loop + dup dropped; 1<->2 and 3<->4 reciprocal
    got = reciprocity(spark, e).collect()[0]
    assert got.n_edges == 5
    assert got.n_reciprocal == 4
    assert math.isclose(got.recip_r, 0.8, abs_tol=1e-6)


def test_weighted_modularity_matches_networkx(spark):
    rng = random.Random(5)
    pairs = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(18), rng.randrange(18)) for _ in range(60))
        if a != b
    })
    wpairs = [(a, b, 1 + ((a * 7 + b) % 5)) for a, b in pairs]
    we = spark.createDataFrame(wpairs, "src long, dst long, weight long")
    g = nx.Graph()
    for a, b, w in wpairs:
        g.add_edge(a, b, weight=w)
    labels = {v: v % 3 for v in g.nodes}
    got = modularity_by_community(
        spark, we, _labels_df(spark, labels), weight_col="weight"
    ).toPandas()
    want = nx.algorithms.community.modularity(
        g, [{v for v in g if labels[v] == c} for c in range(3)], weight="weight"
    )
    assert math.isclose(got["modularity_r"].sum(), want, abs_tol=1e-5)
    # strength sums partition 2·Σw exactly
    assert int(got["degree_sum"].sum()) == 2 * sum(w for _, _, w in wpairs)
