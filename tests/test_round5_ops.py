"""Rectangle (4-cycle) count, parallel Louvain phase-1, Katz centrality,
mean-aggregate feature smoothing, temperature mix weights — NetworkX /
brute-force verified on seeded fixtures."""

import itertools
import math

import networkx as nx

from pgs_spark.operators.centrality import katz_centrality
from pgs_spark.operators.community import louvain_local_move, modularity_by_community
from pgs_spark.operators.corpus import temperature_mix_weights
from pgs_spark.operators.features import mean_aggregate_features
from pgs_spark.operators.triangles import rectangle_count
from tests.conftest import TRIANGLE_PLUS_TAIL, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def _nx_rectangles(g):
    """Brute-force 4-cycle count: C(common(u,w), 2)/2 over all pairs."""
    total = 0
    for u, w in itertools.combinations(g.nodes, 2):
        p = len(set(g[u]) & set(g[w]))
        total += p * (p - 1) // 2
    assert total % 2 == 0
    return total // 2


def test_rectangles_known_graphs(spark):
    # square: exactly one 4-cycle
    square = [(0, 1), (1, 2), (2, 3), (0, 3)]
    row = rectangle_count(spark, edges_df(spark, square)).collect()[0]
    assert row["n_rectangles"] == 1 and row["n_closed_pairs"] == 2
    # triangle + tail: no 4-cycle
    row = rectangle_count(spark, edges_df(spark, TRIANGLE_PLUS_TAIL)).collect()[0]
    assert row["n_rectangles"] == 0
    # K4: 3 four-cycles (each pair of disjoint edges)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = rectangle_count(spark, edges_df(spark, k4)).collect()[0]
    assert row["n_rectangles"] == 3


def test_rectangles_random_matches_bruteforce(spark):
    for s in (0, 1, 2):
        pairs = random_graph(30, 0.15, seed=950 + s)
        g = nx.Graph(pairs)
        row = rectangle_count(spark, edges_df(spark, pairs)).collect()[0]
        assert row["n_rectangles"] == _nx_rectangles(g)


def test_rectangles_hub_cap_undercounts_only(spark):
    pairs = random_graph(30, 0.2, seed=953)
    exact = rectangle_count(spark, edges_df(spark, pairs)).collect()[0]
    capped = rectangle_count(
        spark, edges_df(spark, pairs), max_center_degree=4
    ).collect()[0]
    assert capped["n_rectangles"] <= exact["n_rectangles"]


def test_louvain_separates_cliques(spark):
    """Two disjoint cliques: one local-move round collapses each clique to a
    single community and the two communities never mix."""
    labels = {
        r["id"]: r["comm"]
        for r in louvain_local_move(
            spark, edges_df(spark, TWO_CLIQUES), rounds=2
        ).collect()
    }
    c1 = {labels[v] for v in range(4)}
    c2 = {labels[v] for v in range(10, 13)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_louvain_improves_modularity(spark):
    """On a seeded random graph, LOUVAIN_ROUNDS of local moves reach at
    least the modularity of the singleton partition (which is ≤ 0)."""
    pairs = random_graph(40, 0.1, seed=960)
    e = edges_df(spark, pairs)
    labels = louvain_local_move(spark, e, rounds=2).select(
        "id", "comm"
    ).withColumnRenamed("comm", "label")
    q_after = sum(
        r["modularity_r"]
        for r in modularity_by_community(spark, e, labels).collect()
    )
    singleton = labels.selectExpr("id", "id AS label")
    q_single = sum(
        r["modularity_r"]
        for r in modularity_by_community(spark, e, singleton).collect()
    )
    assert q_after >= q_single


def test_louvain_deterministic(spark):
    pairs = random_graph(35, 0.12, seed=961)
    a = sorted(
        (r["id"], r["comm"])
        for r in louvain_local_move(spark, edges_df(spark, pairs), rounds=2).collect()
    )
    b = sorted(
        (r["id"], r["comm"])
        for r in louvain_local_move(spark, edges_df(spark, pairs), rounds=2).collect()
    )
    assert a == b


def test_katz_matches_reference_recurrence(spark):
    """Driver-side integer replay of x' = scale + (Σ_N x · 5) // 100."""
    pairs = random_graph(25, 0.15, seed=970)
    g = nx.Graph(pairs)
    scale = 1_000_000
    x = {v: scale for v in g.nodes}
    for _ in range(4):
        x = {
            v: scale + (sum(x[u] for u in g[v]) * 5) // 100 for v in g.nodes
        }
    got = {
        r["id"]: r["katz"]
        for r in katz_centrality(spark, edges_df(spark, pairs), rounds=4).collect()
    }
    assert got == x


def test_katz_tracks_nx_ranking(spark):
    """Truncated integer Katz orders vertices like nx.katz_centrality on a
    well-conditioned graph (same alpha, enough rounds)."""
    pairs = random_graph(30, 0.12, seed=971)
    g = nx.Graph(pairs)
    ref = nx.katz_centrality(g, alpha=0.05, beta=1.0, max_iter=500, tol=1e-12)
    got = {
        r["id"]: r["katz"]
        for r in katz_centrality(spark, edges_df(spark, pairs), rounds=12).collect()
    }
    top_ref = max(ref, key=lambda v: (ref[v], -v))
    top_got = max(got, key=lambda v: (got[v], -v))
    assert top_got == top_ref
    # Spearman-ish sanity: the induced orderings agree on >80% of pairs
    vs = sorted(g.nodes)
    agree = disagree = 0
    for a, b in itertools.combinations(vs, 2):
        if ref[a] == ref[b] or got[a] == got[b]:
            continue
        if (ref[a] < ref[b]) == (got[a] < got[b]):
            agree += 1
        else:
            disagree += 1
    assert agree / max(1, agree + disagree) > 0.8


def test_mean_aggregate_regular_graph_fixed_point(spark):
    """On a regular graph the degree feature is already smooth: every round
    returns exactly deg·scale (cycle C6 is 2-regular)."""
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    got = {
        r["id"]: (r["degree"], r["feat"])
        for r in mean_aggregate_features(spark, edges_df(spark, cyc), rounds=3).collect()
    }
    assert got == {v: (2, 2_000_000) for v in range(6)}


def test_mean_aggregate_matches_integer_replay(spark):
    pairs = random_graph(30, 0.15, seed=980)
    g = nx.Graph(pairs)
    scale = 1_000_000
    x = {v: g.degree[v] * scale for v in g.nodes}
    for _ in range(2):
        x = {v: sum(x[u] for u in g[v]) // g.degree[v] for v in g.nodes}
    got = {
        r["id"]: r["feat"]
        for r in mean_aggregate_features(
            spark, edges_df(spark, pairs), rounds=2
        ).collect()
    }
    assert got == x


def test_mix_temperature_weights(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(400)]
        + [(i, "fr") for i in range(400, 500)]
        + [(i, "sw") for i in range(500, 504)],
        "doc_id long, lang string",
    )
    rows = {r["stratum"]: r for r in temperature_mix_weights(docs).collect()}
    # weights normalize
    assert abs(sum(r["weight_r"] for r in rows.values()) - 1.0) < 1e-5
    # sqrt regime: exact micro-unit weights
    assert rows["en"]["w_micro"] == round(math.sqrt(400) * 1e6)
    assert rows["sw"]["w_micro"] == round(math.sqrt(4) * 1e6)
    # τ<1 boosts the low-resource stratum, shrinks the high-resource one
    assert rows["sw"]["boost_r"] > 1.0 > rows["en"]["boost_r"]
    # mass ordering still respects counts
    assert rows["en"]["weight_r"] > rows["fr"]["weight_r"] > rows["sw"]["weight_r"]


def test_louvain_weighted_follows_heavy_edges(spark):
    """Path 0-1-2-3 where edge (0,1) carries almost all the weight: the
    weighted gains must bind 0 and 1 into one community; unweighted rounds
    see an undifferentiated path."""
    we = spark.createDataFrame(
        [(0, 1, 100), (1, 2, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    labels = {
        r["id"]: r["comm"]
        for r in louvain_local_move(
            spark, we, rounds=2, weight_col="weight"
        ).collect()
    }
    assert labels[0] == labels[1]
    assert labels[3] != labels[0]


def test_louvain_weighted_unit_weights_match_unweighted(spark):
    """weight=1 everywhere must reproduce the unweighted program exactly."""
    pairs = random_graph(30, 0.12, seed=990)
    e = edges_df(spark, pairs)
    we = e.selectExpr("src", "dst", "CAST(1 AS LONG) AS weight")
    a = sorted(
        (r["id"], r["comm"])
        for r in louvain_local_move(spark, e, rounds=2).collect()
    )
    b = sorted(
        (r["id"], r["comm"])
        for r in louvain_local_move(
            spark, we, rounds=2, weight_col="weight"
        ).collect()
    )
    assert a == b


def test_louvain_two_level_disconnected_keeps_level1(spark):
    """Two disjoint cliques: the coarse graph has NO cross-community edges,
    so level 2 is empty and the COALESCE map-back must return the level-1
    partition unchanged."""
    from pgs_spark.operators.community import louvain_two_level

    l1 = {
        r["id"]: r["comm"]
        for r in louvain_local_move(
            spark, edges_df(spark, TWO_CLIQUES), rounds=2
        ).collect()
    }
    l2 = {
        r["id"]: r["comm"]
        for r in louvain_two_level(
            spark, edges_df(spark, TWO_CLIQUES), rounds=2, rounds2=2
        ).collect()
    }
    assert l1 == l2


def test_louvain_two_level_merges_clique_chain(spark):
    """Four 4-cliques in a sparse ring (one bridge edge between consecutive
    cliques): level 1 collapses each clique; level 2 can merge bridged
    cliques but must never split one, and modularity must not regress."""
    from pgs_spark.operators.community import louvain_two_level

    cliques = []
    for c in range(4):
        base = 10 * c
        cliques.append([(base + a, base + b) for a in range(4) for b in range(a + 1, 4)])
    bridges = [(3, 10), (13, 20), (23, 30), (33, 0)]
    pairs = [e for cl in cliques for e in cl] + bridges
    e = edges_df(spark, pairs)
    g = nx.Graph(pairs)
    two = {
        r["id"]: r["comm"]
        for r in louvain_two_level(spark, e, rounds=2, rounds2=2).collect()
    }
    # no clique is split across communities
    for c in range(4):
        assert len({two[10 * c + a] for a in range(4)}) == 1
    # modularity of the final partition beats singleton and level-1-degraded
    part = {}
    for v, cm in two.items():
        part.setdefault(cm, set()).add(v)
    q2 = nx.algorithms.community.modularity(g, list(part.values()))
    one = {
        r["id"]: r["comm"]
        for r in louvain_local_move(spark, e, rounds=2).collect()
    }
    p1 = {}
    for v, cm in one.items():
        p1.setdefault(cm, set()).add(v)
    q1 = nx.algorithms.community.modularity(g, list(p1.values()))
    assert q2 >= q1 - 1e-9
    assert q2 > 0.5  # strong planted structure must be found
