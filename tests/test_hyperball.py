"""HyperBall neighborhood function: oracle exactness + estimator accuracy.

The oracle-exactness test IS the correctness statement (the module's dyadic
argument says both engines compute bit-identical estimates); the accuracy
test pins the estimator to exact BFS ball sizes so a silent register-
derivation bug can't pass as "still matches the oracle that shares it."
"""

import duckdb
import pytest

from pgs_spark.operators.hyperball import hyperball, neighborhood_function
from pgs_spark.plans.oracle_sql import hyperball_sql
from tests.conftest import PATH5, STAR10, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def _oracle(pairs, supersteps):
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = hyperball_sql(f"SELECT * FROM (VALUES {vals}) t(src, dst)", supersteps)
    return {int(i): float(e) for i, e in con.execute(sql).fetchall()}


def _spark_est(spark, pairs, supersteps):
    got = hyperball(spark, edges_df(spark, pairs), supersteps=supersteps).collect()
    return {r["id"]: r["est"] for r in got}


@pytest.mark.parametrize("pairs", [PATH5, STAR10, TWO_CLIQUES])
@pytest.mark.parametrize("t", [1, 3])
def test_oracle_exact_known_graphs(spark, pairs, t):
    assert _spark_est(spark, pairs, t) == _oracle(pairs, t)


def test_oracle_exact_random_graph(spark):
    pairs = random_graph(150, 0.03, seed=321)
    assert _spark_est(spark, pairs, 3) == _oracle(pairs, 3)


def test_estimates_track_exact_ball_sizes(spark):
    """Mean HLL estimate vs mean EXACT 2-hop ball size (recursive-CTE BFS):
    m=16 gives ~26% per-vertex RSE; the mean over 150 vertices concentrates
    well inside ±20%."""
    pairs = random_graph(150, 0.03, seed=99)
    est = _spark_est(spark, pairs, 2)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    rows = con.execute(
        f"""
        WITH RECURSIVE e AS (SELECT * FROM (VALUES {vals}) t(src, dst)),
        sym AS (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e),
        verts AS (SELECT DISTINCT u AS id FROM sym),
        walk(root, id, d) AS (
            SELECT id, id, 0 FROM verts
            UNION
            SELECT w.root, s.v, w.d + 1 FROM walk w JOIN sym s ON s.u = w.id
            WHERE w.d < 2)
        SELECT root, COUNT(DISTINCT id) FROM walk GROUP BY root
        """
    ).fetchall()
    exact = {int(r): float(c) for r, c in rows}
    assert set(est) == set(exact)
    mean_est = sum(est.values()) / len(est)
    mean_true = sum(exact.values()) / len(exact)
    assert abs(mean_est - mean_true) / mean_true < 0.20


def test_monotone_in_supersteps(spark):
    """Register maxes only grow with t, so every estimate is monotone
    nondecreasing in the superstep count."""
    pairs = random_graph(80, 0.04, seed=7)
    e1 = _spark_est(spark, pairs, 1)
    e3 = _spark_est(spark, pairs, 3)
    assert all(e3[i] >= e1[i] for i in e1)


def test_neighborhood_function_is_sum(spark):
    est = _spark_est(spark, PATH5, 2)
    n = neighborhood_function(spark, edges_df(spark, PATH5), 2).collect()[0]["n_est"]
    assert n == pytest.approx(round(sum(est.values()), 6), abs=2e-6)


def _harm_oracle(pairs, supersteps):
    from pgs_spark.plans.oracle_sql import harmonic_sql

    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = harmonic_sql(f"SELECT * FROM (VALUES {vals}) t(src, dst)", supersteps)
    return {int(i): float(h) for i, h in con.execute(sql).fetchall()}


@pytest.mark.parametrize("pairs", [PATH5, STAR10])
def test_harmonic_oracle_exact(spark, pairs):
    from pgs_spark.operators.hyperball import harmonic_centrality

    got = {
        r["id"]: r["harm"]
        for r in harmonic_centrality(spark, edges_df(spark, pairs), 3).collect()
    }
    assert got == _harm_oracle(pairs, 3)


def test_harmonic_center_beats_leaf(spark):
    # star: the hub reaches everyone at distance 1, leaves at distance 2 —
    # hub centrality must dominate every leaf's (estimates are monotone and
    # the telescoping terms divide by radius)
    from pgs_spark.operators.hyperball import harmonic_centrality

    got = {
        r["id"]: r["harm"]
        for r in harmonic_centrality(spark, edges_df(spark, STAR10), 2).collect()
    }
    assert got[0] > max(got[i] for i in range(1, 11))


def test_effective_diameter_ring200(spark):
    """200-ring: balls grow 1->3->5->7 vertices, so N(r) growth dominates
    the small-set HLL bias (on a 5-vertex toy the raw estimator's bias
    floods the signal and deff degenerates to 0 — module docstring). deff
    must be interior: real hops are needed for 90% coverage."""
    from pgs_spark.operators.hyperball import effective_diameter
    from tests.conftest import edges_df

    ring = [(i, (i + 1) % 200) for i in range(200)]
    got = effective_diameter(spark, edges_df(spark, ring), supersteps=3).collect()[0]
    ns = [got.n0_r, got.n1_r, got.n2_r, got.n3_r]
    assert ns == sorted(ns)  # register maxima only grow
    assert 0.0 < got.deff_r <= 3.0


def test_effective_diameter_clique_is_small(spark):
    """Complete graph: one hop reaches everything — deff <= 1."""
    from pgs_spark.operators.hyperball import effective_diameter
    from tests.conftest import edges_df

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = effective_diameter(spark, edges_df(spark, k5), supersteps=2).collect()[0]
    assert got.deff_r <= 1.0
    assert got.n1_r == got.n2_r  # ball saturates after one hop
