"""Known-answer tests for build_order (operators/dag.py) and rich_club
(operators/community.rich_club) — FIXTURES.md §3 hand-built-graph
discipline: tiny graphs, exact expectations."""

from pgs_spark.operators.community import rich_club
from pgs_spark.operators.dag import build_order, condensation_edges

from tests.conftest import edges_df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- build_order ----------------------------------------------------------

# directed: cycle {0,1,2} -> 3 -> 4, plus a root 5 -> 3 (diamond into 3)
CYCLE_TAIL = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 3)]


def test_build_order_cycle_tail(spark):
    res = build_order(spark, edges_df(spark, CYCLE_TAIL))
    got = {r["id"]: (r["scc"], r["level"]) for r in res.assignments.collect()}
    # SCC {0,1,2} collapses to min-id 0 at level 0; 5 is a root at level 0;
    # 3 waits on the cycle (level 1), 4 on 3 (level 2).
    assert got == {
        0: (0, 0),
        1: (0, 0),
        2: (0, 0),
        3: (3, 1),
        4: (4, 2),
        5: (5, 0),
    }
    # one level-sum fix point after the 2-deep chain: <= depth+1 rounds
    assert res.rounds <= 4


def test_build_order_levels_are_topological(spark):
    """Every condensation edge must go strictly uphill in level — the
    build-order invariant that makes level-parallel scheduling sound."""
    e = edges_df(spark, CYCLE_TAIL + [(4, 6), (6, 7), (7, 6)])
    res = build_order(spark, e)
    a = res.assignments
    ce = condensation_edges(e, a.select("id", "scc"))
    lv = a.select("scc", "level").distinct()
    bad = (
        ce.join(lv.withColumnRenamed("scc", "src").withColumnRenamed("level", "ls"), "src")
        .join(lv.withColumnRenamed("scc", "dst").withColumnRenamed("level", "ld"), "dst")
        .filter("ld <= ls")
    )
    assert bad.count() == 0
    # SCC members share one level
    assert a.select("scc", "level").distinct().count() == a.select("scc").distinct().count()


def test_build_order_dag_is_path_depth(spark):
    # pure path a->b->c->d: levels 0..3, singleton SCCs
    res = build_order(spark, edges_df(spark, [(10, 11), (11, 12), (12, 13)]))
    got = {r["id"]: r["level"] for r in res.assignments.collect()}
    assert got == {10: 0, 11: 1, 12: 2, 13: 3}


# --- rich_club ------------------------------------------------------------


def test_rich_club_clique_plus_pendant(spark):
    # 4-clique {0,1,2,3} plus pendant 4-0: degrees 0:4, 1/2/3:3, 4:1.
    e = edges_df(
        spark,
        [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(0, 4)],
    )
    got = {r["k"]: (r["n_club"], r["e_club"], r["phi_r"]) for r in rich_club(spark, e).collect()}
    # k=1: club {0,1,2,3} (deg>1), all 6 clique edges inside -> phi=1.0
    assert got[1] == (4, 6, 1.0)
    # k=3: club {0} alone -> filtered (n_club < 2); k=4: empty -> filtered
    assert 3 not in got and 4 not in got
    # threshold ladder = degree values present with n_club >= 2
    assert set(got) == {1}


def test_rich_club_star_is_zero(spark):
    # star: hub deg 10, leaves deg 1. k=1 club = {hub} alone -> no rows.
    e = edges_df(spark, [(0, i) for i in range(1, 11)])
    assert rich_club(spark, e).count() == 0


def test_rich_club_two_hubs_linked(spark):
    # two stars whose hubs are linked: hubs deg 4, leaves deg 1.
    e = edges_df(
        spark,
        [(0, i) for i in (2, 3, 4)]
        + [(1, i) for i in (5, 6, 7)]
        + [(0, 1)],
    )
    got = {r["k"]: (r["n_club"], r["e_club"], r["phi_r"]) for r in rich_club(spark, e).collect()}
    # k=1: club = {0,1}, the hub-hub edge inside -> phi = 2*1/(2*1) = 1.0
    assert got == {1: (2, 1, 1.0)}


# --- sssp (weighted Bellman-Ford) -------------------------------------------


def _wedges(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src long, dst long, weight long",
    )


def test_sssp_prefers_cheap_detour(spark):
    from pgs_spark.operators.traversal import sssp_distances

    # 0-1 costs 10 direct, but 0-2-1 costs 3; 1-3 extends the cheap path.
    e = _wedges(spark, [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 4)])
    got = {r["id"]: r["dist"] for r in sssp_distances(spark, e, 0, rounds=6).collect()}
    assert got == {0: 0, 2: 1, 1: 3, 3: 7}


def test_sssp_fixed_rounds_bound_path_length(spark):
    from pgs_spark.operators.traversal import sssp_distances

    # path 0-1-2-3 with unit weights: rounds=2 reaches only <=2 edges out.
    e = _wedges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r["id"]: r["dist"] for r in sssp_distances(spark, e, 0, rounds=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_sssp_rejects_negative_weights(spark):
    import pytest as _pytest

    from pgs_spark.operators.traversal import sssp_distances

    e = _wedges(spark, [(0, 1, -1)])
    with _pytest.raises(ValueError):
        sssp_distances(spark, e, 0)
