"""Deterministic random walks: structural invariants + determinism."""

from pyspark.sql import functions as F

from pgs_spark.operators.walks import random_walks
from tests.conftest import CYCLE4, TWO_CLIQUES, edges_df


def test_walks_follow_edges_and_have_full_length(spark):
    got = random_walks(
        spark, edges_df(spark, TWO_CLIQUES), walk_len=3, start_mod=1
    ).toPandas()
    adj = set()
    for a, b in TWO_CLIQUES:
        adj.add((a, b))
        adj.add((b, a))
    walks = {}
    for r in got.itertuples():
        walks.setdefault(int(r.walk_id), {})[int(r.step)] = int(r.vertex)
    verts = {v for e in TWO_CLIQUES for v in e}
    assert set(walks) == verts  # one walk per vertex at start_mod=1
    for wid, path in walks.items():
        assert sorted(path) == [0, 1, 2, 3]  # steps 0..3, no gaps
        assert path[0] == wid
        for t in range(3):
            assert (path[t], path[t + 1]) in adj, (wid, t, path)


def test_walks_stay_inside_component(spark):
    got = random_walks(
        spark, edges_df(spark, TWO_CLIQUES), walk_len=5, start_mod=1
    ).toPandas()
    for r in got.itertuples():
        same_side = (r.walk_id < 10) == (r.vertex < 10)
        assert same_side, (r.walk_id, r.step, r.vertex)


def test_walks_deterministic_and_seed_sensitive(spark):
    e = edges_df(spark, CYCLE4)
    a = sorted(map(tuple, random_walks(spark, e, walk_len=4, start_mod=1).collect()))
    b = sorted(map(tuple, random_walks(spark, e, walk_len=4, start_mod=1).collect()))
    c = sorted(
        map(tuple, random_walks(spark, e, walk_len=4, start_mod=1, seed=7).collect())
    )
    assert a == b
    assert a != c  # different seed, different paths (4-cycle: 2 choices/step)


def test_walks_start_slice(spark):
    got = random_walks(spark, edges_df(spark, CYCLE4), walk_len=2, start_mod=2)
    wids = {int(r.walk_id) for r in got.select("walk_id").distinct().collect()}
    assert wids == {0, 2}


def test_double_sweep_exact_on_path(spark):
    """PATH5 is a tree: the double sweep finds the TRUE diameter (4)."""
    from pgs_spark.operators.traversal import double_sweep_diameter
    from tests.conftest import PATH5

    got = double_sweep_diameter(spark, edges_df(spark, PATH5)).collect()[0]
    assert got.src0 == 0
    assert got.ecc0 == 4 and got.far0 == 4  # farthest from 0 on a path
    assert got.diam_lb == 4 and got.far1 == 0


def test_double_sweep_lower_bounds_cycle(spark):
    """6-cycle: true diameter 3; any sweep pair reports exactly 3."""
    from pgs_spark.operators.traversal import double_sweep_diameter

    ring6 = [(i, (i + 1) % 6) for i in range(6)]
    got = double_sweep_diameter(spark, edges_df(spark, ring6)).collect()[0]
    assert got.diam_lb == 3
