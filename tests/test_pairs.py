"""closest/farthest pair: known answers + random differential vs numpy brute force."""

import math
import random

from pgs_spark.operators.pairs import closest_pair, farthest_pair


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)], "id long, x double, y double"
    )


def _brute(pts, kind):
    best = None
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            d = math.dist(pts[a], pts[b])
            key = (d, a, b) if kind == "min" else (-d, a, b)
            if best is None or key < best:
                best = key
    d, a, b = (best[0] if kind == "min" else -best[0]), best[1], best[2]
    return a, b, round(d, 6)


def test_known_grid(spark):
    pts = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0), (0.1, 0.0)]
    got_c = closest_pair(spark, _df(spark, pts)).first()
    assert (got_c["a"], got_c["b"], got_c["dist"]) == (0, 4, 0.1)
    got_f = farthest_pair(spark, _df(spark, pts)).first()
    assert (got_f["a"], got_f["b"], got_f["dist"]) == _brute(pts, "max")


def test_random_differential(spark):
    rng = random.Random(9)
    pts = [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(120)]
    df = _df(spark, pts)
    got_c = closest_pair(spark, df).first()
    assert (got_c["a"], got_c["b"], got_c["dist"]) == _brute(pts, "min")
    got_f = farthest_pair(spark, df).first()
    assert (got_f["a"], got_f["b"], got_f["dist"]) == _brute(pts, "max")


def test_clustered_points_force_grid_doubling(spark):
    """All points inside one tiny cluster far from the bbox scale — the
    initial cell guess finds candidates only after doubling; result exact."""
    rng = random.Random(4)
    pts = [(1000.0 + rng.uniform(0, 1e-3), 2000.0 + rng.uniform(0, 1e-3)) for _ in range(30)]
    pts.append((0.0, 0.0))  # stretch the bbox so density-derived s is huge
    got = closest_pair(spark, _df(spark, pts)).first()
    assert (got["a"], got["b"], got["dist"]) == _brute(pts, "min")
