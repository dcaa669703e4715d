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


def test_farthest_pair_cocircular_bounded(spark):
    """Co-circular points — EVERY point on the hull, the former n²-crossJoin
    worst case. The two-pass hull + chunked in-task argmax must return the
    exact pair with no CartesianProduct in the plan and no n²-row shuffle."""
    import math

    from pgs_spark.operators.pairs import farthest_pair
    from pgs_spark.plans.explain import plan_string

    n = 2000
    rows = [
        (i, math.cos(2 * math.pi * i / n), math.sin(2 * math.pi * i / n))
        for i in range(n)
    ]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    q = farthest_pair(spark, pts)
    assert "CartesianProduct" not in plan_string(q)
    got = q.first()
    # brute-force oracle in numpy
    import numpy as np

    xs = np.array([r[1] for r in rows])
    ys = np.array([r[2] for r in rows])
    d = np.sqrt((xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2)
    iu = np.triu_indices(n, 1)
    dm = d[iu]
    mx = dm.max()
    ties = np.flatnonzero(dm == mx)
    a = iu[0][ties].min()
    b = iu[1][ties[iu[0][ties] == a]].min()
    assert (got["a"], got["b"]) == (a, b)
    assert abs(got["dist"] - round(float(mx), 6)) < 1e-12


def test_closest_pair_collinear_and_identical(spark):
    """Degenerate-but-valid inputs (zero bbox area) must still return the
    true pair — the area-seeded grid collapsed here (ADVICE round 2)."""
    from pgs_spark.operators.pairs import closest_pair

    # axis-aligned collinear: height 0
    pts = spark.createDataFrame(
        [(0, 0.0, 5.0), (1, 10.0, 5.0), (2, 13.0, 5.0), (3, 100.0, 5.0)],
        "id long, x double, y double",
    )
    got = closest_pair(spark, pts).first()
    assert (got["a"], got["b"], got["dist"]) == (1, 2, 3.0)
    # all identical at a huge coordinate (zero extent, overflow hazard)
    pts2 = spark.createDataFrame(
        [(7, 1e15, -1e15), (8, 1e15, -1e15), (9, 1e15, -1e15)],
        "id long, x double, y double",
    )
    got2 = closest_pair(spark, pts2).first()
    assert (got2["a"], got2["b"], got2["dist"]) == (7, 8, 0.0)


def test_closest_pair_two_diagonal_corners(spark):
    """Two points on opposite bbox corners: d = sqrt(2)*extent > extent. The
    round-3 strict d < s filter + s >= extent break returned EMPTY here
    (ADVICE round 3 high) — must return the exact pair, never empty."""
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 1.0)], "id long, x double, y double"
    )
    rows = closest_pair(spark, pts).collect()
    assert len(rows) == 1
    got = rows[0]
    assert (got["a"], got["b"], got["dist"]) == (0, 1, round(math.sqrt(2.0), 6))


def test_nearest_value_1d_huge_offset_and_leftovers(spark):
    """ADVICE round 3 medium: raw-value bucketing mis-buckets huge-coordinate
    tiny-range values; leftovers after the doubling budget were dropped.
    Cells now index (val - lo)/s and a final bounded pass resolves all rows."""
    from pgs_spark.operators.geometric import nearest_value_1d

    # huge coordinates, tiny relative range: raw floor(v/s) computes cell ids
    # ~1e15 where double ulp is ~0.25 — adjacency is lost to rounding.
    # (spacing 1.0 at base 1e15 is exactly representable: ulp(1e15) = 0.125)
    base = 1e15
    right = spark.createDataFrame(
        [(i, base + i * 1.0) for i in range(10)], "id long, val double"
    )
    left = spark.createDataFrame(
        [(100 + i, base + i * 1.0 + 0.375) for i in range(10)],
        "id long, val double",
    )
    got = {r["lid"]: r["rid"] for r in nearest_value_1d(spark, left, right).collect()}
    assert got == {100 + i: i for i in range(10)}

    # all right values identical (s floors at 1e-12, doubling caps ~281):
    # a far-away left row must STILL resolve via the final bounded pass
    right2 = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "id long, val double"
    )
    left2 = spark.createDataFrame(
        [(10, 1e6), (11, 4.9)], "id long, val double"
    )
    got2 = {r["lid"]: r["rid"] for r in nearest_value_1d(spark, left2, right2).collect()}
    assert got2 == {10: 1, 11: 1}
