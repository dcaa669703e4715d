"""Gabriel / RNG filters: subset hierarchy + known configurations."""

from pgs_spark.operators.geometric import gabriel_edges, neighbor_pairs, rng_edges


def _pts(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)], "id long, x double, y double"
    )


def test_known_square_with_center(spark):
    """Unit square + center point: diagonals fail both tests (center inside);
    sides are Gabriel edges; center connects to all corners."""
    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.5)]
    df = _pts(spark, pts)
    gab = {(r["a"], r["b"]) for r in gabriel_edges(df, 2.0).collect()}
    sides = {(0, 1), (0, 2), (1, 3), (2, 3)}
    spokes = {(0, 4), (1, 4), (2, 4), (3, 4)}
    assert gab == sides | spokes  # diagonals (0,3),(1,2) rejected by center
    rng = {(r["a"], r["b"]) for r in rng_edges(df, 2.0).collect()}
    # RNG drops the square sides too: the center is in every side's lune
    # (dist(center, corner) = 0.707 < 1.0 = side length)
    assert rng == spokes
    assert rng <= gab


def test_hierarchy_on_random_points(spark):
    import random

    rnd = random.Random(17)
    pts = [(rnd.uniform(0, 10), rnd.uniform(0, 10)) for _ in range(80)]
    df = _pts(spark, pts)
    r = 3.0
    cand = {(x["a"], x["b"]) for x in neighbor_pairs(df, r).select("a", "b").collect()}
    gab = {(x["a"], x["b"]) for x in gabriel_edges(df, r).collect()}
    rng = {(x["a"], x["b"]) for x in rng_edges(df, r).collect()}
    assert rng <= gab <= cand
    assert len(rng) < len(gab) < len(cand)

    # brute-force differential
    import math

    def brute(kind):
        out = set()
        for a, b in cand:
            (xa, ya), (xb, yb) = pts[a], pts[b]
            dab2 = (xa - xb) ** 2 + (ya - yb) ** 2
            ok = True
            for c, (xc, yc) in enumerate(pts):
                if c in (a, b):
                    continue
                if kind == "gab":
                    mx, my = (xa + xb) / 2.0, (ya + yb) / 2.0
                    if (xc - mx) ** 2 + (yc - my) ** 2 < dab2 / 4.0:
                        ok = False
                        break
                else:
                    if (xc - xa) ** 2 + (yc - ya) ** 2 < dab2 and (xc - xb) ** 2 + (yc - yb) ** 2 < dab2:
                        ok = False
                        break
            if ok:
                out.add((a, b))
        return out

    assert gab == brute("gab")
    assert rng == brute("rng")
