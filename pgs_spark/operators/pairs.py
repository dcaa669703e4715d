"""closestPointPair / farthestPointPair — global extremal pairs, distributed.

Grafts of PGS_Optimisation.closestPointPair (PGS_Optimisation.java:977;
divide-and-conquer commons/ClosestPointPair.java:48-93) and farthestPointPair
(PGS_Optimisation.java:1054, rotating calipers on the hull).

closest_pair: grid-bucket candidate join. Bucket points into cells of side s;
any pair closer than s shares a cell or sits in adjacent cells, so joining
each point's 3×3 neighborhood finds every pair with dist < s — candidates per
cell are O(points per cell), never all-pairs. s seeds from the bbox extent
(max extent / √n) so degenerate-but-valid inputs — all points collinear on an
axis-aligned line, or all identical (extent 0) — still resolve: an area-based
seed collapses to ~1e-150 there and no doubling count recovers. Cells index
(x−x0)/s so a huge-coordinate, tiny-extent cloud cannot overflow the long
cell id. The candidate filter is INCLUSIVE (d ≤ s — a pair at distance
exactly s differs by ≤ s per axis, so it still lands in the 3×3 probe) and
the no-candidate loop only gives up once s ≥ the bbox DIAGONAL (at which
point every pair both shares a probe and passes d ≤ s), so the loop provably
terminates with the exact pair for any n ≥ 2 — including two points on
opposite bbox corners, where d = √2·extent > extent.

farthest_pair: the farthest pair's endpoints lie on the convex hull. Pass 1
computes a monotone-chain hull per Arrow batch (numpy, mapInPandas — bounded
memory); pass 2 reduces the unioned candidates to the TRUE global hull
(hull-of-union-of-hulls) on one partition and takes the exact argmax with
CHUNKED vectorized pairwise distances — no crossJoin node anywhere in the
plan, so co-circular data (every point on the hull) degrades to O(h²) flops
inside one task instead of an n²-row shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dist2(xa, ya, xb, yb):
    return (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)


def closest_pair(
    spark: SparkSession, points: DataFrame, max_doublings: int = 64
) -> DataFrame:
    """points (id, x, y) → single row (a, b, dist): the globally closest pair
    (a < b; ties broken by (dist, a, b)); dist rounded to 6dp."""
    pts = points.select("id", F.col("x").cast("double"), F.col("y").cast("double")).persist()
    stats = pts.agg(
        F.count("*").alias("n"),
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).first()
    n = stats["n"]
    if n < 2:
        pts.unpersist()
        return spark.createDataFrame([], "a long, b long, dist double")
    x0, y0 = float(stats["x0"]), float(stats["y0"])
    extent = max(stats["x1"] - x0, stats["y1"] - y0)
    # give-up bound: the bbox diagonal — no pair is farther, so once s ≥ diag
    # the inclusive d ≤ s filter admits every pair and best cannot be None
    diag = float(np.hypot(stats["x1"] - x0, stats["y1"] - y0))
    s = max(extent, 0.0) / max(float(n) ** 0.5, 1.0)
    if s <= 0.0:
        s = 1e-12  # all points identical — any cell size finds the 0-dist pair

    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    best = None
    for _ in range(max_doublings):
        # bbox-relative cell ids: bounded by extent/s ≤ √n · 2^k — no overflow
        cells = pts.select(
            "id", "x", "y",
            F.floor((F.col("x") - F.lit(x0)) / s).alias("cx"),
            F.floor((F.col("y") - F.lit(y0)) / s).alias("cy"),
        )
        probe = cells.select(
            F.col("id").alias("a"), F.col("x").alias("xa"), F.col("y").alias("ya"),
            F.explode(
                F.array(*[
                    F.struct((F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy"))
                    for dx, dy in offsets
                ])
            ).alias("c"),
        ).select("a", "xa", "ya", "c.cx", "c.cy")
        cand = (
            probe.join(
                cells.select(
                    F.col("id").alias("b"), F.col("x").alias("xb"),
                    F.col("y").alias("yb"), "cx", "cy",
                ),
                ["cx", "cy"],
            )
            .filter(F.col("a") < F.col("b"))
            .select(
                "a", "b",
                F.sqrt(_dist2(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb"))).alias("d"),
            )
            .filter(F.col("d") <= F.lit(float(s)))
        )
        best = cand.orderBy("d", "a", "b").limit(1).first()
        if best is not None or s >= max(diag, 1e-12):
            # any candidate ⇒ the true argmin pair has d ≤ s ⇒ it shared a
            # probe and survived the inclusive filter ⇒ best IS the argmin;
            # s ≥ diag ⇒ every pair is a candidate, so best cannot be None
            break
        s *= 2.0
    pts.unpersist()
    if best is None:
        return spark.createDataFrame([], "a long, b long, dist double")
    return spark.createDataFrame(
        [(int(best["a"]), int(best["b"]), float(best["d"]))], "a long, b long, dist double"
    ).select("a", "b", F.round("dist", 6).alias("dist"))


def _hull_batches(batches):
    """Monotone-chain convex hull per Arrow batch (collinear points kept —
    a superset of the hull is always a valid candidate set)."""
    for pdf in batches:
        if len(pdf) <= 3:
            yield pdf
            continue
        p = pdf.sort_values(["x", "y"]).to_numpy()  # columns id, x, y

        def chain(rows):
            out = []
            for r in rows:
                while len(out) >= 2:
                    ox, oy = out[-2][1], out[-2][2]
                    ax, ay = out[-1][1], out[-1][2]
                    if (ax - ox) * (r[2] - oy) - (ay - oy) * (r[1] - ox) < 0:
                        out.pop()
                    else:
                        break
                out.append(r)
            return out

        lower = chain(p)
        upper = chain(p[::-1])
        hull = np.array(lower[:-1] + upper[:-1])
        yield pd.DataFrame({"id": hull[:, 0].astype("int64"), "x": hull[:, 1], "y": hull[:, 2]})


def _global_argmax_batches(batches):
    """Single-partition reducer: union of per-partition hull candidates →
    global hull (hull-of-union-of-hulls == the true hull) → exact farthest
    pair by chunked vectorized pairwise distance. Bounded memory (2048-row
    chunks) and zero shuffle rows even when EVERY point is on the hull
    (co-circular worst case)."""
    pdfs = [pdf for pdf in batches if len(pdf)]
    if not pdfs:
        return
    allp = pd.concat(pdfs, ignore_index=True)
    hull = allp if len(allp) <= 3 else next(iter(_hull_batches(iter([allp]))))
    ids = hull["id"].to_numpy(np.int64)
    xs = hull["x"].to_numpy(np.float64)
    ys = hull["y"].to_numpy(np.float64)
    n = len(ids)
    if n < 2:
        return
    best = None  # (d, a, b) maximizing d, then minimizing (a, b)
    chunk = 2048
    for i0 in range(0, n, chunk):
        xi, yi = xs[i0:i0 + chunk, None], ys[i0:i0 + chunk, None]
        ii = ids[i0:i0 + chunk, None]
        # same expression tree as the SQL oracle: (xa−xb)² + (ya−yb)², √ last
        d = np.sqrt((xi - xs[None, :]) * (xi - xs[None, :])
                    + (yi - ys[None, :]) * (yi - ys[None, :]))
        lo = np.minimum(ii, ids[None, :])
        hi = np.maximum(ii, ids[None, :])
        mask = ii != ids[None, :]
        if not mask.any():
            continue
        dm, am, bm = d[mask], lo[mask], hi[mask]
        mx = dm.max()
        tie = dm == mx
        order = np.lexsort((bm[tie], am[tie]))
        cand = (float(mx), int(am[tie][order[0]]), int(bm[tie][order[0]]))
        if (
            best is None
            or cand[0] > best[0]
            or (cand[0] == best[0] and (cand[1], cand[2]) < (best[1], best[2]))
        ):
            best = cand
    yield pd.DataFrame({"a": [best[1]], "b": [best[2]], "dist": [best[0]]})


def farthest_pair(spark: SparkSession, points: DataFrame) -> DataFrame:
    """points (id, x, y) → single row (a, b, dist): the globally farthest
    pair (a < b; ties broken by (−dist, a, b)); dist rounded to 6dp."""
    pts = points.select(
        F.col("id").cast("long"), F.col("x").cast("double"), F.col("y").cast("double")
    )
    hull = pts.mapInPandas(_hull_batches, schema="id long, x double, y double")
    out = hull.coalesce(1).mapInPandas(
        _global_argmax_batches, schema="a long, b long, dist double"
    )
    return out.select("a", "b", F.round("dist", 6).alias("dist"))
