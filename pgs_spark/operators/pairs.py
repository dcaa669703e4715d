"""closestPointPair / farthestPointPair — global extremal pairs, distributed.

Grafts of PGS_Optimisation.closestPointPair (PGS_Optimisation.java:977;
divide-and-conquer commons/ClosestPointPair.java:48-93) and farthestPointPair
(PGS_Optimisation.java:1054, rotating calipers on the hull).

closest_pair: grid-bucket candidate join. Bucket points into cells of side s;
any pair closer than s shares a cell or sits in adjacent cells, so joining
each point's 3×3 neighborhood finds every pair with dist < s — candidates per
cell are O(points per cell), never all-pairs. If no pair beats s (grid too
fine), double s and retry: the driver loop runs O(1) times in practice and
the RESULT is s-independent (the exact global argmin), so a brute-force
oracle can verify it.

farthest_pair: the farthest pair's endpoints lie on the convex hull, and the
global hull is a subset of the union of per-partition hulls — so compute a
monotone-chain hull per Arrow batch (numpy, mapInPandas — the one genuinely
imperative step), union the small candidate sets, and take the exact argmax
with the same SQL-mirrorable distance expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dist2(xa, ya, xb, yb):
    return (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)


def closest_pair(
    spark: SparkSession, points: DataFrame, max_doublings: int = 8
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
    area = max((stats["x1"] - stats["x0"]) * (stats["y1"] - stats["y0"]), 1e-300)
    s = max((area / n) ** 0.5, 1e-150)  # expected ~1 point per cell

    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    best = None
    for _ in range(max_doublings):
        cells = pts.select(
            "id", "x", "y",
            F.floor(F.col("x") / s).alias("cx"),
            F.floor(F.col("y") / s).alias("cy"),
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
            .filter(F.col("d") < F.lit(float(s)))
        )
        best = cand.orderBy("d", "a", "b").limit(1).first()
        if best is not None:
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


def farthest_pair(spark: SparkSession, points: DataFrame) -> DataFrame:
    """points (id, x, y) → single row (a, b, dist): the globally farthest
    pair (a < b; ties broken by (−dist, a, b)); dist rounded to 6dp."""
    pts = points.select(
        F.col("id").cast("long"), F.col("x").cast("double"), F.col("y").cast("double")
    )
    hull = pts.mapInPandas(_hull_batches, schema="id long, x double, y double").persist()
    a = hull.select(F.col("id").alias("a"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = hull.select(F.col("id").alias("b"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    scored = (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.sqrt(_dist2(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb"))).alias("d"),
        )
    )
    out = scored.orderBy(F.col("d").desc(), "a", "b").limit(1).select(
        "a", "b", F.round("d", 6).alias("dist")
    )
    return out
