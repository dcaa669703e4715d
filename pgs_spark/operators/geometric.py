"""Proximity-graph edge filters — Gabriel and relative-neighborhood graphs.

Grafts of the reference's triangulation-derived proximity filters:
- Gabriel filter (PGS_Meshing.java:175-224 `gabrielFaces`): keep edge (a,b)
  iff no third point lies strictly inside the circle with diameter ab.
- Relative-neighborhood filter (PGS_Meshing.java:231-282 `relativeNeighborFaces`):
  keep (a,b) iff no c is strictly closer to BOTH endpoints than they are to
  each other (the lune test).

The reference filters edges of a Delaunay triangulation; a distributed engine
gets the same result from a distance-bounded candidate edge set (every
Gabriel/RNG edge on non-degenerate points is shorter than any threshold that
keeps the graph connected — here the caller picks the radius). Shapes:

  candidate edges: grid-bucketed 3x3 self-join, pair emitted once in the cell
                   of the lexicographically smaller endpoint's probe (the
                   closest_pair machinery) — never all-pairs.
  witness check:   edges x points grid join on the MIDPOINT's cell at half
                   the cell size (any witness lies within |ab|/2 <= radius/2
                   of the midpoint, so a 3x3 probe at cell=radius/2 covers
                   it), exact strict-inequality predicate inside, anti-join.

All double arithmetic is structurally mirrored by the DuckDB oracles
(__spark_entry__), so the filters are value-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _d2(xa, ya, xb, yb):
    return (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)


def neighbor_pairs(points: DataFrame, radius: float) -> DataFrame:
    """All pairs (a < b) with dist < radius: grid cells of side `radius`,
    3x3 probe, strict predicate. Output (a, xa, ya, b, xb, yb)."""
    r = float(radius)
    cells = points.select(
        "id", "x", "y",
        F.floor(F.col("x") / r).alias("cx"),
        F.floor(F.col("y") / r).alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = cells.select(
        F.col("id").alias("a"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.explode(F.array(*[
            F.struct((F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy"))
            for dx, dy in offs
        ])).alias("c"),
    ).select("a", "xa", "ya", "c.cx", "c.cy")
    return (
        probe.join(
            cells.select(
                F.col("id").alias("b"), F.col("x").alias("xb"),
                F.col("y").alias("yb"), "cx", "cy",
            ),
            ["cx", "cy"],
        )
        .filter(
            (F.col("a") < F.col("b"))
            & (_d2(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb")) < F.lit(r * r))
        )
        .select("a", "xa", "ya", "b", "xb", "yb")
        .distinct()
    )


def _witnessed(edges: DataFrame, points: DataFrame, radius: float, inside) -> DataFrame:
    """Edges having at least one witness point c (c ∉ {a,b}) satisfying
    `inside(cx, cy, edge-cols)` — candidate witnesses found via a 3x3 grid
    probe around the edge midpoint at cell = radius/2."""
    h = float(radius) / 2.0
    e = edges.select(
        "*",
        ((F.col("xa") + F.col("xb")) / 2.0).alias("mx"),
        ((F.col("ya") + F.col("yb")) / 2.0).alias("my"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    eprobe = e.select(
        "*",
        F.explode(F.array(*[
            F.struct(
                (F.floor(F.col("mx") / h) + dx).alias("gx"),
                (F.floor(F.col("my") / h) + dy).alias("gy"),
            )
            for dx, dy in offs
        ])).alias("g"),
    ).select("a", "b", "xa", "ya", "xb", "yb", "mx", "my", "g.gx", "g.gy")
    pts = points.select(
        F.col("id").alias("c"), F.col("x").alias("cx"), F.col("y").alias("cy"),
        F.floor(F.col("x") / h).alias("gx"), F.floor(F.col("y") / h).alias("gy"),
    )
    return (
        eprobe.join(pts, ["gx", "gy"])
        .filter((F.col("c") != F.col("a")) & (F.col("c") != F.col("b")))
        .filter(inside)
        .select("a", "b")
        .distinct()
    )


def gabriel_edges(points: DataFrame, radius: float) -> DataFrame:
    """(a, b): pairs closer than `radius` whose diameter circle is empty."""
    cand = neighbor_pairs(points, radius).persist()
    inside = _d2(F.col("cx"), F.col("cy"), F.col("mx"), F.col("my")) < (
        _d2(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb")) / F.lit(4.0)
    )
    bad = _witnessed(cand, points, radius, inside)
    return cand.join(bad, ["a", "b"], "left_anti").select("a", "b")


def nearest_value_1d(
    spark,
    left: DataFrame,
    right: DataFrame,
    max_doublings: int = 48,
) -> DataFrame:
    """Exact 1-NN lookup on a 1D value (the KD-tree role of
    PGS_Optimisation.closestPoint, PGS_Optimisation.java:873-925), as a
    BANDED EQUI-JOIN — never a cross join.

    left (id, val) × right (id, val) → (left_id, right_id): for each left row
    the right row minimizing |lval − rval|, ties to the smallest right id.

    Plan (the 1D analog of `neighbor_pairs`' grid): right rows dedupe to one
    row per distinct value (min id — intra-value ties resolved up front);
    cell side s = range/|right| (expected one right value per cell); each
    left row probes cells {c−1, c, c+1} via equi-join and takes
    min(struct(dist, rid)). A candidate at dist ≤ s is provably the global
    argmin (anything closer shares the probe window); left rows whose best
    candidate is farther re-run with s doubled — the closest_pair doubling
    discipline, O(log range) driver rounds, each a pure equi-join + min_by.

    Exactness guards: cells index (val − lo)/s — NOT raw val/s — so a
    huge-coordinate, tiny-range input (values ~1e15, s tiny) cannot overflow
    the long cell id or lose adjacency to double rounding; and any left rows
    still unresolved after `max_doublings` (e.g. a degenerate s floor of
    1e-12, whose coverage caps at ~281 after 48 doublings) get ONE final
    bounded pass at s = every unresolved row's worst-case distance to its
    nearest right endpoint (lo/hi are right values, so nearest-dist ≤
    min(|lv−lo|, |lv−hi|) ≤ that s) — no row is ever silently dropped.
    """
    left = left.select(F.col("id").alias("lid"), F.col("val").cast("double").alias("lv"))
    r = (
        right.select(F.col("val").cast("double").alias("rv"), F.col("id").alias("id"))
        .groupBy("rv")
        .agg(F.min("id").alias("rid"))
        .persist()
    )
    stats = r.agg(
        F.count("*").alias("n"), F.min("rv").alias("lo"), F.max("rv").alias("hi")
    ).first()
    nr = int(stats["n"] or 0)
    if nr == 0:
        r.unpersist()
        return spark.createDataFrame([], "lid long, rid long")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    s = max((hi - lo) / nr, 1e-12)

    def _round(unresolved, s):
        """One banded round at cell side s → (resolved (lid, rid), leftovers)."""
        rcells = r.select(
            "rv", "rid", F.floor((F.col("rv") - F.lit(lo)) / s).alias("cell")
        )
        probe = unresolved.select(
            "lid",
            "lv",
            F.explode(
                F.array(
                    *[F.floor((F.col("lv") - F.lit(lo)) / s) + d for d in (-1, 0, 1)]
                )
            ).alias("cell"),
        )
        best = (
            probe.join(rcells, "cell")
            .select(
                "lid",
                F.struct(F.abs(F.col("lv") - F.col("rv")).alias("d"), "rid").alias("c"),
            )
            .groupBy("lid")
            .agg(F.min("c").alias("c"))
            .select("lid", F.col("c.d").alias("d"), F.col("c.rid").alias("rid"))
        )
        done = best.filter(F.col("d") <= F.lit(float(s))).select("lid", "rid")
        return done.localCheckpoint(eager=True)

    unresolved = left.persist()
    resolved_parts = []
    for _ in range(max_doublings):
        done = _round(unresolved, s)
        resolved_parts.append(done)
        nxt = unresolved.join(done, "lid", "left_anti").persist()
        unresolved.unpersist()
        unresolved = nxt
        if unresolved.isEmpty():
            break
        s *= 2.0
    else:
        # doubling budget exhausted with leftovers: one exact final pass at
        # s ≥ max over leftovers of min(|lv−lo|, |lv−hi|) — an upper bound on
        # each row's nearest-neighbor distance, so every row resolves here
        bound = unresolved.agg(
            F.max(
                F.least(
                    F.abs(F.col("lv") - F.lit(lo)), F.abs(F.col("lv") - F.lit(hi))
                )
            ).alias("b")
        ).first()["b"]
        if bound is not None:
            resolved_parts.append(_round(unresolved, max(float(bound), s)))
    r.unpersist()
    unresolved.unpersist()
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.union(p)
    return out


def rng_edges(points: DataFrame, radius: float) -> DataFrame:
    """(a, b): pairs closer than `radius` with an empty lune — no c strictly
    closer to both endpoints than dist(a,b). A lune witness satisfies the
    median identity dist(c,m)² = (dist(c,a)² + dist(c,b)²)/2 − |ab|²/4
    < 0.75·|ab|², so it lies within (√3/2)·|ab| < 0.866·radius of the
    midpoint — covered exactly by a 3x3 probe at cell = radius (hence the
    2·radius argument to the shared witness machinery)."""
    cand = neighbor_pairs(points, radius).persist()
    dab2 = _d2(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb"))
    inside = (
        (_d2(F.col("cx"), F.col("cy"), F.col("xa"), F.col("ya")) < dab2)
        & (_d2(F.col("cx"), F.col("cy"), F.col("xb"), F.col("yb")) < dab2)
    )
    bad = _witnessed(cand, points, 2.0 * radius, inside)
    return cand.join(bad, ["a", "b"], "left_anti").select("a", "b")
