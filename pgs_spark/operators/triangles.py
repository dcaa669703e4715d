"""Triangle counting via degree-ordered wedge join.

Fills the role of the reference's triangle enumeration
(TriangleCollector.visitSimpleTriangles, used at PGS_Meshing.java:118-129 and
PGS_Triangulation.java:626-634 — each triangle visited exactly once). A mesh
library gets "each triangle once" from planarity; a general graph gets it from
*degree orientation*: orient every undirected edge from the endpoint with the
smaller (degree, id) to the larger. Every triangle then has exactly one vertex
with two out-edges, so counting closed wedges counts each triangle once — and
the orientation bounds out-degree by O(√|E|), which is what keeps the wedge
join tractable on power-law graphs (hubs become sinks, not wedge centers).

Plan: edges ⋈ degrees (twice) → orient → self-join on the wedge center →
semi-join closure against the oriented edge set. Three shuffles total, no
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import canonicalize, degrees, symmetrize


def _oriented(und: DataFrame) -> DataFrame:
    """Canonical undirected edges → degree-oriented directed edges
    (a, b, db) with (deg(a), a) < (deg(b), b); db = deg(b) carried for the
    wedge-order comparison."""
    deg = degrees(und)
    e = (
        und.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dd"), "dst")
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(fwd, F.col("dd")).otherwise(F.col("ds")).alias("db"),
    )


def triangles(
    spark: SparkSession, edges: DataFrame, ori_out: list | None = None
) -> DataFrame:
    """All triangles of an edge table (any orientation) → (x, y, z) rows,
    each triangle exactly once (x = wedge center).

    The oriented edge table is persisted (it feeds both wedge sides and the
    closing semi-join). One-shot callers let the session reap it; ITERATIVE
    callers (operators/truss.py peels per round) pass `ori_out` to receive
    the persisted DataFrame and unpersist it once the round's result is
    materialized — otherwise every round leaks a cached relation."""
    und = canonicalize(edges)
    ori = _oriented(und).persist()
    if ori_out is not None:
        ori_out.append(ori)
    e1 = ori.select(F.col("a"), F.col("b").alias("v"), F.col("db").alias("dv"))
    e2 = ori.select(F.col("a"), F.col("b").alias("w"), F.col("db").alias("dw"))
    wedges = e1.join(e2, "a").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = ori.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi").select(
        F.col("a").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )
    return tri


def triangle_count(spark: SparkSession, edges: DataFrame) -> int:
    """Total number of triangles."""
    return triangles(spark, edges).count()


def triangle_counts_per_vertex(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """(id, n_triangles) — every corner of every triangle credited once."""
    tri = triangles(spark, edges)
    corners = (
        tri.select(F.col("x").alias("id"))
        .union(tri.select(F.col("y").alias("id")))
        .union(tri.select(F.col("z").alias("id")))
    )
    return corners.groupBy("id").agg(F.count("*").alias("n_triangles"))


def rectangle_count(
    spark: SparkSession, edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Global 4-cycle (rectangle) count — the quadrilateral sibling of
    triangle_count.

    Role: the reference's quad-mesh family (PGS_Meshing's quadrangulation
    consumers) counts quadrilateral faces from planarity; a general graph
    gets the count from the WEDGE-PAIR identity: for each unordered
    non-center pair {u, w}, let p = |N(u) ∩ N(w)| (the number of wedges
    u–z–w). Every 4-cycle u–z1–w–z2 contributes C(2,2)=1 to C(p,2) at its
    diagonal pair {u, w} and once more at the other diagonal {z1, z2}, so
    n_rectangles = Σ_{u<w} C(p,2) / 2 — pure integers end to end (the sum
    is provably even), no enumeration of the cycles themselves.

    Plan: one self-join of the symmetrized edge table on the wedge center
    (the same Σ deg² fan-out as the triangle wedge join) collapsed
    immediately by a map-side-combinable COUNT per (u, w) — the cycle count
    never materializes quadruples. ``max_center_degree`` optionally drops
    wedges centered on hubs (the standard power-law cap — DISCLOSED via the
    argument, never silent; None = exact, and the gate runs exact).

    Returns one row: (n_rectangles, n_closed_pairs) where n_closed_pairs is
    the number of distance-≤2 pairs with ≥2 common neighbors (the pairs that
    close at least one rectangle).
    """
    und = canonicalize(edges)
    sym = symmetrize(und)
    if max_center_degree is not None:
        deg = degrees(und)
        ok = deg.filter(F.col("degree") <= max_center_degree).select(
            F.col("id").alias("src")
        )
        sym = sym.join(ok, "src", "left_semi")
    s1 = sym.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    s2 = sym.select(F.col("src").alias("z"), F.col("dst").alias("w"))
    pairs = (
        s1.join(s2, "z")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("p"))
    )
    agg = pairs.agg(
        F.coalesce(F.sum(F.expr("(p * (p - 1)) DIV 2")), F.lit(0)).alias("cp2"),
        F.coalesce(
            F.sum(F.when(F.col("p") >= 2, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).alias("n_closed_pairs"),
    )
    return agg.select(
        F.expr("cp2 DIV 2").cast("long").alias("n_rectangles"),
        F.col("n_closed_pairs").cast("long"),
    )
