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

from pgs_spark.operators.edges import canonicalize, degrees


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
