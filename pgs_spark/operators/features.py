"""Neighborhood feature smoothing — the GNN-preprocessing operator.

Role: the relational graft of the reference's Laplacian smoothing loop
(PGS_Morphology.smooth / smoothMesh's per-vertex neighbor averaging,
PGS_Meshing.java:831-856): each round replaces a vertex value with the MEAN
of its neighbors' values. On a link graph this is exactly the propagation
step of simplified graph convolution (SGC, Wu et al. 2019) / GraphSAGE's
mean aggregator (Hamilton et al. 2017) — the standard way to precompute
k-hop-smoothed vertex features for downstream models without training a
network, which is what a 100-TB feature pipeline actually runs.

DETERMINISM: a float mean is summation-order-dependent across engines, so
the feature is carried in INTEGER MICRO-UNITS with a floor-divided mean:

    x_0(v)     = deg(v) · scale            (the degree feature, exact)
    x_{t+1}(v) = (Σ_{u∈N(v)} x_t(u)) DIV deg(v)

Integer sum + integer floor division — bit-exact replay in DuckDB
(plans/oracle_sql.mean_agg_sql), no epsilon. deg(v) ≥ 1 for every vertex of
the edge table, so the division is total.

Scale shape per round: one |E|-sized dart join + one map-side-combinable
integer SUM per vertex, then a broadcast-free join back to the |V|-sized
degree table — a PageRank superstep without teleport. k is small (2–3) by
construction: SGC's own ablation shows k > 3 over-smooths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import canonicalize, degrees, symmetrize


def mean_aggregate_features(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Canonical/any edges → (id, degree, feat) after ``rounds`` synchronous
    neighbor-mean rounds; feat in micro-units (feat/scale ≈ the smoothed
    degree). All-integer — see module docstring."""
    und = canonicalize(edges).persist()
    sym = symmetrize(und).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    deg = degrees(und)
    x = deg.select(
        "id", "degree", (F.col("degree") * F.lit(int(scale))).cast("long").alias("feat")
    )
    for _ in range(rounds):
        gathered = (
            sym.join(x.select(F.col("id").alias("u"), "feat"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("feat").alias("g"))
        )
        x = deg.join(gathered, "id").select(
            "id", "degree", F.expr("g DIV degree").cast("long").alias("feat")
        )
    return x
