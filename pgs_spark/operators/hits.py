"""HITS hubs-and-authorities — the second classic link-analysis recurrence.

The reference's smoothMesh fixed-point family (PGS_Morphology.java:260-285,
grafted as PageRank in operators/pagerank.py) is a single-score recurrence;
HITS (Kleinberg 1999) is its two-score sibling and the canonical ranking on
BIPARTITE link structure — here the customer→supplier purchase graph
(sources/tpch_graph.customer_supplier_edges), where hub scores rank
customers by how strongly they concentrate on authoritative suppliers and
authority scores rank suppliers symmetrically.

Per superstep (the textbook mutual recursion, L2-normalized):

    auth_i(v) = Σ_{u→v} hub_{i-1}(u)   then  auth /= sqrt(Σ auth²)
    hub_i(u)  = Σ_{u→v} auth_i(v)      then  hub  /= sqrt(Σ hub²)

Distributed shape: each half-step is ONE equi-join of the edge table with a
|V|-row score relation plus a codegen groupBy-sum — identical to the
gather-scatter plan PageRank runs, so everything proven there (map-side
partial aggregation absorbing hub-degree skew, AQE, no driver-side loops)
carries over. The L2 norm is a 1-row aggregate crossJoined back (broadcast
of a scalar, never a data-sized side). State snapshots to parquet per
superstep (operators/state.py discipline — flat lineage for long runs).

Cross-engine determinism: the only non-rational step is sqrt(), which IEEE
754 requires correctly rounded (the spanner.py discipline), and the gather
sums match the DuckDB oracle's to summation-order slack that the final 6dp
round buries — the same contract pagerank_sql has held since round 1.
Oracle: plans/oracle_sql.hits_sql (unrolled CTE per half-step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.state import make_work_dir, snapshot


def hits(
    spark: SparkSession,
    directed_edges: DataFrame,
    fixed_iterations: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """(id, hub_r, auth_r) after `fixed_iterations` synchronous HITS
    supersteps on (src, dst) directed edges, both scores L2-normalized per
    half-step and rounded to `round_to` dp.

    Vertices with no out-edges carry hub 0; no in-edges carry auth 0 —
    COALESCE(0) after the gather, exactly as the oracle does."""
    e = directed_edges.select("src", "dst").distinct().persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    work_dir = make_work_dir("pgs_hits_")
    hub = snapshot(verts.select("id", F.lit(1.0).alias("hub")), work_dir, "h_0")

    for i in range(1, fixed_iterations + 1):
        # auth half-step: gather hub mass along edges, L2-normalize
        a_raw = (
            e.join(hub, e.src == hub.id)
            .groupBy(e.dst.alias("id"))
            .agg(F.sum("hub").alias("a"))
        )
        a_norm = a_raw.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("_na"))
        auth = snapshot(
            verts.join(a_raw, "id", "left")
            .crossJoin(a_norm)
            .select("id", (F.coalesce(F.col("a"), F.lit(0.0)) / F.col("_na")).alias("auth")),
            work_dir,
            f"a_{i % 2}",
        )
        # hub half-step: scatter back along edges, L2-normalize
        h_raw = (
            e.join(auth, e.dst == auth.id)
            .groupBy(e.src.alias("id"))
            .agg(F.sum("auth").alias("h"))
        )
        h_norm = h_raw.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("_nh"))
        hub = snapshot(
            verts.join(h_raw, "id", "left")
            .crossJoin(h_norm)
            .select("id", (F.coalesce(F.col("h"), F.lit(0.0)) / F.col("_nh")).alias("hub")),
            work_dir,
            f"h_{i % 2}",
        )

    out = hub.join(auth, "id").select(
        "id",
        F.round("hub", round_to).alias("hub_r"),
        F.round("auth", round_to).alias("auth_r"),
    )
    e.unpersist()
    return out
