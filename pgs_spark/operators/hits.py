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
    import math

    from pyspark.sql import Observation

    e = directed_edges.select("src", "dst").distinct().persist()
    work_dir = make_work_dir("pgs_hits_")

    # Round-6 half-step shape: ONE job per half-step. The gather writes the
    # RAW score relation (only vertices actually gathered — missing rows are
    # exact zeros that contribute nothing to the next gather and are filled
    # at the output join), the L2 norm rides the write via observe(), and
    # normalization is applied LAZILY as raw/norm when the next half-step
    # (or the output) reads the snapshot back. Per element the float ops are
    # identical to materializing the normalized score first (each raw value
    # divided by the same norm, then summed), so the 6dp-rounded output is
    # unchanged; the previous shape computed every gather twice (once for
    # the norm aggregate, once for the score join) and re-joined the |V|
    # vertex relation into every half-step.
    def _gather(prev_scores, key_in, key_out, col):
        obs = Observation()
        raw = (
            e.join(prev_scores, F.col(key_in) == prev_scores.id)
            .groupBy(F.col(key_out).alias("id"))
            .agg(F.sum("s").alias("raw"))
            .observe(obs, F.sum(F.col("raw") * F.col("raw")).alias("ss"))
        )
        snap = snapshot(raw, work_dir, col)
        norm = math.sqrt(float(obs.get["ss"] or 0.0))
        return snap.select("id", (F.col("raw") / F.lit(norm)).alias("s")), snap, norm

    hub = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct().select("id", F.lit(1.0).alias("s"))
    for i in range(1, fixed_iterations + 1):
        # auth half-step: gather hub mass along edges, L2-normalize
        auth, a_snap, na = _gather(hub, "src", "dst", f"a_{i % 2}")
        # hub half-step: scatter back along edges, L2-normalize
        hub, h_snap, nh = _gather(auth, "dst", "src", f"h_{i % 2}")

    # Every vertex with out-edges appears in the hub snapshot and every one
    # with in-edges in the auth snapshot, so their full-outer join IS the
    # vertex set — no re-derivation from the (unpersisted) edge table.
    out = (
        h_snap.select("id", F.col("raw").alias("h"))
        .join(a_snap.select("id", F.col("raw").alias("a")), "id", "full_outer")
        .select(
            "id",
            F.round(F.coalesce(F.col("h"), F.lit(0.0)) / F.lit(nh), round_to).alias(
                "hub_r"
            ),
            F.round(F.coalesce(F.col("a"), F.lit(0.0)) / F.lit(na), round_to).alias(
                "auth_r"
            ),
        )
    )
    e.unpersist()
    return out
