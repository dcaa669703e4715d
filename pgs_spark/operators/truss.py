"""k-truss decomposition — iterative triangle-support peeling.

The cohesive-subgraph extension of the engine's triangle machinery
(operators/triangles.py, the TriangleCollector role —
PGS_Meshing.java:118-129): the k-truss is the maximal subgraph whose every
edge participates in ≥ k−2 triangles WITHIN the subgraph (Cohen 2008). On
link graphs it is the standard community-core / spam-farm filter — stronger
than k-core (which this engine peels in operators/merge.py) because it
demands closed wedges, not mere degree.

Distributed shape (Cohen's MapReduce formulation, here as DataFrame
supersteps): each round re-enumerates triangles on the surviving edge set
with the degree-ORIENTED wedge join (out-degree bounded by O(√|E|) — hubs
become sinks, the same reason triangle_count survives power-law graphs),
credits each triangle to its three edges with one groupBy, and drops edges
below support k−2. Rounds to convergence are bounded by the peel depth
(small in practice); each round is three shuffles, state snapshots to
parquet (operators/state.py discipline — flat lineage, off-heap).

The support threshold is an exact integer comparison, so a fixed-round run
is a fixed program both engines replay bit-identically — the DuckDB oracle
(plans/oracle_sql.ktruss_sql) unrolls the identical rounds with ID-ordered
triangle enumeration (the triangle SET is orientation-independent, so the
per-edge supports agree with the degree-oriented Spark plan exactly).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import canonicalize
from pgs_spark.operators.state import make_work_dir, snapshot
from pgs_spark.operators.triangles import triangles


@dataclass
class TrussResult:
    edges: DataFrame  # canonical (src, dst) of the k-truss
    rounds: int
    converged: bool
    history: list = field(default_factory=list)


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 30,
    fixed_rounds: int | None = None,
) -> TrussResult:
    """Canonical edge subset forming the k-truss. `fixed_rounds` runs
    exactly that many peel rounds (the oracle-replayable fixed program);
    otherwise peels until an idempotent round (true k-truss). k ≤ 2 is the
    whole graph by definition (every edge has ≥ 0 triangles)."""
    cur = canonicalize(edges)
    if k <= 2:
        return TrussResult(cur, 0, True)
    work_dir = make_work_dir("pgs_truss_")
    cur = snapshot(cur, work_dir, "e_0")
    n_cur = cur.count()
    history: list[dict] = []
    limit = fixed_rounds if fixed_rounds is not None else max_rounds
    rounds = 0
    converged = False
    for r in range(1, limit + 1):
        ori_handoff: list = []
        tri = triangles(spark, cur, ori_out=ori_handoff)
        sup = (
            tri.select(F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst"))
            .union(
                tri.select(
                    F.least("y", "z").alias("src"), F.greatest("y", "z").alias("dst")
                )
            )
            .union(
                tri.select(
                    F.least("x", "z").alias("src"), F.greatest("x", "z").alias("dst")
                )
            )
            .groupBy("src", "dst")
            .agg(F.count("*").alias("cnt"))
        )
        cur = snapshot(
            sup.filter(F.col("cnt") >= k - 2).select("src", "dst"),
            work_dir,
            f"e_{r % 2}",
        )
        for ori in ori_handoff:  # snapshot materialized the round — release
            ori.unpersist()
        rounds = r
        n_new = cur.count()
        history.append({"round": r, "edges": n_new, "dropped": n_cur - n_new})
        if fixed_rounds is None and n_new == n_cur:
            converged = True
            break
        n_cur = n_new
        if n_cur == 0:
            converged = True
            break
    return TrussResult(cur, rounds, converged, history)
