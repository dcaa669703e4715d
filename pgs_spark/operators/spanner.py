"""Multiplicative (2k−1)-spanner — distributed Baswana–Sen.

Graft of the reference's GreedyMultiplicativeSpanner (PGS_Meshing.java:267-285:
jgrapht ``GreedySpanner`` with parameter 2k−1). The greedy algorithm is
inherently sequential (it inspects edges one at a time against a growing
forest); the distributed classic with the same (2k−1)-stretch guarantee is
Baswana–Sen ("A simple and linear time randomized algorithm for computing
sparse spanners in weighted graphs", Random Struct. Algorithms 2007):
k−1 rounds of cluster sampling + one edge-per-adjacent-cluster selection,
then a final inter-cluster phase — every step a join + groupBy over the
(vertex, cluster) table, i.e. the engine's standard superstep shape.

Unweighted specialization (the reference's meshes are unit-weight for this
op): when a vertex sees a sampled adjacent cluster it keeps exactly the one
connecting edge (all edges tie at weight 1, so the "strictly closer" set of
the weighted algorithm is empty); a vertex with no sampled neighbor exits,
keeping one edge per adjacent cluster. Expected spanner size O(k·n^(1+1/k)).

Determinism (cross-engine oracle discipline): cluster sampling is HASH
sampling — center c survives round i iff md5-unit(c|i|seed) < n^(−1/k) — and
every per-vertex choice is a MIN over (center) / (neighbor id), so the whole
run is a fixed program a DuckDB oracle replays exactly. For k=2 both
engines derive the sampling threshold as 1.0/sqrt(n) — correctly-rounded
sqrt + division land on the identical double, so no value has to be smuggled
from a live run into the static oracle SQL (pow() would not guarantee that).

Scale: state is (vertex, center) + the active dart table; each round is two
hash joins + two groupBys. No collect, no crossJoin; k is 2-3 in practice so
the chained-localCheckpoint hazard (layout.py) never engages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize


def _hash_unit(col, tag: str):
    h = F.md5(F.concat(col.cast("string"), F.lit(f"|{tag}")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("double") / F.lit(16777216.0)


@dataclass
class SpannerResult:
    edges: DataFrame  # canonical (src, dst), src < dst — a (2k−1)-spanner
    k: int
    p_sample: float
    history: list = field(default_factory=list)


def baswana_sen_spanner(
    spark: SparkSession,
    undirected_edges: DataFrame,
    k: int = 2,
    seed: int = 7,
) -> SpannerResult:
    """Canonical undirected edge table → spanner edge subset with stretch
    ≤ 2k−1: dist_spanner(u,v) ≤ (2k−1)·dist_graph(u,v) for every edge (u,v)
    (and hence for every pair). Deterministic for a given (graph, k, seed).
    """
    sym = symmetrize(undirected_edges).persist()
    verts = sym.select(F.col("src").alias("id")).distinct()
    n = verts.count()
    if n == 0:
        sym.unpersist()
        return SpannerResult(
            spark.createDataFrame([], "src long, dst long"), k, 0.0
        )
    # 1/sqrt(n) for k=2 (not n**-0.5): C sqrt + IEEE division are correctly
    # rounded in BOTH Python and DuckDB, so the oracle's 1.0/sqrt(COUNT(*))
    # lands on the identical double; pow() would not guarantee that
    import math

    p = 1.0 / math.sqrt(float(n)) if k == 2 else float(n) ** (-1.0 / k)

    # clustering state: (id, center); round 0 = singleton clusters
    cl = verts.select("id", F.col("id").alias("center"))
    cl = cl.localCheckpoint(eager=True)
    # active darts: both endpoints clustered, different clusters
    darts = sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    spanner_parts: list[DataFrame] = []
    history: list[dict] = []

    for i in range(1, k):
        # cluster label + sampled flag on the v side of every dart
        cl_v = cl.select(
            F.col("id").alias("v"),
            F.col("center").alias("cv"),
            (_hash_unit(F.col("center"), f"{i}|{seed}") < F.lit(p)).alias("sv"),
        )
        cl_u = cl.select(
            "id",
            F.col("center").alias("cu"),
            (_hash_unit(F.col("center"), f"{i}|{seed}") < F.lit(p)).alias("su"),
        )
        adj = (
            darts.join(cl_u.withColumnRenamed("id", "u"), "u")
            .join(cl_v, "v")
            .filter(F.col("cu") != F.col("cv"))
            .persist()
        )
        # vertices whose own cluster was NOT sampled must act this round
        acting = adj.filter(~F.col("su"))
        # (a) nearest sampled adjacent cluster = MIN center among sampled
        joiners = (
            acting.filter(F.col("sv"))
            .groupBy("u")
            .agg(F.min("cv").alias("c_new"))
        )
        # connecting edge: the MIN neighbor id inside the chosen cluster
        join_edges = (
            acting.join(joiners, "u")
            .filter(F.col("cv") == F.col("c_new"))
            .groupBy("u", "c_new")
            .agg(F.min("v").alias("w"))
            .select(F.col("u").alias("a"), F.col("w").alias("b"))
        )
        # (b) vertices with NO sampled adjacent cluster exit, keeping one
        # edge per adjacent cluster (MIN neighbor id within each)
        exit_edges = (
            acting.join(joiners, "u", "left_anti")
            .groupBy("u", "cv")
            .agg(F.min("v").alias("w"))
            .select(F.col("u").alias("a"), F.col("w").alias("b"))
        )
        spanner_parts.append(join_edges.localCheckpoint(eager=True))
        spanner_parts.append(exit_edges.localCheckpoint(eager=True))
        # next clustering: sampled clusters keep members; joiners move
        kept = cl_u.filter(F.col("su")).select("id", F.col("cu").alias("center"))
        moved = joiners.select(F.col("u").alias("id"), F.col("c_new").alias("center"))
        cl = kept.union(moved).localCheckpoint(eager=True)
        adj.unpersist()
        # active darts: both endpoints still clustered (recomputed next round)
        ids = cl.select("id")
        darts = (
            darts.join(ids.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(ids.withColumnRenamed("id", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        history.append({"round": i, "clustered": cl.count()})

    # phase 2: every still-clustered vertex keeps one edge to each adjacent
    # foreign cluster of the final clustering
    cl_v = cl.select(F.col("id").alias("v"), F.col("center").alias("cv"))
    cl_u = cl.select("id", F.col("center").alias("cu"))
    final_edges = (
        darts.join(cl_u.withColumnRenamed("id", "u"), "u")
        .join(cl_v, "v")
        .filter(F.col("cu") != F.col("cv"))
        .groupBy("u", "cv")
        .agg(F.min("v").alias("w"))
        .select(F.col("u").alias("a"), F.col("w").alias("b"))
    )
    spanner_parts.append(final_edges)

    out = spanner_parts[0]
    for part in spanner_parts[1:]:
        out = out.union(part)
    out = (
        out.select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .distinct()
    )
    sym.unpersist()
    return SpannerResult(out, k, p, history)


def spanner_sql(edges_sql: str, k: int = 2, seed: int = 7) -> str:
    """Unrolled DuckDB oracle replaying the identical fixed program. k=2
    only: its sampling threshold 1.0/sqrt(n) is bit-exact cross-engine
    (correctly-rounded sqrt + division), so no value needs to be smuggled
    from a live engine run into this static SQL."""
    assert k == 2, "oracle supports k=2 (threshold exactness)"

    def unit(col: str, tag: str) -> str:
        return (
            f"(('0x' || substr(md5(CAST({col} AS VARCHAR) || '|{tag}'), 1, 6))::BIGINT"
            " / 16777216.0)"
        )

    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        "sym AS MATERIALIZED (SELECT src AS u, dst AS v FROM e "
        "UNION ALL SELECT dst, src FROM e)",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym)",
        "cl0 AS MATERIALIZED (SELECT id, id AS center FROM verts)",
        "pcte AS MATERIALIZED (SELECT 1.0 / sqrt(COUNT(*)) AS ps FROM verts)",
        "d0 AS MATERIALIZED (SELECT u, v FROM sym)",
    ]
    prev_cl, prev_d = "cl0", "d0"
    span_selects = []
    for i in range(1, k):
        tag = f"{i}|{seed}"
        parts += [
            f"adj{i} AS MATERIALIZED (SELECT d.u, d.v, a.center AS cu, b.center AS cv, "
            f"{unit('a.center', tag)} < (SELECT ps FROM pcte) AS su, "
            f"{unit('b.center', tag)} < (SELECT ps FROM pcte) AS sv "
            f"FROM {prev_d} d JOIN {prev_cl} a ON d.u = a.id "
            f"JOIN {prev_cl} b ON d.v = b.id WHERE a.center <> b.center)",
            f"join{i} AS MATERIALIZED (SELECT u, MIN(cv) AS c_new FROM adj{i} "
            "WHERE NOT su AND sv GROUP BY u)",
            f"jedge{i} AS (SELECT a.u AS a, MIN(a.v) AS b FROM adj{i} a "
            f"JOIN join{i} j ON a.u = j.u AND a.cv = j.c_new "
            "WHERE NOT a.su GROUP BY a.u)",
            f"xedge{i} AS (SELECT a.u AS a, MIN(a.v) AS b FROM adj{i} a "
            f"WHERE NOT a.su AND a.u NOT IN (SELECT u FROM join{i}) "
            "GROUP BY a.u, a.cv)",
            f"cl{i} AS MATERIALIZED ("
            f"SELECT c.id, c.center FROM {prev_cl} c "
            f"WHERE {unit('c.center', tag)} < (SELECT ps FROM pcte) "
            f"UNION ALL SELECT u AS id, c_new AS center FROM join{i})",
            f"d{i} AS MATERIALIZED (SELECT d.u, d.v FROM {prev_d} d "
            f"WHERE d.u IN (SELECT id FROM cl{i}) AND d.v IN (SELECT id FROM cl{i}))",
        ]
        span_selects += [f"SELECT a, b FROM jedge{i}", f"SELECT a, b FROM xedge{i}"]
        prev_cl, prev_d = f"cl{i}", f"d{i}"
    parts.append(
        "fedge AS (SELECT d.u AS a, MIN(d.v) AS b "
        f"FROM {prev_d} d JOIN {prev_cl} x ON d.u = x.id "
        f"JOIN {prev_cl} y ON d.v = y.id WHERE x.center <> y.center "
        "GROUP BY d.u, y.center)"
    )
    span_selects.append("SELECT a, b FROM fedge")
    union = " UNION ALL ".join(span_selects)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst FROM ({union})"
    )
