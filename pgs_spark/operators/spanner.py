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
    preserve_edges: DataFrame | None = None,
) -> SpannerResult:
    """Canonical undirected edge table → spanner edge subset with stretch
    ≤ 2k−1: dist_spanner(u,v) ≤ (2k−1)·dist_graph(u,v) for every edge (u,v)
    (and hence for every pair). Deterministic for a given (graph, k, seed).

    ``preserve_edges`` (src, dst): must-keep edges retained unconditionally —
    the reference's preservePerimeter flag (PGS_Meshing.java:276-283).
    Adding edges never increases distances, so the result stays a spanner.
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
    if preserve_edges is not None:
        out = out.union(
            preserve_edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
        ).distinct()
    sym.unpersist()
    return SpannerResult(out, k, p, history)


def baswana_sen_spanner_weighted(
    spark: SparkSession,
    weighted_edges: DataFrame,
    k: int = 2,
    seed: int = 7,
    preserve_edges: DataFrame | None = None,
) -> SpannerResult:
    """Weight-aware Baswana–Sen (2k−1)-spanner over a canonical
    (src, dst, weight) table: dist_spanner(u,v) ≤ (2k−1)·w_dist(u,v).

    The reference feeds its spanner the EUCLIDEAN-weighted triangulation
    graph (PGS_Triangulation.java:550-569 ``setEdgeWeight``;
    PGS_Meshing.java:267-285) — the unit-weight specialization above
    under-serves that family. Baswana–Sen 2007 is natively weighted; the
    deltas vs the unweighted program are exactly three struct-mins:

    - the LIGHTEST edge per (vertex, adjacent cluster) replaces "MIN
      neighbor id" — ``min(struct(w, v))``;
    - a vertex joins the sampled adjacent cluster reachable by the lightest
      such edge — ``min(struct(w, center, v))``;
    - each adjacent cluster STRICTLY LIGHTER than the joined one also
      contributes its lightest edge (the "closer clusters" rule that makes
      the weighted stretch bound work).

    Ties break on (weight, center/neighbor id), so for integer or otherwise
    cross-engine-exact weights the whole run remains a fixed program a
    DuckDB oracle replays bit-exactly (`spanner_weighted_sql`).

    ``preserve_edges`` (src, dst) is the reference's preservePerimeter flag
    (PGS_Meshing.java:276-283: constraint/perimeter edges are unconditionally
    retained): those edges are unioned into the output unconditionally —
    still a spanner, since adding edges never increases distances.

    Scale: identical superstep shape to the unweighted version — per round
    two hash joins + two groupBys over (vertex, cluster) state; no collect,
    no crossJoin; k ≤ 3 in practice so the localCheckpoint chain stays
    shallow.
    """
    import math

    we = weighted_edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").alias("w"),
    )
    sym = (
        we.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .union(we.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w"))
        .persist()
    )
    verts = sym.select(F.col("u").alias("id")).distinct()
    n = verts.count()
    if n == 0:
        sym.unpersist()
        return SpannerResult(
            spark.createDataFrame([], "src long, dst long, weight double"), k, 0.0
        )
    p = 1.0 / math.sqrt(float(n)) if k == 2 else float(n) ** (-1.0 / k)

    cl = verts.select("id", F.col("id").alias("center")).localCheckpoint(eager=True)
    darts = sym
    spanner_parts: list[DataFrame] = []
    history: list[dict] = []

    for i in range(1, k):
        tag = f"{i}|{seed}"
        cl_u = cl.select(
            F.col("id").alias("u"),
            F.col("center").alias("cu"),
            (_hash_unit(F.col("center"), tag) < F.lit(p)).alias("su"),
        )
        cl_v = cl.select(F.col("id").alias("v"), F.col("center").alias("cv"))
        acting = (
            darts.join(cl_u, "u")
            .join(cl_v, "v")
            .filter((F.col("cu") != F.col("cv")) & ~F.col("su"))
        )
        # lightest edge per (unsampled-cluster vertex, adjacent cluster);
        # sv recomputed from cv AFTER the groupBy (constant per group —
        # recomputation beats a nondeterministic first())
        best = (
            acting.groupBy("u", "cv")
            .agg(F.min(F.struct(F.col("w"), F.col("v"))).alias("b"))
            .select(
                "u",
                "cv",
                F.col("b.w").alias("bw"),
                F.col("b.v").alias("bv"),
                (_hash_unit(F.col("cv"), tag) < F.lit(p)).alias("sv"),
            )
            .persist()
        )
        # (a) join the sampled adjacent cluster with the lightest connecting
        # edge (ties: center, then neighbor id)
        joiners = (
            best.filter(F.col("sv"))
            .groupBy("u")
            .agg(F.min(F.struct(F.col("bw"), F.col("cv"), F.col("bv"))).alias("j"))
            .select(
                "u",
                F.col("j.bw").alias("ws"),
                F.col("j.cv").alias("c_new"),
                F.col("j.bv").alias("partner"),
            )
        )
        join_edges = joiners.select(
            F.col("u").alias("a"), F.col("partner").alias("b"), F.col("ws").alias("w")
        )
        # strictly-lighter adjacent clusters also contribute their lightest edge
        closer_edges = (
            best.join(joiners.select("u", "ws"), "u")
            .filter(F.col("bw") < F.col("ws"))
            .select(F.col("u").alias("a"), F.col("bv").alias("b"), F.col("bw").alias("w"))
        )
        # (b) no sampled adjacent cluster → exit with the lightest edge to
        # EVERY adjacent cluster
        exit_edges = (
            best.join(joiners.select("u"), "u", "left_anti")
            .select(F.col("u").alias("a"), F.col("bv").alias("b"), F.col("bw").alias("w"))
        )
        spanner_parts.append(join_edges.localCheckpoint(eager=True))
        spanner_parts.append(closer_edges.localCheckpoint(eager=True))
        spanner_parts.append(exit_edges.localCheckpoint(eager=True))
        kept = cl.filter(_hash_unit(F.col("center"), tag) < F.lit(p))
        moved = joiners.select(F.col("u").alias("id"), F.col("c_new").alias("center"))
        cl = kept.union(moved).localCheckpoint(eager=True)
        best.unpersist()
        ids = cl.select("id")
        darts = (
            darts.join(ids.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(ids.withColumnRenamed("id", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        history.append({"round": i, "clustered": cl.count()})

    # phase 2: lightest edge per (still-clustered vertex, adjacent foreign
    # cluster) under the final clustering
    cl_u = cl.select(F.col("id").alias("u"), F.col("center").alias("cu"))
    cl_v = cl.select(F.col("id").alias("v"), F.col("center").alias("cv"))
    final_edges = (
        darts.join(cl_u, "u")
        .join(cl_v, "v")
        .filter(F.col("cu") != F.col("cv"))
        .groupBy("u", "cv")
        .agg(F.min(F.struct(F.col("w"), F.col("v"))).alias("b"))
        .select(F.col("u").alias("a"), F.col("b.v").alias("b"), F.col("b.w").alias("w"))
    )
    spanner_parts.append(final_edges)

    out = spanner_parts[0]
    for part in spanner_parts[1:]:
        out = out.union(part)
    out = out.select(
        F.least("a", "b").alias("src"),
        F.greatest("a", "b").alias("dst"),
        F.col("w").alias("weight"),
    ).distinct()
    if preserve_edges is not None:
        # preservePerimeter: must-keep edges (with their input weights) are
        # retained unconditionally; union-distinct keeps the result canonical
        must = (
            preserve_edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .join(we, ["src", "dst"], "inner")
            .select("src", "dst", F.col("w").alias("weight"))
        )
        out = out.union(must).distinct()
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


def spanner_weighted_sql(edges_sql: str, seed: int = 7) -> str:
    """DuckDB oracle for `baswana_sen_spanner_weighted` at k=2, replaying the
    identical fixed program (one sampling round + final phase). Requires
    cross-engine-exact weights (integers, or expressions both engines compute
    bit-identically). Round-1 clusters are singletons, so the engine's
    per-(vertex, cluster) lightest-edge groupBy degenerates to the dart rows
    themselves (canonical input has one weight per pair); every struct-MIN
    becomes a ROW_NUMBER() ... ORDER BY (weight, center, neighbor) pick."""
    tag = f"1|{seed}"

    def unit(col: str) -> str:
        return (
            f"(('0x' || substr(md5(CAST({col} AS VARCHAR) || '|{tag}'), 1, 6))::BIGINT"
            " / 16777216.0)"
        )

    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED (
    SELECT src AS u, dst AS v, weight AS w FROM e
    UNION ALL SELECT dst, src, weight FROM e),
verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym),
pcte AS MATERIALIZED (SELECT 1.0 / sqrt(COUNT(*)) AS ps FROM verts),
-- round 1: singleton clusters (center = id); unsampled-cluster vertices act
best1 AS MATERIALIZED (
    SELECT u, v AS cv, w AS bw, v AS bv,
           {unit('v')} < (SELECT ps FROM pcte) AS sv
    FROM sym WHERE NOT ({unit('u')} < (SELECT ps FROM pcte))),
join1 AS MATERIALIZED (
    SELECT u, bw AS ws, cv AS c_new, bv AS partner FROM (
        SELECT u, bw, cv, bv,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY bw, cv, bv) AS rn
        FROM best1 WHERE sv) t WHERE rn = 1),
jedge AS (SELECT u AS a, partner AS b, ws AS w FROM join1),
closer AS (SELECT b.u AS a, b.bv AS b, b.bw AS w
           FROM best1 b JOIN join1 j ON b.u = j.u WHERE b.bw < j.ws),
xedge AS (SELECT u AS a, bv AS b, bw AS w FROM best1
          WHERE u NOT IN (SELECT u FROM join1)),
cl1 AS MATERIALIZED (
    SELECT id, id AS center FROM verts
    WHERE {unit('id')} < (SELECT ps FROM pcte)
    UNION ALL SELECT u AS id, c_new AS center FROM join1),
d1 AS MATERIALIZED (
    SELECT s.u, s.v, s.w FROM sym s
    WHERE s.u IN (SELECT id FROM cl1) AND s.v IN (SELECT id FROM cl1)),
fedge AS (
    SELECT u AS a, bv AS b, bw AS w FROM (
        SELECT d.u, d.v AS bv, d.w AS bw,
               ROW_NUMBER() OVER (PARTITION BY d.u, y.center
                                  ORDER BY d.w, d.v) AS rn
        FROM d1 d JOIN cl1 x ON d.u = x.id JOIN cl1 y ON d.v = y.id
        WHERE x.center <> y.center) t WHERE rn = 1)
SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst, w AS weight
FROM (SELECT * FROM jedge UNION ALL SELECT * FROM closer
      UNION ALL SELECT * FROM xedge UNION ALL SELECT * FROM fedge)
"""
