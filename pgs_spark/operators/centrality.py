"""Stress centrality from a seed set — Brandes-shaped, all-integer.

Role: the shortest-path-centrality member of the reference's traversal
family. distanceTree (PGS_Contour.java:718-740) gives single-source hop
distances; stress centrality (Shimbel 1953) asks the next question — how
many shortest paths RUN THROUGH each vertex — and is the integer sibling of
betweenness. Exact betweenness accumulates sigma_v/sigma_w fractions
(Brandes 2001) whose float sums are summation-order-dependent and therefore
not replayable across engines; stress keeps Brandes' two-phase structure
with PURE INTEGER arithmetic, so the DuckDB oracle matches bit-for-bit.

Pilot-seed semantics (the standard sampling estimator shape, Brandes-Pich
2007): centrality is accumulated from a FIXED SEED SET within a FIXED DEPTH
— `stress(v) = Σ_{s in seeds} Σ_t sigma_st(v)` over targets t within
``max_depth`` hops of s. Both bounds are disclosed parameters, not silent
caps; exact all-sources stress is the seeds=V, max_depth=diameter corner.

Two phases, both per-seed but batched over ALL seeds in one DataFrame with
a seed column (one Spark job services every seed simultaneously — adding
seeds widens rows, not stages):

1. FORWARD: BFS levels with path counts. sigma(s, v) = number of shortest
   s->v paths; level d+1 = gather from level d, anti-join against the seen
   set, SUM(sigma) per (seed, vertex).
2. BACKWARD: psi(s, v) = number of shortest-path CONTINUATIONS from v to
   any strictly-deeper target, via psi(v) = Σ_{w in succ(v)} (1 + psi(w))
   (succ = neighbors one level deeper; every cross-level edge is a BFS-DAG
   edge). Then stress(v) += sigma(s, v) * psi(s, v) for v != s — v as a
   path ENDPOINT contributes nothing by construction (psi counts
   continuations, which an endpoint's own path lacks).

Scale shape: each forward hop is one join + one anti-join + one
map-side-combinable SUM on (seed, id); each backward level the same with
the join transposed. State per level is at most |seeds| * |V| rows;
levels snapshot to parquet (alternating names — the kcore/BFS discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize
from pgs_spark.operators.state import make_work_dir, snapshot


def stress_from_seeds(
    spark: SparkSession,
    undirected_edges: DataFrame,
    seeds: list[int] | DataFrame | None = None,
    seed_mod: int | None = None,
    max_depth: int = 3,
) -> DataFrame:
    """Canonical undirected edges + a seed set -> (id, stress).

    Seeds come as an explicit id list, a single-column (id) DataFrame, or —
    the scale-generic form — ``seed_mod``: every vertex with id % seed_mod
    == 0 seeds (a deterministic slice that exists at every scale factor; no
    driver-side collect). Emits vertices with stress > 0 (interior vertices
    of at least one counted shortest path). Oracle:
    plans/oracle_sql.stress_sql unrolls the identical program.
    """
    work_dir = make_work_dir("pgs_stress_")
    sym = symmetrize(
        undirected_edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    ).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    sym = snapshot(sym, work_dir, "sym")

    if seed_mod is not None:
        seeds_df = (
            sym.select(F.col("u").alias("id")).distinct()
            .filter(F.col("id") % seed_mod == 0)
        )
    elif isinstance(seeds, DataFrame):
        seeds_df = seeds.select("id")
    else:
        seeds_df = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    lvl0 = seeds_df.select(
        F.col("id").alias("s"), "id", F.lit(1).cast("long").alias("sigma")
    )
    levels: list[DataFrame] = [snapshot(lvl0, work_dir, "lvl_0")]
    seen = levels[0].select("s", "id")
    for d in range(1, max_depth + 1):
        prev = levels[-1]
        nxt = (
            prev.join(sym, prev["id"] == sym["u"])
            .select("s", F.col("v").alias("id"), "sigma")
            .join(seen, ["s", "id"], "left_anti")
            .groupBy("s", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = snapshot(nxt, work_dir, f"lvl_{d}")
        levels.append(nxt)
        seen = snapshot(
            seen.union(nxt.select("s", "id")), work_dir, f"seen_{d % 2}"
        )

    psi = levels[max_depth].select("s", "id", F.lit(0).cast("long").alias("psi"))
    psi = snapshot(psi, work_dir, f"psi_{max_depth}")
    contribs: list[DataFrame] = []
    # deepest level contributes nothing (psi = 0); skip its sigma*psi rows
    for d in range(max_depth - 1, -1, -1):
        succ = (
            psi.join(sym, psi["id"] == sym["v"])
            .select("s", F.col("u").alias("id"), "psi")
        )
        cur = levels[d]
        psi = (
            cur.select("s", "id", "sigma")
            .join(succ, ["s", "id"], "left")
            .groupBy("s", "id")
            .agg(
                F.first("sigma").alias("sigma"),
                F.coalesce(F.sum(F.lit(1) + F.col("psi")), F.lit(0)).alias("psi"),
            )
        )
        psi = snapshot(psi, work_dir, f"psi_{d}")
        contribs.append(
            psi.filter(F.col("id") != F.col("s")).select(
                "id", (F.col("sigma") * F.col("psi")).alias("c")
            )
        )
        psi = psi.select("s", "id", "psi")

    out = contribs[0]
    for c in contribs[1:]:
        out = out.union(c)
    return (
        out.groupBy("id")
        .agg(F.sum("c").alias("stress"))
        .filter(F.col("stress") > 0)
    )


def katz_centrality(
    spark: SparkSession,
    undirected_edges: DataFrame,
    rounds: int = 4,
    alpha_num: int = 5,
    alpha_den: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Katz centrality (Katz 1953) truncated to a fixed round count, in
    INTEGER MICRO-UNITS — the attenuated-walk-count sibling of PageRank
    (smoothMesh's averaging loop graft, pagerank.py) that weights ALL walks
    instead of a stationary random surfer: x = Σ_k α^k A^k 1.

    The recurrence x' = 1 + α·A·x is evaluated in fixed point:

        x_0(v)   = scale                     (1.0 in micro-units)
        x_{t+1}(v) = scale + (Σ_{u∈N(v)} x_t(u) · alpha_num) DIV alpha_den

    Every term is a BIGINT; the one non-ring op is the floor division, which
    both engines define identically for non-negative operands — so the
    DuckDB oracle (plans/oracle_sql.katz_sql) replays the program bit-exact
    with no rounding epsilon. α = alpha_num/alpha_den (default 0.05) sits
    below 1/λ_max for the gate graphs, matching the convergent regime of the
    true series; ``rounds`` is a disclosed truncation, not a silent cap.

    Scale shape per round: one |E|-sized dart join + one map-side-combinable
    integer SUM per vertex — identical to a PageRank superstep without the
    dangling pass. Returns (id, katz) with katz in micro-units.
    """
    from pgs_spark.operators.edges import canonicalize

    sym = symmetrize(canonicalize(undirected_edges)).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    verts = sym.select(F.col("u").alias("id")).distinct()
    x = verts.select("id", F.lit(int(scale)).cast("long").alias("katz"))
    for _ in range(rounds):
        gathered = (
            sym.join(x.select(F.col("id").alias("u"), "katz"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("katz").alias("g"))
        )
        x = verts.join(gathered, "id", "left").select(
            "id",
            (
                F.lit(int(scale))
                + F.expr(
                    f"(coalesce(g, 0L) * {int(alpha_num)}) DIV {int(alpha_den)}"
                )
            ).cast("long").alias("katz"),
        )
    return x


def betweenness_from_seeds(
    spark: SparkSession,
    undirected_edges: DataFrame,
    seeds: list[int] | DataFrame | None = None,
    seed_mod: int | None = None,
    max_depth: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Seeded BETWEENNESS centrality — the fractional refinement of
    stress_from_seeds (same Brandes 2001 two-phase skeleton, same
    Brandes-Pich 2007 pilot-seed estimator shape): instead of counting the
    shortest paths through a vertex, weight each one by the FRACTION of
    s->t shortest paths it represents.

    DETERMINISM: Brandes' dependency recursion
        delta(v) = sum_{w in succ(v)} sigma_v / sigma_w * (1 + delta(w))
    sums floats whose value depends on aggregation order — not replayable
    across engines. Here the recursion runs in FIXED-POINT MICRO-UNITS with
    floor division applied per successor edge:
        delta_u(v) = sum_w (sigma_v * (scale + delta_u(w))) // sigma_w
    Every term is one integer multiply + one integer floor division
    (Spark `div` == DuckDB `//` on non-negative operands), and the sum is
    an order-free integer — bit-exact cross-engine, no epsilon. The
    floor-per-edge rounding makes this a deterministic micro-unit VARIANT
    of Brandes' real-valued delta (each term under-counts by < 1 micro);
    the estimator semantics (fixed seeds, fixed depth) are unchanged.

    Scale shape identical to stress_from_seeds: forward BFS sigma levels,
    backward per-level join + one map-side-combinable integer SUM; state is
    |seeds| x |V| rows max, snapshot per level. Overflow bound: sigma_v *
    (scale + delta) must stay under 2^63 — sigma grows with path multiplicity,
    so depth is the disclosed budget exactly as in stress.

    Returns (id, bc_micro): sum over seeds of the micro-unit dependency, for
    vertices with bc_micro > 0 (interior vertices of at least one counted
    shortest path).  Oracle: plans/oracle_sql.betweenness_sql.
    """
    from pgs_spark.operators.state import make_work_dir, snapshot

    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    work_dir = make_work_dir("pgs_btw_")
    sym = symmetrize(
        undirected_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    ).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    sym = snapshot(sym, work_dir, "sym")

    if seed_mod is not None:
        seeds_df = (
            sym.select(F.col("u").alias("id")).distinct()
            .filter(F.col("id") % seed_mod == 0)
        )
    elif isinstance(seeds, DataFrame):
        seeds_df = seeds.select("id")
    else:
        seeds_df = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    lvl0 = seeds_df.select(
        F.col("id").alias("s"), "id", F.lit(1).cast("long").alias("sigma")
    )
    levels: list[DataFrame] = [snapshot(lvl0, work_dir, "lvl_0")]
    seen = levels[0].select("s", "id")
    for d in range(1, max_depth + 1):
        prev = levels[-1]
        nxt = (
            prev.join(sym, prev["id"] == sym["u"])
            .select("s", F.col("v").alias("id"), "sigma")
            .join(seen, ["s", "id"], "left_anti")
            .groupBy("s", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = snapshot(nxt, work_dir, f"lvl_{d}")
        levels.append(nxt)
        seen = snapshot(
            seen.union(nxt.select("s", "id")), work_dir, f"seen_{d % 2}"
        )

    # backward: delta rides with sigma so each level join is self-contained
    delta = levels[max_depth].select(
        "s", "id", "sigma", F.lit(0).cast("long").alias("delta")
    )
    delta = snapshot(delta, work_dir, f"delta_{max_depth}")
    contribs: list[DataFrame] = []
    for d in range(max_depth - 1, -1, -1):
        succ = (
            delta.join(sym, delta["id"] == sym["v"])
            .select(
                "s",
                F.col("u").alias("id"),
                F.col("sigma").alias("w_sigma"),
                F.col("delta").alias("w_delta"),
            )
        )
        cur = levels[d]
        delta = (
            cur.select("s", "id", "sigma")
            .join(succ, ["s", "id"], "left")
            .select(
                "s",
                "id",
                "sigma",
                F.expr(
                    f"(sigma * ({int(scale)}L + w_delta)) DIV w_sigma"
                ).alias("term"),
            )
            .groupBy("s", "id")
            .agg(
                F.first("sigma").alias("sigma"),
                F.coalesce(F.sum("term"), F.lit(0)).cast("long").alias("delta"),
            )
        )
        delta = snapshot(delta, work_dir, f"delta_{d}")
        contribs.append(
            delta.filter(F.col("id") != F.col("s")).select(
                "id", F.col("delta").alias("c")
            )
        )
    out = contribs[0]
    for c in contribs[1:]:
        out = out.union(c)
    return (
        out.groupBy("id")
        .agg(F.sum("c").cast("long").alias("bc_micro"))
        .filter(F.col("bc_micro") > 0)
    )
