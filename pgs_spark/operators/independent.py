"""Distributed maximal independent set — Luby's algorithm.

Role: the independent-set primitive under the reference's coloring family.
RLFColoring (reference jgrapht RLF usage, PGS_Coloring.java) grows color
classes that ARE maximal independent sets, and Jones–Plassmann
(operators/coloring.py) colors exactly the per-round local-hash-minima that
Luby's algorithm admits to the MIS. This operator surfaces that primitive
standalone: one MIS over the graph, computed in O(log n) expected supersteps.

Algorithm (Luby 1986, hash-derandomized like operators/matching.py): each
round every ACTIVE vertex draws a deterministic priority
``md5(id | seed | round)``; a vertex joins the MIS iff its (priority, id)
pair is strictly smaller than every active neighbor's (vertices with no
active neighbors join unconditionally). MIS members AND their neighbors
deactivate. Re-hashing per round keeps adversarial orderings from starving
progress, and the fixed rule makes the whole run a deterministic program a
DuckDB oracle replays member-for-member (``luby_mis_sql``).

Guarantees: the output is INDEPENDENT after any number of rounds (two
adjacent actives can never both be round-minima, and a member's neighbors
leave with it), and MAXIMAL at convergence (an active vertex only remains
while it has an active neighbor; every live round admits at least the
globally-minimum active vertex, so the active set empties).

Scale shape per round: one groupBy (neighbor struct-min, map-side
combinable), one broadcast-size-agnostic semi/anti join pair to deactivate,
edge state snapshotted to parquet (alternating names — the GC discipline of
kcore/merge). No collect, no windows over unbounded partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize
from pgs_spark.operators.state import make_work_dir, snapshot


@dataclass
class MISResult:
    members: DataFrame  # (id, mis_round) — independent set members
    rounds: int
    converged: bool
    history: list = field(default_factory=list)


def _prio(col, seed: int, r: int):
    return F.md5(F.concat(col.cast("string"), F.lit(f"|{seed}|{r}")))


def luby_mis(
    spark: SparkSession,
    undirected_edges: DataFrame,
    max_rounds: int = 30,
    fixed_rounds: int | None = None,
    seed: int = 7,
) -> MISResult:
    """Canonical undirected edge table → (id, mis_round) MIS members.

    ``fixed_rounds`` runs exactly that many supersteps (oracle mode — both
    engines execute the identical program); otherwise runs until the active
    vertex set empties (maximal MIS) or ``max_rounds``.
    """
    work_dir = make_work_dir("pgs_mis_")
    edges = (
        undirected_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    edges = snapshot(edges, work_dir, "edges_init")
    verts = snapshot(
        symmetrize(edges).select(F.col("src").alias("id")).distinct(),
        work_dir,
        "verts_init",
    )
    member_parts: list[DataFrame] = []
    history: list[dict] = []
    limit = fixed_rounds if fixed_rounds is not None else max_rounds
    rounds = 0
    converged = False
    for r in range(1, limit + 1):
        sym = symmetrize(edges).select(F.col("src").alias("u"), F.col("dst").alias("v"))
        nbr_min = sym.groupBy("u").agg(
            F.min(F.struct(_prio(F.col("v"), seed, r).alias("h"), F.col("v"))).alias("s")
        )
        own = F.struct(_prio(F.col("id"), seed, r).alias("h"), F.col("id").alias("v"))
        mis_r = (
            verts.join(nbr_min, verts["id"] == nbr_min["u"], "left")
            .filter(F.col("s").isNull() | (own < F.col("s")))
            .select("id", F.lit(r).alias("mis_round"))
        )
        mis_r = snapshot(mis_r, work_dir, f"mis_{r}")
        rounds = r
        n_new = mis_r.count()
        history.append({"round": r, "admitted": n_new})
        member_parts.append(mis_r)
        gone = mis_r.select("id").union(
            sym.join(mis_r.select(F.col("id").alias("u")), "u", "left_semi")
            .select(F.col("v").alias("id"))
        )
        verts = snapshot(
            verts.join(gone, "id", "left_anti"), work_dir, f"verts_{r % 2}"
        )
        if verts.isEmpty():
            converged = True
            break
        edges = snapshot(
            # the named-key semi-join moves the key column first; re-select
            # (src, dst) because symmetrize() unions BY POSITION
            edges.join(verts.select(F.col("id").alias("src")), "src", "left_semi")
            .join(verts.select(F.col("id").alias("dst")), "dst", "left_semi")
            .select("src", "dst"),
            work_dir,
            f"edges_{r % 2}",
        )
    members = member_parts[0]
    for p in member_parts[1:]:
        members = members.union(p)
    return MISResult(members=members, rounds=rounds, converged=converged, history=history)


def luby_mis_sql(edges_sql: str, rounds: int, seed: int = 7) -> str:
    """Unrolled DuckDB oracle: the identical fixed-round hash-priority MIS."""

    def pr(x: str, r: int) -> str:
        return f"md5(CAST({x} AS VARCHAR) || '|{seed}|{r}')"

    parts = [
        f"eraw AS ({edges_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst)",
        "v0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM "
        "(SELECT src AS u FROM e0 UNION ALL SELECT dst FROM e0) t)",
    ]
    prev_e, prev_v = "e0", "v0"
    selects = []
    for r in range(1, rounds + 1):
        parts += [
            f"sym{r} AS MATERIALIZED (SELECT src AS u, dst AS v FROM {prev_e} "
            f"UNION ALL SELECT dst, src FROM {prev_e})",
            f"mis{r} AS MATERIALIZED (SELECT id, {r} AS mis_round FROM {prev_v} p "
            f"WHERE NOT EXISTS (SELECT 1 FROM sym{r} s WHERE s.u = p.id "
            f"AND ({pr('s.v', r)}, s.v) < ({pr('p.id', r)}, p.id)))",
            f"gone{r} AS (SELECT id FROM mis{r} UNION ALL "
            f"SELECT s.v FROM sym{r} s JOIN mis{r} m ON s.u = m.id)",
            f"v{r} AS MATERIALIZED (SELECT id FROM {prev_v} "
            f"WHERE id NOT IN (SELECT id FROM gone{r}))",
            f"e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev_e} e "
            f"JOIN v{r} a ON e.src = a.id JOIN v{r} b ON e.dst = b.id)",
        ]
        selects.append(f"SELECT id, mis_round FROM mis{r}")
        prev_e, prev_v = f"e{r}", f"v{r}"
    union = " UNION ALL ".join(selects)
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, mis_round FROM ({union})"
