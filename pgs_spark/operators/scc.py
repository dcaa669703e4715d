"""Strongly connected components on a DIRECTED link graph.

ConnectivityInspector (the reference's component surface, grafted for
undirected graphs in operators/components.py) answers "who is connected";
on a directed web/link graph the structural question is "who is MUTUALLY
reachable" — the bow-tie decomposition's core. This is the distributed
Trim + forward-backward min-label peeling SCC (the FW-BW-Trim family:
Orzan 2004; Hong, Rodia, Olukotun 2013):

    repeat until no vertices remain:
      TRIM  — peel vertices with in-degree 0 OR out-degree 0 in the
              remaining graph (each is a singleton SCC) to a fixpoint;
              this erases the DAG tendrils of the bow tie cheaply.
      LABEL — on the cyclic core: fwd(v) = min id that REACHES v (min-label
              propagation along edges), bwd(v) = min id v REACHES (along
              reversed edges); peel {v : fwd(v) = bwd(v)} as SCC fwd(v).

Correctness: fwd(v) = bwd(v) = m means m ⇄ v, so v ∈ SCC(m); SCC members
share their full reach sets, so an entire SCC peels atomically and m is the
SCC's minimum id (every member reaches v, so the min reaching id can only
be ≤ each member's id — and it is itself a member). Intra-SCC paths never
leave the SCC (any relay on a v→…→v cycle is mutually reachable with v),
so peeling other SCCs or trimmed singletons never breaks a remaining SCC:
each round's induced subgraph preserves exactly the unpeeled SCCs. Every
label round peels at least the SCC of the minimum remaining id.

Distributed shape: both label fields propagate in ONE superstep — a
forward equi-join (src→dst carries fwd) and a backward equi-join (dst→src
carries bwd) feeding one codegen groupBy(min) each, state snapshotted to
parquet (operators/state.py). Trim is two semi-joins per iteration.
Convergence is exact: labels are monotonically non-increasing longs, so
the (count, xor-hash) signature — observed on the snapshot WRITE job,
components.py's one-job-per-round discipline — repeats iff the fixpoint is
reached. No floating point anywhere; the DuckDB oracle
(plans/oracle_sql.scc_sql) computes the same partition via bidirectional
transitive closure, tractable at gate scale only.

100-TB note: closure-based truth is quadratic in SCC size — that is the
oracle's job, never the engine's. The engine's per-superstep cost is
O(|E|) shuffled on the vertex id, hub skew absorbed by map-side partial
min; label rounds are bounded by the cyclic core's diameter. The known
adversarial case is a long PATH of SCCs (peels serialize); Trim absorbs
the pure-DAG version of it, and max_peels bounds the rest.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.state import make_work_dir, snapshot


@dataclass
class SCCResult:
    assignments: DataFrame  #: (id, scc) — scc = min vertex id of the SCC
    history: list = field(default_factory=list)


def _observed_snapshot(df: DataFrame, work_dir: str, name: str, cols: list[str]):
    """Snapshot with a (count, xor-hash) signature riding the write job."""
    obs = Observation()
    observed = df.observe(
        obs, F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64(*cols)).alias("h")
    )
    out = snapshot(observed, work_dir, name)
    vals = obs.get
    return out, (int(vals["n"] or 0), int(vals["h"] or 0))


def strongly_connected_components(
    spark: SparkSession,
    directed_edges: DataFrame,
    max_peels: int = 30,
    max_inner: int = 100,
) -> SCCResult:
    """(id, scc) over (src, dst) directed edges; self-loops ignored, every
    vertex assigned (trimmed/isolated vertices get their own id). Raises if
    max_peels rounds leave vertices unassigned — a partial SCC answer is
    not an answer."""
    work_dir = make_work_dir("pgs_scc_")
    # edge snapshots alternate two names off ONE global counter — trim and
    # label phases both rewrite edges, so per-phase parities could collide
    # (overwriting the dir being read); a single monotone flip cannot.
    e_flip = [0]

    def _edge_snapshot(df):
        e_flip[0] += 1
        return _observed_snapshot(
            df, work_dir, f"e_{e_flip[0] % 2}", ["src", "dst"]
        )

    edges, e_sig = _edge_snapshot(
        directed_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    remaining = snapshot(
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct(),
        work_dir,
        "rem",
    )
    history: list = []
    done_parts: list[DataFrame] = []
    n_remaining = remaining.count()

    for peel in range(max_peels):
        if n_remaining == 0:
            break
        # ---- TRIM: peel in/out-degree-0 vertices as singleton SCCs ----
        trims = 0
        while True:
            core = (
                remaining.join(
                    edges.select(F.col("src").alias("id")).distinct(), "id", "left_semi"
                ).join(
                    edges.select(F.col("dst").alias("id")).distinct(), "id", "left_semi"
                )
            )
            core, c_sig = _observed_snapshot(core, work_dir, "core", ["id"])
            if c_sig[0] == n_remaining:
                break  # nothing trimmed this pass
            trimmed = remaining.join(core, "id", "left_anti").select(
                "id", F.col("id").alias("scc")
            )
            done_parts.append(snapshot(trimmed, work_dir, f"done_t{peel}_{trims}"))
            remaining = snapshot(core.select("id"), work_dir, "rem")
            n_remaining = c_sig[0]
            edges, e_sig = _edge_snapshot(
                edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
            )
            trims += 1
            if n_remaining == 0:
                break
        if n_remaining == 0:
            history.append({"peel": peel, "trim_rounds": trims, "inner_supersteps": 0})
            break
        # ---- LABEL: bidirectional min-label propagation to fixpoint ----
        labels, sig = _observed_snapshot(
            remaining.select("id", F.col("id").alias("fwd"), F.col("id").alias("bwd")),
            work_dir,
            "lab_0",
            ["id", "fwd", "bwd"],
        )
        inner = 0
        for inner in range(1, max_inner + 1):
            fmin = (
                edges.join(labels, edges.src == labels.id)
                .groupBy(edges.dst.alias("id"))
                .agg(F.min("fwd").alias("f2"))
            )
            bmin = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy(edges.src.alias("id"))
                .agg(F.min("bwd").alias("b2"))
            )
            nxt = (
                labels.join(fmin, "id", "left")
                .join(bmin, "id", "left")
                .select(
                    "id",
                    F.least("fwd", "f2").alias("fwd"),
                    F.least("bwd", "b2").alias("bwd"),
                )
            )
            labels, new_sig = _observed_snapshot(
                nxt, work_dir, f"lab_{inner % 2}", ["id", "fwd", "bwd"]
            )
            if new_sig == sig:
                break
            sig = new_sig
        peeled, p_sig = _observed_snapshot(
            labels.filter(F.col("fwd") == F.col("bwd")).select(
                "id", F.col("fwd").alias("scc")
            ),
            work_dir,
            f"done_p{peel}",
            ["id", "scc"],
        )
        done_parts.append(peeled)
        remaining = snapshot(
            labels.filter(F.col("fwd") != F.col("bwd")).select("id"), work_dir, "rem"
        )
        n_remaining -= p_sig[0]
        edges, e_sig = _edge_snapshot(
            edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        history.append(
            {
                "peel": peel,
                "trim_rounds": trims,
                "inner_supersteps": inner,
                "peeled": p_sig[0],
                "edges_left": e_sig[0],
            }
        )
    if n_remaining != 0:
        raise RuntimeError(
            f"SCC did not converge within max_peels={max_peels}: "
            f"{n_remaining} vertices unassigned"
        )
    if not done_parts:  # edgeless input
        out = spark.createDataFrame([], "id long, scc long")
    else:
        out = done_parts[0]
        for p in done_parts[1:]:
            out = out.unionByName(p)
    return SCCResult(assignments=out, history=history)
