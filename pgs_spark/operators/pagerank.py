"""PageRank: power iteration with teleport, dangling-mass redistribution,
per-superstep convergence metrics, and resumable checkpoints.

The iteration template is the reference's convergence loop
(PGS_Meshing.smoothMesh, PGS_Meshing.java:803-814: ``do { delta = smooth(...) }
while (delta > cutoff && iter < max)``) and its two-phase superstep barrier
(commons/PMesh.java:237-270 computes all new positions, then flips). The
per-superstep convergence/error bookkeeping mirrors TangencyPack's superstep
solver (commons/TangencyPack.java:248-296: iterate, measure residual, stop on
tolerance with a max-pass guard).

Spark plan per superstep (sparse gather-scatter):
  contribs = weighted_edges ⋈ ranks on src        (hash join; edges side is
             pre-hash-partitioned on src once, so only the small ranks side
             shuffles each superstep; AQE skew-join splits hub partitions)
  gathered = contribs.groupBy(dst).sum            (map-side partial agg; an
             optional salted two-stage agg splits hub dst keys explicitly)
  ranks'   = (1-α)/N + α·(gathered + dangling_mass/N)
  delta    = Σ|ranks' − ranks|                    (one action, fused with the
             next iteration's dangling-mass sum — a single pass)

State per superstep is |V| rows — tiny relative to |E| — so checkpointing every
iteration is cheap and gives both flat lineage and mid-convergence resume.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators import skew
from pgs_spark.streaming.checkpoint import CheckpointManager, fingerprint_edges


@dataclass
class PageRankResult:
    ranks: DataFrame          # (id: long, rank: double)
    iterations: int
    converged: bool
    history: list = field(default_factory=list)  # per-superstep metric dicts


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    salt_buckets: int | None = None,
    num_partitions: int | None = None,
    collect_skew_metrics: bool = False,
    fixed_iterations: int | None = None,
) -> PageRankResult:
    """Power-iteration PageRank over a directed edge table (src, dst).

    Matches networkx.pagerank semantics: teleport (1-alpha)/N, dangling mass
    redistributed uniformly, L1 convergence test. `fixed_iterations` runs an
    exact number of supersteps with no convergence test (for oracles).
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # ---- one-time build (persisted across supersteps) -----------------------
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # vstate: (id, outdeg|null). Dangling vertices have null outdeg.
    vstate = (
        verts.join(outdeg, verts.id == outdeg.src, "left")
        .select("id", "outdeg")
        .persist()
    )
    n = vstate.count()
    n_dangling = vstate.filter(F.col("outdeg").isNull()).count()
    if n == 0:
        return PageRankResult(verts.select("id", F.lit(0.0).alias("rank")), 0, True)

    # weighted edges: contribution weight 1/outdeg; hash-partitioned on the
    # join key ONCE so the per-superstep join only shuffles the ranks side.
    w_edges = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition(num_partitions, "src")
        .persist()
    )
    w_edges.count()  # materialize before the loop

    # Superstep state ALWAYS snapshots to parquet: |V| rows is cheap, lineage
    # stays flat, and — critically — the state lives off-heap (OS page cache).
    # localCheckpoint keeps every superstep's rows as deserialized on-heap RDD
    # blocks that unpersist() cannot free; at 20M vertices that produced
    # multi-second Full GC pauses every superstep.
    start_iter = 0
    ranks = None
    d_mass = float(n_dangling) / n  # all ranks equal at iter 0 → analytic
    history: list[dict] = []
    durable = checkpoint_dir is not None
    tmp_dir = None
    if not durable:
        tmp_dir = tempfile.mkdtemp(
            prefix="pgs_pr_", dir=os.environ.get("PGS_SPARK_LOCAL_DIR") or None
        )
        checkpoint_dir = tmp_dir
    cp = CheckpointManager(spark, checkpoint_dir, fingerprint_edges(edges))
    if durable:
        resumed = cp.resume_point()
        if resumed is None:
            cp.clear()  # stale state from a different input — never mix
        else:
            start_iter, ranks, m = resumed
            d_mass = m.get("dangling_mass", d_mass)
            if m.get("delta", 1.0) < tol and fixed_iterations is None:
                vstate.unpersist()  # early return must not leak cached state
                w_edges.unpersist()
                return PageRankResult(ranks.select("id", "rank"), start_iter, True, history)
    if ranks is None:
        ranks = vstate.select("id", F.lit(1.0 / n).alias("rank"))

    teleport = (1.0 - alpha) / n
    limit = fixed_iterations if fixed_iterations is not None else max_iter
    converged = False

    for it in range(start_iter, limit):
        t0 = time.time()
        # Gather join: edges are already hash-partitioned on src (built once);
        # SHUFFLE_HASH on the vertex side means only |V| rows shuffle per
        # superstep, the hash build parallelizes across tasks, and the 50M-row
        # edge side streams with no sort. (Letting Catalyst pick gives either
        # a broadcast of the full rank vector — a *serial* build that caps
        # scaling, Amdahl — or a sort-merge join that re-sorts the edges every
        # superstep.)
        contribs = w_edges.join(
            ranks.select("id", "rank").hint("shuffle_hash"), w_edges.src == F.col("id")
        ).select("dst", (F.col("rank") * F.col("w")).alias("contrib"))
        if salt_buckets:
            gathered = skew.salted_sum(contribs, "dst", "contrib", salt_buckets)
        else:
            gathered = contribs.groupBy("dst").agg(F.sum("contrib").alias("contrib"))
        new_ranks = (
            vstate.join(gathered, vstate.id == gathered.dst, "left")
            .select(
                "id",
                "outdeg",
                (
                    F.lit(teleport)
                    + F.lit(alpha) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(d_mass / n))
                ).alias("rank"),
            )
        )

        # Snapshot this superstep (job 1: parquet write), then compute the
        # fused delta + dangling-mass statistics from the re-read state
        # (job 2) — two jobs per superstep, state off-heap.
        new_ranks = cp.save(new_ranks, it + 1, lineage=False)
        stats = (
            new_ranks.select("id", "outdeg", F.col("rank").alias("new_rank"))
            .join(ranks.select("id", F.col("rank").alias("old_rank")), "id")
            .agg(
                F.sum(F.abs(F.col("new_rank") - F.col("old_rank"))).alias("delta"),
                F.sum(
                    F.when(F.col("outdeg").isNull(), F.col("new_rank")).otherwise(0.0)
                ).alias("d_mass"),
            )
            .first()
        )
        delta = float(stats["delta"])
        d_mass = float(stats["d_mass"] or 0.0)
        metrics = {
            "iteration": it + 1,
            "delta": delta,
            "dangling_mass": d_mass,
            "seconds": time.time() - t0,
        }
        if collect_skew_metrics:
            metrics["skew_ratio_dst"] = skew.skew_ratio(contribs, "dst")
        history.append(metrics)
        cp.write_manifest(it + 1, metrics)
        cp.prune(keep_last=2)
        ranks = new_ranks
        iterations = it + 1
        if fixed_iterations is None and delta < tol:
            converged = True
            break
    else:
        iterations = start_iter if limit <= start_iter else limit

    vstate.unpersist()
    w_edges.unpersist()
    if fixed_iterations is not None:
        converged = True
    # NOTE: with an ephemeral temp dir the returned DataFrame reads from that
    # dir's final snapshot — it is pruned to the last two snapshots and left
    # on disk (removing it would invalidate the returned DataFrame).
    return PageRankResult(ranks.select("id", "rank"), iterations, converged, history)
