"""Synchronous label propagation with deterministic tie-breaking.

Graft of two reference behaviors:
- PGS_Meshing.stochasticMerge's island pass (PGS_Meshing.java:706-725): seeded
  random labels, then a vertex adopts a neighbor's label — one LPA superstep.
- PGS_Coloring's class assignment (PGS_Coloring.java:236-273): iterative
  neighbor-label aggregation with a pinned seed (SEED=1337) for repeatability.

Tie-break: most frequent neighbor label, then the minimum label — an explicit
deterministic order, because Spark aggregation order is nondeterministic and
the reference explicitly sorts before order-sensitive steps
(PGS_Conversion.java:1087-1088). Convergence = zero label changes (the
GeneticColoring stopping rule: iterate until conflict count is 0,
commons/GeneticColoring.java:41-95), with a max-superstep guard.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize


@dataclass
class LPAResult:
    labels: DataFrame  # (id: long, label: long)
    iterations: int
    converged: bool
    history: list = field(default_factory=list)


def label_propagation(
    spark: SparkSession,
    undirected_edges: DataFrame,
    max_iter: int = 10,
    seed: int | None = None,
    n_initial_labels: int | None = None,
) -> LPAResult:
    """LPA over a canonical undirected edge table.

    Default init: label = vertex id (community detection). With `seed` and
    `n_initial_labels`: seeded random labels in [0, n) — the stochasticMerge
    configuration (nClasses + seed, PGS_Meshing.java:693-700).
    """
    sym = symmetrize(undirected_edges).persist()
    verts = sym.select(F.col("src").alias("id")).distinct()
    if seed is not None and n_initial_labels:
        labels = verts.select(
            "id",
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_initial_labels)).alias("label"),
        )
    else:
        labels = verts.select("id", F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    history: list[dict] = []
    converged = False
    iterations = 0
    for it in range(1, max_iter + 1):
        nbr = sym.join(labels, sym.dst == labels.id).select(
            F.col("src").alias("id"), "label"
        )
        counts = nbr.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        # argmax by (cnt, -label): most frequent, ties to the smallest label.
        best = (
            counts.groupBy("id")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("s"))
            .select("id", (-F.col("s.nl")).alias("new_label"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=False)  # materialized by the changed-count action
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        iterations = it
        history.append({"iteration": it, "changed": changed})
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    return LPAResult(labels, iterations, converged, history)
