"""K-means (Lloyd) as pure relational algebra — no UDF, no driver collect.

Graft of PGS_PointSet.cluster (PGS_PointSet.java:297-325: Lloyd iterations,
fixed max iteration count, deterministic seeded init). Init is deterministic
(the first k vectors by id); each iteration is two joins + two aggregations:

  dims     = explode vectors to (id, dim_index, value) rows
  distances= dims ⋈ centroid_dims on dim_index → Σ(v−c)² per (id, cluster)
  assign   = per-id argmin (tie → lowest cluster id — explicit determinism)
  update   = per-(cluster, dim_index) mean of member values

Everything stays JVM-side whole-stage codegen; at 10^9 vectors the dims table
is the only large relation and both joins are hash-partitioned on dim_index /
vec_id. Fixed `iterations` keeps it oracle-unrollable (the reference caps at
25 iterations the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dims(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)),
    ).select(
        "vec_id", (F.col("pos") + 1).alias("i"), F.col("col").cast("double").alias("val")
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) after `iterations` Lloyd steps:
    assignments = (vec_id, cluster); centroids = (c, i, cval) — the means of
    the FINAL assignment (what an IVF probe ranks against). Init centroids
    are the vectors with the k smallest ids (the actual k smallest — not
    `id < k`, which silently under-initializes on non-0-based id spaces)."""
    dims = _dims(embeddings, id_col, vec_col).persist()
    init_ids = (
        embeddings.select(F.col(id_col).alias("vec_id"))
        .distinct()
        .orderBy("vec_id")
        .limit(k)
    )
    cent = dims.join(F.broadcast(init_ids), "vec_id").select(
        F.col("vec_id").alias("c"), "i", F.col("val").alias("cval")
    )
    assign = None
    for _ in range(iterations):
        d2 = (
            dims.join(cent, "i")
            .groupBy("vec_id", "c")
            .agg(
                F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))).alias("dist2")
            )
        )
        # ONE-PASS argmin: min(struct(dist2, c)) == "min dist2, ties to min
        # c". The former two-pass form (min-per-vec_id then a dist2 == m
        # equality join) evaluated the float aggregate TWICE — shuffle merge
        # order differs between evaluations, the last-ulp mismatch fails the
        # equality, and the vec_id silently drops; compounded per Lloyd step
        # this emptied the whole assignment by iteration 5 (found via the
        # round-4 IVF recall sweep reading 0.000).
        assign = (
            d2.groupBy("vec_id")
            .agg(F.min(F.struct("dist2", "c")).alias("s"))
            .select("vec_id", F.col("s.c").alias("cluster"))
        )
        cent = (
            assign.join(dims, "vec_id")
            .groupBy(F.col("cluster").alias("c"), "i")
            .agg(F.avg("val").alias("cval"))
        )
    out = assign.select("vec_id", "cluster").localCheckpoint(eager=True)
    # centroids FROM the checkpointed final assignment (same formula as the
    # loop's last step) — guarantees centroid labels are exactly the labels
    # the returned assignment uses, even under nondeterministic re-evaluation
    cent_out = (
        out.join(dims, "vec_id")
        .groupBy(F.col("cluster").alias("c"), "i")
        .agg(F.avg("val").alias("cval"))
        .select("c", "i", "cval")
        .localCheckpoint(eager=True)
    )
    dims.unpersist()  # long-lived sessions must not accumulate cached state
    return out, cent_out


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) — see kmeans_fit."""
    assign, _ = kmeans_fit(embeddings, k, iterations, id_col, vec_col)
    return assign


def kmeans_ctes(k: int = 4, iterations: int = 2) -> tuple[list[str], str]:
    """(CTE definitions, final-assignment CTE name) — shared by kmeans_sql
    and downstream oracles that build on the clustering (IVF ANN)."""
    parts = [
        "dims AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        "unnest(embedding::DOUBLE[]) AS val FROM embeddings)",
        f"init_ids AS (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})",
        "cent0 AS MATERIALIZED (SELECT d.vec_id AS c, d.i, d.val AS cval FROM dims d "
        "JOIN init_ids USING (vec_id))",
    ]
    prev_cent = "cent0"
    assign = None
    for it in range(1, iterations + 1):
        parts.append(
            f"d{it} AS MATERIALIZED (SELECT d.vec_id, c.c, "
            f"SUM((d.val - c.cval) * (d.val - c.cval)) AS dist2 "
            f"FROM dims d JOIN {prev_cent} c ON d.i = c.i GROUP BY d.vec_id, c.c)"
        )
        parts.append(
            f"a{it} AS MATERIALIZED (SELECT vec_id, MIN(c) AS cluster FROM ("
            f"SELECT vec_id, c, dist2, MIN(dist2) OVER (PARTITION BY vec_id) AS m FROM d{it}) t "
            f"WHERE dist2 = m GROUP BY vec_id)"
        )
        parts.append(
            f"cent{it} AS MATERIALIZED (SELECT a.cluster AS c, d.i, AVG(d.val) AS cval "
            f"FROM a{it} a JOIN dims d ON a.vec_id = d.vec_id GROUP BY a.cluster, d.i)"
        )
        prev_cent = f"cent{it}"
        assign = f"a{it}"
    return parts, assign


def kmeans_sql(k: int = 4, iterations: int = 2) -> str:
    """DuckDB oracle mirroring kmeans_assign structurally."""
    parts, assign = kmeans_ctes(k, iterations)
    return "WITH " + ",\n".join(parts) + f"\nSELECT vec_id, cluster FROM {assign}"
