"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline (the crossJoin-then-argmin
shape of PGS_Optimisation.closestPoint, PGS_Optimisation.java:873-925); the
scale path is random-hyperplane LSH bucketing (the STRtree-index-before-
pairwise-tests discipline of commons/FastOverlapRegions.java:46-47 — prune
with a cheap index, verify exactly within buckets).

Hyperplane components are deterministic ±1 derived from md5 parity, so the
DuckDB oracle can inline the identical planes as literals. Dot products are
computed in double over the ordered array — bit-identical across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered double-precision dot product of two array columns.

    SQL mirror: list_dot_product(a::DOUBLE[], b::DOUBLE[])."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_normalized: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rnk): brute-force top-k cosine neighbors
    of each query vector against the full embedding table.

    The query side is small by construction → broadcast; the big side streams
    through one whole-stage-codegen pass. At cluster scale this is the exact
    re-ranker behind the LSH candidate generator below."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    sim = dot(F.col("qv"), F.col("nv"))
    if not assume_normalized:
        sim = sim / (
            F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("nv"), F.col("nv")))
        )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("sim"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


def ivf_build(
    embeddings: DataFrame,
    n_clusters: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index ONCE: k-means coarse quantizer over the corpus.

    Returns (base, cent): base = (neighbor_id, nv, cluster) — the inverted
    file, ready to serve any number of query batches; cent = (c, i, cval)
    final centroid dims. In production the build is amortized across the
    query stream (and persisted as a table); benchmarks must time it
    separately from the per-batch probe+re-rank (`ivf_query`) or the
    quantizer's one-time cost drowns the latency the index actually buys."""
    from pgs_spark.operators.kmeans import kmeans_fit

    assign, cent = kmeans_fit(embeddings, n_clusters, iterations, id_col, vec_col)
    base = embeddings.join(assign, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "cluster"
    )
    return base, cent


def ivf_query(
    base: DataFrame,
    cent: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve one query batch against a prebuilt IVF index (`ivf_build`):
    rank centroids per query, take the `nprobe` nearest cells, exact cosine
    re-rank inside them. Candidates per query ≈ nprobe·|V|/n_clusters."""
    from pyspark.sql import Window as W

    from pgs_spark.operators.kmeans import _dims

    # query → squared distance to each FINAL centroid (same expression tree
    # as the quantizer itself, so the oracle mirrors it term for term)
    qd = _dims(queries, id_col, vec_col)
    d2 = (
        qd.join(cent, "i")
        .groupBy(F.col("vec_id").alias("query_id"), F.col("c"))
        .agg(
            F.sum(
                (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
            ).alias("dist2")
        )
    )
    wp = W.partitionBy("query_id").orderBy("dist2", "c")
    probe = (
        d2.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("c").alias("cluster"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        base.join(F.broadcast(probe.join(q, "query_id")), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("nv")), 6).alias("sim"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 4,
    iterations: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with multi-probe: k-means coarse quantizer → each query
    searches its `nprobe` NEAREST CENTROIDS' clusters → exact cosine re-rank.

    nprobe=1 recovers the classic single-cell IVF; nprobe>1 is the recall
    knob — a true neighbor just across a cluster boundary is missed by the
    single cell but caught by the second-closest one (the reference's
    CoverTree 1-NN, PGS_CirclePacking.java:199-239, always finds the true
    neighbor; this bounds how far the approximation is allowed to fall
    short). Candidates per query are nprobe·|V|/k, and the re-rank is the
    same whole-stage-codegen dot product as the brute-force baseline.
    bench.py records measured recall@k vs brute force per nprobe — no
    silent recall loss — and separately times build vs query at production
    quantizer widths (n_clusters √n-ish) via `ivf_build`/`ivf_query`,
    which this convenience wrapper composes."""
    base, cent = ivf_build(embeddings, n_clusters, iterations, id_col, vec_col)
    return ivf_query(base, cent, queries, k, nprobe, id_col, vec_col)


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 parity (cross-engine constant)."""
    planes = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}|{i}|{j}".encode()).hexdigest()
            row.append(1 if int(h[-1], 16) % 2 else -1)
        planes.append(row)
    return planes


def lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): random-hyperplane signature as an int in [0, 2^n_planes).
    Vectors sharing a bucket are ANN candidates; expected candidates per
    bucket shrink exponentially with n_planes — the scale knob."""
    planes = hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(F.col(vec_col), plane) > 0).cast("int")
        bucket = bucket + bit * (1 << i)
    return embeddings.select(F.col(id_col).alias("id"), bucket.cast("int").alias("bucket"))


def lsh_candidate_pairs(
    buckets: DataFrame, max_bucket: int = 256, stats_out: dict | None = None
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing an LSH bucket, hot buckets
    capped to a star on the bucket minimum (see dedup.capped_bucket_pairs —
    a degenerate bucket of zero-vectors would otherwise cost m² pairs)."""
    from pgs_spark.operators.dedup import capped_bucket_pairs

    return capped_bucket_pairs(
        buckets.persist(), ["bucket"], "id", max_bucket, stats_out
    )


def embedding_neardup(
    spark,
    embeddings: DataFrame,
    tau: float = 0.99,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats_out: dict | None = None,
) -> DataFrame:
    """(vec_id, keep_id): embedding-COSINE near-duplicate resolution — the
    vector-space sibling of dedup.dedup_keep_list (same composition as the
    reference's stochasticMerge pipeline, PGS_Meshing.java:727-738: cut
    edges → connectedSets() → per-component aggregate):

      candidates = random-hyperplane LSH buckets (lsh_buckets — identical
                   vectors always collide; near-identical ones collide
                   unless a perturbation flips a plane sign, the standard
                   LSH recall trade), hot buckets star-capped
      verified   = candidate pairs with ROUND(cos, 6) >= tau (embeddings
                   are unit-norm, so dot IS cosine — 6dp rounding makes
                   the threshold cross-engine exact)
      keep_id    = min vec_id of the verified-pair connected component;
                   unmatched vectors keep themselves

    Never all-pairs: pair generation is bucketed and capped, verification
    touches candidates only, and CC is the alternating-star loop — each
    piece already shaped for the 100-TB corpus. The DuckDB oracle
    (plans/docs_sql.embedding_neardup_sql) replays the identical planes,
    cap, threshold, and closure, so the gate match is exact including LSH
    recall losses."""
    from pgs_spark.operators.components import connected_components

    emb = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).persist()
    buckets = lsh_buckets(
        emb, n_planes, dim, seed, id_col="id", vec_col="v"
    )
    pairs = lsh_candidate_pairs(buckets, max_bucket, stats_out)
    va = emb.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = emb.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    verified = (
        pairs.join(va, "a")
        .join(vb, "b")
        .filter(F.round(dot(F.col("va"), F.col("vb")), 6) >= F.lit(tau))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp = connected_components(spark, verified).components
    all_ids = emb.select("id").distinct()
    out = all_ids.join(comp, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("component", "id").alias("keep_id"),
    )
    emb.unpersist()
    return out
