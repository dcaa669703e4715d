"""Edge-table derivation, canonicalization, degrees, and CSR adjacency.

Graft map (SURVEY §2.2):
- ``derive_edges``     ← PGS_Conversion.toDualGraph (PGS_Conversion.java:1068-1108):
  explode records into keys, group/join on the key, emit edges.
- ``canonicalize``     ← PEdge's symmetric equality (commons/PEdge.java:98-110):
  an undirected edge is stored once as (least, greatest).
- ``degrees``          ← PMesh.initMeshVertices degree counting
  (commons/PMesh.java:44-92, `edgeCounts.merge(e, 1, Integer::sum)`).
- ``adjacency``        ← jgrapht NeighborCache materialization
  (PGS_Meshing.java:221); sorted neighbor arrays mirror the deterministic edge
  sort of PGS_Conversion.java:1087-1088 — these are the per-partition CSR
  blocks of the north rule.
- ``integrity_report`` ← the isConformingMesh check
  (PGS_ShapePredicates.java:731-734) and the >2-faces-per-edge guard
  (PGS_Conversion.java:1101-1104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_edges(refs: DataFrame, repos: DataFrame) -> DataFrame:
    """(repo, ref) reference pairs → directed edge table (src, dst).

    ``repos`` is the dimension (repo, repo_id). Both endpoints resolve through
    it, so imports of unknown repos drop out (inner join) — the same guard as
    toDualGraph ignoring edge keys not shared by a real face pair. The repo
    dimension is orders of magnitude smaller than the refs fact table at any
    scale (10^8 repos vs 10^12 files), so Spark broadcasts it when it fits and
    AQE handles the rest; self-imports are dropped like self-loops.
    """
    src = repos.select(F.col("repo"), F.col("repo_id").alias("src"))
    dst = repos.select(
        F.lower(F.col("repo")).alias("ref"), F.col("repo_id").alias("dst")
    )
    return (
        refs.join(src, "repo")
        .join(dst, "ref")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def canonicalize(edges: DataFrame) -> DataFrame:
    """Directed → canonical undirected: (least, greatest), dedup, no loops.

    Mirror of PEdge.equals/hashCode being symmetric in the endpoints
    (commons/PEdge.java:98-110)."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Canonical undirected → both directions (the darts of
    FastPolygonizer.java:47-60: each undirected edge becomes two darts)."""
    return edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def degrees(undirected_edges: DataFrame) -> DataFrame:
    """Per-vertex degree of a canonical undirected edge table → (id, degree)."""
    return (
        symmetrize(undirected_edges)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
    )


def out_degrees(directed_edges: DataFrame) -> DataFrame:
    return directed_edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("outdeg")
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing at either endpoint."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def adjacency(undirected_edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """CSR-block adjacency: (src, nbrs sorted array<long>, deg).

    Sorted arrays give deterministic iteration (PGS_Conversion.java:1087-1088
    sorts edges "to ensure deterministic processing") and cache-friendly
    per-partition blocks for the wedge join."""
    sym = symmetrize(undirected_edges)
    if num_partitions:
        sym = sym.repartition(num_partitions, "src")
    return sym.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs"),
        F.count("*").alias("deg"),
    )


def integrity_report(undirected_edges: DataFrame) -> dict[str, int]:
    """Edge-table invariants (FIXTURES.md §2): returns violation counts.

    - self_loops: must be 0
    - duplicate_edges: must be 0 post-canonicalization
    - non_canonical: rows with src >= dst, must be 0
    (the isConformingMesh-style assertion, PGS_ShapePredicates.java:731-734).
    """
    e = undirected_edges
    agg = e.select(
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("self_loops"),
        F.sum((F.col("src") > F.col("dst")).cast("long")).alias("non_canonical"),
    ).first()
    dup = (
        e.groupBy("src", "dst").count().filter(F.col("count") > 1).count()
    )
    return {
        "self_loops": int(agg["self_loops"] or 0),
        "non_canonical": int(agg["non_canonical"] or 0),
        "duplicate_edges": int(dup),
    }


def boundary_vertices(weighted_edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """(id, is_boundary): the PMesh.initMeshVertices boundary flag
    (commons/PMesh.java:57-67: an edge used by exactly ONE face marks both
    endpoints as boundary vertices — the flag the reference's smoothing loop
    pins in place).

    Graft semantics on a weighted co-occurrence graph: ``weight == 1`` edges
    are the single-support ("one face") edges; a vertex is boundary iff it is
    incident to at least one. One filter + one semi-join per side — no
    iteration, scale-safe."""
    ends = weighted_edges.select(F.col("src").alias("id")).union(
        weighted_edges.select(F.col("dst").alias("id"))
    ).distinct()
    single = weighted_edges.filter(F.col(weight_col) == 1)
    b_ids = (
        single.select(F.col("src").alias("id"))
        .union(single.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("b", F.lit(True))
    )
    return ends.join(b_ids, "id", "left").select(
        "id", F.coalesce("b", F.lit(False)).alias("is_boundary")
    )
