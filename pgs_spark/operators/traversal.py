"""BFS single-source hop distances — iterative frontier expansion.

Graft of PGS_Contour.distanceTree (PGS_Contour.java:718-740: BFSShortestPath
over the mesh graph from a snapped source vertex) and the frontier loop of
SpiralIterator (commons/SpiralIterator.java:16-64: gather unvisited neighbors
of the frontier, emit ring by ring).

Plan per hop: frontier ⋈ edges → candidate next frontier → anti-join against
visited. State (visited set) is |V| rows max; it snapshots to parquet each hop
(off-heap, alternating two paths — the GC fix PageRank/CC got; localCheckpoint
pinned every hop's visited set on-heap) and the frontier is re-derived from
the snapshot as ``dist == hop`` — one write + one cheap scan per hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize
from pgs_spark.operators.state import make_work_dir, snapshot


def bfs_distances(
    spark: SparkSession,
    undirected_edges: DataFrame,
    source: int,
    max_hops: int = 20,
) -> DataFrame:
    """(id, dist) for every vertex reachable from `source` within max_hops."""
    sym = symmetrize(undirected_edges).persist()
    work_dir = make_work_dir("pgs_bfs_")
    visited = spark.createDataFrame([(int(source), 0)], "id long, dist int")
    visited = snapshot(visited, work_dir, "visited_0")
    for hop in range(1, max_hops + 1):
        frontier = visited.filter(F.col("dist") == hop - 1).select("id")
        nxt = (
            frontier.join(sym, frontier.id == sym.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .select("id", F.lit(hop).cast("int").alias("dist"))
        )
        visited = snapshot(visited.union(nxt), work_dir, f"visited_{hop % 2}")
        # termination check reads the just-written snapshot — one cheap scan
        if visited.filter(F.col("dist") == hop).isEmpty():
            break
    sym.unpersist()
    return visited
