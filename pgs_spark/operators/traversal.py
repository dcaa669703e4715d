"""BFS single-source hop distances — iterative frontier expansion.

Graft of PGS_Contour.distanceTree (PGS_Contour.java:718-740: BFSShortestPath
over the mesh graph from a snapped source vertex) and the frontier loop of
SpiralIterator (commons/SpiralIterator.java:16-64: gather unvisited neighbors
of the frontier, emit ring by ring).

Plan per hop: frontier ⋈ edges → candidate next frontier → anti-join against
visited. State (visited set) is |V| rows max; lineage truncated per hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize


def bfs_distances(
    spark: SparkSession,
    undirected_edges: DataFrame,
    source: int,
    max_hops: int = 20,
) -> DataFrame:
    """(id, dist) for every vertex reachable from `source` within max_hops."""
    sym = symmetrize(undirected_edges).persist()
    visited = spark.createDataFrame([(int(source), 0)], "id long, dist int")
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier.id == sym.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .select("id", F.lit(hop).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    sym.unpersist()
    return visited
