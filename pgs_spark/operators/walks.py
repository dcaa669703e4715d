"""Deterministic random-walk generation over the symmetrized link graph.

The graph-embedding data-prep primitive (DeepWalk / node2vec corpus
generation, Perozzi et al. 2014): one walk per seed vertex, fixed length,
next hop chosen uniformly-by-hash among neighbors. The choice
argmin_v md5(walk_id | seed,step | v) is a replayable uniform draw — the same
discipline as layout.py's md5 unit-uniforms — so the walks are identical in
any engine, any partitioning, any retry (a `rand()`-based walk would not
survive task retries, let alone an oracle).

Scale shape: each step is one equi-join of the |W|-row walk frontier against
the edge table on the current vertex, then a per-walk struct-min — the
gather-join shape PageRank uses, with the frontier in place of the rank
vector. Work per step is Σ_{w} deg(cur_w) ≤ 2|E|; nothing is ever all-pairs
and the step count is a fixed constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import canonicalize, symmetrize


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    walk_len: int = 4,
    start_mod: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(walk_id, step, vertex) for one walk per seed-slice vertex.

    Starts: every graph vertex with id % start_mod == 0 (walk_id = start
    vertex id); steps 0..walk_len inclusive, step 0 being the start itself.
    On the symmetrized graph every vertex has a neighbor, so walks never
    strand. Next hop from u at step t: the neighbor v minimizing
    (md5(f"{walk_id}|w{seed}s{t}|{v}"), v) — hash-uniform, tie-broken by id.
    """
    sym = symmetrize(canonicalize(edges)).persist()
    frontier = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .filter(F.col("vertex") % start_mod == 0)
        .select(F.col("vertex").alias("walk_id"), "vertex")
    )
    # each frontier feeds BOTH the next step and one branch of the output
    # union — persist per step so the union's L branches read cached state
    # instead of re-executing ever-longer join chains (O(L²) joins unpersisted)
    frontier = frontier.persist()
    out = frontier.select("walk_id", F.lit(0).alias("step"), "vertex")
    for t in range(1, walk_len + 1):
        h = F.md5(
            F.concat(
                F.col("walk_id").cast("string"),
                F.lit(f"|w{seed}s{t}|"),
                F.col("dst").cast("string"),
            )
        )
        frontier = (
            frontier.join(sym, frontier.vertex == sym.src)
            .select("walk_id", h.alias("h"), "dst")
            .groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("walk_id", F.col("m.dst").alias("vertex"))
            .persist()
        )
        out = out.unionByName(
            frontier.select("walk_id", F.lit(t).alias("step"), "vertex")
        )
    return out
