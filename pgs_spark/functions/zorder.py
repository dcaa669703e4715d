"""Z-order (Morton) space-filling-curve locality index.

Graft of the reference's Hilbert-curve locality sorts (PGS_PointSet.hilbertSort,
PGS_PointSet.java:277-282; PGS_Optimisation.hilbertSortFaces,
PGS_Optimisation.java:1072): order 2D data so that neighbors in the plane land
near each other in the linear order. In a distributed engine the payoff is
physical LAYOUT, not iteration order: z-ordering rows before a parquet write
clusters both key dimensions into the same row groups, so min/max row-group
statistics prune scans for 2D box/range predicates — the "CSR block locality"
story of SURVEY §2.6.

Morton interleave beats Hilbert here because it is a pure bit-shuffle — five
shift-mask stages per dimension, whole-stage-codegen column arithmetic,
bit-identical in DuckDB (`&`, `|`, `<<` on BIGINT) so the index expression
itself is oracle-checkable. (Hilbert's rotation state needs iteration or a
lookup table; its ~2× locality edge over Morton does not survive row-group
granularity.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread the low 16 bits of n to the even bit positions of a 32-bit word
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _part1by1(n: Column) -> Column:
    n = n.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        n = (n.bitwiseOR(F.shiftleft(n, shift))).bitwiseAND(F.lit(mask))
    return n


def interleave_bits(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit non-negative ints: bit i of x lands
    at position 2i, bit i of y at 2i+1. SQL mirror: the same shift-mask
    cascade with `&`/`|`/`<<` on BIGINT."""
    return _part1by1(x.cast("long")).bitwiseOR(
        F.shiftleft(_part1by1(y.cast("long")), 1)
    )


def interleave_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB expression mirroring interleave_bits(x, y) structurally."""

    def part(e: str) -> str:
        e = f"(({e}) & 65535)"
        for shift, mask in _SPREAD:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({part(x_expr)} | ({part(y_expr)} << 1))"


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, num_partitions: int, z_col: str = "z"
) -> DataFrame:
    """Range-partition + sort rows by their Morton code — the write-side
    layout operator. `df.write.parquet` after this produces row groups whose
    (x, y) min/max envelopes are small boxes, so a predicate on either or
    both dimensions prunes row groups (see test_zorder for the measured
    pruning on the co-purchase edge table)."""
    with_z = df.withColumn(z_col, interleave_bits(F.col(x_col), F.col(y_col)))
    return with_z.repartitionByRange(num_partitions, z_col).sortWithinPartitions(z_col)


def sfc_tour(points: DataFrame) -> DataFrame:
    """Space-filling-curve tour — the distributed GreedyTSP analog
    (PGS_Optimisation greedy nearest-neighbor tour; SURVEY §2.9). A
    sequential nearest-neighbor tour is inherently serial; the classic
    distributed heuristic for Euclidean TSP is "visit points in
    space-filling-curve order" (Platzman & Bartholdi, "Spacefilling curves
    and the planar travelling salesman problem", JACM 1989 — O(log n)
    worst-case tour-length ratio; Morton here, same locality family).

    points (id, x, y) → (id, z, tour_rank): quantize to a 16-bit grid,
    Morton-interleave, rank by (z, id). The rank is two-level — per-bucket
    (z >> 16) row_number + a |buckets|-row cumulative offset join — so no
    global single-partition window; the same discipline as spiral_order.
    """
    from pyspark.sql import Window as W

    pts = points.select(
        "id", F.col("x").cast("double"), F.col("y").cast("double")
    )
    b = pts.agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).first()
    x0, x1, y0, y1 = (float(b[c] or 0.0) for c in ("x0", "x1", "y0", "y1"))
    xr = (x1 - x0) or 1.0
    yr = (y1 - y0) or 1.0

    def quant(col, lo, rng):
        return F.least(
            F.floor((col - F.lit(lo)) / F.lit(rng) * F.lit(65535.0)),
            F.lit(65535),
        ).cast("long")

    zed = pts.select(
        "id",
        interleave_bits(
            quant(F.col("x"), x0, xr), quant(F.col("y"), y0, yr)
        ).alias("z"),
    )
    w_b = W.partitionBy("bkt").orderBy("z", "id")
    within = zed.withColumn("bkt", F.shiftright("z", 16)).withColumn(
        "rn", F.row_number().over(w_b)
    )
    w_off = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = (
        within.groupBy("bkt")
        .agg(F.count("*").alias("sz"))
        .select("bkt", F.coalesce(F.sum("sz").over(w_off), F.lit(0)).alias("off"))
    )
    return within.join(offs, "bkt").select(
        "id", "z", (F.col("off") + F.col("rn")).cast("long").alias("tour_rank")
    )


def sfc_tour_sql(points_sql: str) -> str:
    """DuckDB oracle for sfc_tour — identical quantization, interleave
    (interleave_sql bit cascade), and two-level ranking."""
    qx = "CAST(least(floor((p.x - c.x0) / c.xr * 65535.0), 65535) AS BIGINT)"
    qy = "CAST(least(floor((p.y - c.y0) / c.yr * 65535.0), 65535) AS BIGINT)"
    z = interleave_sql(qx, qy)
    return f"""
WITH pts AS MATERIALIZED (SELECT id, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
                          FROM ({points_sql})),
cst AS MATERIALIZED (SELECT MIN(x) AS x0, MIN(y) AS y0,
    CASE WHEN MAX(x) - MIN(x) = 0 THEN 1.0 ELSE MAX(x) - MIN(x) END AS xr,
    CASE WHEN MAX(y) - MIN(y) = 0 THEN 1.0 ELSE MAX(y) - MIN(y) END AS yr
    FROM pts),
zed AS MATERIALIZED (SELECT p.id, {z} AS z FROM pts p CROSS JOIN cst c),
rk AS (SELECT id, z, z >> 16 AS bkt,
       ROW_NUMBER() OVER (PARTITION BY z >> 16 ORDER BY z, id) AS rn FROM zed),
off AS (SELECT bkt,
        COALESCE(SUM(CAST(sz AS BIGINT)) OVER (ORDER BY bkt
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        FROM (SELECT bkt, COUNT(*) AS sz FROM rk GROUP BY bkt))
SELECT r.id, r.z, CAST(f.o + r.rn AS BIGINT) AS tour_rank
FROM rk r JOIN off f ON r.bkt = f.bkt
"""
