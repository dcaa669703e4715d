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
