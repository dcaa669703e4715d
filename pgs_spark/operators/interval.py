"""Bucketed interval-overlap join — the sweep-line graft.

Graft of the reference's segment-intersection sweep
(PGS_Processing.lineSegmentsIntersection, PGS_Processing.java:584-607 — a
Balaban/sweep algorithm over x-strips). A sweep is inherently sequential; the
distributed shape is STRIP BUCKETING: chop the axis into width-w strips,
explode every interval to the strips it touches, equi-join on (key, strip),
verify the exact overlap predicate inside the strip.

Dedup without a distinct shuffle: a pair that overlaps in several strips is
emitted ONLY in the strip containing max(start_a, start_b) — each qualifying
pair counted exactly once, no post-join distinct over the (potentially huge)
pair set. Strip width is the scale knob: ~the median interval length keeps
the explode factor ≈2 while the equi-join prunes all far-apart pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    intervals: DataFrame,
    width: int,
    key_col: str = "key",
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Self-join: all pairs (a < b) of same-key intervals that overlap
    ([s,e] closed; overlap ⇔ s_a ≤ e_b ∧ s_b ≤ e_a). Output (key, a, b)."""
    w = F.lit(width)
    bucketed = intervals.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        F.explode(
            F.sequence(F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w))
        ).alias("strip"),
    )
    a = bucketed.select(
        "key", "strip", F.col("id").alias("a"), F.col("s").alias("sa"), F.col("e").alias("ea")
    )
    b = bucketed.select(
        "key", "strip", F.col("id").alias("b"), F.col("s").alias("sb"), F.col("e").alias("eb")
    )
    return (
        a.join(b, ["key", "strip"])
        .filter(
            (F.col("a") < F.col("b"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
            # count-once strip: the one containing the later start
            & (F.col("strip") == F.floor(F.greatest("sa", "sb") / w))
        )
        .select("key", "a", "b")
    )


def points_in_intervals(
    points: DataFrame,
    intervals: DataFrame,
    width: int,
    point_val: str = "v",
    point_id: str = "pid",
    ivl_id: str = "iid",
    start_col: str = "lo",
    end_col: str = "hi",
) -> DataFrame:
    """findContainingFace graft (PGS_Meshing.findContainingFace,
    PGS_Meshing.java:1045: locate the region containing a query point) as a
    STRIP-BUCKETED lookup, 1D: points (pid, v) × intervals (iid, lo, hi) →
    (pid, iid) for every half-open containment lo ≤ v < hi.

    Intervals explode to the strips they touch; each point lives in exactly
    ONE strip, so the equi-join emits every qualifying (point, interval) pair
    exactly once — no post-join distinct. Never all-pairs: the join prunes
    every interval not touching the point's strip. Strip width ≈ the median
    interval length keeps the explode factor ~2 (same knob as
    interval_overlap_pairs)."""
    w = F.lit(width)
    iv = intervals.select(
        F.col(ivl_id).alias("iid"),
        F.col(start_col).alias("lo"),
        F.col(end_col).alias("hi"),
        F.explode(
            F.sequence(F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w))
        ).alias("strip"),
    )
    pt = points.select(
        F.col(point_id).alias("pid"),
        F.col(point_val).alias("v"),
        F.floor(F.col(point_val) / w).alias("strip"),
    )
    return (
        pt.join(iv, "strip")
        .filter((F.col("lo") <= F.col("v")) & (F.col("v") < F.col("hi")))
        .select("pid", "iid")
    )
